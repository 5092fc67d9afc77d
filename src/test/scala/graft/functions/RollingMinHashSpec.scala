package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RollingMinHashSpec extends SparkTestBase {

  import spark.implicits._

  /** Direct (non-rolling) reference: hash every window from scratch. */
  private def windowHashes(s: String, w: Int): Seq[Long] = {
    val b = s.getBytes("UTF-8")
    (0 to b.length - w).map { i =>
      (i until i + w).foldLeft(0L)((h, j) =>
        (h * RollingMinHash.Base + (b(j) & 0xff)) % RollingMinHash.Mod)
    }
  }

  private def naive(s: String, w: Int): Option[Long] =
    if (s.getBytes("UTF-8").length < w) None else Some(windowHashes(s, w).min)

  test("rolling update matches per-window recomputation") {
    val rnd = new scala.util.Random(3)
    val texts = Seq("", "a", "abcdefghijklmnop", "the quick brown fox jumps") ++
      (0 until 20).map(_ => rnd.alphanumeric.take(5 + rnd.nextInt(60)).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = df.select($"id", RollingMinHash.rollingMinHash($"t", 16).as("h"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == naive(t, 16), s"'$t'")
    }
  }

  test("identical docs share fingerprints; shared window detected across docs") {
    val common = "0123456789abcdef" // one full 16-byte window
    val a = s"prefix one $common suffix aaa"
    val b = s"totally different text $common more"
    val Some(ha) = naive(a, 16)
    // min over windows is not guaranteed equal across docs, but the shared
    // window's hash is in both window sets — check via the naive sets
    assert(windowHashes(a, 16).toSet.intersect(windowHashes(b, 16).toSet).nonEmpty)
    assert(naive(a, 16) == naive(a, 16)) // deterministic
    assert(ha >= 0 && ha < RollingMinHash.Mod)
  }

  test("short text yields null; window bounds validated") {
    val df = Seq((1L, "short")).toDF("id", "t")
    val r = df.select(RollingMinHash.rollingMinHash($"t", 16)).head()
    assert(r.isNullAt(0))
    val litX = org.apache.spark.sql.graftbridge.Bridge.expression(lit("x"))
    intercept[IllegalArgumentException](RollingMinHash(litX, 0))
    intercept[IllegalArgumentException](RollingMinHash(litX, 65))
  }

  test("SQL registration via extensions") {
    withExtensionsSession { s2 =>
      val v = s2.sql("SELECT rolling_min_hash('0123456789abcdefgh', 16) AS h").head().getLong(0)
      assert(Some(v) == naive("0123456789abcdefgh", 16))
    }
  }
}
