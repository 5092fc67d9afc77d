package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {

  import spark.implicits._

  test("approxDistinctByKey: exact counts right, estimates inside budget") {
    // 3 keys with known distinct cardinalities 1000 / 100 / 1
    val df = spark.range(2000).select(
      when($"id" < 1000, "a").when($"id" < 1900, "b").otherwise("c").as("k"),
      when($"id" < 1000, $"id")            // a: 1000 distinct
        .when($"id" < 1900, pmod($"id", lit(100)))  // b: 100 distinct
        .otherwise(lit(0L)).as("v"))
    val out = Sketches.approxDistinctByKey(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out("a")._1 == 1000L && out("b")._1 == 100L && out("c")._1 == 1L)
    out.values.foreach { case (_, approxOk, hllOk) =>
      assert(approxOk && hllOk, s"estimate outside tolerance: $out")
    }
  }

  test("approxIntersection: exact intersection certified by inclusion-exclusion") {
    // A = 0..1499, B = 1000..2499 -> |A∩B| = 500
    val a = spark.range(0, 1500).toDF("v")
    val b = spark.range(1000, 2500).toDF("v")
    val out = Sketches.approxIntersection(a, b, "v").collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1500L, 1500L, 500L)))
    assert(r.getBoolean(3), "inclusion-exclusion estimate inside budget")
    // disjoint sides: exact 0; the certificate must hold via the absolute
    // slack term (relative tolerance alone is degenerate at n_exact = 0)
    val d = Sketches.approxIntersection(
      spark.range(0, 800).toDF("v"), spark.range(10000, 10800).toDF("v"), "v")
      .collect()(0)
    assert(d.getLong(2) == 0L && d.getBoolean(3))
  }

  test("hllPartUnion: union of part sketches estimates the global distinct") {
    // 4 parts over overlapping value ranges; global distinct = 500
    val df = spark.range(2000).select(
      pmod($"id", lit(4)).cast("string").as("part"),
      pmod($"id" * 13L, lit(500)).as("v"))
    val Array(row) = Sketches.hllPartUnion(df, "part", "v").collect()
    assert(row.getLong(0) == 4L)
    assert(row.getLong(1) == 500L)
    assert(row.getBoolean(2), "union estimate outside tolerance")
  }

  test("heavyHitters: exact top-k with CM certificate, deterministic tie order") {
    // zipf-ish: token t<i> appears (50 - i) times, plus tied tail tokens
    val df = (0 until 40).flatMap(i => Seq.fill(50 - i)(s"t$i"))
      .toDF("token")
    val out = Sketches.heavyHitters(df, "token", k = 10).collect()
    assert(out.length == 10)
    assert(out.head.getString(0) == "t0" && out.head.getLong(1) == 50L)
    // descending counts, lexicographic on ties
    val counts = out.map(_.getLong(1)).toSeq
    assert(counts == counts.sortBy(-_))
    out.foreach(r => assert(r.getBoolean(2), s"CM bound violated for ${r.getString(0)}"))
  }

  test("hllPartSketches: parquet round trip and subset re-slice, no rescan") {
    val tmp = java.nio.file.Files.createTempDirectory("hll_parts").toString
    val df = spark.range(2000).select(
      pmod($"id", lit(4)).cast("string").as("part"),
      pmod($"id" * 13L, lit(500)).as("v"))
    // profile once -> persist the artifact
    Sketches.hllPartSketches(df, "part", "v").write.mode("overwrite").parquet(tmp)

    // re-slice forever: unions read ONLY the stored sketch rows
    val stored = spark.read.parquet(tmp)
    val Array(all) = Sketches.hllUnionEstimate(stored).collect()
    assert(all.getLong(0) == 4L && all.getLong(1) == 2000L)
    assert(math.abs(all.getLong(2) - 500L) <= 25L, s"global estimate off: $all")

    val subsetExact = df.filter($"part".isin("0", "1"))
      .select("v").distinct().count()
    val Array(sub) = Sketches.hllUnionEstimate(stored.filter($"part".isin("0", "1")))
      .collect()
    assert(sub.getLong(0) == 2L && sub.getLong(1) == 1000L)
    assert(math.abs(sub.getLong(2) - subsetExact) <= 0.05 * subsetExact,
      s"subset estimate ${sub.getLong(2)} vs exact $subsetExact")
  }

  test("hllPartUnion: NULL part group is excluded from n_parts but not the union") {
    // part NULL holds values 400..499; n_parts must count the 2 real parts
    // (SQL count-distinct semantics) while the union still sees all 500
    // values — dropping the null group's sketch would break union_ok.
    val df = spark.range(500).select(
      when($"id" < 200, "p0").when($"id" < 400, "p1").otherwise(lit(null)).as("part"),
      $"id".as("v"))
    val Array(row) = Sketches.hllPartUnion(df, "part", "v").collect()
    assert(row.getLong(0) == 2L, s"n_parts counted the NULL group: $row")
    assert(row.getLong(1) == 500L)
    assert(row.getBoolean(2), "union estimate lost the NULL part's values")
  }

  test("heavyHitters: null items ignored, non-string column rejected") {
    val withNulls = (Seq.fill(5)(Some("a")) ++ Seq.fill(3)(Some("b")) ++
      Seq.fill(4)(Option.empty[String])).toDF("token")
    val out = Sketches.heavyHitters(withNulls, "token", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 5L), ("b", 3L)))
    val longs = spark.range(10).toDF("token")
    val err = intercept[IllegalArgumentException](
      Sketches.heavyHitters(longs, "token"))
    assert(err.getMessage.contains("StringType"))
  }

  test("heavyHitters probe matches the SQL aggregate's UTF-8 item encoding") {
    // non-ASCII tokens exercise the byte-level probe path
    val df = (Seq.fill(30)("naïve") ++ Seq.fill(20)("café") ++ Seq.fill(10)("東京"))
      .toDF("token")
    val out = Sketches.heavyHitters(df, "token", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(("naïve", 30L, true), ("café", 20L, true), ("東京", 10L, true)))
  }
}
