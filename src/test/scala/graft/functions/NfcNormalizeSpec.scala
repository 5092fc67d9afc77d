package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** All non-ASCII content is written as explicit \\uXXXX escapes so the
  * composed/decomposed distinction survives editors and copy-paste.
  */
class NfcNormalizeSpec extends SparkTestBase {

  import spark.implicits._

  private val DecomposedCafe = "café"             // e + combining acute
  private val ComposedCafe   = "café"              // precomposed é
  private val DecomposedMix  = "über más"   // two combining marks
  private val ComposedSDots  = "ṩ"                 // ṩ precomposed
  private val DecomposedSDots = "ṩ"         // dot-below + dot-above
  private val HangulPair     = "\uud55c 한" // syllable + jamo

  test("matches java.text.Normalizer on composed/decomposed/mixed strings") {
    val cases = Seq("plain ascii text", DecomposedCafe, ComposedCafe,
      DecomposedMix, ComposedSDots, DecomposedSDots, "", HangulPair)
    val rows = cases.toDF("s")
      .select($"s", NfcNormalize.nfcNormalize($"s").as("n"))
      .collect()
    rows.foreach { r =>
      val expected = java.text.Normalizer.normalize(r.getString(0),
        java.text.Normalizer.Form.NFC)
      assert(r.getString(1) == expected, ascii(r.getString(0)))
    }
    // exactly the decomposed cases changed (cafe, mix, sdots, jamo pair)
    val changed = rows.count(r => r.getString(0) != r.getString(1))
    assert(changed == 4, rows.map(r => ascii(r.getString(0))).mkString(", "))
  }

  private def ascii(s: String): String =
    s.map(c => if (c < 128) c.toString else f"\\u${c.toInt}%04x").mkString

  test("null propagates") {
    val out = Seq(Some(DecomposedCafe), None).toDF("s")
      .select(NfcNormalize.nfcNormalize($"s")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    assert(out.toSeq == Seq(ComposedCafe, null))
  }

  test("SQL registration") {
    NfcNormalize.register(spark)
    assert(spark.sql(s"SELECT nfc_normalize('$DecomposedCafe') = '$ComposedCafe'")
      .head.getBoolean(0))
  }

  test("whole-stage codegen keeps the expression compiled") {
    // fallback=false turns a generated-code compile failure into a hard
    // error instead of a silent interpreted-mode retreat — this is the
    // guard that catches a broken static-kernel reference (e.g. a companion
    // method whose forwarder Scala suppresses due to a name collision).
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(3)
        .select(NfcNormalize.nfcNormalize(
          concat(lit(DecomposedCafe + "-"), $"id".cast("string"))).as("n"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1) Project [nfcnormalize"), plan)
      assert(df.head.getString(0) == ComposedCafe + "-0")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
