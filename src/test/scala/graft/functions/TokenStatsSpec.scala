package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TokenStatsSpec extends SparkTestBase {

  import spark.implicits._

  private val ts = TokenStats.tokenStats(col("text"))

  test("census matches the WordCounts-aggregate formulation on random docs") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("a", "bb", "ccc", "Ww", "x9", "the", "émile", "日本語", "z",
      "hash-collider", "HASH-COLLIDER")
    val seps = Vector(" ", "  ", "\t", "\n", " \r ")
    val docs = (0 until 300).map { i =>
      val n = rnd.nextInt(40)
      val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
      (i.toLong, seps(rnd.nextInt(seps.size)) + body + seps(rnd.nextInt(seps.size)))
    }.toDF("id", "text")

    val native = docs
      .select($"id", ts.as("s"))
      .select($"id", $"s.n_tokens", $"s.n_types", $"s.max_tf")
      .orderBy("id").collect().map(_.toSeq.toList).toSeq

    val viaArray = docs
      .select($"id", explode(WordCounts.wordCounts($"text")).as("w"))
      .groupBy($"id")
      .agg(sum($"w.tf").as("n_tokens"), count(lit(1)).as("n_types"),
        max($"w.tf").as("max_tf"))
      .unionByName(
        // the aggregate formulation drops empty docs; reinstate them as zeros
        docs.select($"id", WordCounts.wordCounts($"text").as("w"))
          .filter(size($"w") === 0)
          .select($"id", lit(0L).as("n_tokens"), lit(0L).as("n_types"),
            lit(0L).as("max_tf")))
      .orderBy("id").collect().map(_.toSeq.toList).toSeq

    assert(native == viaArray)
  }

  test("null propagates; empty and all-whitespace give an all-zero census") {
    val docs = Seq((1L, null: String), (2L, ""), (3L, " \t\n "), (4L, "b a b"))
      .toDF("id", "text")
    val out = docs.select($"id", ts.as("s")).orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getStruct(1).toSeq == Seq(0L, 0L, 0L))
    assert(out(2).getStruct(1).toSeq == Seq(0L, 0L, 0L))
    assert(out(3).getStruct(1).toSeq == Seq(3L, 2L, 2L))
  }

  test("growth past the initial tables keeps the census exact") {
    val text = ((0 until 200).map(i => s"w$i") ++ (0 until 50).map(i => s"w$i"))
      .mkString(" ")
    val s = Seq((1L, text)).toDF("id", "text").select(ts.as("s")).head().getStruct(0)
    assert(s.toSeq == Seq(250L, 200L, 2L))
  }

  test("SQL registration") {
    withExtensionsSession { s2 =>
      val row = s2.sql("SELECT token_stats('b a b c') AS s").head().getStruct(0)
      assert(row.toSeq == Seq(4L, 3L, 2L))
    }
  }

  test("whole-stage codegen keeps the expression compiled") {
    // range-backed (a local Seq constant-folds to LocalTableScan)
    val df = spark.range(3)
      .select(TokenStats.tokenStats(concat(lit("a b "), $"id".cast("string"))).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [tokenstats"), plan)
    assert(df.orderBy("s.n_tokens").head.getStruct(0).toSeq == Seq(3L, 3L, 1L))
  }
}
