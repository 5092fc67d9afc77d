package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** k-anonymity reports, the nesting generalization ladder, incremental
  * maintenance against a prior, and l-diversity.
  */
class PrivacySpec extends SparkTestBase {

  import spark.implicits._

  private def people(rows: (Int, String, Double)*) =
    rows.toSeq.toDF("nation", "segment", "bal")

  test("qiGroupReport: exact group sizes, at_risk iff below k") {
    val df = people(
      (1, "A", 10.0), (1, "A", 20.0), (1, "A", 30.0),
      (1, "B", 5.0), (2, "A", 7.0), (2, "A", 9.0))
    val out = Privacy.qiGroupReport(df, Seq("nation", "segment"), k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out((1, "A")) === ((3L, false)))
    assert(out((1, "B")) === ((1L, true)))
    assert(out((2, "A")) === ((2L, true)))
    intercept[IllegalArgumentException] {
      Privacy.qiGroupReport(df, Seq.empty, k = 3)
    }
    intercept[IllegalArgumentException] {
      Privacy.qiGroupReport(df, Seq("nation"), k = 1)
    }
  }

  test("generalizationLadder: rollup matches direct bucketing at every width") {
    // deterministic pseudo-random balances incl. negatives (floor-division
    // nesting must hold below zero too)
    val df = spark.range(500).select(
      (pmod($"id" * 7, lit(3))).cast("int").as("nation"),
      concat(lit("s"), pmod($"id", lit(2))).as("segment"),
      (pmod($"id" * 131 + 17, lit(4000)) - lit(1000)).cast("double").as("bal"))
    val widths = Seq(250L, 500L, 2000L)
    val out = Privacy.generalizationLadder(df, Seq("segment"), "bal", widths, k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    // independent per-width recomputation (no rollup)
    widths.foreach { w =>
      val direct = df.groupBy($"segment", floor($"bal" / w).as("b"))
        .agg(count(lit(1)).as("n"))
        .agg(count(lit(1)), min($"n"),
          sum(when($"n" < 8, $"n").otherwise(0L)))
        .head()
      val (ng, mg, risk, _, _) = out(w)
      assert(ng === direct.getLong(0), s"n_groups at width $w")
      assert(mg === direct.getLong(1), s"min_group at width $w")
      assert(risk === direct.getLong(2), s"rows_at_risk at width $w")
    }
    // chosen = narrowest width meeting k, and only that one
    val passing = out.filter { case (_, (_, mg, _, meets, _)) =>
      meets && mg >= 8 }.keys
    if (passing.nonEmpty) {
      val narrowest = passing.min
      out.foreach { case (w, (_, _, _, _, chosen)) =>
        assert(chosen === (w == narrowest), s"chosen flag at width $w")
      }
    } else assert(out.values.forall(!_._5))
  }

  test("generalizationLadder: non-nesting widths rejected") {
    val df = people((1, "A", 10.0))
    intercept[IllegalArgumentException] {
      Privacy.generalizationLadder(df, Seq("segment"), "bal",
        widths = Seq(500L, 750L), k = 2)
    }
  }

  test("generalize: values become range starts, below-k groups suppressed") {
    // segment s0: bucket 0 has 3 rows, bucket 500 has 1; s1: bucket 0 has 2
    val df = Seq(
      (1L, "s0", 10.0), (2L, "s0", 499.0), (3L, "s0", 0.0),
      (4L, "s0", 750.0), (5L, "s1", 100.0), (6L, "s1", 200.0),
      (7L, "s1", -1.0)) // negative: floor puts it in the -500 bucket
      .toDF("id", "segment", "bal")
    val out = Privacy.generalize(df, Seq("segment"), "bal", width = 500L, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // kept: s0 bucket 0 (3 rows), s1 bucket 0 (2 rows)
    // suppressed: s0/750 (1 row), s1/-500 (1 row)
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 5L -> 0L, 6L -> 0L))
    // invariant: every released group meets k by construction
    val groups = Privacy.generalize(df, Seq("segment"), "bal", 500L, k = 2)
      .groupBy("segment", "bal").count().collect().map(_.getLong(2))
    assert(groups.forall(_ >= 2))
  }

  test("generalize: over-limit group table falls back to the shuffled semi-join, same answer") {
    // broadcastGroupLimit = 0 forces the non-broadcast path — the size
    // gate ADVICE asked for (QI domain × bucket count can reach n/k
    // groups, past any broadcast budget); the fallback must be a pure
    // plan change, never an answer change
    val df = Seq(
      (1L, "s0", 10.0), (2L, "s0", 499.0), (3L, "s0", 0.0),
      (4L, "s0", 750.0), (5L, "s1", 100.0), (6L, "s1", 200.0),
      (7L, "s1", -1.0)).toDF("id", "segment", "bal")
    def run(limit: Long) =
      Privacy.generalize(df, Seq("segment"), "bal", width = 500L, k = 2,
          broadcastGroupLimit = limit)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(run(0L) === run(1000000L))
  }

  test("generalize: outputOrder totally orders the release without changing its rows") {
    // many partitions + shuffled input so the range-route + local-sort
    // plan actually has ordering work to do
    val df = spark.range(5000).repartition(13).select(
      $"id",
      concat(lit("s"), pmod($"id", lit(3))).as("segment"),
      (pmod($"id" * 131 + 17, lit(4000)) - lit(1000)).cast("double").as("bal"))
    val unordered = Privacy.generalize(df, Seq("segment"), "bal", 500L, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ordered = Privacy.generalize(df, Seq("segment"), "bal", 500L, k = 2,
        outputOrder = Some("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(ordered.toSeq === unordered.sortBy(_._1).toSeq)
    // and the ordered face survives the shuffle-fallback path too
    val orderedNoBc = Privacy.generalize(df, Seq("segment"), "bal", 500L,
        k = 2, broadcastGroupLimit = 0L, outputOrder = Some("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(orderedNoBc.toSeq === ordered.toSeq)
  }

  test("generalize: outputOrder holds under the REAL shuffled join (auto-broadcast off)") {
    // broadcastGroupLimit = 0 alone is not enough: Spark's size-based
    // planner still auto-broadcasts the tiny safe table, so the shuffled
    // sort-merge/hash join — whose key exchange would land ABOVE a
    // pre-join range exchange and demote the total order to
    // per-partition — is never planned. Kill auto-broadcast to pin the
    // genuine fallback plan.
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.range(5000).repartition(13).select(
        $"id",
        concat(lit("s"), pmod($"id", lit(3))).as("segment"),
        (pmod($"id" * 131 + 17, lit(4000)) - lit(1000)).cast("double").as("bal"))
      val out = Privacy.generalize(df, Seq("segment"), "bal", 500L, k = 2,
        broadcastGroupLimit = 0L, outputOrder = Some("id"))
      // the physical plan must actually contain a non-broadcast join —
      // otherwise this test degenerates into the broadcast case again
      val physical = out.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastHashJoin"),
        s"expected the shuffled fallback join, got:\n$physical")
      val got = out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(got.toSeq === got.sortBy(_._1).toSeq, "release not totally ordered")
      val reference = Privacy.generalize(df, Seq("segment"), "bal", 500L, k = 2)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1)
      assert(got.toSeq === reference.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("generalizeChosen: applies the ladder's chosen width; fails loudly when none meets k") {
    val df = spark.range(300).select(
      concat(lit("s"), pmod($"id", lit(2))).as("segment"),
      (pmod($"id" * 131 + 17, lit(4000)) - lit(1000)).cast("double").as("bal"))
    val widths = Seq(250L, 500L, 2000L, 4000L)
    val ladder = Privacy.generalizationLadder(df, Seq("segment"), "bal", widths, k = 10)
      .filter($"chosen").collect()
    assume(ladder.nonEmpty)
    val w = ladder.head.getLong(0)
    val viaChosen = Privacy.generalizeChosen(df, Seq("segment"), "bal", widths, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val direct = Privacy.generalize(df, Seq("segment"), "bal", w, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(viaChosen === direct)
    // at the chosen width nothing is suppressed (min_group >= k there)
    assert(viaChosen.length === 300)
    // unreachable k: the release must refuse, not ship at-risk rows
    val e = intercept[IllegalArgumentException] {
      Privacy.generalizeChosen(df, Seq("segment"), "bal", Seq(250L), k = 200)
    }
    assert(e.getMessage.contains("no width"))
  }

  test("kAnonAgainstPrior: merge equals rebuild and statuses are exact") {
    val prior = people(
      (1, "A", 0.0), (1, "A", 0.0), // known safe-ish group, below k=3
      (2, "B", 0.0), (2, "B", 0.0), (2, "B", 0.0)) // known safe
    val batch = people(
      (1, "A", 0.0), // pushes (1,A) to 3 -> became_safe
      (2, "B", 0.0), // still_safe
      (3, "C", 0.0), (3, "C", 0.0), (3, "C", 0.0), // new_safe
      (4, "D", 0.0)) // new_at_risk
    val out = Privacy.kAnonAgainstPrior(batch, Seq("nation", "segment"), k = 3,
        prior = Privacy.qiCounts(prior, Seq("nation", "segment")))
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(out((1, "A")) === ((2L, 1L, 3L, "became_safe")))
    assert(out((2, "B")) === ((3L, 1L, 4L, "still_safe")))
    assert(out((3, "C")) === ((0L, 3L, 3L, "new_safe")))
    assert(out((4, "D")) === ((0L, 1L, 1L, "new_at_risk")))
    // untouched prior group appears and keeps its standing
    val out2 = Privacy.kAnonAgainstPrior(
        batch.filter($"nation" =!= 2), Seq("nation", "segment"), k = 3,
        prior = Privacy.qiCounts(prior, Seq("nation", "segment")))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getString(5)).toMap
    assert(out2((2, "B")) === "still_safe")
    // merge ≡ rebuild: total_n matches qiGroupReport over the union
    val merged = Privacy.kAnonAgainstPrior(batch, Seq("nation", "segment"),
        k = 3, prior = Privacy.qiCounts(prior, Seq("nation", "segment")))
      .select($"nation", $"segment", $"total_n")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val rebuilt = Privacy.qiGroupReport(prior.unionAll(batch),
        Seq("nation", "segment"), k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(merged === rebuilt)
  }

  test("lDiversityReport: distinct sensitive values per group, below_l flag") {
    val df = people(
      (1, "A", 0.0), (1, "B", 0.0), (1, "A", 0.0),
      (2, "A", 0.0), (2, "A", 0.0))
    val out = Privacy.lDiversityReport(df, Seq("nation"), "segment", l = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1) === ((3L, 2L, false)))
    assert(out(2) === ((2L, 1L, true)))
  }
}
