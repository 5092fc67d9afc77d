package graft.pipeline

import graft.functions.Num
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality column profiler — the "expectations" report run before any
  * corpus is trusted: per column, row count, null count and EXACT distinct
  * count. A schema drift (a loader suddenly writing nulls, an id column
  * collapsing to one value, a fanout join duplicating rows) shows up here
  * as an integer delta against the previous snapshot.
  *
  * Scale shape: ONE aggregation over one scan. Multiple exact
  * count(DISTINCT) in a single agg plan through Spark's Expand (one row
  * per tracked column per input row, map-side partially aggregated), so
  * the cost is #cols × one pass, not #cols passes — at 100 TB switch the
  * wide columns to `approx_count_distinct` and keep the exact path for
  * key columns (the oracle needs the exact rule, so exact is what ships
  * here). The per-column output rows are generated from the ONE
  * aggregated row.
  */
object Profiler {

  /** Per-column profile of `cols`: (`col_name`, `n_rows`, `n_null`,
    * `n_distinct`) — all exact integers. NULL does not count toward
    * `n_distinct` (SQL COUNT DISTINCT semantics, same in the oracle).
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"), countDistinct(col(c)).as(s"__nd_$c"))
    } :+ count(lit(1)).as("__n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__nn_$c")).as("n_null"),
          col(s"__nd_$c").as("n_distinct"))
      }: _*)).as("p"))
      .select("p.*")
  }

  /** Jensen–Shannon divergence of each group's word distribution from the
    * whole corpus — the distribution-drift monitor: a source whose
    * vocabulary shifts (new crawler, language mix change, spam influx)
    * moves its JS score long before any single quality signal trips.
    *
    * `JS(p‖q) = ½·Σ_t [p_t·ln(p_t/m_t) + q_t·ln(q_t/m_t)]` with
    * `m = (p+q)/2`, in nats, bounded by ln 2. The sum only ever
    * materializes the terms PRESENT in the group: for a term the group
    * lacks (p_t = 0), the contribution collapses to `½·q_t·ln 2`, so the
    * whole absent-term mass is the closed form
    * `½·ln 2·(1 − Σ_{t∈group} q_t)` — no group×vocabulary fanout, the
    * usual scale killer of naive JS implementations.
    *
    * Determinism: counts are exact integers; probabilities are single
    * divisions; `ln` agrees cross-engine to the last ulp at worst, and
    * the final score is rounded — the [[Dsir]]/[[LanguageModel]]
    * precedent.
    *
    * Scale shape: one tokenize-explode → (group, term) count (map-side
    * combined), corpus counts aggregate the much smaller grouped frame,
    * the join is term-keyed, and scalars ride in via one cross join of a
    * 1-row aggregate. Output: one row per group.
    */
  def jsDrift(docs: DataFrame, textCol: String, groupCol: String,
      roundTo: Int = 6): DataFrame = {
    val terms = docs
      .select(col(groupCol), explode(TextAnalysis.words(col(textCol))).as("__term"))
    // materialized once: byGroup feeds the group totals, the corpus
    // counts AND the final join — without the checkpoint each consumer
    // would re-tokenize the whole corpus
    val byGroup = Dedup.materializeOnce(
      terms.groupBy(col(groupCol), col("__term"))
        .agg(count(lit(1)).as("__c")))
    val groupTotals = byGroup.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("__gt"))
    val corpus = byGroup.groupBy(col("__term")).agg(sum(col("__c")).as("__cc"))
    val corpusTotal = corpus.agg(sum(col("__cc")).as("__ct"))
    val p = col("__c").cast("double") / col("__gt").cast("double")
    val q = col("__cc").cast("double") / col("__ct").cast("double")
    val m = (p + q) / 2.0
    val ln2 = math.log(2.0)
    byGroup
      .join(groupTotals, Seq(groupCol))
      .join(corpus, Seq("__term"))
      .crossJoin(broadcast(corpusTotal))
      .groupBy(col(groupCol))
      .agg(
        sum(p * log(p / m) + q * log(q / m)).as("__present"),
        sum(q).as("__coverage"),
        max(col("__gt")).as("n_tokens"))
      .select(col(groupCol), col("n_tokens"),
        Num.round0((col("__present") + lit(ln2) * (lit(1.0) - col("__coverage"))) / 2.0,
          roundTo).as("js_nats"))
  }

  /** Word-count artifact of a corpus snapshot: (`term`, `cnt`) — the
    * persistable prior for [[jsDriftAgainstPrior]] (write it with a plain
    * `.write.parquet`; a monitoring job reads KB–MB of counts instead of
    * re-tokenizing the historical corpus).
    */
  def termCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.words(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))

  /** Incremental vocabulary-drift monitor: JS divergence of each NEW
    * batch group's word distribution against a PRIOR corpus's persisted
    * [[termCounts]] artifact — the every-ingest shape of [[jsDrift]]
    * (which compares groups to their own corpus): the historical corpus
    * is never re-read, only its counts.
    *
    * Unlike the intra-corpus case, the batch support is NOT a subset of
    * the prior's, so BOTH absent-term directions appear: a batch term the
    * prior lacks contributes `½·p·ln 2` (folded into the same sum via the
    * left join's null arm), and the prior mass the batch never touches is
    * the closed form `½·ln 2·(1 − Σ_{t∈batch} q_t)`. A batch group with
    * fully disjoint vocabulary scores exactly `ln 2`.
    *
    * Scale shape: tokenize-explode the BATCH only (the small side), one
    * term-keyed left join against the artifact, scalars broadcast; one
    * row per group out.
    */
  def jsDriftAgainstPrior(fresh: DataFrame, textCol: String, groupCol: String,
      priorCounts: DataFrame, roundTo: Int = 6): DataFrame = {
    val byGroup = Dedup.materializeOnce(
      fresh.select(col(groupCol), explode(TextAnalysis.words(col(textCol))).as("term"))
        .groupBy(col(groupCol), col("term"))
        .agg(count(lit(1)).as("__c")))
    val groupTotals = byGroup.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("__gt"))
    val priorTotal = priorCounts.agg(sum(col("cnt")).as("__pt"))
    val p = col("__c").cast("double") / col("__gt").cast("double")
    val q = col("cnt").cast("double") / col("__pt").cast("double")
    val m = (p + q) / 2.0
    val ln2 = math.log(2.0)
    byGroup
      .join(groupTotals, Seq(groupCol))
      .join(priorCounts, Seq("term"), "left")
      .crossJoin(broadcast(priorTotal))
      .groupBy(col(groupCol))
      .agg(
        sum(when(col("cnt").isNotNull, p * log(p / m) + q * log(q / m))
          .otherwise(p * ln2)).as("__present"),
        sum(when(col("cnt").isNotNull, q).otherwise(lit(0.0))).as("__coverage"),
        max(col("__gt")).as("n_tokens"))
      .select(col(groupCol), col("n_tokens"),
        Num.round0((col("__present") + lit(ln2) * (lit(1.0) - col("__coverage"))) / 2.0,
          roundTo).as("js_nats"))
  }
}
