package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate sketches for profiling at data scale: HLL distinct counts,
  * mergeable per-partition sketch union, and count-min heavy-hitter
  * estimation (SURVEY §2.9 beyond-reference additions).
  *
  * Why sketches at 100 TB: an exact `count(DISTINCT x)` re-shuffles the full
  * key universe per dimension cut, and an exact top-k over a heavy-tailed
  * item column pays a full aggregation before it can truncate. The sketch
  * versions are one-pass, map-side-combined, fixed-memory aggregates whose
  * partial states MERGE — so a profiling pass computes one sketch per
  * partition/day/file and any union of cuts later without rescanning data.
  *
  * Correctness posture: estimates are checked against the exact value with
  * an explicit tolerance IN the output (`*_ok` boolean columns) — the
  * cross-engine oracle reproduces the exact side and pins every `_ok` to
  * true, so the driver hash-checks both the exact values and the claim that
  * each engine-side estimate lands inside its error budget.
  */
object Sketches {

  /** Per-key distinct-count estimates vs exact, in ONE aggregation pass:
    *
    *  - `n_exact`: exact distinct (the oracle-checkable truth),
    *  - `approx_ok`: Spark's HLL++ (`approx_count_distinct`, relative sd
    *    `rsd`) within `tol` of exact,
    *  - `hll_ok`: the DataSketches HLL (`hll_sketch_agg` with 2^`lgK`
    *    buckets → `hll_sketch_estimate`) within `tol` of exact.
    *
    * The DataSketches path is the one to keep at scale: its binary sketch
    * column is storable and mergeable ([[hllPartUnion]]); the exact count
    * here exists to certify the estimates.
    */
  def approxDistinctByKey(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      rsd: Double = 0.02,
      lgK: Int = 14,
      tol: Double = 0.05): DataFrame = {
    val within = (est: org.apache.spark.sql.Column) =>
      abs(est.cast("double") - col("n_exact").cast("double")) <=
        lit(tol) * col("n_exact").cast("double")
    // Collapse to distinct (key, value) pairs FIRST: all three aggregates
    // are idempotent under duplicate values (exact distinct by definition;
    // both HLLs are set sketches whose register update is a max), so the
    // results are identical — but the PLAN is not. Mixing countDistinct
    // with non-distinct aggs makes Spark's one-distinct strategy group
    // phase 1 by (key, value), which materializes a typed HLL sketch
    // buffer PER DISTINCT PAIR (measured: 1.24 s vs 0.4 s here, and at
    // data scale a per-pair sketch buffer is the real hazard — billions
    // of KB-sized aggregation states instead of one per key). After the
    // map-side-combined distinct, every aggregate is a plain per-key agg:
    // n_exact is count(*), and each key holds exactly one sketch buffer.
    val dis = df.select((keyCols :+ valueCol).map(col): _*).distinct()
    dis.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_exact"),
        approx_count_distinct(col(valueCol), rsd).as("__approx"),
        hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK))).as("__hll"))
      .select(keyCols.map(col) ++ Seq(col("n_exact"),
        within(col("__approx")).as("approx_ok"),
        within(col("__hll")).as("hll_ok")): _*)
  }

  /** The persistable profiling artifact: one row per `partCol` group with
    * its row count and binary HLL sketch. Write this to parquet once per
    * profiling pass (per day/file/source); any later union of any subset of
    * parts ([[hllUnionEstimate]]) answers distinct-count questions WITHOUT
    * rescanning the data — the "profile once, re-slice forever" path at
    * 100 TB, where each part row is a few KB regardless of data size.
    */
  def hllPartSketches(
      df: DataFrame,
      partCol: String,
      valueCol: String,
      lgK: Int = 14): DataFrame =
    df.groupBy(col(partCol))
      .agg(count(lit(1)).as("n_rows"),
        hll_sketch_agg(col(valueCol), lit(lgK)).as("hll_sketch"))

  /** Union stored part sketches (typically read back from parquet) into a
    * global distinct estimate: (n_parts, n_rows, n_distinct_est). Sketches
    * must share one lgK — DataSketches unions downgrade otherwise, so mixed
    * configs are rejected rather than silently degraded.
    */
  def hllUnionEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      count(lit(1)).as("n_parts"),
      sum(col("n_rows")).as("n_rows"),
      hll_sketch_estimate(hll_union_agg(col("hll_sketch"), lit(false)))
        .as("n_distinct_est"))

  /** Sketch-union certificate: build one HLL sketch PER `partCol` group
    * ([[hllPartSketches]]), then union the part sketches — never the raw
    * data — into a global distinct estimate checked against the exact
    * count. Output is one row: (n_parts, n_exact, union_ok). The union
    * stage aggregates `n_parts` fixed-size binaries, so re-slicing a
    * 100 TB profile by any combination of parts is a driver-scale job.
    */
  def hllPartUnion(
      df: DataFrame,
      partCol: String,
      valueCol: String,
      lgK: Int = 14,
      tol: Double = 0.05): DataFrame = {
    val parts = hllPartSketches(df, partCol, valueCol, lgK)
      .withColumnRenamed("hll_sketch", "__sk")
    // count(col) skips a NULL part group, matching SQL count(DISTINCT part);
    // its sketch still joins the union so no values are lost to the count.
    val unioned = parts.agg(
      count(col(partCol)).as("n_parts"),
      hll_sketch_estimate(hll_union_agg(col("__sk"), lit(false))).as("__est"))
    val exact = df.agg(countDistinct(col(valueCol)).as("n_exact"))
    unioned.crossJoin(exact).select(
      col("n_parts"),
      col("n_exact"),
      (abs(col("__est").cast("double") - col("n_exact").cast("double")) <=
        lit(tol) * col("n_exact").cast("double")).as("union_ok"))
  }

  /** Approximate distinct-INTERSECTION of two item sets by HLL
    * inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), where the
    * union estimate comes from merging the two sketches (never re-scanning
    * either side). Output is one row:
    * (n_a, n_b, n_exact, incl_excl_ok) — exact per-side distinct counts,
    * the exact intersection (the certifiable truth), and whether the
    * sketch-derived intersection lands within `tol·n_exact + slack`.
    *
    * The absolute `slack` term exists because inclusion–exclusion
    * subtracts two near-equal large estimates: the error is relative to
    * the UNION size, not the intersection, so a tiny true intersection
    * under huge sides needs headroom (the standard caveat of this
    * estimator; a small default covers certificate flutter at test
    * scales).
    *
    * Scale shape: one aggregation pass per side (map-side combined HLL +
    * exact count), a scalar crossJoin, and one distinct-semi-join for the
    * exact certificate — at 100 TB, drop the exact column and the whole
    * answer is three fixed-size sketches.
    */
  def approxIntersection(
      dfA: DataFrame,
      dfB: DataFrame,
      itemCol: String,
      lgK: Int = 14,
      tol: Double = 0.05,
      slack: Long = 16L): DataFrame = {
    def side(df: DataFrame, sk: String, n: String) =
      df.filter(col(itemCol).isNotNull).agg(
        hll_sketch_agg(col(itemCol), lit(lgK)).as(sk),
        countDistinct(col(itemCol)).as(n))
    val exact = dfA.select(col(itemCol)).filter(col(itemCol).isNotNull).distinct()
      .join(dfB.select(col(itemCol)).filter(col(itemCol).isNotNull).distinct(), Seq(itemCol))
      .agg(count(lit(1)).as("n_exact"))
    side(dfA, "__ska", "n_a").crossJoin(side(dfB, "__skb", "n_b"))
      .crossJoin(exact)
      .withColumn("__est",
        hll_sketch_estimate(col("__ska")) + hll_sketch_estimate(col("__skb")) -
          hll_sketch_estimate(hll_union(col("__ska"), col("__skb"), false)))
      .select(col("n_a"), col("n_b"), col("n_exact"),
        (abs(col("__est").cast("double") - col("n_exact").cast("double")) <=
          lit(tol) * col("n_exact").cast("double") + lit(slack.toDouble))
          .as("incl_excl_ok"))
  }

  /** Quantile sketch with a rank certificate: per-key exact percentiles
    * (the oracle-checkable truth, rounded like every cross-engine double
    * aggregate) plus `approx_ok` — whether EVERY `percentile_approx`
    * answer's rank lands inside the sketch's guaranteed window
    * `[(p - eps)·n, (p + eps)·n]`, `eps = 1/accuracy` (±1 rank slack for
    * boundary rounding).
    *
    * Scale shape: two map-side-combined aggregation passes — one building
    * the approx + exact answers, one counting ranks of the approx answers
    * after a broadcast join of the tiny per-key answer table back onto the
    * data. At 100 TB the exact column is the optional certificate; the
    * approx sketch (mergeable, fixed memory) is the product.
    */
  def approxPercentilesCertified(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      percentiles: Seq[Double] = Seq(0.5, 0.9),
      accuracy: Int = 1000): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p > 0 && p < 1),
      s"percentiles must be in (0, 1): $percentiles")
    val eps = 1.0 / accuracy
    val pi  = percentiles.zipWithIndex
    val v   = col(valueCol).cast("double")
    val answers = df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      pi.map { case (p, i) =>
        round(expr(s"percentile($valueCol, $p)"), 4).as(s"p${math.round(p * 100)}")
      } ++ pi.map { case (p, i) =>
        percentile_approx(v, lit(p), lit(accuracy)).as(s"__ap$i")
      }: _*)
    val rankAggs = pi.flatMap { case (_, i) => Seq(
      sum(when(v < col(s"__ap$i"), 1L).otherwise(0L)).as(s"__lo$i"),
      sum(when(v <= col(s"__ap$i"), 1L).otherwise(0L)).as(s"__hi$i")) }
    val ranks = df
      .join(broadcast(answers.select(keyCols.map(col) ++
        pi.map { case (_, i) => col(s"__ap$i") }: _*)), keyCols)
      .groupBy(keyCols.map(col): _*)
      .agg(rankAggs.head, rankAggs.tail: _*)
    val ok = pi.map { case (p, i) =>
      (col(s"__hi$i").cast("double") >= (lit(p) - eps) * col("n") - 1) &&
        (col(s"__lo$i").cast("double") <= (lit(p) + eps) * col("n") + 1)
    }.reduce(_ && _)
    answers.join(ranks, keyCols).select(
      keyCols.map(col) ++ Seq(col("n")) ++
        pi.map { case (p, _) => col(s"p${math.round(p * 100)}") } :+
        ok.as("approx_ok"): _*)
  }

  /** Heavy hitters with a count-min certificate: the exact top-`k` items by
    * frequency (deterministic ties: count desc, item asc), each annotated
    * with whether the count-min sketch estimate respects the CM guarantee
    * `exact <= est <= exact + 3·eps·N` (CM never under-counts; the
    * over-count budget is eps·N in expectation per probe, 3x for slack —
    * deterministic for a fixed dataset + seed).
    *
    * Scale shape: ONE descent of the raw frame aggregates it to the
    * vocabulary `(item, n_exact)` (map-side combine — for heavy-tailed
    * item columns this collapses the data by orders of magnitude), which
    * is checkpointed and then feeds BOTH the sketch and the top-k. The
    * sketch is rebuilt from the weighted vocab via
    * [[graft.functions.CountMinSketchWeighted]] — CM sketches are linear,
    * so `add(item, n)` yields the identical sketch to `n` row-wise adds —
    * a fixed `depth x width` mergeable aggregate; the exact top-k is a
    * TakeOrdered job on the same vocab frame; the probes are `k` bounded
    * driver-side lookups. At 100 TB the exact side is the optional
    * certificate and the sketch is the product — estimate any item's
    * count without a second scan.
    */
  def heavyHitters(
      df: DataFrame,
      itemCol: String,
      k: Int = 20,
      eps: Double = 1e-4,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(itemCol).dataType == StringType,
      s"heavyHitters requires a StringType item column; " +
        s"'$itemCol' is ${df.schema(itemCol).dataType.simpleString}")
    // nulls carry no frequency signal and would NPE the byte-probe below
    val items = df.filter(col(itemCol).isNotNull)
    // One descent of the raw frame; the checkpointed vocabulary then feeds
    // both the sketch (weighted inserts — identical cells by CM linearity)
    // and the exact top-k without re-running the expensive lineage.
    val vocab = Dedup.materializeOnce(
      items.groupBy(col(itemCol)).agg(count(lit(1)).as("n_exact")))
    val skBytes = vocab
      .agg(graft.functions.CountMinSketchWeighted
        .cmSketchWeighted(col(itemCol), col("n_exact"), eps, confidence, seed)
        .as("__sk"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val budget = math.max(1L, math.ceil(3 * eps * cms.totalCount()).toLong)

    val top = vocab
      .orderBy(col("n_exact").desc, col(itemCol).asc)
      .limit(k)
      .collect()
    val rows = top.map { r =>
      val item  = r.getString(0)
      val exact = r.getLong(1)
      // the SQL aggregate added strings as raw UTF-8 bytes; probe identically
      val est = cms.estimateCount(item.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Row(item, exact, est >= exact && est <= exact + budget)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField(itemCol, StringType),
        StructField("n_exact", LongType),
        StructField("cms_ok", BooleanType))))
  }

  // --- Bloom membership artifacts -----------------------------------------
  //
  // The third mergeable sketch family: set MEMBERSHIP (HLL answers "how
  // many distinct", count-min "how often", Bloom "is this one of them").
  // The 100 TB shape is build-once / probe-everywhere: a blocklist or
  // eval-set fingerprint table becomes a fixed-size bit array that rides
  // to every executor inside the plan, so decontamination or re-ingest
  // filtering is a NARROW map over the corpus — no shuffle, no join, and
  // the artifact persists to parquet for later runs or merging.

  /** Build a serialized Bloom filter over `itemCol` (string or bigint).
    * Distributed build (`treeAggregate` of per-partition filters inside
    * `df.stat.bloomFilter`); the returned bytes are the persistable
    * artifact, sized ~ `-n·ln(fpp)/ln(2)²` bits (1M items @ 1% ≈ 1.2 MB),
    * independent of corpus size. Deterministic for fixed input values —
    * insertion is a bitwise OR, so partition order cannot change the bits.
    */
  def bloomBuild(
      df: DataFrame,
      itemCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be > 0: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")
    val bf = df.filter(col(itemCol).isNotNull)
      .stat.bloomFilter(itemCol, expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Union independently built Bloom artifacts (e.g. one per day's
    * blocklist delta) into one. All parts must share build parameters
    * (`expectedItems`, `fpp`) — incompatible bit layouts are rejected by
    * the sketch library rather than silently corrupted.
    */
  def bloomMerge(blooms: Seq[Array[Byte]]): Array[Byte] = {
    require(blooms.nonEmpty, "bloomMerge requires at least one filter")
    val merged = blooms.map(b => org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(b)))
      .reduceLeft { (a, b) => a.mergeInPlace(b); a }
    val out = new java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    out.toByteArray
  }

  /** Probe every row's `itemCol` against a built artifact: adds boolean
    * `might_contain`. Narrow (no exchange); the probe is a codegen'd
    * native expression and the filter deserializes once per executor.
    * Guarantee: no false negatives — a `false` is definitive.
    */
  def bloomProbe(df: DataFrame, itemCol: String, bloomBytes: Array[Byte],
      outCol: String = "might_contain"): DataFrame =
    df.withColumn(outCol,
      graft.functions.BloomMightContain.mightContain(col(itemCol), bloomBytes))

  /** Blocklist-probe certificate, one row:
    *
    *  - `n_corpus` / `n_members`: corpus rows probed and how many are TRUE
    *    members (value present in `members`) — the oracle-checkable truth,
    *  - `no_false_negatives`: every true member row probed TRUE (the Bloom
    *    guarantee — must ALWAYS hold),
    *  - `fp_within_bound`: false-positive rows <= 3·fpp·(non-members) + 8
    *    (deterministic for fixed data; 3x + additive slack covers the
    *    variance of small corpora).
    *
    * The member check is an exact broadcast semi-join ONLY for the
    * certificate; the production path is [[bloomProbe]] alone.
    */
  def bloomCertificate(
      corpus: DataFrame,
      itemCol: String,
      members: DataFrame,
      memberItemCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bloom  = bloomBuild(members, memberItemCol, expectedItems, fpp)
    val probed = bloomProbe(corpus.filter(col(itemCol).isNotNull), itemCol, bloom)
    val flagged = probed.join(
        broadcast(members.select(col(memberItemCol).as(itemCol)).distinct()
          .withColumn("__is_member", lit(true))),
        Seq(itemCol), "left")
      .select(col("might_contain"),
        coalesce(col("__is_member"), lit(false)).as("__is_member"))
    flagged.agg(
        count(lit(1)).as("n_corpus"),
        sum(when(col("__is_member"), 1L).otherwise(0L)).as("n_members"),
        min(when(col("__is_member"), col("might_contain")).otherwise(lit(true)))
          .as("no_false_negatives"),
        sum(when(!col("__is_member") && col("might_contain"), 1L).otherwise(0L))
          .as("__fps"))
      .select(col("n_corpus"), col("n_members"), col("no_false_negatives"),
        (col("__fps").cast("double") <=
          lit(3 * fpp) * (col("n_corpus") - col("n_members")).cast("double")
            + lit(8.0)).as("fp_within_bound"))
  }
}
