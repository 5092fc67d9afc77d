package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Weighted sampling, proportional mixing and the quantile certificate. */
class SamplingMixSpec extends SparkTestBase {

  import spark.implicits._

  test("exactQuotaSplit: quotas exact per stratum, partition-invariant, disjoint") {
    val df = (1L to 250L).map(i => (i, if (i <= 100) "a" else "b"))
      .toDF("id", "src")
    val out = Sampling.exactQuotaSplit(df, "id", "src",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .groupBy("src", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // a: n=100 -> 80/10/10; b: n=150 -> 120/15/15 — EXACT, not binomial
    assert(out(("a", "train")) === 80L && out(("a", "val")) === 10L &&
      out(("a", "test")) === 10L)
    assert(out(("b", "train")) === 120L && out(("b", "val")) === 15L &&
      out(("b", "test")) === 15L)
    // partition invariance: same assignment regardless of physical layout
    val a1 = Sampling.exactQuotaSplit(df.repartition(13), "id", "src",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a2 = Sampling.exactQuotaSplit(df.repartition(1), "id", "src",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a1 === a2)
  }

  test("weightedSample: weight-proportional, partition-invariant, k-bounded") {
    // 1000 light rows (w=1) + 1000 heavy rows (w=20): heavy rows hold ~95%
    // of the total weight, so a 200-row sample must be heavy-dominated.
    val df = spark.range(2000).select(
      $"id", when($"id" < 1000, 1L).otherwise(20L).as("w"))
    val picked = Sampling.weightedSample(df, "id", "w", k = 200)
      .collect().map(_.getLong(0))
    assert(picked.length == 200)
    val heavy = picked.count(_ >= 1000)
    assert(heavy > 160, s"heavy rows underrepresented: $heavy/200")

    // hash-keyed race: the same rows win under any partitioning
    val repicked = Sampling.weightedSample(df.repartition(7), "id", "w", k = 200)
      .collect().map(_.getLong(0))
    assert(picked.sorted.toSeq == repicked.sorted.toSeq)
  }

  test("weightedSample: zero-weight rows never selected") {
    val df = spark.range(100).select(
      $"id", when($"id" < 50, 0L).otherwise(1L).as("w"))
    val picked = Sampling.weightedSample(df, "id", "w", k = 60)
      .collect().map(_.getLong(0))
    assert(picked.length == 50) // only 50 eligible rows exist
    assert(picked.forall(_ >= 50))
  }

  test("assignSplit: total, partition-invariant, roughly proportional") {
    val df = spark.range(5000).toDF("id")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val out = Sampling.assignSplit(df, "id", splits)
    // total: every row gets exactly one split label from the declared set
    assert(out.count() == 5000)
    val bySplit = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // proportionality within ±3 sd of binomial noise
    assert(math.abs(bySplit("train") - 4000L) < 3 * math.sqrt(5000 * 0.8 * 0.2))
    assert(math.abs(bySplit("val") - 500L) < 3 * math.sqrt(5000 * 0.1 * 0.9))
    // the same row always lands in the same split, any partitioning
    val again = Sampling.assignSplit(df.repartition(13), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.collect().forall(r => again(r.getLong(0)) == r.getString(1)))
  }

  test("assignSplit rejects weights that do not sum to 1") {
    val df = spark.range(10).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(df, "id", Seq(("a", 0.5), ("b", 0.4)))
    }
  }

  test("mixByParts: exact stride-scheduling interleave, zero-weight dropped") {
    // a:2 b:1 c:0 -> L=2; a keys 1,3,5..., b keys 2,6,10..., c gone.
    val rows = (0 until 10).flatMap(i =>
      Seq((s"a$i", "a"), (s"b$i", "b"), (s"c$i", "c")))
    val df = rows.toDF("id", "src")
    val out = Sampling.mixByParts(df, "id", "src",
      parts = Map("a" -> 2L, "b" -> 1L, "c" -> 0L), defaultPart = 1L)
      .orderBy("mix_key", "src", "id")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(!out.exists(_._1 == "c"))
    // every prefix tracks the 2:1 target within one row
    val srcSeq = out.map(_._1).toSeq
    assert(srcSeq.take(9) == Seq("a", "b", "a", "a", "b", "a", "a", "b", "a"),
      s"interleave order wrong: ${srcSeq.take(9)}")
    // keys are the closed-form strides
    assert(out.filter(_._1 == "a").map(_._3).toSeq == (1L to 19L by 2L))
    assert(out.filter(_._1 == "b").map(_._3).toSeq == (2L to 38L by 4L))
  }

  test("temperatureSample: smallest stratum whole, rates follow closed form") {
    // strata: a=4000, b=1000, c=250 → rates at α=0.5: (250/4000)^0.5=0.25,
    // (250/1000)^0.5=0.5, c=1.0
    val df = spark.range(5250).select($"id",
      when($"id" < 4000, "a").when($"id" < 5000, "b").otherwise("c").as("src"))
    val kept = Sampling.temperatureSample(df, "id", "src", alpha = 0.5)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("c") == 250L, s"smallest stratum must be kept whole: $kept")
    // hash thinning is binomial around rate·n: allow ±4σ
    def band(n: Long, rate: Double): (Double, Double) = {
      val sd = math.sqrt(n * rate * (1 - rate))
      (n * rate - 4 * sd, n * rate + 4 * sd)
    }
    val (loA, hiA) = band(4000, 0.25)
    val (loB, hiB) = band(1000, 0.5)
    assert(kept("a") >= loA && kept("a") <= hiA, s"a out of band: $kept")
    assert(kept("b") >= loB && kept("b") <= hiB, s"b out of band: $kept")
  }

  test("temperatureSample: alpha=1 keeps everything, alpha=0 equalizes") {
    val df = spark.range(3000).select($"id",
      when($"id" < 2500, "big").otherwise("small").as("src"))
    assert(Sampling.temperatureSample(df, "id", "src", alpha = 1.0).count() == 3000L)
    val eq = Sampling.temperatureSample(df, "id", "src", alpha = 0.0)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(eq("small") == 500L)
    // big thinned to ~nmin = 500 in expectation (rate 0.2): ±4σ band
    val sd = math.sqrt(2500 * 0.2 * 0.8)
    assert(math.abs(eq("big") - 500.0) <= 4 * sd, s"big not equalized: $eq")
  }

  test("mixByParts rejects all-zero weights") {
    val df = Seq(("x", "a")).toDF("id", "src")
    intercept[IllegalArgumentException](
      Sampling.mixByParts(df, "id", "src", Map("a" -> 0L), defaultPart = 0L))
  }

  test("capPerKey: quota enforced per key in order, small keys untouched") {
    import spark.implicits._
    val df = (1 to 9).map(i => ("big", i.toLong)) ++ Seq(("small", 1L), ("small", 2L))
    val out = Sampling.capPerKey(df.toDF("k", "id"), Seq("k"), quota = 3,
        ordCols = Seq("id"))
      .orderBy("k", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(
      ("big", 1L), ("big", 2L), ("big", 3L), ("small", 1L), ("small", 2L)))
  }

  test("capPerKey rejects bad arguments") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("k", "id")
    intercept[IllegalArgumentException] { Sampling.capPerKey(df, Seq("k"), 0, Seq("id")) }
    intercept[IllegalArgumentException] { Sampling.capPerKey(df, Seq("k"), 1, Nil) }
  }

  test("clusterAtomicSplit: a cluster never straddles the split boundary") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    // planted clusters: {0..4} rooted at 0, {10, 11} rooted at 10
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L),
      (10L, 10L), (11L, 10L)).toDF("id", "cluster_id")
    val out = Sampling.clusterAtomicSplit(docs, "doc_id", clusters, 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.size === 200)
    // invariant: every clustered member carries the root as unit and the
    // root's OWN split decision
    (0L to 4L).foreach { i =>
      assert(out(i)._1 === 0L); assert(out(i)._2 === out(0L)._2)
    }
    assert(out(10L)._2 === out(11L)._2)
    // singletons split by their own id — identical to deterministicSample
    val trainIds = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .collect().map(_.getLong(0)).toSet
    (20L until 200L).foreach { i =>
      assert(out(i)._1 === i)
      assert((out(i)._2 == "train") === trainIds.contains(i), s"doc $i")
    }
    // both sides populated at this fraction
    assert(out.values.map(_._2).toSet === Set("train", "heldout"))
  }

  test("clusterAtomicSplit: caller-side id/cluster_id columns don't collide") {
    import spark.implicits._
    // df already carries cluster_id AND id columns — the join must not be
    // ambiguous, and the caller's columns must survive untouched
    val docs = Seq((1L, 99L, 5L), (2L, 98L, 6L)).toDF("doc_id", "cluster_id", "id")
    val clusters = Seq((2L, 1L)).toDF("id", "cluster_id")
    val out = Sampling.clusterAtomicSplit(docs, "doc_id", clusters, 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((99L, 5L, 1L)))   // caller columns intact, singleton unit
    assert(out(2L) === ((98L, 6L, 1L)))   // clustered doc adopts root 1
  }

  test("clusterAtomicSplit rejects a bad fraction; labels are configurable") {
    import spark.implicits._
    val docs = Seq(1L, 2L).toDF("doc_id")
    val none = spark.emptyDataFrame.select(lit(0L).as("id"), lit(0L).as("cluster_id"))
    intercept[IllegalArgumentException] {
      Sampling.clusterAtomicSplit(docs, "doc_id", none, 1.5)
    }
    val lab = Sampling.clusterAtomicSplit(docs, "doc_id", none, 1.0, "a", "b")
      .collect().map(_.getString(2)).toSet
    assert(lab === Set("a"))
  }

  test("approxPercentilesCertified: exact values right, certificate holds") {
    // two keys, values 0..999 (exact p50 = 499.5 by linear interpolation)
    // and 0..99 doubled (p50 = 49.5)
    val df = spark.range(1000).select(lit("k1").as("k"), $"id".cast("double").as("v"))
      .union(spark.range(100).select(lit("k2").as("k"), $"id".cast("double").as("v")))
    val out = Sketches.approxPercentilesCertified(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out("k1") == ((1000L, 499.5, 899.1, true)), s"k1: ${out("k1")}")
    assert(out("k2")._1 == 100L && out("k2")._2 == 49.5)
    assert(out("k2")._4, "certificate failed on k2")
  }
}
