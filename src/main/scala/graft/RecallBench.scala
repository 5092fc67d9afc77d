package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN quality evidence at crossover scale: recall@10 of the trained
  * IVF / IVF-PQ / residual-IVF-PQ paths against the exact brute-force
  * cosine top-10, at the SAME trained configuration the query surface
  * uses (`nCells = n/128`, 8×16 codebooks — [[Queries]]' loadOrTrain
  * parameters). The corpus is L2-normalized first so inner product ≡
  * cosine — the PQ family's documented contract (Stress pins the same
  * normalization before its ADC stages).
  *
  * Usage: `runMain graft.RecallBench [dataDir]` against a
  * [[CrossoverGen]] dir (200k × 64-dim embeddings with planted
  * near-twins). Prints one JSON line per (method, nProbe) row; the round
  * record lands in RECALL.json.
  */
object RecallBench {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/crossover_sf10")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-recall-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
    val sq = aggregate(transform(col("embedding").cast("array<double>"),
      x => x * x), lit(0.0), (a, b) => a + b)
    val corpus = graft.pipeline.Dedup.materializeOnce(
      raw.select(col("vec_id"),
        when(sq === 0.0, col("embedding").cast("array<double>"))
          .otherwise(transform(col("embedding").cast("array<double>"),
            x => x / sqrt(sq))).as("embedding")))
    val n = corpus.count()
    val queries = graft.pipeline.Dedup.materializeOnce(
      corpus.filter(pmod(col("vec_id"), lit(2000L)) === 7L).limit(100))
    val k = 10

    val truth = graft.pipeline.Similarity.bruteForceTopK(
        queries, corpus, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"""{"stage":"recall_truth","vecs":$n,"queries":${truth.size / k},"k":$k}""")

    val nCells = math.max(16, (n / 128L).toInt)
    val cents = graft.pipeline.Similarity.ivfCentroids(
      corpus, "vec_id", "embedding", nCells)
    val books = graft.pipeline.PQ.pqCodebooks(
      corpus, "vec_id", "embedding", nSubq = 8, nCentroids = 16)
    val rbooks = graft.pipeline.PQ.residualCodebooks(
      corpus, "vec_id", "embedding", cents, nSubq = 8, nCentroids = 16)

    def measure(method: String, nProbe: Int)(
        run: () => org.apache.spark.sql.DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      val hits = run()
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).count(truth.contains)
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = hits.toDouble / truth.size
      println(f"""{"stage":"ann_recall","method":"$method","nprobe":$nProbe,"recall":$recall%.3f,"sec":$sec%.2f,"vecs":$n,"cells":$nCells,"k":$k}""")
      recall
    }

    for (np <- Seq(2, 8)) {
      measure("ivf", np)(() => graft.pipeline.Similarity.ivfTopK(
        corpus, queries, "vec_id", "embedding", k, cents, np))
      measure("ivfpq", np)(() => graft.pipeline.PQ.ivfPqTopK(
        corpus, queries, "vec_id", "embedding", k, cents, np, books))
      measure("ivfpq_residual", np)(() => graft.pipeline.PQ.ivfPqResidualTopK(
        corpus, queries, "vec_id", "embedding", k, cents, np, rbooks))
    }
    spark.stop()
  }
}
