package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the table-backed quantile trainer (dev
  * only — not part of the driver contract). Times each stage of
  * `q_rank_grid_table` separately to localize cold-run cost.
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/crossover_sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import spark.implicits._
    val ps = (1 to 19).map(_ * 0.05)
    val ev = t("read+count") {
      val e = Queries.events(spark, sfDir).select($"event_type", $"value")
      e.count(); e
    }
    // stage 1: band pass alone (same ladder the trainer uses)
    val margin = 3.0 / 2000
    val frs = ps.flatMap(p => Seq(math.max(p - margin, 1e-9), p,
      math.min(p + margin, 1.0))).distinct.sorted
    t("band pass (approx_percentile agg)") {
      ev.filter($"value".isNotNull)
        .select($"event_type".cast("string").as("__k"),
          $"value".cast("double").as("__v"))
        .groupBy($"__k")
        .agg(count(lit(1)).as("__n"),
          percentile_approx($"__v", array(frs.map(lit): _*), lit(2000)).as("__apx"))
        .write.format("noop").mode("overwrite").save()
    }
    // full trainer, twice
    for (i <- 1 to 2) t(s"exactQuantileGridTable run $i") {
      graft.pipeline.Dedup.withMaterialized {
        Queries.quantileGridTable(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
