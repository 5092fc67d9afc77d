package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: confirm exchange reuse in the executed resample plan. */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Queries.resample(spark, "/root/testdata/sf0.01", "1h")
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    val scans  = "FileScan parquet".r.findAllIn(plan).length
    val reused = "ReusedExchange".r.findAllIn(plan).length
    println(s"SCANS=$scans REUSED_EXCHANGES=$reused")
  }
}
