package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump simple plans for the headline queries (pushdown/broadcast
  * inspection). Run: sbt "runMain graft.ExplainCheck [queries...]".
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q_time_filter", "q_resample_1h", "q_join_enrich", "q1_agg", "q_ffill")
    for (q <- qs) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
