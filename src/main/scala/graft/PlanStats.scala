package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._

/** Dev tool: one line of logical-plan shape statistics per query — the
  * evidence base for any plan-derived session heuristic (what fraction of
  * the inventory has joins / generates / checkpoint leaves, and how big
  * the leaf scans are). Session shape matches graft.Bench.
  *
  * Usage: sbt "runMain graft.PlanStats [query ...]"
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val only = args.toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected =
      if (only.isEmpty) SparkEntry.queries else SparkEntry.queries.filter(kv => only(kv._1))
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try graft.pipeline.Dedup.withMaterialized {
        val plan = fn(spark, sfDir).queryExecution.analyzed
        var joins, gens, rdds, windows, aggs, leaves = 0
        var bytes = BigInt(0)
        plan.foreach {
          case _: Join => joins += 1
          case _: Generate => gens += 1
          case l: org.apache.spark.sql.execution.LogicalRDD =>
            rdds += 1; leaves += 1; bytes += l.stats.sizeInBytes
          case _: Window => windows += 1
          case _: Aggregate => aggs += 1
          case l if l.children.isEmpty && l.isInstanceOf[LeafNode] =>
            leaves += 1; bytes += l.stats.sizeInBytes
          case _ =>
        }
        println(f"$name%-24s leaves=$leaves%2d bytes=$bytes%12d joins=$joins%2d gens=$gens%2d ckptRdds=$rdds%2d windows=$windows%2d aggs=$aggs%2d")
      } catch { case e: Throwable =>
        println(s"$name FAILED: $e")
      }
    }
    spark.stop()
  }
}
