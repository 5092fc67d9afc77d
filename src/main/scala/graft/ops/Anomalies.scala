package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical outlier detection over keyed series — the audit companion to
  * [[Bars.gaps]]: gaps say where a stream went silent, this says where it
  * went WILD (stuck sensor, fat-finger trade, bot burst) before any of it
  * is resampled into training features.
  */
object Anomalies {

  /** Rows whose `valueCol` sits more than `threshold` sample standard
    * deviations from their key's mean. Emits the input columns plus a
    * rounded `z` score.
    *
    * Scale shape: one map-side-combined aggregation to (key, mean, sd) —
    * output rows = #keys — broadcast-joined back onto the stream, then a
    * narrow filter. No window, no second shuffle of the data; the stream
    * is read once. Keys with fewer than 2 rows (sd undefined) or constant
    * value (sd = 0) emit nothing.
    */
  def zscoreOutliers(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      threshold: Double = 3.0,
      roundZ: Int = 6,
      broadcastStats: Boolean = true): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val keys = keyCols.map(col)
    val stats = df.groupBy(keys: _*)
      .agg(avg(col(valueCol)).as("__m"), stddev_samp(col(valueCol)).as("__sd"))
    val z = (col(valueCol) - col("__m")) / col("__sd")
    // set broadcastStats = false only for pathological key cardinality
    // (stats rows = #keys); the planner then picks the join by stats
    df.join(if (broadcastStats) broadcast(stats) else stats, keyCols)
      .filter(col("__sd") > 0 && abs(z) > threshold)
      .withColumn("z", round(z, roundZ))
      .drop("__m", "__sd")
  }
}
