package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew salting for equi-joins — the manual escape hatch for the one shape
  * AQE's skew-split cannot fix: a HOT KEY (not merely a hot partition).
  * AQE splits oversized shuffle partitions between tasks, but every row of
  * one join key still meets every matching row in a single sort-merge
  * group; when 30% of a 100 TB fact table shares one key, that group is a
  * straggler no partition-split removes.
  *
  * The standard remedy: widen the join key with a salt. The big (skewed)
  * side gets a deterministic salt in [0, buckets); the small side is
  * replicated once per bucket; the join runs on (key, salt), spreading the
  * hot key over `buckets` independent sort-merge groups. Cost: the small
  * side shuffles `buckets`× its size — cheap when it is orders of
  * magnitude below the fact side (the usual skew shape).
  */
object Salting {

  /** Salted equi-join of a skewed `big` side against a `small` side on
    * `keys`. Semantics are exactly `big.join(small, keys, how)` for
    * `inner` / `left` / `left_semi` / `left_anti` (directions where
    * replicating the right side cannot duplicate or drop output rows).
    *
    * The salt is `xxhash64` of the big side's whole row, mod `buckets` —
    * DETERMINISTIC, not `rand()`: a task retry that re-salts differently
    * than the original attempt would lose or duplicate rows mid-shuffle.
    * Identical rows share a salt, which is harmless: the hot KEY's rows
    * are what must spread, and they differ in their payload columns.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      buckets: Int,
      how: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(how.toLowerCase),
      s"saltedJoin supports $allowed, not '$how' (replicating the right side " +
        "would duplicate rows under right/full joins)")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(buckets.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", how).drop("__salt")
  }
}
