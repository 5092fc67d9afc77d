package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, n-gram Jaccard, MinHash+LSH and SimHash.
  *
  * Scale shapes:
  *  - exact: one hash-groupBy (map-side combined) on a digest of the text —
  *    never shuffles full documents, only (digest, id).
  *  - n-gram Jaccard: explode shingles → self-join on shingle → count shared.
  *    The shingle join is the classic inverted-index plan; hot shingles are
  *    the skew risk, so `jaccardPairs` takes a document-frequency cap that
  *    drops stop-shingles before the join (standard trick, keeps AQE happy).
  *  - MinHash+LSH: signature = per-band min of digest; candidates share a
  *    (band, bucket) key → the join is on tiny fixed-width keys.
  *  - SimHash: 64-bit signature via bit-voting; near-dups = equal signatures
  *    (or banded signature pieces for Hamming distance > 0).
  *
  * All digests are md5-based (deterministic, identical across engines) so
  * correctness oracles can reproduce signatures bit-for-bit.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per distinct text digest.
    * Returns (idCol, digest, dupCount).
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact dedup applied: one representative row per distinct text. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactGroups(df, textCol, idCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Distinct word n-gram shingles per doc: (id, shingle). */
  def explodedShingles(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol),
        explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("shingle"))

  /** Near-duplicate pairs by exact n-gram Jaccard similarity >= `threshold`.
    * `maxShingleDf` drops shingles appearing in more than that many docs
    * (stop-shingle skew guard); pass Int.MaxValue for exact semantics.
    * Output: (id_a, id_b, jaccard) with id_a < id_b.
    */
  def jaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val sh = explodedShingles(df, textCol, idCol, n)
    val filtered =
      if (maxShingleDf == Int.MaxValue) sh
      else {
        val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleDf).select("shingle")
        sh.join(hot, Seq("shingle"), "left_anti")
      }
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))

    val a = filtered.select(col(idCol).as("id_a"), col("shingle"))
    val b = filtered.select(col(idCol).as("id_b"), col("shingle"))
    val shared = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))

    shared
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signature column: for each of `numHashes` hash functions, the
    * minimum md5 digest of `i:shingle`. Deterministic and engine-portable
    * (no seeded JVM-specific hashing).
    */
  def minhashSignature(text: Column, n: Int, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(array_distinct(TextAnalysis.shingles(text, n)),
        s => md5(concat(lit(s"$i:"), s))))
    }: _*)

  /** LSH candidate pairs: split the signature into `bands` bands of `rowsPerBand`
    * hashes; docs sharing any band bucket become candidates; candidates are
    * verified with exact Jaccard when `verifyThreshold` > 0.
    */
  def minhashLshPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      verifyThreshold: Double = 0.0): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigDf = df.select(col(idCol), minhashSignature(col(textCol), n, numHashes).as("sig"))

    val banded = sigDf.select(col(idCol),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("|", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
      }: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))

    val l = banded.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val r = banded.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    val cands = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    if (verifyThreshold <= 0.0) cands
    else {
      val verified = jaccardPairs(df, textCol, idCol, n, verifyThreshold)
      cands.join(verified, Seq("id_a", "id_b"), "inner")
    }
  }

  /** 64-bit SimHash from word tokens: each token votes its md5-derived 64-bit
    * pattern; the signature takes the sign of each bit's vote sum. Built
    * entirely from builtins (`conv` on md5 hex → bigint bits).
    */
  def simhash(text: Column): Column = {
    val tokens = TextAnalysis.words(text)
    // 64-bit value per token from the first 16 hex chars of its md5.
    val tokBits = transform(tokens, t => conv(substring(md5(t), 1, 16), 16, 10).cast("decimal(20,0)"))
    // For each bit position: sum of votes (+1 if bit set else -1) > 0 → bit set.
    val bitCols = (0 until 64).map { b =>
      val mask   = java.math.BigDecimal.valueOf(2).pow(b)
      val bitVal = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(b))
      val votes = aggregate(tokBits, lit(0L),
        (acc, v) => acc + when(pmod(floor(v / lit(mask)).cast("decimal(20,0)"), lit(2)) === 1, 1L).otherwise(-1L))
      when(votes > 0, lit(bitVal)).otherwise(lit(java.math.BigDecimal.ZERO))
    }
    bitCols.map(_.cast("decimal(20,0)")).reduce(_ + _)
  }

  /** SimHash near-dup groups: docs with identical simhash. */
  def simhashGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), simhash(col(textCol)).as("simhash"))
      .groupBy(col("simhash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
}
