package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The snapshot-stamp staleness guard for against-prior folds: a stamped
  * artifact loads only under the snapshot id it was saved with; an
  * unstamped, half-written or retrained prior is refused loudly instead
  * of folding into a silently wrong answer. Pinned on the two
  * representative against-prior artifacts: [[TextAnalysis.lineCounts]]
  * (line dedup) and [[Privacy.qiCounts]] (incremental k-anonymity).
  */
class ArtifactsSpec extends SparkTestBase {

  import spark.implicits._

  test("stamped lineCounts artifact: matching snapshot loads, stale refuses") {
    val dir = java.nio.file.Files.createTempDirectory("art_stamp_").toFile
    try {
      val docs = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("id", "t")
      val counts = TextAnalysis.lineCounts(docs, "t")
      val p = new java.io.File(dir, "lc").getAbsolutePath
      Artifacts.saveStamped(counts, p, snapshot = "batch-41")
      assert(Artifacts.snapshotOf(spark, p) === Some("batch-41"))
      val loaded = Artifacts.loadStamped(spark, p, "batch-41")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(loaded("a") === 2L)
      val e = intercept[IllegalArgumentException] {
        Artifacts.loadStamped(spark, p, "batch-42")
      }
      assert(e.getMessage.contains("batch-41") &&
        e.getMessage.contains("batch-42"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("stamped qiCounts artifact: unstamped prior (plain save) is refused") {
    val dir = java.nio.file.Files.createTempDirectory("art_stamp_").toFile
    try {
      val rows = Seq((1, "A"), (1, "A"), (2, "B")).toDF("nation", "segment")
      val qi = Privacy.qiCounts(rows, Seq("nation", "segment"))
      // a plain save — the pre-guard convention / a crash before the
      // sidecar write — must NOT load as any snapshot
      val p = new java.io.File(dir, "qi").getAbsolutePath
      Artifacts.save(qi, p)
      assert(Artifacts.snapshotOf(spark, p) === None)
      val e = intercept[IllegalArgumentException] {
        Artifacts.loadStamped(spark, p, "snap-1")
      }
      assert(e.getMessage.contains("unstamped"))
      // re-stamping repairs it, and the sidecar never leaks into the data
      Artifacts.saveStamped(qi, p, "snap-1")
      val loaded = Artifacts.loadStamped(spark, p, "snap-1")
      assert(loaded.columns.toSeq === Seq("nation", "segment", "prior_n"))
      assert(loaded.count() === 2)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
