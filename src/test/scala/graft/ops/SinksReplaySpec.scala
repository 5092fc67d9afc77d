package graft.ops

import graft.SparkTestBase

import java.nio.file.Files

/** K1-K5 sinks + replay callback coverage. */
class SinksReplaySpec extends SparkTestBase {

  import spark.implicits._

  private def df = (1 to 100).map(i => (i.toLong * 1000, s"v$i"))
    .toDF("__timestamp", "v")

  test("batched sink rotates files by maxRecordsPerFile (K1)") {
    val out = Files.createTempDirectory("graft_sink").toString + "/batched"
    Sinks.writeBatched(df.repartition(1), out, "parquet", maxRecordsPerFile = 30)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4) // 100 rows / 30 per file
    assert(spark.read.parquet(out).count() == 100)
  }

  test("full sink writes a single csv file with header (K2)") {
    val out = Files.createTempDirectory("graft_sink").toString + "/full"
    Sinks.writeFull(df, out, "csv")
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 100)
    assert(back.columns.toSeq == Seq("__timestamp", "v"))
  }

  test("gzip csv sink (K1 compression)") {
    val out = Files.createTempDirectory("graft_sink").toString + "/gz"
    Sinks.writeBatched(df, out, "csv", compression = Some("gzip"))
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv.gz"))
    assert(files.nonEmpty)
    assert(spark.read.option("header", "true").csv(out).count() == 100)
  }

  test("replay dispatches rows in order with timestamps (K4)") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val status = Replay.replay(df.orderBy("__timestamp")) { (ts, row) =>
      seen += ts
      assert(row.getAs[String]("v") == s"v${ts / 1000}")
    }
    assert(status == Replay.Ok)
    assert(seen.toSeq == (1 to 100).map(_.toLong * 1000))
  }

  test("replay cooperative stop returns ForceStop (core.py:123-132)") {
    val flag = new Replay.StopFlag
    var n = 0
    val status = Replay.replay(df.orderBy("__timestamp"), flag = flag) { (_, _) =>
      n += 1
      if (n == 10) flag.stop()
    }
    assert(status == Replay.ForceStop)
    assert(n == 10)
  }
}
