package graft.ops

import graft.SparkTestBase

class SessionizeSpec extends SparkTestBase {

  import spark.implicits._

  private def ev = Seq(
    ("u1", 1000L), ("u1", 2000L), ("u1", 8000L),  // gap 6000 > 5000 → new session
    ("u1", 9000L),
    ("u2", 1000L),                                 // single event
    ("u2", 7000L)                                  // gap 6000 → its own session
  ).toDF("user", "__timestamp")

  test("gap splits sessions per key; ids are 0-based ordinals") {
    val out = Sessionize.assign(ev, Seq("user"), "__timestamp", gapMs = 5000L)
      .orderBy("user", "__timestamp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    assert(out == Seq(
      ("u1", 1000L, 0L), ("u1", 2000L, 0L), ("u1", 8000L, 1L), ("u1", 9000L, 1L),
      ("u2", 1000L, 0L), ("u2", 7000L, 1L)))
  }

  test("a gap exactly equal to the threshold stays in-session") {
    val df  = Seq(("u", 0L), ("u", 5000L)).toDF("user", "__timestamp")
    val ids = Sessionize.assign(df, Seq("user"), "__timestamp", gapMs = 5000L)
      .select("session_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L))
  }

  test("session summary carries bounds, counts and span") {
    val out = Sessionize.sessions(ev, Seq("user"), "__timestamp", gapMs = 5000L)
      .orderBy("user", "session_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      ("u1", 0L, 1000L, 2000L, 2L, 1000L),
      ("u1", 1L, 8000L, 9000L, 2L, 1000L),
      ("u2", 0L, 1000L, 1000L, 1L, 0L),
      ("u2", 1L, 7000L, 7000L, 1L, 0L)))
  }

  test("windows are key-partitioned (scale shape)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = Sessionize.sessions(ev, Seq("user"), "__timestamp", 5000L)
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty)
  }

  test("debounce keeps exactly each burst's first row") {
    import spark.implicits._
    val df = Seq(
      // key a: burst at 0..40 (gap 50), lone row at 200, burst at 500..510
      ("a", 0L, 1L), ("a", 30L, 2L), ("a", 40L, 3L),
      ("a", 200L, 4L),
      ("a", 500L, 5L), ("a", 510L, 6L),
      // key b: everything within one burst
      ("b", 100L, 7L), ("b", 120L, 8L)
    ).toDF("k", "t", "id")
    val out = Sessionize.debounce(df, Seq("k"), "t", gapMs = 50L,
        tieCols = Seq("id"))
      .orderBy("k", "t").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 0L), ("a", 200L), ("a", 500L), ("b", 100L)))
  }
}
