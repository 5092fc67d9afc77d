package graft.ops

import graft.SparkTestBase
import graft.time.Intervals
import graft.ops.Resampler.ResampleOptions

/** Randomized equivalence: [[Resampler.resample]] vs a direct row-by-row
  * simulation of the reference's event loop
  * (`BatchEveryIntervalHandler.process/finalize`, classes.py:589-637).
  * The golden fixtures pin four specific datasets; this pins the semantics
  * over random gap patterns, duplicate timestamps and null values.
  */
class ResamplerPropsSpec extends SparkTestBase {

  import spark.implicits._

  /** The reference loop: at each boundary B emit the last event with ts < B —
    * full row when it lies within [B - step, B), else a gap row that is null
    * everywhere except the ffill keys, which carry the last event's values.
    * Boundaries run from nextBoundary(t0) while B <= t1, plus one tail flush.
    */
  private def simulate(
      events: Seq[(Long, Option[Double], Long)], // (ts, value, id)
      interval: String,
      ffillValue: Boolean): Seq[(Long, Option[Double], Option[Long])] = {
    val step   = Intervals.toMillis(interval)
    val sorted = events.sortBy(e => (e._1, e._3))
    val t0     = sorted.head._1
    val t1     = sorted.map(_._1).max
    val b0     = Intervals.nextBoundary(t0, interval, initialize = true)
    val kMax   = Math.floorDiv(t1 - b0, step) + 1 // incl. tail flush
    (0L to kMax).map { k =>
      val b    = b0 + k * step
      val prev = sorted.takeWhile(_._1 < b).lastOption
      prev match {
        case Some((ts, v, id)) if ts >= b - step =>
          (b, v, Some(id))                        // real row
        case Some((_, v, _)) =>
          (b, if (ffillValue) v else None, None)  // gap row
        case None => (b, None, None)              // before first event
      }
    }
  }

  private def run(seed: Int, interval: String, n: Int, spanMs: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val events = (0 until n).map { i =>
      val ts = 1600000000000L + (rnd.nextDouble() * spanMs).toLong
      val v  = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(1000).toDouble)
      (ts, v, i.toLong)
    }
    val df = events.toDF("__timestamp", "value", "id")
    val got = Resampler.resample(df, interval,
      opts = ResampleOptions(ffillKeys = Seq("value"), tieCols = Seq("id"),
        coverageBuckets = 7)) // small buckets → cross-slice carries exercised
      .collect()
      .map(r => (r.getLong(0),
        Option(r.get(r.fieldIndex("value"))).map(_.asInstanceOf[Double]),
        Option(r.get(r.fieldIndex("id"))).map(_.asInstanceOf[Long])))
      .toSeq
    val want = simulate(events, interval, ffillValue = true)
    assert(got == want,
      s"seed=$seed interval=$interval: first diff at ${got.zip(want).indexWhere(p => p._1 != p._2)}")
  }

  test("matches the reference event loop on random dense streams") {
    run(seed = 1, interval = "10s", n = 200, spanMs = 3600000L)   // ~2 events/bucket
    run(seed = 2, interval = "1m", n = 150, spanMs = 3600000L)
  }

  test("matches on sparse streams full of gaps") {
    run(seed = 3, interval = "1s", n = 40, spanMs = 3600000L)     // ~1% buckets hit
    run(seed = 4, interval = "100l", n = 30, spanMs = 600000L)
  }

  test("keyed resample matches the per-key simulation on random streams") {
    val rnd = new scala.util.Random(21)
    val events = (0 until 300).map { i =>
      val key = s"k${rnd.nextInt(4)}"
      val ts  = 1600000000000L + (rnd.nextDouble() * 600000L).toLong
      val v   = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(1000).toDouble)
      (key, ts, v, i.toLong)
    }
    val df = events.toDF("key", "__timestamp", "value", "id")
    val got = Resampler.resampleByKey(df, "10s", Seq("key"),
      opts = ResampleOptions(ffillKeys = Seq("value"), tieCols = Seq("id")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(r.fieldIndex("value"))).map(_.asInstanceOf[Double]),
        Option(r.get(r.fieldIndex("id"))).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._2)).toSeq
    val want = events.groupBy(_._1).toSeq.flatMap { case (k, evs) =>
      simulate(evs.map(e => (e._2, e._3, e._4)), "10s", ffillValue = true)
        .map { case (b, v, id) => (k, b, v, id) }
    }.sortBy(t => (t._1, t._2))
    assert(got == want,
      s"first diff at ${got.zip(want).indexWhere(p => p._1 != p._2)}")
  }

  test("matches with heavy timestamp ties") {
    val rnd = new scala.util.Random(9)
    val events = (0 until 120).map { i =>
      // only 20 distinct timestamps → 6-way ties on average
      val ts = 1600000000000L + rnd.nextInt(20) * 7000L
      (ts, Some(i.toDouble): Option[Double], i.toLong)
    }
    val df = events.toDF("__timestamp", "value", "id")
    val got = Resampler.resample(df, "5s",
      opts = ResampleOptions(ffillKeys = Seq("value"), tieCols = Seq("id")))
      .collect()
      .map(r => (r.getLong(0),
        Option(r.get(r.fieldIndex("value"))).map(_.asInstanceOf[Double]),
        Option(r.get(r.fieldIndex("id"))).map(_.asInstanceOf[Long])))
      .toSeq
    assert(got == simulate(events, "5s", ffillValue = true))
  }
}
