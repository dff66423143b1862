package graft.operators

import graft.SparkSpec
import graft.sources.Catalog
import org.apache.spark.sql.functions._

/** Gap sessionization and multi-resolution rollup re-aggregation. */
class SessionsSuite extends SparkSpec {

  import spark.implicits._

  private val MIN = 60000L // ms
  private def ns(ms: Long) = ms * 1000000L

  private def sessions(tsMs: Seq[(Long, Long)], gapMs: Long) =
    Sessions.sessionize(
      tsMs.map { case (u, t) => (u, ns(t), 1.0) }.toDF("user_id", "ts_ns", "value"),
      "user_id", "ts_ns", gapMs, col("value"))
      .orderBy("user_id", "session_start_ms")
      .select("user_id", "session_start_ms", "session_end_ms", "n_events", "sum_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("events closer than the gap merge; a gap-sized pause splits") {
    // user 1: 0, 10min, then 50min (40min pause > 30min gap) → 2 sessions
    val got = sessions(Seq((1L, 0L), (1L, 10 * MIN), (1L, 50 * MIN)), 30 * MIN)
    assert(got == Seq(
      (1L, 0L, 10 * MIN + 30 * MIN, 2L, 2L),
      (1L, 50 * MIN, 80 * MIN, 1L, 1L)))
  }

  test("a pause of EXACTLY the gap still merges; one ms beyond splits") {
    // session_window's range is end-INCLUSIVE at the merge boundary: an
    // event AT last_ts + gap extends the session (Spark semantics —
    // the oracle mirrors it as `diff > gap` starting a new session)
    val merged = sessions(Seq((1L, 0L), (1L, 30 * MIN)), 30 * MIN)
    assert(merged == Seq((1L, 0L, 60 * MIN, 2L, 2L)),
      s"exact-gap event must extend the session: $merged")
    val split = sessions(Seq((1L, 0L), (1L, 30 * MIN + 1)), 30 * MIN)
    assert(split.size == 2, s"gap+1ms must open a new session: $split")
  }

  test("entities never mix") {
    val got = sessions(Seq((1L, 0L), (1L, 30 * MIN - 1), (2L, 0L)), 30 * MIN)
    assert(got == Seq(
      (1L, 0L, 30 * MIN - 1 + 30 * MIN, 2L, 2L),
      (2L, 0L, 30 * MIN, 1L, 1L)))
  }

  test("sessionize matches an independent window-function formulation") {
    val ev = Catalog.load(spark, sf0001, "events")
    val got = Sessions.sessionize(ev, "user_id", "ts_ns",
      gapMs = 1800000L, valueCol = col("value"))
    // reference: lag/cumsum session ids (the oracle's shape, in Spark)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_ms")
    val ref = ev.select(col("user_id"), expr("ts_ns DIV 1000000").as("ts_ms"),
        floor(col("value")).cast("long").as("v"))
      .withColumn("new_s",
        when(col("ts_ms") - lag("ts_ms", 1).over(w) <= 1800000L, 0L).otherwise(1L))
      .withColumn("sid", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ts_ms").as("session_start_ms"),
        (max("ts_ms") + 1800000L).as("session_end_ms"),
        count(lit(1)).as("n_events"), sum("v").as("sum_v"))
      .drop("sid")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("coarsening the hourly rollup equals rolling up daily directly") {
    val ev = Catalog.load(spark, sf0001, "events")
    val hourly = Sessions.downsample(ev, "ts_ns", Seq("event_type"),
      col("value"), intervalMs = 3600000L)
    val viaLadder = Sessions.coarsen(hourly, Seq("event_type"),
      intervalMs = 86400000L)
    val direct = Sessions.downsample(ev, "ts_ns", Seq("event_type"),
      col("value"), intervalMs = 86400000L)
    assert(viaLadder.exceptAll(direct).isEmpty && direct.exceptAll(viaLadder).isEmpty)
  }

  test("asOfJoin attaches the latest at-or-before right row per key") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 10L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 150L), (2L, 50L, 500L))
      .toDF("k", "ts", "pv")
      .select(col("k"), col("ts"), col("ts").as("p_ts"), col("pv"))
    val got = Sessions.asOfJoin(left, right, "k", "ts", "ts", Seq("p_ts", "pv"))
      .select("k", "ts", "tag", "p_ts", "pv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    assert(got == Set(
      (1L, 10L, "a", 10L, 100L), // equal ts sees the marker (>= semantics)
      (1L, 20L, "b", 15L, 150L), // latest preceding wins
      (1L, 5L, "c", -1L, -1L),   // nothing before → null
      (2L, 10L, "d", -1L, -1L))) // other key's markers invisible
  }

  test("asOfJoin carries whole right rows — a null payload value never tears") {
    // right row at ts=20 has pv NULL: a left row after it must see THAT
    // row's (p_ts=20, pv=null), never p_ts=20 paired with the OLDER row's
    // pv=100 (the torn mix per-column carries produce)
    val left = Seq((1L, 30L, "a")).toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, Some(100L)), (1L, 20L, None))
      .toDF("k", "ts", "pv")
      .select(col("k"), col("ts"), col("ts").as("p_ts"), col("pv"))
    val got = Sessions.asOfJoin(left, right, "k", "ts", "ts", Seq("p_ts", "pv"))
      .select("k", "ts", "p_ts", "pv").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == Set((1L, 30L, 20L, -1L)), s"got $got")
  }

  test("counterRates: integer deltas, zero-dt pairs dropped, exact micros") {
    val df = Seq((1L, 0L, 10.0), (1L, 2000L, 15.9), (1L, 2000L, 15.9),
      (1L, 4000L, 11.0), (2L, 0L, 1.0))
      .map { case (u, ms, v) => (u, ms * 1000000L, v) }
      .toDF("user_id", "ts_ns", "value")
    val got = Sessions.counterRates(df, "user_id", "ts_ns", col("value"))
      .select("user_id", "ts_ms", "dv", "dt_ms", "rate_micros").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set(
      (1L, 2000L, 5L, 2000L, 2500000L),   // +5 over 2s = 2.5/s
      (1L, 4000L, -4L, 2000L, -2000000L)) // counter reset → negative rate
      , s"got $got")
  }

  test("sessionize carries no Window node (native session_window aggregate)") {
    val ev = Catalog.load(spark, sf0001, "events")
    val plan = Sessions.sessionize(ev, "user_id", "ts_ns", 1800000L, col("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected window-free plan:\n$plan")
  }
}
