package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.engine.Planners
import graft.model.{AggFn, TopNQuery}
import graft.sources.Catalog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** A grouped input point for the group_by_tag_names test. */
final case class GroupedPoint(ts: java.sql.Timestamp, group_key: String,
    entity: String, value: Long)

/** Streaming TopNAggregation (ST1–ST5): incremental dirty snapshots,
  * bounded counters, late-data drop, the `_top_n_result` sink, and
  * equivalence with the batch pre-compute. */
class TopNStreamSuite extends SparkSpec {

  private def tmp(prefix: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/test-tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val HOUR = 3600000L

  private def runBatches(cfg: TopNStreamConfig,
      batches: Seq[Seq[TopNPoint]]): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[TopNPoint]
    val name = "topn_test_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = TopNStream.topNAggregate(src.toDF(), cfg).writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmp("ckpt"))
      .start()
    batches.foreach { b => src.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("incremental dirty snapshots; latest flush supersedes (ST1/ST3)") {
    val cfg = TopNStreamConfig(intervalMs = HOUR, n = 2, countersNumber = 100)
    val all = runBatches(cfg, Seq(
      Seq(TopNPoint(ts(100), "a", 5), TopNPoint(ts(200), "b", 3)),
      Seq(TopNPoint(ts(300), "b", 9), TopNPoint(ts(400), "c", 4))))
    // two flushes for bucket 0 — both snapshot sets appended
    assert(all.select("flush_seq").distinct().count() == 2)
    val fin = TopNStream.latestSnapshot(all)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // final counters: a=5, b=12, c=4 → top2 = b(12) rank1, a(5) rank2
    assert(fin.toSeq == Seq(("b", 12L, 1L), ("a", 5L, 2L)))
  }

  test("bounded counters evict the minimum on overflow (counters_number)") {
    val cfg = TopNStreamConfig(intervalMs = HOUR, n = 3, countersNumber = 2)
    val all = runBatches(cfg, Seq(Seq(
      TopNPoint(ts(100), "a", 10), TopNPoint(ts(200), "b", 1),
      TopNPoint(ts(300), "c", 7)))) // c arrives when {a,b} full → evicts b
    val fin = TopNStream.latestSnapshot(all)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getLong(2)))
    assert(fin.toSeq == Seq(("a", 10L), ("c", 7L)))
  }

  test("bottom-N (desc=false) eviction is direction-aware: evicts the MAX") {
    val cfg = TopNStreamConfig(intervalMs = HOUR, n = 2, countersNumber = 2,
      desc = false)
    // one point per entity, values distinct — greedy eviction of the max
    // keeps exactly the true bottom-2 {d=1, b=2}; min-eviction would have
    // discarded exactly those
    val all = runBatches(cfg, Seq(Seq(
      TopNPoint(ts(100), "a", 10), TopNPoint(ts(200), "b", 2),
      TopNPoint(ts(300), "c", 7), TopNPoint(ts(400), "d", 1))))
    val fin = TopNStream.latestSnapshot(all)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(fin.toSeq == Seq(("d", 1L, 1L), ("b", 2L, 2L)))
  }

  test("late rows beyond the watermark are dropped (ST2)") {
    val cfg = TopNStreamConfig(intervalMs = HOUR, n = 5, countersNumber = 100,
      lruSize = 1) // lateness = 1 hour
    val all = runBatches(cfg, Seq(
      // watermark advances to 5h - 1h = 4h after this batch
      Seq(TopNPoint(ts(5 * HOUR), "a", 1)),
      // bucket 0 is far behind the 4h watermark → dropped, never counted
      Seq(TopNPoint(ts(100), "zombie", 99), TopNPoint(ts(5 * HOUR + 1), "a", 1))))
    val fin = TopNStream.latestSnapshot(all).collect()
    assert(!fin.exists(_.getString(1) == "zombie"))
    assert(fin.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ==
      Set((5 * HOUR, "a", 2L)))
  }

  test("window state is dropped after expiry (event-time timeout)") {
    val cfg = TopNStreamConfig(intervalMs = HOUR, n = 5, countersNumber = 100,
      lruSize = 1)
    val all = runBatches(cfg, Seq(
      Seq(TopNPoint(ts(100), "a", 1)),
      // pushes watermark to 9h, expiring bucket 0 (end 1h + lateness 1h)
      Seq(TopNPoint(ts(10 * HOUR), "b", 1)),
      // bucket 0's final flush must have happened; this row is late-dropped
      Seq(TopNPoint(ts(200), "a", 50))))
    val bucket0 = TopNStream.latestSnapshot(all).filter(col("bucket_ms") === 0)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(bucket0.toSeq == Seq(("a", 1L)))
  }

  test("ST2 exactly: count-based LRU accepts old windows while the cache " +
      "has room and drops closed ones when full — provably different from " +
      "the time-based horizon under bursty event-time skew") {
    val base = TopNStreamConfig(intervalMs = HOUR, n = 5, countersNumber = 100,
      lruSize = 2)
    val batches = Seq(
      Seq(TopNPoint(ts(10 * HOUR), "a", 1)),
      // 4.5h behind the watermark — far outside the time horizon
      // (lruSize × interval = 2h) but the cache has room, so the
      // reference ACCEPTS it (isWindowLate requires a full cache)
      Seq(TopNPoint(ts(5 * HOUR + 1800000L), "old", 7)),
      // new window on a full cache evicts the LEAST RECENTLY USED —
      // that is bucket 10h (bucket 5h was touched later), even though
      // 10h is the more recent in event time
      Seq(TopNPoint(ts(11 * HOUR), "b", 1)),
      // bucket 10h is now closed-by-watermark + cache full + absent →
      // the reference DROPS it; the 2h time horizon would accept it
      Seq(TopNPoint(ts(10 * HOUR + 1800000L), "late", 3)))

    val cnt = TopNStream.latestSnapshot(
      runBatches(base, batches)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(cnt == Set(
      (5 * HOUR, "old", 7L), (10 * HOUR, "a", 1L), (11 * HOUR, "b", 1L)),
      s"count-based (reference) behavior violated: $cnt")

    val tim = TopNStream.latestSnapshot(
      runBatches(base.copy(latenessMode = "time"), batches)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(tim == Set(
      (10 * HOUR, "a", 1L), (10 * HOUR, "late", 3L), (11 * HOUR, "b", 1L)),
      s"time-based approximation changed: $tim")
    assert(cnt != tim, "the two lateness modes must provably differ here")
  }

  test("parquet `_top_n_result` sink + topNRead round trip (ST4 + §3.3)") {
    val cfg = TopNStreamConfig(intervalMs = HOUR, n = 2, countersNumber = 100)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[TopNPoint]
    val out = tmp("topnresult")
    val q = TopNStream.sinkToResultTable(
      TopNStream.topNAggregate(src.toDF(), cfg), out, tmp("ckpt"),
      Trigger.ProcessingTime(0))
    src.addData(Seq(
      TopNPoint(ts(100), "a", 5), TopNPoint(ts(HOUR + 100), "a", 2),
      TopNPoint(ts(150), "b", 8), TopNPoint(ts(HOUR + 200), "c", 6)))
    q.processAllAvailable()
    q.stop()
    val buckets = TopNStream.latestSnapshot(spark.read.parquet(out))
      .withColumnRenamed("bucket_ms", "bucket_start").drop("rank")
    val read = Planners.topNRead(buckets,
      TopNQuery(Seq("g"), "t", topN = 10, agg = Some(AggFn.Sum)))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // cross-bucket SUM: a=5+2=7, b=8, c=6 → b, a, c
    assert(read.toSeq == Seq(("b", 8L), ("a", 7L), ("c", 6L)))
  }

  test("group_by_tag_names: entities rank within each group per window (ST3)") {
    val events = Catalog.load(spark, sf0001, "events")
    val batch = Planners.topNBuckets(events, "ts_ns", "user_id",
      floor(col("value")).cast("long"), intervalMs = 6 * HOUR, n = 2,
      groupCols = Seq("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet

    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[GroupedPoint]
    src.addData(events.select(col("ts"), col("event_type").as("group_key"),
      col("user_id").cast("string").as("entity"),
      floor(col("value")).cast("long").as("value")).as[GroupedPoint].collect().toSeq)
    val name = "topn_grouped_eq"
    val q = TopNStream.topNAggregate(src.toDF(),
      TopNStreamConfig(intervalMs = 6 * HOUR, n = 2, countersNumber = 1 << 20))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmp("ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = TopNStream.latestSnapshot(spark.table(name))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(streamed == batch)
  }

  test("replaying events reproduces the batch topNBuckets pre-compute") {
    val events = Catalog.load(spark, sf0001, "events")
    val batch = Planners.topNBuckets(events, "ts_ns", "user_id",
      floor(col("value")).cast("long"), intervalMs = HOUR, n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    val pts = events.select(
      col("ts").as("ts"),
      col("user_id").cast("string").as("entity"),
      floor(col("value")).cast("long").as("value"))
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[TopNPoint]
    src.addData(pts.as[TopNPoint].collect().toSeq)
    val name = "topn_replay_eq"
    val q = TopNStream.topNAggregate(src.toDF(),
      TopNStreamConfig(intervalMs = HOUR, n = 3, countersNumber = 1 << 20))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmp("ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = TopNStream.latestSnapshot(spark.table(name))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
  }
}
