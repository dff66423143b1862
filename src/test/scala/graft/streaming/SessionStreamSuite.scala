package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
    value: Double)

/** Streaming gap sessionization: sessions emit once the watermark has
  * provably closed them, and match the batch operator on the same data. */
class SessionStreamSuite extends SparkSpec {

  private def tmp(prefix: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/test-tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val MIN = 60000L

  test("closed sessions emit with the batch operator's exact rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[SessionEvent]
    val name = "sess_test_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Sessions.sessionizeStream(src.toDF(), "user_id", "ts",
        gapMs = 30 * MIN, watermarkDelay = "0 seconds", valueCol = col("value"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmp("sess"))
      .start()
    // user 1: two sessions (40-min pause); user 2: one. A far-future
    // event advances the watermark past every earlier session's end.
    src.addData(
      SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(10 * MIN), 2.0),
      SessionEvent(2L, ts(5 * MIN), 5.0))
    q.processAllAvailable()
    src.addData(SessionEvent(1L, ts(50 * MIN), 3.0))
    q.processAllAvailable()
    src.addData(SessionEvent(9L, ts(1000 * MIN), 0.0)) // watermark push
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name)
      .select("user_id", "session_start_ms", "session_end_ms", "n_events", "sum_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (1L, 0L, 40 * MIN, 2L, 3L),
      (1L, 50 * MIN, 80 * MIN, 1L, 3L),
      (2L, 5 * MIN, 35 * MIN, 1L, 5L)),
      s"streamed sessions diverge: $got")
    // replay equivalence: the batch operator over the same events (the
    // watermark-pushing sentinel included) contains exactly these rows
    val batch = Sessions.sessionize(
      Seq((1L, 0L, 1.0), (1L, 10 * MIN, 2.0), (2L, 5 * MIN, 5.0),
        (1L, 50 * MIN, 3.0), (9L, 1000 * MIN, 0.0))
        .map { case (u, t, v) => (u, t * 1000000L, v) }
        .toDF("user_id", "ts_ns", "value"),
      "user_id", "ts_ns", 30 * MIN, col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got.subsetOf(batch), "stream must be a prefix of the batch replay")
    assert((batch -- got).forall(_._1 == 9L), "only the sentinel stays open")
  }

  test("streamed rollup buckets equal the batch downsample on replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[SessionEvent]
    val name = "roll_test_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Sessions.downsampleStream(
        src.toDF().withColumnRenamed("user_id", "event_type"),
        "ts", Seq("event_type"), col("value"),
        intervalMs = 10 * MIN, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmp("roll"))
      .start()
    src.addData(
      SessionEvent(1L, ts(0), 1.5), SessionEvent(1L, ts(3 * MIN), 2.5),
      SessionEvent(2L, ts(4 * MIN), 7.9), SessionEvent(1L, ts(12 * MIN), 4.0))
    q.processAllAvailable()
    src.addData(SessionEvent(9L, ts(1000 * MIN), 0.0)) // watermark push
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name)
      .select("bucket_ms", "event_type", "cnt", "sum_v", "min_v", "max_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      (0L, 1L, 2L, 3L, 1L, 2L),          // floor(1.5)+floor(2.5) = 1+2
      (0L, 2L, 1L, 7L, 7L, 7L),
      (10 * MIN, 1L, 1L, 4L, 4L, 4L)),
      s"streamed rollup diverges: $got")
    // batch operator over the same events (sentinel included) ⊇ streamed
    val batch = Sessions.downsample(
      Seq((1L, 0L, 1.5), (1L, 3 * MIN, 2.5), (2L, 4 * MIN, 7.9),
        (1L, 12 * MIN, 4.0), (9L, 1000 * MIN, 0.0))
        .map { case (u, t, v) => (u, t * 1000000L, v) }
        .toDF("event_type", "ts_ns", "value"),
      "ts_ns", Seq("event_type"), col("value"), intervalMs = 10 * MIN)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got.subsetOf(batch) && (batch -- got).forall(_._2 == 9L))
  }
}
