package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Time-series shaping beyond the reference's fixed-interval buckets:
 * gap-based sessionization and multi-resolution rollups — the two
 * aggregation shapes an observability/training-data pipeline needs that
 * BanyanDB's TopN buckets (fixed `interval`, ST5) don't express.
 *
 * Scale shapes:
 * - [[sessionize]] uses Spark's native `session_window` aggregate — one
 *   shuffle on the entity key, per-key in-partition merge of overlapping
 *   windows, streaming-capable with a watermark (no window function over
 *   the full table, no per-entity single-task funnel).
 * - [[downsample]] / [[coarsen]] are single partial-aggregated shuffles;
 *   `coarsen` re-aggregates a FINER rollup instead of rescanning raw data
 *   — the multi-resolution retention ladder (1m → 1h → 1d) that keeps
 *   100 TB of raw events queryable at month granularity for the cost of
 *   reading the hour table. count/sum/min/max are re-aggregable; mean is
 *   derived (`sum_v / cnt`) at read time, never stored.
 */
object Sessions {

  /**
   * Gap-based sessionization: events of one entity belong to the same
   * session while consecutive events are at most `gapMs` apart (an event
   * at EXACTLY last + gap still extends — `session_window` merge
   * semantics); a session's end is its last event + gap (the idle
   * timeout that closed it). Timestamps truncate to MILLISECONDS before
   * the gap compare
   * so an external engine reasoning in ms computes identical sessions
   * (the reference's query timestamps are ms precision too,
   * measure/v1/query.proto:35).
   *
   * `sum_v` sums `floor(value)` as int64 — session aggregates are exact
   * integer sums, independent of merge order.
   *
   * @return (entityCol, session_start_ms, session_end_ms, n_events, sum_v)
   */
  def sessionize(df: DataFrame, entityCol: String, tsNsCol: String,
      gapMs: Long, valueCol: Column): DataFrame = {
    require(gapMs > 0, "gapMs must be positive")
    val tsMs = expr(s"$tsNsCol DIV 1000000")
    df.withColumn("__ts", timestamp_millis(tsMs))
      .groupBy(col(entityCol),
        session_window(col("__ts"), s"$gapMs milliseconds").as("__w"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(valueCol).cast("long")).as("sum_v"))
      .select(col(entityCol),
        unix_millis(col("__w.start")).as("session_start_ms"),
        unix_millis(col("__w.end")).as("session_end_ms"),
        col("n_events"), col("sum_v"))
  }

  /**
   * Streaming form of [[sessionize]]: the same native `session_window`
   * aggregate under a watermark — a session emits (append mode) once the
   * watermark passes its end, i.e. once the idle gap has provably
   * elapsed. State per open session is one merged window + counters,
   * evicted at emission; the 100 TB-stream shape (keyed state, bounded
   * by OPEN sessions, not history).
   */
  def sessionizeStream(df: DataFrame, entityCol: String, tsCol: String,
      gapMs: Long, watermarkDelay: String, valueCol: Column): DataFrame = {
    require(gapMs > 0, "gapMs must be positive")
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(col(entityCol),
        session_window(col(tsCol), s"$gapMs milliseconds").as("__w"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(valueCol).cast("long")).as("sum_v"))
      .select(col(entityCol),
        unix_millis(col("__w.start")).as("session_start_ms"),
        unix_millis(col("__w.end")).as("session_end_ms"),
        col("n_events"), col("sum_v"))
  }

  /**
   * Fixed-interval rollup of raw events: one row per (bucket, dims) with
   * the four re-aggregable statistics. `value` is floored to int64 first
   * (exact sums, engine-portable).
   *
   * @return (bucket_ms, dims..., cnt, sum_v, min_v, max_v)
   */
  def downsample(df: DataFrame, tsNsCol: String, dims: Seq[String],
      valueCol: Column, intervalMs: Long): DataFrame = {
    require(intervalMs > 0, "intervalMs must be positive")
    import graft.functions.BanyanSemantics.longDiv
    val bucket = (longDiv(longDiv(col(tsNsCol).cast("long"), lit(1000000L)),
      lit(intervalMs)) * lit(intervalMs)).as("bucket_ms")
    val v = floor(valueCol).cast("long")
    df.groupBy(bucket +: dims.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(v).as("sum_v"),
        min(v).as("min_v"), max(v).as("max_v"))
  }

  /**
   * Streaming form of [[downsample]]: the same fixed-interval
   * count/sum/min/max rollup as a watermarked tumbling-window aggregate —
   * a bucket emits (append mode) once the watermark passes its end, and
   * the emitted rows are exactly what the batch operator computes over
   * the same events. writeStream this into the rollup table and
   * [[coarsen]] reads it like any other level of the ladder: continuous
   * ingest maintains the 1m level, scheduled batch re-aggregation rolls
   * it up. State is bounded by OPEN buckets × dims, not history.
   */
  def downsampleStream(df: DataFrame, tsCol: String, dims: Seq[String],
      valueCol: Column, intervalMs: Long, watermarkDelay: String): DataFrame = {
    require(intervalMs > 0, "intervalMs must be positive")
    val v = floor(valueCol).cast("long")
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), s"$intervalMs milliseconds").as("__w") +:
        dims.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(v).as("sum_v"),
        min(v).as("min_v"), max(v).as("max_v"))
      .select(unix_millis(col("__w.start")).as("bucket_ms") +:
        (dims.map(col) ++ Seq(col("cnt"), col("sum_v"), col("min_v"),
          col("max_v"))): _*)
  }

  /**
   * Re-aggregate a finer [[downsample]] rollup to a coarser interval —
   * reads the rollup table, never the raw events. `intervalMs` must be a
   * multiple of the finer rollup's interval (a finer bucket then falls
   * entirely inside one coarse bucket; floor-division places it).
   */
  def coarsen(rollup: DataFrame, dims: Seq[String], intervalMs: Long): DataFrame = {
    require(intervalMs > 0, "intervalMs must be positive")
    import graft.functions.BanyanSemantics.longDiv
    val bucket = (longDiv(col("bucket_ms"), lit(intervalMs)) * lit(intervalMs))
      .as("bucket_ms_out")
    rollup.groupBy(bucket +: dims.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
      .withColumnRenamed("bucket_ms_out", "bucket_ms")
  }
}
