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
   * As-of (temporal) join: attach to every left row the LATEST right row
   * of the same key with `rightTs <= leftTs` — "the dimension state in
   * effect when the event happened" (config at incident time, the last
   * preceding marker event, a slowly-changing attribute). Right rows
   * must be unique per (key, ts); pre-aggregate if not.
   *
   * Spark-first shape: no point-in-time subquery per row and no range
   * join — the two sides UNION on the key, one shuffle partitions by
   * the (high-cardinality) key, and a running `last(payload, ignoreNulls)`
   * carries each right row forward to the left rows that follow it in
   * (ts, right-first) order. Cost is one exchange + one in-partition
   * sort, the same as the sessionize aggregate; per-key state is one
   * payload row. Ties at equal ts resolve right-before-left, so an
   * event AT the marker's timestamp sees that marker (ASOF `>=`
   * semantics, like DuckDB's ASOF JOIN). The payload travels as ONE
   * struct through a single `last(ignoreNulls)` — every enriched row is
   * a whole right row, never a column-wise mix of two right rows (which
   * per-column carries would produce when a right row holds a NULL in
   * one payload column but not another).
   *
   * @param payload right-side columns to carry (names must not clash
   *                with left columns)
   */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTsMs: String, rightTsMs: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asOfJoin needs at least one payload column")
    require(payload.forall(p => !left.columns.contains(p)),
      "payload column names must not clash with left columns")
    import org.apache.spark.sql.expressions.Window
    val r = right.select(col(key), col(rightTsMs).as("__ts"),
        struct(payload.map(col): _*).as("__pay"))
      .withColumn("__is_r", lit(1))
    val l = left.withColumn("__ts", col(leftTsMs)).withColumn("__is_r", lit(0))
    val all = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = all
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__is_r") === 0)
    payload.foldLeft(carried)((df, p) => df.withColumn(p, col("__pay")(p)))
      .drop("__is_r", "__ts", "__pay")
  }

  /**
   * Counter rates (the meter/PromQL `rate` primitive): per entity, the
   * per-second rate between CONSECUTIVE samples — `Δfloor(value) /
   * Δt`. Pairs with `Δt = 0` are dropped (undefined rate). The window
   * partitions on the high-cardinality entity and holds one lag row of
   * state; determinism: integer deltas, one double division, one
   * rounding to integer micros.
   *
   * @return (entityCol, ts_ms, prev_ts_ms, dv, dt_ms, rate_micros)
   */
  def counterRates(df: DataFrame, entityCol: String, tsNsCol: String,
      valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // value tiebreak: equal-(entity, ts) samples order deterministically,
    // and identical duplicates are order-indifferent (their dt=0 pair is
    // dropped either way) — exact cross-engine parity
    val w = Window.partitionBy(col(entityCol)).orderBy(col("ts_ms"), col("__v"))
    df.select(col(entityCol), expr(s"$tsNsCol DIV 1000000").as("ts_ms"),
        floor(valueCol).cast("long").as("__v"))
      .withColumn("prev_ts_ms", lag("ts_ms", 1).over(w))
      .withColumn("dv", col("__v") - lag("__v", 1).over(w))
      .withColumn("dt_ms", col("ts_ms") - col("prev_ts_ms"))
      .filter(col("dt_ms") > 0)
      .withColumn("rate_micros", // per-SECOND rate: dv·1e6·(1000/dt_ms)
        round(col("dv").cast("double") * lit(1.0e9) / col("dt_ms"))
          .cast("long"))
      .drop("__v")
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
