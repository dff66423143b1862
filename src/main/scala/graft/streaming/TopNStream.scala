package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** One input point: event time, ranked entity, measured value. */
final case class TopNPoint(ts: java.sql.Timestamp, entity: String, value: Long)

/** Keyed form after bucketing (key = (bucket_ms, group_key)). The group
  * key is the concatenated `group_by_tag_names` value ("" when the
  * aggregation declares none). */
final case class BucketedPoint(bucket_ms: Long, group_key: String,
    ts: java.sql.Timestamp, entity: String, value: Long)

/** One appended snapshot row of the derived `_top_n_result` table. A later
  * `flush_seq` for the same bucket supersedes earlier ones — the same
  * latest-version-wins read semantic as the measure path (T8). */
final case class TopNResultRow(bucket_ms: Long, group_key: String,
    entity: String, value: Long, rank: Long, flush_seq: Long)

/** Per-window state: bounded entity→sum counters + flush counter. */
final case class TopNWindowState(counters: Map[String, Long], flushSeq: Long)

/**
 * Streaming TopNAggregation pre-compute (SURVEY §2.7, ST1–ST5) — the
 * Spark Structured Streaming counterpart of the reference's flow job
 * (pkg/flow/streaming/sliding_window.go:76-310 window assign/trigger,
 * topn.go:50-120 bounded counter heaps, wiring banyand/measure/topn.go:557-580).
 *
 * Shape: tumbling event-time windows of `intervalMs` (ST1/ST5), keyed by
 * window start; per window a bounded map of at most `countersNumber` entity
 * counters (ST3) updated by `flatMapGroupsWithState`; every micro-batch
 * emits a DIRTY SNAPSHOT of the window's current top `n` (the reference's
 * incremental flush, topn.go dirty-window set), and an event-time timeout
 * emits the final snapshot and drops the state.
 *
 * Lateness (ST2): the reference bounds live windows by COUNT (`lru_size`
 * newest window snapshots, sliding_window.go:66-74); Spark's watermark is
 * time-based, so we use `lru_size × intervalMs` of allowed lateness — the
 * exact analogue when event time advances roughly uniformly, and the delta
 * is documented here rather than hidden. Rows older than the watermark are
 * dropped before reaching the state function, like the reference's
 * late-window check (sliding_window.go:240-243).
 *
 * Counter eviction: when a window already tracks `countersNumber` entities,
 * a new entity evicts the current minimum counter (topn heap overflow,
 * topn_heap.go) — approximate by design, as the reference documents
 * (docs/concept/data-model.md:164). Set `countersNumber` ≥ the expected
 * distinct-entity cardinality per window for exact results.
 *
 * Scale: state per window is O(countersNumber); shuffle is one exchange on
 * bucket_ms; snapshots are append-only so the sink is the exactly-once
 * parquet file sink (ST4) and reads dedup by (bucket, max flush_seq).
 */
final case class TopNStreamConfig(
    intervalMs: Long,
    n: Int,
    countersNumber: Int = 1000,
    lruSize: Int = 2,
    desc: Boolean = true) {
  require(intervalMs > 0 && n > 0 && countersNumber > 0 && lruSize > 0,
    "all TopNStreamConfig parameters must be positive")
}

object TopNStream {

  /** Streaming transform: points (ts, entity, value) → appended dirty
    * snapshots of per-bucket top-n. Use with OutputMode/Trigger of the
    * caller's sink; rows are append-only by construction. */
  def topNAggregate(points: DataFrame, cfg: TopNStreamConfig): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val lateness = cfg.lruSize * cfg.intervalMs
    // group_by_tag_names (topn.proto): rank entities WITHIN each group key
    // per window; a missing column means one global ranking per window
    val hasGroup = points.columns.contains("group_key")
    val groupKeyCol = if (hasGroup) col("group_key") else lit("")
    val bucketed = points
      .withWatermark("ts", s"$lateness milliseconds")
      .select(
        (expr(s"unix_millis(ts) DIV ${cfg.intervalMs}") * cfg.intervalMs)
          .cast("long").as("bucket_ms"),
        groupKeyCol.as("group_key"),
        col("ts"), col("entity"), col("value").cast("long").as("value"))
      .as[BucketedPoint]

    val out = bucketed
      .groupByKey(p => (p.bucket_ms, p.group_key))
      .flatMapGroupsWithState[TopNWindowState, TopNResultRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state) => updateWindow(key, rows, state, cfg, lateness)
      }
      .toDF()
    if (hasGroup) out else out.drop("group_key")
  }

  private def updateWindow(key: (Long, String), rows: Iterator[BucketedPoint],
      state: GroupState[TopNWindowState], cfg: TopNStreamConfig,
      lateness: Long): Iterator[TopNResultRow] = {
    val bucket = key._1
    if (state.hasTimedOut) {
      // final flush, then drop the window (sliding_window.go eviction
      // flush). Bump flush_seq so the final snapshot strictly supersedes
      // the last dirty one instead of duplicating its rows.
      val st = state.get
      val out = snapshot(key, st.copy(flushSeq = st.flushSeq + 1), cfg)
      state.remove()
      return out
    }
    var st = state.getOption.getOrElse(TopNWindowState(Map.empty, 0L))
    // Heap-backed eviction (topn_heap.go): an ordered (value, entity) set
    // beside the counters map makes overflow eviction O(log n) instead of a
    // full map scan per insert. Eviction is SORT-DIRECTION-AWARE: a top-N
    // (desc) evicts the minimum counter, a bottom-N (asc) evicts the
    // MAXIMUM — evicting the minimum there would discard exactly the
    // entities the ranking cares about.
    val counters = scala.collection.mutable.Map.empty[String, Long] ++= st.counters
    val heap = scala.collection.mutable.TreeSet.empty[(Long, String)]
    counters.foreach { case (e, v) => heap += ((v, e)) }
    rows.foreach { p =>
      counters.get(p.entity) match {
        case Some(c) =>
          heap -= ((c, p.entity))
          counters(p.entity) = c + p.value
          heap += ((c + p.value, p.entity))
        case None if counters.size < cfg.countersNumber =>
          counters(p.entity) = p.value
          heap += ((p.value, p.entity))
        case None =>
          val evict = if (cfg.desc) heap.head else heap.last
          heap -= evict
          counters -= evict._2
          counters(p.entity) = p.value
          heap += ((p.value, p.entity))
      }
    }
    st = TopNWindowState(counters.toMap, st.flushSeq + 1)
    state.update(st)
    // window expires `lateness` past its end; keep strictly above watermark
    val expiry = math.max(bucket + cfg.intervalMs + lateness,
      state.getCurrentWatermarkMs() + 1)
    state.setTimeoutTimestamp(expiry)
    snapshot(key, st, cfg)
  }

  /** Current top-n of a window, ranked (value desc|asc, entity asc). */
  private def snapshot(key: (Long, String), st: TopNWindowState,
      cfg: TopNStreamConfig): Iterator[TopNResultRow] = {
    val ordered = st.counters.toSeq.sortBy { case (e, v) =>
      (if (cfg.desc) -v else v, e)
    }.take(cfg.n)
    ordered.iterator.zipWithIndex.map { case ((e, v), i) =>
      TopNResultRow(key._1, key._2, e, v, i + 1L, st.flushSeq)
    }
  }

  /** ST4 sink: append snapshots to the `_top_n_result`-shaped parquet table
    * via the exactly-once file sink. */
  def sinkToResultTable(snapshots: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    snapshots.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .start()

  /** Read-side dedup over appended snapshots: for each bucket keep only the
    * rows of its highest flush_seq — the measure latest-version-wins
    * semantic applied to flushes. Output matches the batch analogue
    * [[graft.engine.Planners.topNBuckets]]: (bucket_ms, entity, value, rank). */
  def latestSnapshot(appended: DataFrame): DataFrame = {
    val hasGroup = appended.columns.contains("group_key")
    val partNames = if (hasGroup) Seq("bucket_ms", "group_key") else Seq("bucket_ms")
    val parts = partNames.map(col)
    val keep = parts ++ Seq(col("entity"), col("value"), col("rank"))
    // partial-aggregated max + equi-join on the bucket key, instead of a
    // max-over-window (which funnels every snapshot of a bucket through
    // one task before filtering). The agg side's keys are re-aliased to
    // fresh attributes — a self-join over a sink view otherwise trips
    // Catalyst's conflicting-reference check.
    val latest = appended.groupBy(parts: _*).agg(max(col("flush_seq")).as("__maxFlush"))
      .select(partNames.map(n => col(n).as(s"__k_$n")) :+ col("__maxFlush"): _*)
    val on = partNames.map(n => col(n) === col(s"__k_$n")).reduce(_ && _) &&
      col("flush_seq") === col("__maxFlush")
    appended.join(latest, on).select(keep: _*)
  }

  /**
   * Replay a bounded source through the streaming job and return the final
   * per-bucket top-n as a batch frame — the conformance harness for ST1–ST5
   * (results must equal the batch pre-compute on the same data).
   */
  def replayToBatch(points: DataFrame, cfg: TopNStreamConfig,
      spark: SparkSession, checkpoint: String): DataFrame = {
    val sinkName = "topn_replay_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // Each shuffle partition of a stateful operator carries a state store
    // (open/commit per batch). The window-key cardinality, not row volume,
    // bounds useful parallelism here; 8 stores keep the replay parallel
    // without paying 32 store commits per batch. A cluster deployment
    // raises this with `spark.sql.shuffle.partitions` as usual.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = topNAggregate(points, cfg).writeStream
        .format("memory").queryName(sinkName)
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    latestSnapshot(spark.table(sinkName))
  }
}
