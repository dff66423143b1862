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

/** One live window snapshot inside the count-based LRU state. */
final case class LruWindow(bucket_ms: Long, counters: Map[String, Long])

/** Count-based mode state for ONE flow key (the group key): the LRU of
  * live window snapshots in recency order (head = least recently used,
  * last = most), the flow's own event-time watermark (max element ts
  * seen), and the monotone flush counter. Size is bounded by
  * `lruSize × countersNumber` entries by construction. */
final case class TopNLruState(windows: Seq[LruWindow], watermark_ms: Long,
    flushSeq: Long)

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
 * Lateness (ST2): the reference bounds live windows by COUNT — an LRU
 * cache of at most `lru_size` window snapshots (sliding_window.go:66-74,
 * 104-124), where an element is late-dropped only when its window's max
 * timestamp is at or before the flow's watermark AND the cache is full
 * AND the window is not cached (isWindowLate, sliding_window.go:236-243);
 * inserting a window into a full cache evicts the least-recently-used one
 * with an eviction flush. `latenessMode = "count"` (default) replicates
 * that exactly: state is keyed by the FLOW identity (the group key — the
 * reference's window operator is one single-threaded component per flow),
 * each state holds the LRU of live windows, and each micro-batch's rows
 * fold in event-time order (the deterministic stand-in for the
 * reference's single-stream arrival order; the watermark is the max
 * element timestamp seen, updated after each element like receive()'s
 * loop). `latenessMode = "time"` keeps the earlier approximation —
 * windows keyed individually with `lru_size × intervalMs` of allowed
 * lateness — which partitions state by (bucket, group) and therefore
 * scales the stateful shuffle over buckets too; equivalent for streams
 * whose event time advances roughly uniformly, divergent under bursty
 * event-time skew (count mode accepts arbitrarily old windows while the
 * cache has room and protects recently-updated ones; time mode uses a
 * fixed horizon).
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
    desc: Boolean = true,
    latenessMode: String = "count") {
  require(intervalMs > 0 && n > 0 && countersNumber > 0 && lruSize > 0,
    "all TopNStreamConfig parameters must be positive")
  require(latenessMode == "count" || latenessMode == "time",
    "latenessMode is 'count' (reference-exact LRU) or 'time' (watermark)")
}

object TopNStream {

  /** Streaming transform: points (ts, entity, value) → appended dirty
    * snapshots of per-bucket top-n. Use with OutputMode/Trigger of the
    * caller's sink; rows are append-only by construction. */
  def topNAggregate(points: DataFrame, cfg: TopNStreamConfig): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    // group_by_tag_names (topn.proto): rank entities WITHIN each group key
    // per window; a missing column means one global ranking per window
    val hasGroup = points.columns.contains("group_key")
    val groupKeyCol = if (hasGroup) col("group_key") else lit("")
    def bucketed(df: DataFrame) = df.select(
        (expr(s"unix_millis(ts) DIV ${cfg.intervalMs}") * cfg.intervalMs)
          .cast("long").as("bucket_ms"),
        groupKeyCol.as("group_key"),
        col("ts"), col("entity"), col("value").cast("long").as("value"))
      .as[BucketedPoint]
    val out =
      if (cfg.latenessMode == "count")
        bucketed(points)
          .groupByKey(_.group_key)
          .flatMapGroupsWithState[TopNLruState, TopNResultRow](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            (key, rows, state) => updateLruGroup(key, rows, state, cfg)
          }
          .toDF()
      else {
        val lateness = cfg.lruSize * cfg.intervalMs
        bucketed(points.withWatermark("ts", s"$lateness milliseconds"))
          .groupByKey(p => (p.bucket_ms, p.group_key))
          .flatMapGroupsWithState[TopNWindowState, TopNResultRow](
            OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
            (key, rows, state) => updateWindow(key, rows, state, cfg, lateness)
          }
          .toDF()
      }
    if (hasGroup) out else out.drop("group_key")
  }

  /** Per-window bounded counters with the sort-direction-aware overflow
    * eviction (topn_heap.go): an ordered (value, entity) set beside the
    * map makes eviction O(log n). */
  private final class WinCounters(init: Map[String, Long], cfg: TopNStreamConfig) {
    private val m = scala.collection.mutable.Map.empty[String, Long] ++= init
    private val heap = scala.collection.mutable.TreeSet.empty[(Long, String)]
    m.foreach { case (e, v) => heap += ((v, e)) }
    def add(entity: String, value: Long): Unit = m.get(entity) match {
      case Some(c) =>
        heap -= ((c, entity)); m(entity) = c + value; heap += ((c + value, entity))
      case None if m.size < cfg.countersNumber =>
        m(entity) = value; heap += ((value, entity))
      case None =>
        val evict = if (cfg.desc) heap.head else heap.last
        heap -= evict; m -= evict._2
        m(entity) = value; heap += ((value, entity))
    }
    def toMap: Map[String, Long] = m.toMap
  }

  /** Count-based ST2: one state per flow key holding the reference's LRU
    * of live window snapshots. Rows fold in event-time order (ties by
    * entity then value) — the deterministic analogue of arrival order;
    * the watermark advances to each element's timestamp AFTER it is
    * processed, exactly like receive()'s loop, so an element is judged
    * against the watermark its predecessors established. */
  private def updateLruGroup(groupKey: String, rows: Iterator[BucketedPoint],
      state: GroupState[TopNLruState],
      cfg: TopNStreamConfig): Iterator[TopNResultRow] = {
    val st = state.getOption.getOrElse(TopNLruState(Nil, Long.MinValue, 0L))
    // recency order: index 0 = LRU, last = MRU (stored that way too)
    val order = scala.collection.mutable.ArrayBuffer.empty[Long]
    val wins = scala.collection.mutable.Map.empty[Long, WinCounters]
    st.windows.foreach { w =>
      order += w.bucket_ms; wins(w.bucket_ms) = new WinCounters(w.counters, cfg)
    }
    var wm = st.watermark_ms
    val touched = scala.collection.mutable.Set.empty[Long]
    val evicted = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[String, Long])]
    val sorted = rows.toArray.sortBy(p => (p.ts.getTime, p.entity, p.value))
    sorted.foreach { p =>
      val bucket = p.bucket_ms
      val windowMaxTs = bucket + cfg.intervalMs - 1
      val present = wins.contains(bucket)
      // isWindowLate (sliding_window.go:236-243): late ⟺ window closed by
      // the watermark AND the cache is full AND the window is not cached
      val late = windowMaxTs <= wm && wins.size >= cfg.lruSize && !present
      if (!late) {
        if (present) { order -= bucket; order += bucket } // LRU touch
        else {
          if (wins.size >= cfg.lruSize) {
            val lru = order.remove(0)
            evicted += ((lru, wins.remove(lru).get.toMap)) // eviction flush
          }
          wins(bucket) = new WinCounters(Map.empty, cfg)
          order += bucket
        }
        wins(bucket).add(p.entity, p.value)
        touched += bucket
      }
      if (p.ts.getTime > wm) wm = p.ts.getTime
    }
    val seq = st.flushSeq + 1
    state.update(TopNLruState(
      order.toSeq.map(b => LruWindow(b, wins(b).toMap)), wm, seq))
    // an evicted-then-readded bucket reports only its LIVE (fresh) content
    // at this seq — the re-created window supersedes the eviction flush,
    // as the reference's latest-flush read semantic would resolve it too
    val evictedOut = evicted.filter { case (b, _) => !wins.contains(b) }
      .flatMap { case (b, c) => snapshotRows(b, groupKey, c, seq, cfg) }
    val liveOut = touched.toSeq.sorted.filter(wins.contains)
      .flatMap(b => snapshotRows(b, groupKey, wins(b).toMap, seq, cfg))
    (evictedOut ++ liveOut).iterator
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
    // Heap-backed eviction (topn_heap.go) via WinCounters. Eviction is
    // SORT-DIRECTION-AWARE: a top-N (desc) evicts the minimum counter, a
    // bottom-N (asc) evicts the MAXIMUM — evicting the minimum there
    // would discard exactly the entities the ranking cares about.
    val counters = new WinCounters(st.counters, cfg)
    rows.foreach(p => counters.add(p.entity, p.value))
    st = TopNWindowState(counters.toMap, st.flushSeq + 1)
    state.update(st)
    // window expires `lateness` past its end; keep strictly above watermark
    val expiry = math.max(bucket + cfg.intervalMs + lateness,
      state.getCurrentWatermarkMs() + 1)
    state.setTimeoutTimestamp(expiry)
    snapshot(key, st, cfg)
  }

  /** Current top-n of a window, ranked (value desc|asc, entity asc). */
  private def snapshotRows(bucket: Long, groupKey: String,
      counters: Map[String, Long], flushSeq: Long,
      cfg: TopNStreamConfig): Seq[TopNResultRow] = {
    val ordered = counters.toSeq.sortBy { case (e, v) =>
      (if (cfg.desc) -v else v, e)
    }.take(cfg.n)
    ordered.zipWithIndex.map { case ((e, v), i) =>
      TopNResultRow(bucket, groupKey, e, v, i + 1L, flushSeq)
    }
  }

  private def snapshot(key: (Long, String), st: TopNWindowState,
      cfg: TopNStreamConfig): Iterator[TopNResultRow] =
    snapshotRows(key._1, key._2, st.counters, st.flushSeq, cfg).iterator

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
