package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming NEAR-duplicate detection — the Structured Streaming face of
 * the batch MinHash-LSH pair join (`Dedup.minhashLshPairs`, q24): a
 * crawled-text ingest must suppress re-posts and boilerplate variants
 * *as they arrive*, not in a nightly batch pass. Same sketch family as
 * q24 end to end (fused `shingleHashes` 60-bit keys, `minhashSigLongs`
 * lanes, xxhash64 band buckets), so a document pair that bands together
 * in the batch join bands together here.
 *
 * Shape: one stateful operator keyed by `(band, bucket)` —
 * `flatMapGroupsWithState` with event-time timeout. State per bucket is
 * a bounded list of (id, eventTime, bottom-m shingle sketch); a new
 * arrival verifies against the stored sketches (bottom-m Jaccard — EXACT
 * whenever the union fits in m, an unbiased estimate past it) and emits
 * `(first_id, dup_id, jaccard)` for every match, oriented by arrival
 * (the LATER document is the duplicate — the one an ingest suppresses).
 * The same pair can collide in several bands; the cross-band duplicate
 * emissions collapse downstream with `dropDuplicatesWithinWatermark`.
 *
 * Scale + state bounds (the 100 TB/day contract):
 * - state is EVICTED once an entry's event time falls behind the
 *   watermark — near-dups are detected within the `delay` horizon only,
 *   exactly the `StreamDedup` scope (historical overlap belongs to the
 *   batch pass, q24/q72);
 * - each bucket holds at most `maxPerBucket` entries (a hot boilerplate
 *   bucket stops ACCUMULATING but keeps matching against what it holds —
 *   the df-cap move from the batch posting joins);
 * - the shuffled payload per document is `bands` copies of the bottom-m
 *   sketch (8·m bytes each), bounded regardless of document length. The
 *   batch join ships ids only and fetches shingles in a second pass; a
 *   stream has no second pass, so the sketch rides the band exchange —
 *   that is the price of single-pass arrival-time detection, and m is
 *   the knob.
 *
 * Suppression composes at the sink, where a real ingest applies its
 * verdicts: `suppressedIds` distills the pair stream to the dup ids, and
 * the sink's `foreachBatch` anti-joins them against the document batch
 * (stream-stream anti joins are not a Spark operator; the sink-side
 * merge is the deployment shape). `StreamNearDupSuite` drives both and
 * pins replay ≡ batch parity against `Dedup.minhashLshPairs`.
 */
object StreamNearDup {

  case class BandDoc(id: Long, ts: java.sql.Timestamp, band: Int, bucket: Long,
      sh: Array[Long])
  case class NearPair(first_id: Long, dup_id: Long, ts: java.sql.Timestamp,
      jaccard: Double)
  case class BucketEntry(id: Long, tMs: Long, sh: Array[Long])
  case class BucketState(entries: List[BucketEntry])

  /** Bottom-m Jaccard over two SORTED distinct long arrays: walk the
    * union's m smallest values, count those present in both. Exact when
    * |A ∪ B| ≤ m (every value walked), the standard unbiased bottom-k
    * estimate beyond. */
  private[streaming] def bottomMJaccard(a: Array[Long], b: Array[Long],
      m: Int): Double = {
    var i = 0; var j = 0; var taken = 0; var both = 0
    while (taken < m && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && a(i) < b(j))) i += 1
      else if (i >= a.length || b(j) < a(i)) j += 1
      else { both += 1; i += 1; j += 1 }
      taken += 1
    }
    if (taken == 0) 0.0 else both.toDouble / taken
  }

  /**
   * Candidate-pair stream with in-state verification. Input: a streaming
   * DataFrame with an id column, an event-time timestamp column, and a
   * text column. Output (append mode): `(first_id, dup_id, ts, jaccard)`
   * — `ts` is the duplicate's event time (carried so downstream stateful
   * consumers keep an event-time column).
   *
   * Parameters mirror `Dedup.minhashLshPairs` (w-shingles, bands ×
   * rowsPerBand lanes, verify threshold); `maxSketch` is the bottom-m
   * sketch size.
   *
   * Parity contract: batch equivalence (replay ≡ `minhashLshPairs`) is
   * CONDITIONAL on |shingles(a) ∪ shingles(b)| ≤ maxSketch for every
   * candidate pair — the batch path verifies with EXACT Jaccard over
   * full shingle sets, while the stream verifies with bottom-m Jaccard
   * over `maxSketch`-truncated sketches (an unbiased estimate past the
   * bound, so near-threshold pairs on longer documents can flip either
   * way). Size maxSketch to the corpus: ~`(len/ws) · 1.2` hashes per
   * document of length `len`; the suite pins parity at maxSketch=4096,
   * comfortably above its longest unions. The default 128 trades exact
   * parity for an 8·128-byte bounded shuffle payload per band copy.
   *
   * Multiplicity contract: a pair colliding in several bands emits once
   * per colliding band, always within ONE micro-batch (the duplicate
   * document arrives exactly once, and all its band groups process in
   * that batch) — so a sink-side per-batch `dropDuplicates` is exact,
   * and the anti-join suppression is idempotent under repeats anyway. A
   * chained stateful dedup here would trip Spark's global-watermark
   * correctness check (this operator can emit at the watermark edge).
   */
  def nearDupPairsStream(df: DataFrame, idCol: String, eventTimeCol: String,
      textCol: String, delay: String, w: Int = 3, bands: Int = 32,
      rowsPerBand: Int = 2, threshold: Double = 0.5, maxSketch: Int = 128,
      maxPerBucket: Int = 64): Dataset[NearPair] = {
    val spark = df.sparkSession
    import spark.implicits._
    val k = bands * rowsPerBand
    // shape columns FIRST, declare the watermark on the final `ts`
    // attribute, and never re-derive it below: a cast or alias after
    // withWatermark strips the event-time metadata and the stateful
    // operator then rejects the event-time timeout
    val banded = df
      .select(col(idCol).cast("long").as("id"),
        col(eventTimeCol).cast("timestamp").as("ts"),
        graft.functions.SketchFunctions.shingleHashes(col(textCol), w).as("__shFull"))
      .filter(size(col("__shFull")) > 0)
      .withWatermark("ts", delay)
      // the minhash lanes mix the FULL shingle set (identical lane values
      // to the batch path); only the verification payload is sketched
      .withColumn("sig",
        graft.functions.SketchFunctions.minhashSigLongs(col("__shFull"), k))
      .withColumn("sh", slice(array_sort(col("__shFull")), 1, maxSketch))
      .select(col("id"), col("ts"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))
              .cast("array<string>"))))),
        col("sh"))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .as[BandDoc]

    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    require(maxPerBucket >= 1 && maxSketch >= 1, "positive state bounds")
    val delayIv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    require(delayIv.months == 0, "watermark delay must not use month units")
    val horizonMs = delayIv.days * 86400000L + delayIv.microseconds / 1000L

    banded.groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[BucketState, NearPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          var entries = state.getOption.map(_.entries).getOrElse(Nil)
            .filter(_.tMs >= wm)
          if (!rows.hasNext) {
            // timeout invocation: expired entries are gone; drop the
            // state once nothing inside the horizon remains
            if (entries.isEmpty) state.remove()
            else {
              state.update(BucketState(entries))
              state.setTimeoutTimestamp(
                math.max(entries.map(_.tMs).max + horizonMs, wm + 1))
            }
            Iterator.empty
          } else {
            // deterministic intra-batch order: event time, then id —
            // the "first" document of a same-batch collision is the
            // earliest (ties to the lower id), replay-stable
            val arr = rows.toArray.sortBy(r => (r.ts.getTime, r.id))
            val out = scala.collection.mutable.ListBuffer.empty[NearPair]
            arr.foreach { r =>
              entries.foreach { e =>
                if (e.id != r.id) {
                  val jac = bottomMJaccard(e.sh, r.sh, maxSketch)
                  if (jac >= threshold)
                    out += NearPair(e.id, r.id, r.ts,
                      math.rint(jac * 1e6) / 1e6)
                }
              }
              if (entries.size < maxPerBucket)
                entries = entries :+ BucketEntry(r.id, r.ts.getTime, r.sh)
            }
            state.update(BucketState(entries))
            // clamp above the watermark: a late-only batch could otherwise
            // compute a timeout the engine rejects
            state.setTimeoutTimestamp(
              math.max(entries.map(_.tMs).max + horizonMs, wm + 1))
            out.iterator
          }
      }
  }

  /** The ids an ingest suppresses: every document that near-dup-matched
    * an EARLIER one. Feed a sink's `foreachBatch`, where the per-batch
    * anti-join against the arriving documents applies the verdict (the
    * deployment shape — stream-stream anti joins are not an operator).
    * Deliberately stateless: an id matched by several earlier documents
    * repeats, and an anti-join is idempotent under repeats. */
  def suppressedIds(pairs: Dataset[NearPair]): DataFrame =
    pairs.select(col("dup_id").as("id"), col("ts"))
}
