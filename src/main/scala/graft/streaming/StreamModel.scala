package graft.streaming

import graft.operators.CorpusStats
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Incremental model maintenance — keep a trained curation model's
 * sufficient statistics fresh as documents stream in, instead of
 * refitting from the full corpus on a schedule. A pre-training data
 * pipeline retrains its filters continuously (the quality classifier's
 * reference slice grows, the crawl side churns); at 100 TB a periodic
 * batch refit re-reads the world, where the incremental plan touches
 * only each micro-batch.
 *
 * Spark-first shape: there is NO custom state machine here. The
 * classifier's sufficient statistics ([[CorpusStats.nbTokenCounts]] —
 * Naive Bayes is trained by COUNTING, the property that made it
 * oracle-checkable in batch) are a declarative `groupBy(tok).agg(sum)`;
 * applying the very same aggregation to a `readStream` frame makes
 * Catalyst plan a stateful streaming aggregation whose running state is
 * exactly the model's count table. The state is vocabulary-bounded
 * (Heap's law saturates it on open-web text), so no watermark/eviction
 * is needed: this is a cumulative model, not a windowed one — the one
 * streaming-aggregation case where unbounded-lifetime keys are the
 * CORRECT contract, and the state size is the model size.
 *
 * Sink contract: run in Update mode and merge each micro-batch's
 * changed rows into the model store by `tok` (foreachBatch upsert) —
 * only touched vocabulary rows ship per batch. Complete mode also
 * works (the table is model-sized) but rewrites the whole vocabulary
 * per batch; the suite uses it to snapshot exactly.
 *
 * Parity contract (tested): for any prefix of the stream, finishing a
 * state snapshot with [[CorpusStats.nbModelFromCounts]] is
 * byte-identical to the batch fit [[CorpusStats.nbQualityModel]] over
 * the same documents — sums are associative/commutative, smoothing and
 * micro-rounding happen only at finish time.
 */
object StreamModel {

  /** Running per-class token counts `(tok, cp, cn)` over a streaming
    * labeled-document frame — the incremental twin of the batch
    * [[CorpusStats.nbTokenCounts]] (it IS the batch plan, on a
    * streaming input). */
  def nbCountsStream(df: DataFrame, textCol: String, pos: Column): DataFrame =
    CorpusStats.nbTokenCounts(df, textCol, pos)

  /** Running class-prior counts `(p_docs, n_docs)` — one global
    * streaming aggregate (two longs of state). Finish to the prior
    * log-odds with [[priorDeltaFromCounts]]. */
  def priorCountsStream(df: DataFrame, pos: Column): DataFrame =
    df.agg(sum(when(pos, 1L).otherwise(0L)).as("p_docs"),
      sum(when(pos, 0L).otherwise(1L)).as("n_docs"))

  /** Finish a prior snapshot to the integer-micros log-odds
    * [[CorpusStats.nbPriorDelta]] computes in batch. */
  def priorDeltaFromCounts(counts: DataFrame): DataFrame =
    counts.select(round(log(col("p_docs").cast("double") /
      col("n_docs").cast("double")) * lit(1e6))
      .cast("long").as("prior_delta_micros"))
}
