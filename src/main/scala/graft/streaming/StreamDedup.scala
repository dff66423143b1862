package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming ingest deduplication — the Structured Streaming counterpart
 * of the batch element dedup (SURVEY §2 T7, stream `element_id`
 * uniqueness: banyandb writes the same element id at most once per
 * series, banyand/stream/write.go elementID routing) and of the
 * pipeline's exact content dedup (q21/q22): a replay-safe ingest stage
 * that drops duplicate elements *as they arrive*, so an at-least-once
 * upstream (broker redelivery, writer retry) still lands each element
 * once.
 *
 * Both transforms use `dropDuplicatesWithinWatermark`, not
 * `dropDuplicates`: per-key dedup state is EVICTED once the key's event
 * time falls behind the watermark, so state is bounded by
 * (arrival rate × delay) instead of growing with the whole history —
 * the only shape that survives an unbounded 100 TB/day ingest. The
 * contract is correspondingly scoped: a duplicate arriving more than
 * `delay` after the first copy is no longer detected (it is dropped by
 * the watermark if late, or re-admitted if its event time moved on) —
 * exactly the reference's per-part dedup scope, where element ids are
 * unique within the live write window, and historical overlap is
 * resolved by the read-side dedup (T7 batch path).
 */
object StreamDedup {

  /** Drop streaming rows whose `idCols` tuple was already seen within the
    * watermark horizon. `eventTimeCol` must be a timestamp column;
    * `delay` is the watermark delay (e.g. "10 minutes"): the redelivery
    * window the dedup state covers. */
  def dedupElements(df: DataFrame, eventTimeCol: String, delay: String,
      idCols: Seq[String]): DataFrame = {
    require(idCols.nonEmpty, "need at least one id column")
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(idCols)
  }

  /** Content-level streaming dedup: canonical-fingerprint each document
    * ([[graft.operators.TextAnalysis.fingerprint]] — lowercase, collapse
    * punctuation, md5) and keep the first arrival per fingerprint within
    * the watermark horizon. The streaming face of the q21/q22 exact
    * dedup: case/punctuation/whitespace near-duplicates collapse at
    * ingest before they reach storage. */
  def dedupByContent(df: DataFrame, eventTimeCol: String, delay: String,
      textCol: String): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark(Seq("__fp"))
      .drop("__fp")
}
