package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) column plumbing (north-star extension).
 * Media payloads are opaque `binary` columns travelling next to typed
 * metadata; decode/feature steps run per-partition so one task amortizes
 * decoder init over a whole batch of blobs — the Spark-side contract
 * (schema, partitioning, batch shape) is real, while the actual codec call
 * is STUBBED as a deterministic fake (media libraries are not in this
 * container).
 */
object Multimodal {

  /** Typed media row: payload + metadata. */
  final case class MediaBlob(media_id: Long, kind: String, payload: Array[Byte])
  /** Decoded-media features (fake values derived from the payload). */
  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, payload_md5: String)

  /**
   * STUB decoder =========================================================
   * A real implementation would call an image/audio codec here (e.g.
   * JavaCV / TwelveMonkeys) on `payload`. Deterministic fake: dimensions
   * and frame count are pure functions of the payload size, plus an md5 of
   * the bytes proving the payload itself travelled intact — so tests and
   * the DuckDB oracle verify the plumbing end-to-end.
   */
  private def fakeDecode(b: MediaBlob, md: java.security.MessageDigest): MediaFeatures = {
    val len = b.payload.length
    md.reset()
    val hex = md.digest(b.payload).map("%02x".format(_)).mkString
    MediaFeatures(b.media_id, b.kind, len,
      width = 64 + (len * 31) % 1024,
      height = 64 + (len * 17) % 1024,
      n_frames = if (b.kind == "video") 1 + len % 240 else 1,
      payload_md5 = hex)
  }

  /**
   * Decode/feature-extract over a binary column. `mapPartitions` (not
   * `map`) so decoder init happens once per partition — the Scala analogue
   * of `mapInPandas` batch amortization.
   */
  def decodeFeatures(blobs: Dataset[MediaBlob])(implicit spark: SparkSession)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs.mapPartitions { it =>
      // decoder state initialized once per partition (the point of
      // mapPartitions over map — amortized across the whole batch)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(b => fakeDecode(b, md))
    }
  }

  /** Frame-sampling plan for video blobs: every `stride`-th frame index up
    * to the decoded frame count — the downstream extraction work list. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    features.filter(_.kind == "video").toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select("media_id", "frame_idx")
  }

  /**
   * STUB feature embedding: a real pipeline would run a vision/audio
   * encoder over the decoded media; the deterministic fake derives a
   * 16-dim vector from the payload md5 (byte d of the digest → dimension
   * d), so the downstream ANN stage — schema, partitioning, join shape —
   * runs for real and an external oracle can recompute every value.
   */
  def fakeEmbedding(features: Dataset[MediaFeatures])(
      implicit spark: SparkSession): DataFrame =
    features.toDF().select(col("media_id"),
      transform(sequence(lit(0), lit(15)),
        d => conv(substring(col("payload_md5"), d * 2 + 1, lit(2)), 16, 10)
          .cast("double")).as("emb"))

  /** Build a MediaBlob dataset from any table with a text column, treating
    * the UTF-8 bytes as the opaque payload (the testdata has no real media;
    * the pipeline shape is identical). */
  def blobsFromText(df: DataFrame, idCol: String, textCol: String)(
      implicit spark: SparkSession): Dataset[MediaBlob] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        when(col(idCol) % 3 === 0, lit("image"))
          .when(col(idCol) % 3 === 1, lit("audio")).otherwise(lit("video")).as("kind"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaBlob]
  }

  /** Exact BINARY dedup over the opaque payloads — the byte-identical
    * media counterpart of [[Dedup.exact]]'s text dedup (re-crawled or
    * re-encoded-identically assets): group on md5 of the payload bytes
    * within each media kind, keep the min id as the survivor. Hash
    * groupBy with map-side combine — the payload bytes never shuffle,
    * only their 16-byte digests. */
  def exactBinaryDedup(blobs: Dataset[MediaBlob]): DataFrame =
    blobs.toDF()
      .groupBy(col("kind"), md5(col("payload")).as("payload_md5"))
      .agg(min(col("media_id")).as("keep_id"),
        count(lit(1)).as("dup_count"))
}
