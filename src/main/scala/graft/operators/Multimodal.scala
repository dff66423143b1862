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

  /** [[blobsFromText]] plus deterministic "re-encoded" variants of every
    * `everyK`-th asset — the payload with a 2-byte encoder tail appended
    * (id offset 3 000 000 000, divisible by 3 so the kind assignment is
    * preserved). The test adapter for [[perceptualNearDupPairs]]: these
    * byte-perturbed twins are exactly what [[exactBinaryDedup]] MISSES
    * (different digests) and a perceptual signature must catch. */
  def blobsWithReencodes(df: DataFrame, idCol: String, textCol: String,
      everyK: Int = 5)(implicit spark: SparkSession): Dataset[MediaBlob] = {
    import spark.implicits._
    val variants = df.filter(col(idCol) % everyK === 0)
      .withColumn(textCol, concat(col(textCol), lit(" .")))
      .withColumn(idCol, col(idCol) + lit(3000000000L))
    blobsFromText(df.select(col(idCol).cast("long"), col(textCol))
      .unionByName(variants.select(col(idCol).cast("long"), col(textCol))),
      idCol, textCol)
  }

  /**
   * Perceptual signature per asset: 60-bit SimHash over the byte-4-gram
   * stream of the payload ([[graft.functions.SketchImpl
   * .byteGramSimhash60]]) — position-independent, so trims/appends/
   * localized re-encode artifacts move only the grams they touch and
   * near-identical payloads land within a few Hamming bits (a fixed-grid
   * chunk hash fails this: ANY length change shifts every bucket
   * boundary). STUB BOUNDARY: a real deployment computes this same
   * signature over the DECODED byte grid (luma plane / PCM frames) so
   * codec-level re-encodes converge too; in this container the kernel
   * runs on the payload bytes and the downstream plumbing — banded join,
   * popcount verify — is identical and real.
   */
  def perceptualSignature(blobs: Dataset[MediaBlob]): DataFrame =
    blobs.toDF().select(col("media_id"), col("kind"),
      graft.functions.SketchFunctions.byteGramSimhash60(col("payload"), 4)
        .as("sig"))

  /** The ONE materialized pass over the decoded assets every perceptual
    * consumer shares: `(media_id, kind, byte_len, sig)`. Signature AND
    * fidelity metadata come out of a single payload scan, barriered so
    * q116's cluster side never re-decodes or re-signs the corpus (the
    * r12 sf5 profile: the unshared second pass was 2/3 of q116's wall). */
  private def sigMeta(blobs: Dataset[MediaBlob]): DataFrame =
    graft.operators.Dedup.barrier(blobs.toDF().select(
      col("media_id"), col("kind"),
      length(col("payload")).cast("long").as("byte_len"),
      graft.functions.SketchFunctions.byteGramSimhash60(col("payload"), 4)
        .as("sig")))

  /**
   * Perceptual NEAR-dup pairs over media payloads — the non-exact
   * counterpart of [[exactBinaryDedup]] (re-encoded / trimmed assets):
   * pairs of same-kind assets whose perceptual signatures are within
   * `maxDist` Hamming bits, with EXACT recall by block-subset banding
   * (the Manku/Jain/Sarma simhash-dedup table scheme, WWW'07): the
   * 60-bit signature splits into 6 blocks of 10 bits, and every
   * `6 − maxDist`-subset of blocks becomes one bucket table (keys are
   * the concatenated intact blocks). ≤ maxDist flips touch at most
   * maxDist blocks, so some subset of `6 − maxDist` blocks survives
   * untouched — by pigeonhole the bucket tables are a COMPLETE candidate
   * set. Versus the r11 `maxDist + 1` single-block bands (15-bit keys at
   * maxDist=3), the 30-bit subset keys shrink birthday-collision noise
   * by ~2^15: random-pair candidates grow as n²/2^keybits per table, and
   * at sf5 that term had become the candidate majority. Singleton
   * buckets are pruned before the self-join and candidates verify by
   * popcount — payload bytes never shuffle, only 8-byte signatures.
   */
  def perceptualNearDupPairs(blobs: Dataset[MediaBlob], maxDist: Int = 3)
      : DataFrame =
    pairsFromSigs(sigMeta(blobs), maxDist)

  private def pairsFromSigs(sigs: DataFrame, maxDist: Int): DataFrame = {
    val m = 6
    require(maxDist >= 1 && maxDist < m, s"maxDist in [1, ${m - 1}], got $maxDist")
    val bits = 60 / m
    val mask = (1L << bits) - 1L
    val keep = m - maxDist
    val tables = (0 until m).combinations(keep).toArray.zipWithIndex
      .map { case (sub, ti) =>
        val key = sub.foldLeft(lit(0L): org.apache.spark.sql.Column) { (acc, b) =>
          shiftleft(acc, bits)
            .bitwiseOR(shiftright(col("sig"), b * bits).bitwiseAND(mask))
        }
        struct(lit(ti).as("block"), key.as("bkey"))
      }
    val blocks = sigs.select(col("media_id"), col("kind"),
        explode(array(tables.toIndexedSeq: _*)).as("__t"))
      .select(col("media_id"), col("kind"),
        col("__t.block").as("block"), col("__t.bkey").as("bkey"))
    val hot = blocks.groupBy("kind", "block", "bkey")
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .select("kind", "block", "bkey")
    val pruned = blocks.join(hot, Seq("kind", "block", "bkey"))
    val cand = pruned.select(col("kind"), col("block"), col("bkey"),
        col("media_id").as("id_a"))
      .join(pruned.select(col("kind"), col("block"), col("bkey"),
        col("media_id").as("id_b")), Seq("kind", "block", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("kind", "id_a", "id_b").dropDuplicates("kind", "id_a", "id_b")
    cand
      .join(sigs.select(col("media_id").as("id_a"), col("sig").as("__sig_a")),
        Seq("id_a"))
      .join(sigs.select(col("media_id").as("id_b"), col("sig").as("__sig_b")),
        Seq("id_b"))
      .withColumn("hamming",
        call_function("bit_count", col("__sig_a").bitwiseXOR(col("__sig_b"))))
      .filter(col("hamming") <= maxDist)
      .select("kind", "id_a", "id_b", "hamming")
  }

  /** Media dedup SURVIVORS — the keep-list the near-dup pairs exist to
    * produce: connected components over [[perceptualNearDupPairs]]'s
    * same-kind pair graph ([[Dedup.dedupClusters]] label propagation),
    * then per cluster keep the HIGHEST-FIDELITY copy (largest payload;
    * ties → smallest id — among re-encodes of one asset you keep the
    * least-compressed master, the media analogue of q72's longest-text
    * rule). Unclustered assets pass through with a null cluster_id. Only
    * (id, kind, byte_len) metadata flows through the clustering — the
    * payload bytes never shuffle. @return (media_id, kind, byte_len,
    * cluster_id) — survivors + singletons */
  def perceptualDedupSurvivors(blobs: Dataset[MediaBlob], maxDist: Int = 3)
      : DataFrame = {
    // one decoded pass feeds BOTH the fidelity metadata and the pair
    // graph — re-deriving them separately re-signed the whole corpus
    val sm = sigMeta(blobs)
    val meta = sm.select("media_id", "kind", "byte_len")
    val pairs = pairsFromSigs(sm, maxDist).select("id_a", "id_b")
    graft.operators.Dedup.clusterSurvivors(meta, pairs, "media_id", "byte_len")
  }
}
