package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines (north-star
 * extension). Scale design notes per operator:
 *
 * - exact/fingerprint: one hash-partitioned groupBy — the minimum possible
 *   work; AQE handles skew from pathological duplicate clusters.
 * - MinHash/LSH: per-doc signatures are map-only; the only shuffle is the
 *   band-bucket self-join, whose fan-out is bounded by band width, not by
 *   corpus size. Candidate verification re-joins only candidate pairs.
 * - SimHash: map-only signature + 4×16-bit block join (Hamming ≤ 3 ⇒ at
 *   least one of 4 blocks equal) — the standard Manku/Jain/Sarma layout.
 *
 * All hashing uses xxhash64 with fixed literal seeds — deterministic
 * across runs, executors, and Spark versions.
 */
object Dedup {

  /** Exact dedup: group on md5 of the raw text. Returns one row per
    * distinct content hash with the surviving (min) id and the group size. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Word w-shingles of a document, lowercased alnum tokens (distinct set). */
  def shingles(text: Column, w: Int): Column = {
    val toks = filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))
    val n = size(toks)
    // 1-based windows [i, i+w); empty array when fewer than w tokens
    when(n >= w, array_distinct(transform(sequence(lit(1), n - lit(w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w))))))
      .otherwise(array().cast("array<string>"))
  }

  /**
   * MinHash signature: k independent min-hashes over the shingle set.
   * h_i(s) = xxhash64(i, s); signature[i] = min over shingles.
   */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(i, s))))

  /**
   * MinHash + LSH candidate pairs: signature split into `bands` bands of
   * `rowsPerBand` rows; docs sharing any band-hash become candidates; the
   * estimated Jaccard (signature agreement rate) filters final pairs.
   * Returns (id_a, id_b, est_jaccard) with id_a < id_b.
   */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = df.select(col(idCol).as("id"),
        minhashSignature(shingles(col(textCol), w), k).as("sig"))
      .filter(size(col("sig")) === k && !exists(col("sig"), _.isNull))
    // band buckets: (band_idx, hash(band slice)) — the ONLY shuffle key
    val buckets = sigs.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).cast("array<string>"))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = buckets.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = buckets.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    val cand = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").dropDuplicates("id_a", "id_b")
    cand.withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / k)
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** 64-bit SimHash over the token multiset: per bit position, majority
    * vote of token hashes (term-frequency weighted); single pass over the
    * tokens with an array<long> vote accumulator — map-only, no shuffle. */
  def simhash64(text: Column): Column = {
    val toks = filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))
    val hashes = transform(toks, t => xxhash64(t))
    // shift amounts must be literal ints in Spark, so the 64 lanes unroll
    def bitsOf(h: Column): Column = array((0 until 64).map(i =>
      when(shiftright(h, i).bitwiseAND(1L) === 1L, lit(1L)).otherwise(lit(-1L))): _*)
    val votes = aggregate(hashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, bitsOf(h), (a, b) => a + b))
    (0 until 64).map(i =>
      when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist (< 16), via
    * 4-block LSH: equal 16-bit block ⇒ candidate, then exact popcount. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))
    val blocks = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "block").withColumnRenamed("col", "bkey")
    val a = blocks.select(col("block"), col("bkey"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = blocks.select(col("block"), col("bkey"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("block", "bkey")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", call_function("bit_count", col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /**
   * Exact n-gram Jaccard near-dup pairs via an inverted shingle index:
   * explode shingles, self-join on shingle (blocking), count shared
   * shingles per pair, then |A∩B| / (|A|+|B|−|A∩B|). Avoids the O(n²)
   * cross join — cost is Σ (docs per shingle)², bounded by dropping
   * ubiquitous shingles (df > maxDocFreq).
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, threshold: Double = 0.5, maxDocFreq: Int = 1000): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(shingles(col(textCol), w)).as("shingle"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("set_size"))
    val filtered = sh.join(
      sh.groupBy("shingle").agg(count(lit(1)).as("df_"))
        .filter(col("df_") <= maxDocFreq && col("df_") >= 2).select("shingle"),
      Seq("shingle"))
    val pairs = filtered.select(col("shingle"), col("id").as("id_a"))
      .join(filtered.select(col("shingle"), col("id").as("id_b")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    pairs
      .join(broadcast(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("set_size", "size_a")), Seq("id_a"))
      .join(broadcast(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("set_size", "size_b")), Seq("id_b"))
      .withColumn("jaccard_raw", col("inter").cast("double") /
        (col("size_a") + col("size_b") - col("inter")))
      // threshold on the raw value, round only for output
      .filter(col("jaccard_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard_raw"), 6).as("jaccard"))
  }
}
