package graft.operators

import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (north-star extension). Two paths:
 *
 * - brute force: broadcast the (small) query set against the corpus —
 *   one map-only pass over the corpus, cosine via the codegen'd native
 *   expression, per-query top-k via window rank. The exact baseline.
 * - LSH (random hyperplanes): bucket corpus and queries by the sign
 *   pattern of `nPlanes` fixed pseudo-random hyperplane projections;
 *   candidates = same bucket (multi-probe = flip one bit). At 100 TB the
 *   corpus is scanned ONCE to write bucketed parquet; queries then touch
 *   only matching buckets — this is the scale path, traded against recall.
 *
 * Hyperplanes are derived from xxhash64(plane, dim) — deterministic,
 * no RNG state, identical on every executor.
 */
object Similarity {

  /** Exact top-k neighbors for each query vector (queries broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = c.join(broadcast(q), col("nbr_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("nbr_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "nbr_id", "rank", "sim")
  }

  /** Sign-pattern LSH bucket id from nPlanes fixed hyperplanes. The plane
    * matrix entries are ±1 derived from xxhash64(plane, dim) — cheap,
    * deterministic, and good enough for cosine LSH (random-projection
    * signs only need zero-mean iid entries). */
  def lshBucket(vecCol: org.apache.spark.sql.Column, dim: Int, nPlanes: Int)
      : org.apache.spark.sql.Column = {
    val bits = (0 until nPlanes).map { p =>
      // projection_p = Σ_d sign(xxhash64(p,d)) * vec[d]
      val proj = aggregate(
        zip_with(vecCol.cast("array<double>"),
          transform(sequence(lit(0), lit(dim - 1)),
            d => when(xxhash64(lit(p), d) >= 0, lit(1.0)).otherwise(lit(-1.0))),
          (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via LSH buckets: candidates share the query's bucket; top-k by
    * exact cosine within candidates. Recall < 1 by design; raise nPlanes
    * for precision, lower for recall. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nPlanes: Int = 12, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"),
      lshBucket(col(vecCol), dim, nPlanes).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      lshBucket(col(vecCol), dim, nPlanes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("nbr_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "nbr_id", "rank", "sim")
  }

  /** Near-duplicate pairs by embedding cosine ≥ threshold, left side
    * restricted by a predicate (blocking) to bound the pair space. */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double,
      leftFilter: org.apache.spark.sql.Column,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = vectors.filter(leftFilter)
      .select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = vectors.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    b.join(broadcast(a), col("id_a") < col("id_b"))
      .withColumn("sim_raw", cosine(col("vec_a"), col("vec_b")))
      // threshold on the raw value, round only for output
      .filter(col("sim_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim_raw"), 6).as("sim"))
  }
}
