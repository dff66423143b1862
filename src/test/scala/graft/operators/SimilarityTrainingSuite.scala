package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Offline IVF quantizer training ([[Similarity.trainIvfCentroids]]):
 * Lloyd's over DataFrame aggregates must recover cluster structure and
 * improve the cells' recall over the id-prefix placeholder quantizer.
 */
class SimilarityTrainingSuite extends SparkSpec {

  import spark.implicits._

  private val dim = 8

  /** 4 tight clusters around orthogonal axes, 25 vectors each, ids
    * interleaved across clusters (cluster = id % 4). */
  private lazy val clustered = {
    val rows = for (i <- 0 until 100) yield {
      val c = i % 4
      // deterministic small perturbation per vector and dimension
      val v = Array.tabulate(dim) { d =>
        val base = if (d == c * 2) 1.0 else 0.0
        base + 0.05 * (((i * 31 + d * 17) % 7) - 3)
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def nearestAxis(v: Array[Double]): Int =
    (0 until 4).maxBy(c => v(c * 2))

  test("hybridRrfTopK: both-list docs outrank single-list docs at equal rank") {
    val docs = graft.sources.Catalog.load(spark, sf0001, "documents")
    val emb = graft.sources.Catalog.load(spark, sf0001, "embeddings")
    val terms = Seq("spark", "window", "join", "stream")
    val fused = Similarity.hybridRrfTopK(docs, emb, terms,
      queryVecId = 7L, kTop = 20).collect()
    assert(fused.length == 20)
    // ordered by fused score desc, id tiebreak
    val scores = fused.map(_.getLong(3))
    assert(scores.sameElements(scores.sortBy(-_)))
    // RRF arithmetic: every row's score equals its ranks' contributions
    def c(r: Long): Long = if (r == 0L) 0L else math.round(1e9 / (60 + r))
    fused.foreach { row =>
      assert(row.getLong(3) == c(row.getLong(1)) + c(row.getLong(2)))
    }
    // a doc present in both lists must beat a doc with only one, equal
    // rank: holds by construction since contributions are positive
    val both = fused.filter(r => r.getLong(1) > 0 && r.getLong(2) > 0)
    assert(both.nonEmpty, "fixture degenerate: no doc in both lists")
    // determinism: a second evaluation returns identical rows
    val again = Similarity.hybridRrfTopK(docs, emb, terms,
      queryVecId = 7L, kTop = 20).collect()
    assert(fused.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("trainIvfCentroids recovers the 4 cluster axes") {
    val cents = Similarity.trainIvfCentroids(clustered, nlist = 4, iters = 5)
    assert(cents.length == 4)
    // each true cluster axis is claimed by exactly one trained centroid
    val claimed = cents.map(c => nearestAxis(c._2)).toSet
    assert(claimed == Set(0, 1, 2, 3), cents.map(_._2.mkString(",")).mkString(" | "))
    // centroids sit near the cluster mean: dominant coordinate ≈ 1
    cents.foreach { case (_, v) => assert(v(nearestAxis(v) * 2) > 0.7) }
  }

  test("training is deterministic (decimal accumulation)") {
    val a = Similarity.trainIvfCentroids(clustered, nlist = 4, iters = 3)
    val b = Similarity.trainIvfCentroids(clustered, nlist = 4, iters = 3)
    assert(a.map(_._2.toSeq).toSeq == b.map(_._2.toSeq).toSeq)
  }

  test("trained centroids beat the id-prefix quantizer's recall at nprobe=1") {
    val queries = clustered.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(clustered, queries, k = 5)
      .select("query_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(cents: Array[(Long, Array[Double])]): Double = {
      val got = Similarity.ivfTopKWith(clustered, queries, k = 5, cents, nprobe = 1)
        .select("query_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val placeholder = clustered.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val trained = Similarity.trainIvfCentroids(clustered, nlist = 4, iters = 5)
    val (rp, rt) = (recallOf(placeholder), recallOf(trained))
    assert(rt >= rp, s"trained $rt < placeholder $rp")
    assert(rt > 0.9, s"trained recall $rt — clusters should make nprobe=1 near-exact")
  }
}
