package graft.operators

import graft.SparkSpec
import graft.sources.Catalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Measured ANN recall (r5 verdict #2): the "recall < 1 by design" claims
 * on [[Similarity.lshTopK]] / [[Similarity.ivfTopKWith]] carry numbers.
 * Structural invariants are asserted exactly; data-dependent levels get
 * floors well under the measured values (sf0.01 table in BASELINE.md:
 * LSH 0.172/0.040/0.020 at nPlanes 4/8/12; IVF trained 0.372/0.542/
 * 0.778/1.000 at nprobe 1/2/4/8).
 */
class AnnRecallSuite extends SparkSpec {

  private val dim = 64
  private val k = 10
  private val nlist = 8

  private lazy val emb = Catalog.load(spark, sf0001, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 50)
  private lazy val truth =
    Similarity.bruteForceTopK(emb, queries, k).localCheckpoint()

  private def meanRecall(approx: DataFrame): Double =
    Similarity.recallAtK(approx, truth)
      .agg(avg(col("recall"))).head().getDouble(0)

  test("IVF recall is monotone in nprobe and exactly 1.0 at nprobe = nlist") {
    // probing more cells only ADDS candidates, so recall@k never drops;
    // probing every cell IS exhaustive search, so recall is exactly 1
    val cents = Similarity.trainIvfCentroids(emb, nlist, iters = 5)
    val sweep = Seq(1, 2, 4, 8).map(np =>
      np -> meanRecall(Similarity.ivfTopKWith(emb, queries, k, cents, np)))
    sweep.sliding(2).foreach { case Seq((npA, rA), (npB, rB)) =>
      assert(rA <= rB + 1e-9, s"recall fell from nprobe=$npA ($rA) to $npB ($rB)")
    }
    assert(sweep.last._2 == 1.0, s"nprobe=nlist must be exact: ${sweep.last._2}")
    // id-prefix placeholder obeys the same closing invariant
    assert(meanRecall(Similarity.ivfTopK(emb, queries, k, nlist, nlist)) == 1.0)
    // stated floor for the production configuration (measured 0.542 at
    // sf0.01; regenerated testdata may move it, hence the margin)
    assert(sweep.find(_._1 == 2).get._2 >= 0.3,
      s"trained-IVF nprobe=2 recall below floor: ${sweep.find(_._1 == 2).get._2}")
  }

  test("trained-IVF cell population: every cell counted, skew bounded") {
    // the 100 TB ANN scale-killer is one inverted list holding a large
    // corpus fraction — every probe touching it serializes. Lloyd's
    // iterations exist to flatten exactly this; assert the trained
    // quantizer keeps the heaviest cell within a small multiple of the
    // mean (the id-prefix placeholder quantizer carries no such bound —
    // it is the oracle-checkable stand-in, not the production path).
    val cents = Similarity.trainIvfCentroids(emb, nlist, iters = 5)
    val ns = Similarity.ivfCellStats(emb, cents).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ns.map(_._2).sum == emb.count(), "assignment must cover the corpus")
    val mean = ns.map(_._2).sum.toDouble / nlist
    val skew = ns.map(_._2).max / mean
    assert(skew <= 3.0,
      s"heaviest trained cell ${ns.map(_._2).max} vs mean $mean " +
        s"(${skew}x) — retrain with higher nlist/iters (the rebalancing knobs)")
  }

  test("LSH recall is monotone nonincreasing in nPlanes (nested buckets)") {
    // plane p's sign matrix is a prefix of plane p+1's, so an nPlanes+1
    // bucket refines an nPlanes bucket: candidates(12) ⊆ candidates(8)
    // ⊆ candidates(4) — recall can only fall as planes are added
    val sweep = Seq(4, 8, 12).map(np =>
      np -> meanRecall(Similarity.lshTopK(emb, queries, k, dim, np)))
    sweep.sliding(2).foreach { case Seq((npA, rA), (npB, rB)) =>
      assert(rA >= rB - 1e-9, s"recall rose from nPlanes=$npA ($rA) to $npB ($rB)")
    }
    // measured 0.172 at nPlanes=4, sf0.01: a floor documents that the
    // operator actually retrieves signal, not just its own bucket noise
    assert(sweep.head._2 >= 0.05, s"nPlanes=4 recall below floor: ${sweep.head._2}")
  }

  test("multi-probe LSH recall dominates single-probe at every nPlanes") {
    // the probe set strictly CONTAINS the query's own bucket, so the
    // candidate set is a superset of lshTopK's at equal nPlanes — recall
    // can only rise; the measured gain (0.172 → 0.466 at nPlanes=4,
    // sf0.01, BASELINE.md) gets a conservative floor on the margin
    for (np <- Seq(4, 8)) {
      val single = meanRecall(Similarity.lshTopK(emb, queries, k, dim, np))
      val multi = meanRecall(Similarity.lshTopKMultiProbe(emb, queries, k, dim, np))
      assert(multi >= single - 1e-9,
        s"multi-probe lost recall at nPlanes=$np: $multi < $single")
      if (np == 4)
        assert(multi >= single + 0.1,
          s"multi-probe gain collapsed at nPlanes=4: $single -> $multi")
    }
  }

  test("q69 shape: trained-IVF recall report per query, floor holds") {
    val q10 = emb.filter(col("vec_id") < 10)
    val cents = Similarity.trainIvfCentroids(emb, nlist, iters = 3)
    val report = Similarity.recallAtK(
      Similarity.ivfTopKWith(emb, q10, k = 5, cents, nprobe = 2),
      Similarity.bruteForceTopK(emb, q10, k = 5))
    val rows = report.collect()
    assert(rows.length == 10)
    assert(rows.forall(r => r.getLong(1) == 5L), "truth must have k=5 per query")
    val mean = rows.map(_.getDouble(3)).sum / rows.length
    assert(mean >= 0.3, s"q69 mean recall below stated floor: $mean")
  }

  test("rerank recall dominates ADC ranking at every (kShort, nprobe) point") {
    // every truth hit the shortlist contains survives an exact rerank
    // (fewer than k candidates can beat it in exact L2), and the ADC
    // top-k is a subset of every kShort ≥ k shortlist — so the reranked
    // recall can never fall below the pure-ADC recall, and is monotone
    // nondecreasing in kShort at fixed nprobe
    val cents = Similarity.trainIvfCentroids(emb, nlist, iters = 3)
    val cb = Similarity.trainPqCodebooks(emb, dim, nBlocks = 8,
      codesPerBlock = 16, iters = 3)
    val truthL2 = Similarity.bruteForceTopKL2(emb, queries, k).localCheckpoint()
    def recallL2(df: DataFrame): Double =
      Similarity.recallAtK(df, truthL2).agg(avg(col("recall"))).head().getDouble(0)
    for (nprobe <- Seq(2, 4)) {
      val adc = recallL2(
        Similarity.ivfAdcTopKWith(emb, queries, k, cents, cb, nprobe, 8, 16))
      val sweep = Seq(20, 50, 100).map(kShort => kShort -> recallL2(
        Similarity.ivfAdcRerankTopK(emb, queries, k, kShort, cents, cb,
          nprobe, 8, 16)))
      sweep.foreach { case (kShort, r) =>
        assert(r >= adc - 1e-9,
          s"rerank (kShort=$kShort, nprobe=$nprobe) recall $r < ADC $adc")
      }
      sweep.sliding(2).foreach { case Seq((kA, rA), (kB, rB)) =>
        assert(rA <= rB + 1e-9,
          s"rerank recall fell from kShort=$kA ($rA) to $kB ($rB)")
      }
    }
  }
}
