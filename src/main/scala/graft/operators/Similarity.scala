package graft.operators

import graft.functions.TopK.topK
import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (north-star extension). Two paths:
 *
 * - brute force: broadcast the (small) query set against the corpus —
 *   one map-only pass over the corpus, cosine via the codegen'd native
 *   expression, per-query top-k via the bounded BoundedTopKAgg (partial
 *   aggregation keeps ≤ k rows per query per map task — no per-query
 *   single-task window). The exact baseline.
 * - LSH (random hyperplanes): bucket corpus and queries by the sign
 *   pattern of `nPlanes` fixed pseudo-random hyperplane projections;
 *   candidates = same bucket. At 100 TB the corpus is scanned ONCE to
 *   write bucketed parquet; queries then touch only matching buckets —
 *   this is the scale path, traded against recall.
 *
 * Hyperplane entries are ±1 from a fixed LCG over (plane, dim) — resolved
 * to literals at plan-build time, deterministic on every executor, and
 * reproducible in plain SQL by an external oracle (no engine-private
 * hash function in the bucketing).
 */
object Similarity {

  /** rank candidates: group to bounded top-k, then explode back to
    * (query_id, nbr_id, rank, sim) rows. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(topK(k)(col("sim"), col("nbr_id")).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")))
      .select(col("query_id"), col("col.id").as("nbr_id"),
        (col("pos") + 1).cast("int").as("rank"), col("col.sim").as("sim"))

  /** Exact top-k neighbors for each query vector (queries broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = c.join(broadcast(q), col("nbr_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("nbr_vec")), 6))
    rankTopK(scored, k)
  }

  /** ±1 hyperplane entry for (plane, dim) — fixed LCG, engine-portable:
    * sign = +1 iff (1103515245·(p·dim+d+1) + 12345) mod (2³¹−1) < 2³⁰−1. */
  def planeSign(p: Int, d: Int, dim: Int): Double = {
    val h = (1103515245L * (p.toLong * dim + d + 1) + 12345L) % 2147483647L
    if (h < 1073741823L) 1.0 else -1.0
  }

  /** Sign-pattern LSH bucket id from nPlanes fixed hyperplanes: bit p set
    * iff Σ_d vec[d]·sign(p,d) ≥ 0. Backed by the native codegen'd
    * [[graft.functions.LshBucketExpr]] kernel (sign matrix resolved to a
    * flat literal array at plan time, one fused loop per row) — the
    * composed `aggregate`/`zip_with` form evaluates interpreted, nPlanes ×
    * dim lambda calls per row. Bit-identical to [[planeSign]] and to the
    * SQL oracle's recomputation. */
  def lshBucket(vecCol: Column, dim: Int, nPlanes: Int): Column =
    graft.functions.LshFunctions.lshBucket(vecCol, dim, nPlanes)

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
    rankTopK(scored, k)
  }

  /**
   * Multi-probe LSH ANN (Lv et al., "Multi-Probe LSH", VLDB 2007): each
   * query probes its OWN bucket plus the `nPlanes` one-bit-flip
   * neighbors — the buckets a true neighbor most likely landed in when a
   * single hyperplane narrowly separated the pair. Candidates =
   * `nPlanes + 1` buckets per query instead of 1, recovering most of the
   * recall that sign-LSH loses at useful nPlanes (measured on the test
   * embeddings: recall@10 0.172 → 0.466 at nPlanes=4, 0.040 → 0.196 at
   * nPlanes=8, BASELINE.md) for a probe-count, NOT corpus-side, cost.
   *
   * Scale shape identical to [[lshTopK]]: the corpus keeps the SAME
   * single-bucket index (one scan to bucket-partitioned parquet at
   * 100 TB — multi-probe is precisely the trick that boosts recall
   * without re-indexing); only the broadcast-sized query side explodes
   * ×(nPlanes+1), and the probe buckets of one query are pairwise
   * distinct while each corpus vector lives in exactly one bucket, so no
   * candidate pair can repeat — no dedup stage needed before ranking.
   */
  def lshTopKMultiProbe(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int, nPlanes: Int = 12, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"),
      lshBucket(col(vecCol), dim, nPlanes).as("bucket"))
    val probes = (0 until nPlanes)
      .map(p => col("__b0").bitwiseXOR(lit(1L << p))) :+ col("__b0")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      lshBucket(col(vecCol), dim, nPlanes).as("__b0"))
      .select(col("query_id"), col("q_vec"),
        explode(array(probes: _*)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("nbr_vec")), 6))
    rankTopK(scored, k)
  }

  /**
   * IVF (inverted-file) ANN: a coarse quantizer of `nlist` centroids
   * assigns every corpus vector to its nearest cell (argmax cosine, ties
   * to the lower centroid id); a query probes only its `nprobe` nearest
   * cells and ranks the candidates by exact cosine with the bounded
   * top-k aggregate.
   *
   * Scale shape: assignment is MAP-ONLY (the centroid matrix is a plan-time
   * reference object, like the LSH planes) — at 100 TB the corpus is
   * scanned once to write cell-partitioned parquet, and a query reads
   * nprobe/nlist of the data; probing is a broadcast equi-join on the cell
   * id, never a cross join. The `collect()` here resolves the nlist
   * centroid vectors at PLAN-BUILD time (broadcast-sized, like a dimension
   * table) — it is not per-row driver work.
   *
   * Cell scoring runs through the native [[graft.functions.IvfProbeCellsExpr]]
   * kernel: the centroid matrix is one flat double[] and the whole
   * assignment (nlist cosines + nprobe selection) is one fused codegen'd
   * loop per row, instead of an nlist-subtree literal-array expression
   * evaluated per reference — the form that stops scaling past toy nlist.
   *
   * The quantizer here takes the `nlist` lowest-id corpus vectors as
   * centroids — deterministic and recomputable by an external SQL oracle;
   * the production path is [[trainIvfCentroids]] (offline k-means) fed to
   * [[ivfTopKWith]], identical shapes.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 8, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents: Array[(Long, Array[Double])] = corpus.filter(col(idCol) < nlist)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    ivfTopKWith(corpus, queries, k, cents, nprobe, idCol, vecCol)
  }

  /**
   * Offline coarse-quantizer training for [[ivfTopKWith]]: Lloyd's
   * iterations as pure DataFrame aggregates — assignment is the same
   * map-only [[graft.functions.IvfFunctions.probeCells]] kernel the query
   * path uses (nprobe=1 = nearest cell), and the centroid update is `dim`
   * per-dimension means, partial-aggregated (map-side combine, no member
   * collection, no ML library). Each iteration is one job collecting
   * `nlist` rows. Means accumulate via DECIMAL so the trained centroids
   * are bit-identical run-to-run regardless of partition merge order
   * (plain double sums are not). Empty cells keep their previous centroid
   * (the standard k-means dead-cell rule). Train on a sample at 100 TB —
   * the quantizer only needs cluster structure, not the full corpus.
   */
  def trainIvfCentroids(corpus: DataFrame, nlist: Int = 8, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[(Long, Array[Double])] = {
    import graft.functions.IvfFunctions.probeCells
    var cents: Array[(Long, Array[Double])] = corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val dim = cents.head._2.length
    val vecs = corpus.select(col(vecCol).cast("array<double>").as("__v"))
    for (_ <- 1 to iters) {
      val flat = cents.flatMap(_._2)
      val cids = cents.map(_._1)
      val aggs = (0 until dim).map(i =>
        (sum(col("__v")(i).cast("decimal(27,10)")) / count(lit(1)))
          .cast("double").as(s"__d$i"))
      val updated = vecs
        .select(explode(probeCells(col("__v"), flat, cids, dim, 1)).as("__cell"), col("__v"))
        .groupBy("__cell").agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => r.getLong(0) -> Array.tabulate(dim)(i => r.getDouble(1 + i)))
        .toMap
      cents = cents.map { case (cid, old) => (cid, updated.getOrElse(cid, old)) }
    }
    cents
  }

  /** Inverted-list (cell) population under a coarse quantizer: one
    * map-only assignment pass + a cell-keyed count — `(cell, n_vectors)`,
    * nlist rows out. The 100 TB ANN scale-killer is a SKEWED cell (one
    * inverted list holding a large corpus fraction serializes every probe
    * that touches it), and nothing else in the stack measures it; the
    * rebalancing knobs are the training ones — raise `nlist` (smaller
    * cells), more Lloyd iterations, or train on a fresher sample
    * ([[trainIvfCentroids]]). `AnnRecallSuite` asserts a skew bound on
    * the trained quantizer; `RecallTable` prints the distribution per
    * scale factor for BASELINE.md. */
  def ivfCellStats(corpus: DataFrame, cents: Array[(Long, Array[Double])],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.IvfFunctions.probeCells
    val dim = cents.head._2.length
    val flat = cents.flatMap(_._2)
    val cids = cents.map(_._1)
    corpus.select(explode(
        probeCells(col(vecCol).cast("array<double>"), flat, cids, dim, 1))
        .as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n_vectors"))
  }

  /** [[ivfTopK]] with explicit centroids (e.g. [[trainIvfCentroids]]
    * output) — the production path; the id-prefix quantizer above stays
    * for oracle-recomputable tests. */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame, k: Int,
      cents: Array[(Long, Array[Double])], nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nprobe <= cents.length, "nprobe must not exceed the centroid count")
    val dim = cents.head._2.length
    val flat = cents.flatMap(_._2)
    val cids = cents.map(_._1)
    import graft.functions.IvfFunctions.probeCells

    // both sides assign cells via explode(kernel): the Generate node
    // materializes the cell id as an output ATTRIBUTE, so the join-key
    // null filter references the attribute instead of re-inlining the
    // kernel (element_at in a projection got duplicated into the pushed
    // isnotnull predicate — two full scorings per corpus row). The corpus
    // probe list has length 1, so its Generate is row-preserving.
    val lists = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"),
      explode(probeCells(col(vecCol), flat, cids, dim, 1)).as("__cell"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      explode(probeCells(col(vecCol), flat, cids, dim, nprobe)).as("__cell"))
    val scored = lists.join(broadcast(probes), Seq("__cell"))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("nbr_vec")), 6))
    rankTopK(scored, k)
  }

  /**
   * Recall@k of an approximate ANN result against exact ground truth:
   * per query, the fraction of the true top-k the approximate search
   * returned. Both inputs are [[rankTopK]]-shaped (query_id, nbr_id, rank,
   * sim). This is how the "recall < 1 by design" claims on [[lshTopK]] /
   * [[ivfTopKWith]] become MEASURED numbers (BASELINE.md recall tables,
   * r5 verdict #2) instead of design assertions.
   *
   * Scale shape: one equi-join on (query_id, nbr_id) + one aggregate over
   * k·|queries| rows — evaluation-set sized, never corpus sized.
   */
  def recallAtK(approx: DataFrame, truth: DataFrame): DataFrame = {
    val t = truth.select(col("query_id"), col("nbr_id"))
    val a = approx.select(col("query_id"), col("nbr_id"))
      .withColumn("__hit", lit(1L))
    t.join(a, Seq("query_id", "nbr_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_truth"), 6))
  }

  /**
   * Near-duplicate pairs at corpus scale: bucket every vector by its LSH
   * sign pattern, then self-join WITHIN buckets only — a shuffled equi-join
   * on the bucket key, never an all-pairs product. Pair space shrinks from
   * O(n²) to Σ_b |bucket_b|²; recall < 1 by design (pairs split across
   * buckets are missed — raise recall by lowering nPlanes). This is the
   * 100 TB form of [[cosineNearDupPairs]], whose broadcast nested loop is
   * only for a small blocked slice.
   */
  def cosineNearDupPairsLsh(vectors: DataFrame, threshold: Double, dim: Int,
      nPlanes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = vectors.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), dim, nPlanes).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim_raw", cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim_raw"), 6).as("sim"))
  }

  /**
   * SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
   * Data-efficient learning at web-scale through semantic deduplication"):
   * partition the embedding space into clusters, compare pairs only WITHIN
   * a cluster, and drop every vector that has a lower-id neighbor with
   * cosine ≥ `threshold` in its cluster. Survivors are exactly the
   * per-neighborhood minimum ids — a pure function of the data (the paper
   * keeps a random representative; the min-id rule makes the survivor set
   * deterministic, hence oracle-checkable). Like SemDeDup itself, pairs
   * split across clusters are missed by design — that locality is what
   * removes the O(n²) term.
   *
   * This variant clusters by LSH sign bucket (deterministic, engine-
   * recomputable). Scale shape: map-only bucketing, pair space
   * Σ_b |bucket_b|² via the shuffled equi-join of
   * [[cosineNearDupPairsLsh]], then one id-only anti-join.
   */
  def semDedupSurvivors(vectors: DataFrame, threshold: Double, dim: Int,
      nPlanes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = vectors.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), dim, nPlanes).as("cluster"))
    // ONE anti-join with the near-dup predicate IN the join condition:
    // survivor = no lower-id same-cluster neighbor at >= threshold. The
    // anti (like EXISTS) short-circuits per probe row at its FIRST
    // qualifying neighbor — a dense cluster of k near-identical vectors
    // costs O(k) probe checks, not the O(k²) pair materialization of
    // dropping via the full [[cosineNearDupPairsLsh]] pair list
    // (measured 27× the mark-join oracle at sf5 before this rewrite).
    val a = bucketed.select(col("cluster").as("__ca"), col(idCol).as("__ia"),
      col(vecCol).as("__va"))
    bucketed.join(a,
      col("__ca") === col("cluster") && col("__ia") < col(idCol) &&
        cosine(col("__va"), col(vecCol)) >= threshold,
      "left_anti")
      .select(col(idCol), col("cluster"))
  }

  /**
   * [[semDedupSurvivors]] over a TRAINED coarse quantizer (k-means cells,
   * e.g. [[trainIvfCentroids]] output) — the production SemDeDup shape:
   * semantically coherent clusters instead of random hyperplane buckets,
   * so near-duplicates co-locate by meaning rather than by chance sign
   * agreement. Same drop rule; deterministic given the centroids, but not
   * SQL-recomputable (iterative training), so its evidence is the suite's
   * invariant tests, like the trained-IVF path.
   */
  def semDedupSurvivorsWith(vectors: DataFrame, threshold: Double,
      cents: Array[(Long, Array[Double])],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = cents.head._2.length
    val flat = cents.flatMap(_._2)
    val cids = cents.map(_._1)
    import graft.functions.IvfFunctions.probeCells
    val celled = vectors.select(col(idCol), col(vecCol),
      explode(probeCells(col(vecCol), flat, cids, dim, 1)).as("cluster"))
    // same short-circuiting anti-join shape as [[semDedupSurvivors]]
    val a = celled.select(col("cluster").as("__ca"), col(idCol).as("__ia"),
      col(vecCol).as("__va"))
    celled.join(a,
      col("__ca") === col("cluster") && col("__ia") < col(idCol) &&
        cosine(col("__va"), col(vecCol)) >= threshold,
      "left_anti")
      .select(col(idCol), col("cluster"))
  }

  /**
   * Exact squared-L2 top-k (ascending) — the ground-truth metric for the
   * product-quantization paths below (PQ approximates L2, not cosine).
   * Same broadcast-queries + bounded top-k shape as [[bruteForceTopK]];
   * distances are integer micros from the native [[graft.functions
   * .L2SqMicrosExpr]] kernel (dimension-ascending accumulation, one
   * rounding), so ranking ties are engine-exact.
   */
  def bruteForceTopKL2(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.PqFunctions.l2sqMicros
    val c = corpus.select(col(idCol).as("nbr_id"),
      col(vecCol).cast("array<double>").as("nbr_vec"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val scored = c.join(broadcast(q), col("nbr_id") =!= col("query_id"))
      .withColumn("dist_micros", l2sqMicros(col("q_vec"), col("nbr_vec")))
    rankTopKAsc(scored, k)
  }

  /** ascending-distance variant of [[rankTopK]]: rank by (dist_micros asc,
    * nbr_id asc) through the same bounded top-k aggregate. The aggregate
    * compares doubles, which hold integers exactly only up to 2^53 —
    * ADC micros (~1e9) are far inside that, but arbitrary-magnitude L2
    * callers ([[bruteForceTopKL2]], the rerank paths) could exceed it
    * with vector components around 1e4–1e5 at dim 64, silently misranking
    * near-ties. The in-plan guard turns that case into a loud error (one
    * branch per row — noise next to the distance kernel). */
  private def rankTopKAsc(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("__exact", assert_true(
        col("dist_micros") < lit(1L << 53),
        lit("dist_micros exceeds 2^53: double ranking would lose precision")))
      .filter(col("__exact").isNull)
      .groupBy(col("query_id"))
      .agg(topK(k)((-col("dist_micros")).cast("double"), col("nbr_id")).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")))
      .select(col("query_id"), col("col.id").as("nbr_id"),
        (col("pos") + 1).cast("int").as("rank"),
        (-col("col.sim")).cast("long").as("dist_micros"))

  /** Flat codebook from the `codesPerBlock` LOWEST-ID corpus vectors
    * (code c of block b = that vector's b-th subvector) — deterministic
    * and SQL-recomputable, the PQ analogue of [[ivfTopK]]'s id-prefix
    * quantizer. The production path is [[trainPqCodebooks]]. */
  def pqCodebookFromPrefix(corpus: DataFrame, dim: Int, nBlocks: Int,
      codesPerBlock: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Double] = {
    require(dim % nBlocks == 0, "dim must divide into nBlocks")
    val sub = dim / nBlocks
    val rows = corpus.orderBy(col(idCol)).limit(codesPerBlock)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(rows.length == codesPerBlock,
      s"corpus has fewer than $codesPerBlock vectors")
    val cb = new Array[Double](nBlocks * codesPerBlock * sub)
    for (b <- 0 until nBlocks; c <- 0 until codesPerBlock; i <- 0 until sub)
      cb((b * codesPerBlock + c) * sub + i) = rows(c)(b * sub + i)
    cb
  }

  /**
   * Product-quantization ANN (Jégou et al. 2011): corpus vectors compress
   * to `nBlocks` codes via the codegen'd [[graft.functions.PqEncodeExpr]]
   * kernel; queries rank candidates by asymmetric distance (ADC — exact
   * query subvector against the candidate's reconstructed codeword),
   * integer micros per the kernel's block-rounded contract.
   *
   * Scale shape: encode is MAP-ONLY over the corpus (the codebook is a
   * plan-time reference object, like the LSH planes and IVF centroids) —
   * at 100 TB the corpus is scanned once to write the code table, 32×
   * smaller than the raw vectors, and every later query touches only
   * codes; ADC is a broadcast join against the query set with the bounded
   * top-k aggregate. Compose with IVF cells to prune WHICH codes a query
   * reads (IVFADC) — the cell join is [[ivfTopKWith]]'s.
   *
   * This overload uses the id-prefix codebook (oracle-recomputable);
   * recall of the TRAINED path is measured against [[bruteForceTopKL2]]
   * (BASELINE.md recall tables, like LSH/IVF).
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nBlocks: Int = 8, codesPerBlock: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqTopKWith(corpus, queries, k,
      pqCodebookFromPrefix(corpus, dim, nBlocks, codesPerBlock, idCol, vecCol),
      nBlocks, codesPerBlock, idCol, vecCol)

  /** [[pqTopK]] with an explicit flat codebook (e.g. [[trainPqCodebooks]]
    * output) — the production path. */
  def pqTopKWith(corpus: DataFrame, queries: DataFrame, k: Int,
      cb: Array[Double], nBlocks: Int, codesPerBlock: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.PqFunctions.{pqAdcMicros, pqEncode}
    val c = corpus.select(col(idCol).as("nbr_id"),
      pqEncode(col(vecCol).cast("array<double>"), cb, nBlocks, codesPerBlock)
        .as("__codes"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val scored = c.join(broadcast(q), col("nbr_id") =!= col("query_id"))
      .withColumn("dist_micros",
        pqAdcMicros(col("__codes"), col("q_vec"), cb, nBlocks, codesPerBlock))
    rankTopKAsc(scored, k)
  }

  /**
   * Offline per-block k-means codebook training (the PQ index build):
   * one [[graft.functions.PqEncodeExpr]] assignment pass trains ALL
   * blocks simultaneously — posexplode of the code array yields
   * (block, code, subvector) and the centroid update is `sub` per-block
   * per-dimension means, partial-aggregated with DECIMAL accumulation
   * (bit-identical run-to-run under any partition merge order, like
   * [[trainIvfCentroids]]). Each iteration collects
   * `nBlocks · codesPerBlock` rows — codebook-sized, never corpus-sized.
   * Empty codes keep their previous codeword (dead-cell rule). Train on
   * a sample at 100 TB; the codebook only needs subspace structure.
   */
  def trainPqCodebooks(corpus: DataFrame, dim: Int, nBlocks: Int = 8,
      codesPerBlock: Int = 16, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Double] = {
    import graft.functions.PqFunctions.pqEncode
    require(dim % nBlocks == 0, "dim must divide into nBlocks")
    val sub = dim / nBlocks
    var cb = pqCodebookFromPrefix(corpus, dim, nBlocks, codesPerBlock, idCol, vecCol)
    val vecs = corpus.select(col(vecCol).cast("array<double>").as("__v"))
    for (_ <- 1 to iters) {
      val assigned = vecs.select(col("__v"),
        posexplode(pqEncode(col("__v"), cb, nBlocks, codesPerBlock)))
        .withColumnRenamed("pos", "__b").withColumnRenamed("col", "__c")
      val aggs = (0 until sub).map(i =>
        (sum(element_at(col("__v"), col("__b") * sub + i + 1)
          .cast("decimal(27,10)")) / count(lit(1)))
          .cast("double").as(s"__d$i"))
      val updated = assigned.groupBy("__b", "__c")
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1).toInt) ->
          Array.tabulate(sub)(i => r.getDouble(2 + i)))
        .toMap
      val next = cb.clone()
      for (b <- 0 until nBlocks; c <- 0 until codesPerBlock)
        updated.get((b, c)).foreach { cw =>
          var i = 0
          while (i < sub) { next((b * codesPerBlock + c) * sub + i) = cw(i); i += 1 }
        }
      cb = next
    }
    cb
  }

  /**
   * IVFADC (Jégou et al. 2011 §IV): the production composition of the two
   * ANN quantizers — the IVF coarse quantizer prunes WHICH inverted list
   * a query reads (nprobe/nlist of the corpus), and within those lists
   * candidates rank by PQ asymmetric distance over 8-byte codes instead
   * of raw vectors. At 100 TB the index is cell-partitioned parquet of
   * (id, codes) — 32× smaller than the embeddings — and a query touches
   * nprobe cells of it; the raw-vector rerank of the returned k, if
   * wanted, is a k-row point lookup.
   *
   * Scale shape: both assignments are map-only codegen'd kernels over
   * plan-time reference objects; the probe join is a broadcast equi-join
   * on the cell id; ranking is the bounded top-k aggregate. One corpus
   * scan builds the index, never an all-pairs product.
   *
   * This overload derives both quantizers from the id-prefix rule
   * (oracle-recomputable); [[ivfAdcTopKWith]] takes trained ones.
   */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nlist: Int = 8, nprobe: Int = 2, nBlocks: Int = 8,
      codesPerBlock: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents: Array[(Long, Array[Double])] = corpus.filter(col(idCol) < nlist)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    ivfAdcTopKWith(corpus, queries, k, cents,
      pqCodebookFromPrefix(corpus, dim, nBlocks, codesPerBlock, idCol, vecCol),
      nprobe, nBlocks, codesPerBlock, idCol, vecCol)
  }

  /** [[ivfAdcTopK]] with explicit trained quantizers — the production
    * path ([[trainIvfCentroids]] cells + [[trainPqCodebooks]] codes). */
  def ivfAdcTopKWith(corpus: DataFrame, queries: DataFrame, k: Int,
      cents: Array[(Long, Array[Double])], cb: Array[Double], nprobe: Int,
      nBlocks: Int, codesPerBlock: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nprobe <= cents.length, "nprobe must not exceed the centroid count")
    import graft.functions.IvfFunctions.probeCells
    import graft.functions.PqFunctions.{pqAdcMicros, pqEncode}
    val dim = cents.head._2.length
    val flat = cents.flatMap(_._2)
    val cids = cents.map(_._1)
    // the inverted list rows: cell id + PQ codes (the whole stored index)
    val lists = corpus.select(col(idCol).as("nbr_id"),
      pqEncode(col(vecCol).cast("array<double>"), cb, nBlocks, codesPerBlock)
        .as("__codes"),
      explode(probeCells(col(vecCol), flat, cids, dim, 1)).as("__cell"))
    val probes = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"),
      explode(probeCells(col(vecCol), flat, cids, dim, nprobe)).as("__cell"))
    val scored = lists.join(broadcast(probes), Seq("__cell"))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("dist_micros",
        pqAdcMicros(col("__codes"), col("q_vec"), cb, nBlocks, codesPerBlock))
    rankTopKAsc(scored, k)
  }

  /**
   * IVFADC shortlist → EXACT rerank: the full production retrieval stack
   * (Jégou et al. 2011 §V) — the compressed index nominates `kShort`
   * candidates per query, then their RAW vectors are fetched and the
   * final `k` rank by exact squared L2. Every true top-k neighbor the
   * shortlist contains survives the exact rerank (fewer than k items can
   * beat it), so recall@k here is exactly the shortlist's recall — the
   * rerank converts candidate recall into result precision.
   *
   * Scale shape: the rerank's vector fetch BROADCASTS the shortlist
   * (|queries|·kShort id rows) against one corpus scan — a map-side
   * semi-join point lookup, never a shuffle of the corpus; everything
   * upstream is [[ivfAdcTopKWith]]'s cell-pruned code scan.
   */
  def ivfAdcRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      kShort: Int, cents: Array[(Long, Array[Double])], cb: Array[Double],
      nprobe: Int, nBlocks: Int, codesPerBlock: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(kShort >= k, "the shortlist must be at least the final k")
    import graft.functions.PqFunctions.l2sqMicros
    val shortlist = ivfAdcTopKWith(corpus, queries, kShort, cents, cb,
      nprobe, nBlocks, codesPerBlock, idCol, vecCol)
      .select(col("query_id"), col("nbr_id"))
    val scored = corpus
      .select(col(idCol).as("nbr_id"),
        col(vecCol).cast("array<double>").as("nbr_vec"))
      .join(broadcast(shortlist), Seq("nbr_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("q_vec"))), Seq("query_id"))
      .withColumn("dist_micros", l2sqMicros(col("q_vec"), col("nbr_vec")))
    rankTopKAsc(scored, k)
  }

  /** Near-duplicate pairs by embedding cosine ≥ threshold, left side
    * restricted by a predicate (blocking) to bound the pair space. */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double,
      leftFilter: Column,
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

  /**
   * Hybrid lexical+semantic retrieval by reciprocal-rank fusion
   * (Cormack et al. 2009): fuse the BM25 top-`poolSize` for
   * `queryTerms` with the exact cosine top-`poolSize` around the
   * `queryVecId` embedding, score = Σ 1/(kRrf + rank) over the lists
   * that contain the doc, and return the top `kTop` fused results.
   * The standard first-stage retriever of a RAG/search stack, composed
   * from the engine's own ranked primitives.
   *
   * Scale shape: candidate generation is the corpus-touching part and
   * reuses [[graft.operators.CorpusStats.bm25TopK]] (partial-aggregated
   * scoring, TakeOrdered cut) and [[bruteForceTopK]] (broadcast query,
   * bounded top-k aggregate). Fusion then runs on two ≤`poolSize`-row
   * lists — the full-outer join and final cut are dimension-sized no
   * matter the corpus. The one single-partition window ranks the
   * ≤`poolSize`-row lexical list, never the corpus.
   *
   * Determinism: ranks tiebreak by id; RRF contributions are
   * `round(1e9/(kRrf+rank))` nanos summed as integers, so the fused
   * score is an exact int64 in any engine. Absent ranks report 0.
   *
   * @return (doc_id, lex_rank, sem_rank, rrf_nanos), top kTop by
   *         (rrf_nanos desc, doc_id)
   */
  def hybridRrfTopK(docs: DataFrame, embeddings: DataFrame,
      queryTerms: Seq[String], queryVecId: Long, kTop: Int,
      poolSize: Int = 100, kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = CorpusStats.bm25TopK(docs, "doc_id", "text", queryTerms, poolSize)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("score_micros").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id").as("id"), col("lex_rank"))
    val sem = bruteForceTopK(embeddings,
        embeddings.filter(col("vec_id") === queryVecId), poolSize)
      .select(col("nbr_id").as("id"), col("rank").cast("long").as("sem_rank"))
    def contrib(rank: Column): Column =
      coalesce(round(lit(1e9) / (lit(kRrf) + rank)).cast("long"), lit(0L))
    lex.join(sem, Seq("id"), "full")
      .withColumn("rrf_nanos", contrib(col("lex_rank")) + contrib(col("sem_rank")))
      .select(col("id").as("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0L)).as("sem_rank"),
        col("rrf_nanos"))
      .orderBy(col("rrf_nanos").desc, col("doc_id"))
      .limit(kTop)
  }
}
