package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Corpus-level statistical operators ([[CorpusStats]]) and SemDeDup
 * ([[Similarity.semDedupSurvivors]]): hand-computable micro-corpora pin
 * the model math (smoothed log-probs, Okapi weighting, df counting) and
 * the survivor rule, independent of the DuckDB oracle.
 */
class CorpusStatsSuite extends SparkSpec {

  import spark.implicits._

  // 4-doc corpus with a fully hand-countable vocabulary
  private lazy val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the cat ran"),
    (3L, "the dog sat on the mat"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("unigramLogProb: add-one smoothed micros match a hand computation") {
    val out = CorpusStats.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // corpus: the×4 cat×2 sat×2 ran dog on mat  → N=12, V=7
    val n = 12.0 + 7.0
    def lp(c: Long): Long = math.round(math.log((c + 1) / n) * 1e6)
    assert(out(1L) == ((3L, lp(4) + lp(2) + lp(2))))
    assert(out(2L) == ((3L, lp(4) + lp(2) + lp(1))))
    assert(out(3L) == ((6L, 2 * lp(4) + lp(1) + lp(2) + lp(1) + lp(1))))
    // zero-token docs carry no score
    assert(!out.contains(4L))
  }

  test("unigram: scoring against a materialized model is byte-identical to the inline path") {
    // the deployment shape: build the model once, round-trip it through
    // parquet (as SparkEntry's ensureUnigramModel does), score with it
    val dir = java.nio.file.Files.createTempDirectory("unigramlm").toString
    CorpusStats.unigramModel(docs, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val model = spark.read.parquet(dir)
    val inline = CorpusStats.unigramLogProb(docs, "doc_id", "text")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val withModel = CorpusStats.unigramLogProbWith(docs, "doc_id", "text", model)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(inline.toSeq == withModel.toSeq)
    val tiersInline = CorpusStats.perplexityTiers(corpus, "doc_id", "text",
      samplePpm = 1000000L).collect().map(_.toSeq).sortBy(_.head.toString)
    val dir2 = java.nio.file.Files.createTempDirectory("unigramlm2").toString
    CorpusStats.unigramModel(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(dir2)
    val tiersWith = CorpusStats.perplexityTiersWith(corpus, "doc_id", "text",
      spark.read.parquet(dir2), samplePpm = 1000000L)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(tiersInline.toSeq == tiersWith.toSeq)
  }

  test("bm25TopK: ranks the doc with more query-term mass first, exact micros") {
    val out = CorpusStats.bm25TopK(docs, "doc_id", "text",
      terms = Seq("cat", "dog"), kTop = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // docs 1,2 contain cat (df=2); doc 3 contains dog (df=1, higher idf)
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L))
    val n = 4.0; val sumdl = 12.0; val avgdl = sumdl / 4.0
    def score(df: Int, dl: Int): Long = {
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val tfTerm = 1.0 * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
      math.round(idf * tfTerm * 1e6)
    }
    val byId = out.toMap
    assert(byId(1L) == score(2, 3))
    assert(byId(2L) == score(2, 3))
    assert(byId(3L) == score(1, 6))
    // dog's rarity (idf) outweighs doc 3's length penalty here
    assert(out.head._1 == 3L, out.mkString(","))
  }

  test("bm25TopK: kTop caps and ties break by id ascending") {
    val out = CorpusStats.bm25TopK(docs, "doc_id", "text",
      terms = Seq("cat"), kTop = 1).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L) // docs 1,2 tie on score; min id wins
  }

  test("ngramDocFreq counts distinct-per-document grams with gram tiebreak") {
    val out = CorpusStats.ngramDocFreq(
      Seq("a b c a b c", "a b c").toDF("text"), "text", w = 3, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // doc1 grams: {a b c, b c a, c a b} (a-b-c appears twice but counts once)
    assert(out.toMap == Map("a b c" -> 2L, "b c a" -> 1L, "c a b" -> 1L))
    assert(out.head == (("a b c", 2L)))
    // remaining tie on 1 breaks by gram ascending
    assert(out.map(_._1).toSeq == Seq("a b c", "b c a", "c a b"))
  }

  // --- SemDeDup ---

  /** Two tight semantic clusters (axis 0 and axis 1), 4 vectors each,
    * plus one isolated vector. Within-cluster cosine ≈ 1, cross ≈ 0. */
  private lazy val vecs = {
    val rows =
      (0 until 4).map(i => (i.toLong, Array.tabulate(8)(d => if (d == 0) 1.0 else 0.001 * i))) ++
      (4 until 8).map(i => (i.toLong, Array.tabulate(8)(d => if (d == 1) 1.0 else 0.001 * i))) ++
      Seq((8L, Array.tabulate(8)(d => if (d == 7) 1.0 else 0.0)))
    rows.toDF("vec_id", "embedding")
  }

  test("semDedupSurvivors keeps exactly the min-id per dense neighborhood") {
    val out = Similarity.semDedupSurvivors(vecs, threshold = 0.9, dim = 8, nPlanes = 6)
      .select("vec_id").as[Long].collect().toSet
    // LSH sign buckets are deterministic; near-identical vectors share a
    // bucket, so each cluster collapses to its min id; the isolate survives.
    assert(out.contains(0L) && out.contains(4L) && out.contains(8L), out)
    assert(!out.exists(id => (id > 0 && id < 4) || (id > 4 && id < 8)), out)
  }

  test("semDedupSurvivorsWith drops within-cell dups, keeps min id per cell") {
    // explicit centroids pin the cell assignment so the survivor set is exact
    val cents = Array(
      (0L, Array.tabulate(8)(d => if (d == 0) 1.0 else 0.0)),
      (1L, Array.tabulate(8)(d => if (d == 1) 1.0 else 0.0)),
      (2L, Array.tabulate(8)(d => if (d == 7) 1.0 else 0.0)))
    val out = Similarity.semDedupSurvivorsWith(vecs, threshold = 0.9, cents)
      .select("vec_id").as[Long].collect().toSet
    assert(out == Set(0L, 4L, 8L), out)
  }

  test("semDedupSurvivorsWith over trained cells: survivors form an " +
      "independent set — no within-cell near-dup pair survives") {
    val cents = Similarity.trainIvfCentroids(vecs, nlist = 3, iters = 5)
    val out = Similarity.semDedupSurvivorsWith(vecs, threshold = 0.9, cents)
      .select("cluster", "vec_id").as[(Long, Long)].collect()
    val survivors = out.map(_._2).toSet
    assert(survivors.contains(0L) && survivors.contains(8L))
    val byVec = vecs.as[(Long, Array[Double])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    for {
      (c, ids) <- out.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
      Array(x, y) <- ids.combinations(2).map(_.toArray)
    } assert(cos(byVec(x), byVec(y)) < 0.9,
      s"survivors $x,$y in cell $c are still near-dups")
  }

  // --- export shapers (TextAnalysis) & perplexity tiers -------------------

  private lazy val corpus = Seq.tabulate(40) { i =>
    // vary length and vocabulary so surprisal and token counts spread
    (i.toLong, (Seq.fill(3 + i % 7)("the cat") ++ Seq(s"rare$i")).mkString(" "))
  }.toDF("doc_id", "text")

  test("perplexityTiersFromScored: parity with the inline path, both sample rates") {
    // the deployment shape: materialize the SCORED frame (model one step
    // earlier), round-trip it through parquet, assign tiers from it —
    // must be byte-identical to scoring inline, including the hash-sample
    // membership that picks the cut points
    val dir = java.nio.file.Files.createTempDirectory("unigramscored").toString
    CorpusStats.unigramLogProb(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val scored = spark.read.parquet(dir)
    for (ppm <- Seq(1000000L, 400000L)) {
      val inline = CorpusStats.perplexityTiers(corpus, "doc_id", "text",
        samplePpm = ppm).collect().map(_.toSeq).sortBy(_.head.toString)
      val fromScored = CorpusStats.perplexityTiersFromScored(scored, "doc_id",
        samplePpm = ppm).collect().map(_.toSeq).sortBy(_.head.toString)
      assert(inline.toSeq == fromScored.toSeq, s"ppm=$ppm")
    }
  }

  test("perplexityTiers: full-corpus sample partitions monotonically by surprisal") {
    val out = CorpusStats.perplexityTiers(corpus, "doc_id", "text",
      samplePpm = 1000000L)
      .select("tier", "surprisal_micros").as[(String, Long)].collect()
    val byTier = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byTier.keySet == Set("head", "middle", "tail"), byTier.keySet)
    // head = most fluent (lowest surprisal); boundaries never interleave
    assert(byTier("head").max <= byTier("middle").min)
    assert(byTier("middle").max <= byTier("tail").min)
    assert(out.length == 40)
  }

  test("trainingShards: total preservation, contiguous 1-based in-shard positions") {
    val out = TextAnalysis.trainingShards(corpus, "doc_id", nShards = 4)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.length == 40 && out.map(_._1).toSet.size == 40)
    assert(out.forall(r => r._2 >= 0 && r._2 < 4))
    for ((_, rows) <- out.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    // determinism: a second run is byte-identical
    val again = TextAnalysis.trainingShards(corpus, "doc_id", nShards = 4)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("tokenBudgetCut: two-pass prefix sum matches the naive global-sort cut") {
    import org.apache.spark.sql.expressions.Window
    val budget = 120L
    val got = TextAnalysis.tokenBudgetCut(corpus, "doc_id", "text", budget)
      .select("doc_id", "n_tokens", "cum_tokens").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // naive single-partition reference: global sort by the same (h, id)
    val h = conv(substring(md5(concat(col("doc_id").cast("string"), lit(""))), 1, 15),
      16, 10).cast("long")
    val naive = corpus.select(col("doc_id"), h.as("h"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(
        Window.orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "n_tokens", "cum_tokens").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == naive)
    // the budget actually bites: something kept, something excluded
    assert(got.nonEmpty && got.length < 40)
    assert(got.map(_._2).sum <= budget)
  }

  test("semDedupSurvivorsWith is deterministic across runs") {
    val cents = Similarity.trainIvfCentroids(vecs, nlist = 3, iters = 3)
    val a = Similarity.semDedupSurvivorsWith(vecs, 0.9, cents)
      .orderBy("vec_id").collect().toSeq
    val b = Similarity.semDedupSurvivorsWith(vecs, 0.9, cents)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("pmiBigrams: micros match a hand computation; cut and order hold") {
    // corpus engineered so "new york" dominates: 6 co-occurrences, both
    // tokens rare outside the pair; "the cat" is frequent but both
    // tokens are common, so its PMI is lower
    val d = Seq(
      (1L, "new york new york new york the cat"),
      (2L, "new york new york new york the cat"),
      (3L, "the cat the cat the cat the dog the dog")
    ).toDF("doc_id", "text")
    val out = CorpusStats.pmiBigrams(d, "doc_id", "text", minCount = 5L, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // hand counts: doc1/2 tokens = [new york ×3, the, cat] → 8 each;
    // doc3 = [the cat ×3, the dog ×2] → 10. N = 26.
    // unigrams: new=6 york=6 the=7 cat=5 dog=2
    // bigram occurrences M = 7 + 7 + 9 = 23
    // "new york" ×3 per doc1/2 → 6 ("york new" ×2 each = 4, under cut);
    // "the cat": doc1 + doc2 + doc3×3 = 5 ("cat the" 3, under cut)
    def pmi(cab: Long, ca: Long, cb: Long): Long =
      math.round(math.log(cab.toDouble * 26 * 26 / (23.0 * ca * cb)) * 1e6)
    assert(out.toSeq == Seq(
      ("new york", 6L, pmi(6, 6, 6)),
      ("the cat", 5L, pmi(5, 7, 5))))
    assert(out(0)._3 > out(1)._3, "the engineered collocation must rank first")
    // the deployment shape: materialize the collocation stats, round-trip
    // through parquet (as ensurePmiStats does), score from the artifact —
    // must be byte-identical to the inline path
    val (bg, uni) = CorpusStats.collocationStats(d, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pmistats").toString
    bg.write.mode("overwrite").parquet(s"$dir/bigrams")
    uni.write.mode("overwrite").parquet(s"$dir/uni")
    val fromStats = CorpusStats.pmiFromStats(
        spark.read.parquet(s"$dir/bigrams"), spark.read.parquet(s"$dir/uni"),
        minCount = 5L, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(fromStats.toSeq == out.toSeq)
  }

  test("bpeMerges: the textbook low/lower/newest corpus learns the expected merges") {
    import spark.implicits._
    // Sennrich et al.'s worked example shape: {low×5, lower×2, newest×6,
    // widest×3}. Highest pair counts: (e,s)=9 then (es,t)=9 → "est" forms
    // first; later "lo" (7) then "low" (7).
    val docs = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val got = CorpusStats.bpeMerges(docs, "doc_id", "text", numMerges = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got(0) == ((1, "e", "s", "es", 9L)), got.toSeq)
    assert(got(1) == ((2, "es", "t", "est", 9L)), got.toSeq)
    assert(got(2) == ((3, "est", "</w>", "est</w>", 9L)), got.toSeq)
    assert(got(3) == ((4, "l", "o", "lo", 7L)), got.toSeq)
    // deterministic: identical rerun
    val again = CorpusStats.bpeMerges(docs, "doc_id", "text", numMerges = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == again.toSeq)
    // merge exhaustion stops early instead of looping
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val ex = CorpusStats.bpeMerges(tiny, "doc_id", "text", numMerges = 10)
    assert(ex.count() == 2, "a 2-char word admits exactly 2 merges (ab, ab</w>)")
  }

  test("bpeTokenCounts: the learned table compresses trained words, leaves others atomic") {
    import spark.implicits._
    val train = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val merges = CorpusStats.bpeMerges(train, "doc_id", "text", numMerges = 4)
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    // merges: (e,s) (es,t) (est,</w>) (l,o)
    val probe = Seq(
      (10L, "lowest"),   // l o w e s t</w> → est</w>, lo → [lo, w, est</w>] = 3
      (11L, "low"),      // lo w </w> = 3 (no (lo,w) or (w,</w>) merge learned)
      (12L, "xyz"),      // untouched: x y z </w> = 4
      (13L, "lowest lowest xyz")) // 3 + 3 + 4 = 10
      .toDF("doc_id", "text")
    val got = CorpusStats.bpeTokenCounts(probe, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 3L, 11L -> 3L, 12L -> 4L, 13L -> 10L), got)
    // empty merge table = character count + end marker per word
    val atomic = CorpusStats.bpeTokenCounts(probe, "doc_id", "text", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(atomic(10L) == 7L && atomic(12L) == 4L)
  }

  // the textbook merge table used by the encode/pack tests:
  // (e,s) (es,t) (est,</w>) (l,o) — trained in the bpeMerges test above
  private lazy val textbookMerges: Seq[(String, String)] = {
    val train = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    CorpusStats.bpeMerges(train, "doc_id", "text", numMerges = 4)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }

  test("bpeEncode: deterministic vocab ids, id-by-id; sum of lengths = bpeTokenCount") {
    // vocab: 0 <unk>; '0'..'9' → 1..10; 'a'..'z' → 11..36; '</w>' → 37;
    // merge outputs in rank order: es→38 est→39 est</w>→40 lo→41
    val probe = Seq(
      (10L, "lowest"),  // lo w est</w>  → [41, 33, 40]
      (11L, "low"),     // lo w </w>     → [41, 33, 37]
      (12L, "xyz"),     // x y z </w>    → [34, 35, 36, 37]
      (13L, "lowest xyz")).toDF("doc_id", "text")
    val got = CorpusStats.bpeEncode(probe, "doc_id", "text", textbookMerges)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1).toList, r.getLong(2)))).toMap
    assert(got(10L) == ((List(41, 33, 40), 3L)), got)
    assert(got(11L) == ((List(41, 33, 37), 3L)), got)
    assert(got(12L) == ((List(34, 35, 36, 37), 4L)), got)
    assert(got(13L) == ((List(41, 33, 40, 34, 35, 36, 37), 7L)), got)
    // the count kernel and the encode kernel agree on every doc
    val counts = CorpusStats.bpeTokenCounts(probe, "doc_id", "text",
      textbookMerges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall { case (id, (ids, n)) =>
      ids.length.toLong == n && counts(id) == n })
  }

  test("bpe word-encode memo never cross-pollutes between two live tables") {
    // regression for the identity-hash memo key (ADVICE r9): interleave
    // the SAME word through two different tables on one thread — a stale
    // memo entry would return the other table's count
    import org.apache.spark.unsafe.types.UTF8String
    val learned = new graft.functions.BpeTable(textbookMerges)
    val empty = new graft.functions.BpeTable(Nil)
    assert(learned.uid != empty.uid)
    (1 to 3).foreach { _ =>
      assert(graft.functions.SketchImpl.bpeTokenCount(
        UTF8String.fromString("lowest"), learned) == 3L)
      assert(graft.functions.SketchImpl.bpeTokenCount(
        UTF8String.fromString("lowest"), empty) == 7L)
    }
  }

  test("bpe round trip: decoding the id stream recovers the tokenized words") {
    import org.apache.spark.unsafe.types.UTF8String
    val table = new graft.functions.BpeTable(textbookMerges)
    val text = "Lowest LOW, xyz; newest widest lower 42!"
    val ids = graft.functions.SketchImpl.bpeEncodeIds(
      UTF8String.fromString(text), table)
    val decoded = (0 until ids.numElements())
      .map(i => table.symbols(ids.getInt(i))).mkString
    assert(decoded.split("</w>", -1).filter(_.nonEmpty).toList ==
      List("lowest", "low", "xyz", "newest", "widest", "lower", "42"),
      decoded)
  }

  test("packTokenIds: chopped stream rebuilds the per-doc encodes; fixed lengths + pad accounting") {
    // single shard → one fully hand-checkable stream. Encodes:
    //   doc 1 "lowest low"   → [41,33,40, 41,33,37]          (6)
    //   doc 2 "xyz"          → [34,35,36,37]                 (4)
    //   doc 3 "low low low"  → [41,33,37, 41,33,37, 41,33,37](9)
    // stream (19 ids) chopped every 8: [..8], [..8], [3 + 5 pad]
    val probe = Seq((1L, "lowest low"), (2L, "xyz"), (3L, "low low low"))
      .toDF("doc_id", "text")
    val padId = new graft.functions.BpeTable(textbookMerges).vocabSize // 42
    assert(padId == 42)
    val got = CorpusStats.packTokenIds(probe, "doc_id", "text",
      textbookMerges, seqTokens = 8, shards = 1)
      .collect().sortBy(r => r.getLong(1))
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3), r.getSeq[Int](4).toList))
    val stream = List(41, 33, 40, 41, 33, 37) ::: List(34, 35, 36, 37) :::
      List(41, 33, 37, 41, 33, 37, 41, 33, 37)
    assert(got.length == 3)
    assert(got(0) == ((0L, 2L, 0, stream.slice(0, 8))), got.toSeq)
    assert(got(1) == ((1L, 2L, 0, stream.slice(8, 16))), got.toSeq)
    assert(got(2) == ((2L, 1L, 5, stream.slice(16, 19) ::: List.fill(5)(padId))),
      got.toSeq)
    // multi-shard: per shard, stripping pads and concatenating sequences
    // in seq order rebuilds the concatenation of per-doc encodes in id
    // order — layout invariant under any shard count
    val many = (0L until 50L).map(i => (i, s"lowest low xyz $i word${i % 7}"))
      .toDF("doc_id", "text")
    val enc = CorpusStats.bpeEncode(many, "doc_id", "text", textbookMerges)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val shardOf = (id: Long) => {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 64
    }
    val packed = CorpusStats.packTokenIds(many, "doc_id", "text",
      textbookMerges, seqTokens = 8, shards = 64)
      .collect().groupBy(_.getLong(0))
    packed.foreach { case (shard, rows) =>
      val rebuilt = rows.sortBy(_.getLong(1))
        .flatMap(_.getSeq[Int](4)).filter(_ != padId).toList
      val want = (0L until 50L).filter(shardOf(_) == shard).sorted
        .flatMap(enc(_)).toList
      assert(rebuilt == want, s"shard $shard")
      // every sequence is exactly seqTokens long; pads only on the last
      val lens = rows.map(_.getSeq[Int](4).length).toSet
      assert(lens == Set(8), lens)
      val padRows = rows.filter(_.getInt(3) > 0)
      assert(padRows.length <= 1 &&
        padRows.forall(r => r.getLong(1) == rows.map(_.getLong(1)).max))
    }
  }

  // labeled corpus for the trained NB quality classifier: pos vocabulary
  // {good, clean}, neg vocabulary {spam, junk}, shared token {the}
  private lazy val labeledDocs = Seq(
    (1L, "good clean good", true),
    (2L, "good the", true),
    (3L, "spam junk the", false),
    (4L, "junk junk", false)
  ).toDF("doc_id", "text", "curated")

  test("nbQualityModel: Laplace-smoothed per-class micros match a hand computation") {
    val m = CorpusStats.nbQualityModel(labeledDocs, "doc_id", "text", col("curated"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // pos tokens: good×3 clean×1 the×1 (np=5); neg: spam×1 junk×3 the×1
    // (nn=5); V=5 → both denominators 10
    def lp(c: Long): Long = math.round(math.log((c + 1) / 10.0) * 1e6)
    assert(m.keySet == Set("good", "clean", "the", "spam", "junk"))
    assert(m("good") == ((lp(3), lp(0))))
    assert(m("clean") == ((lp(1), lp(0))))
    assert(m("the") == ((lp(1), lp(1))))
    assert(m("spam") == ((lp(0), lp(1))))
    assert(m("junk") == ((lp(0), lp(3))))
  }

  test("nbClassify: log-odds sums are exact and recover the training labels") {
    val out = CorpusStats.nbClassify(labeledDocs, "doc_id", "text", col("curated"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def lp(c: Long): Long = math.round(math.log((c + 1) / 10.0) * 1e6)
    // balanced classes → prior log-odds = ln(2/2) = 0
    val d1 = 2 * (lp(3) - lp(0)) + (lp(1) - lp(0))
    val d3 = (lp(0) - lp(1)) + (lp(0) - lp(3)) + (lp(1) - lp(1))
    assert(out(1L) == ((3L, d1, 1L)))
    assert(out(3L) == ((3L, d3, 0L)))
    // a separable corpus classifies itself perfectly
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(Seq(1L, 2L).forall(out(_)._3 == 1L) &&
      Seq(3L, 4L).forall(out(_)._3 == 0L))
  }

  test("nbPriorDelta shifts the decision; imbalanced priors are exact micros") {
    // 3 pos docs, 1 neg → prior = ln(3/1)
    val skew = labeledDocs.withColumn("curated",
      col("curated") || (col("doc_id") === 3L))
    val pd = CorpusStats.nbPriorDelta(skew, col("curated"))
      .collect().head.getLong(0)
    assert(pd == math.round(math.log(3.0 / 1.0) * 1e6))
  }

  test("nb: classifying against the parquet-round-tripped model is byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("nbmodel").toString
    val pos = col("curated")
    CorpusStats.nbQualityModel(labeledDocs, "doc_id", "text", pos)
      .write.mode("overwrite").parquet(s"$dir/model")
    CorpusStats.nbPriorDelta(labeledDocs, pos)
      .write.mode("overwrite").parquet(s"$dir/prior")
    val inline = CorpusStats.nbClassify(labeledDocs, "doc_id", "text", pos)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val loaded = CorpusStats.nbClassifyWith(labeledDocs, "doc_id", "text",
        spark.read.parquet(s"$dir/model"), spark.read.parquet(s"$dir/prior"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(inline.toSeq == loaded.toSeq)
  }

  test("nb: zero-token documents are dropped from scoring but count in the prior") {
    val withEmpty = labeledDocs.union(Seq((5L, "", false)).toDF("doc_id", "text", "curated"))
    val out = CorpusStats.nbClassify(withEmpty, "doc_id", "text", col("curated"))
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 3L, 4L))
    val pd = CorpusStats.nbPriorDelta(withEmpty, col("curated"))
      .collect().head.getLong(0)
    assert(pd == math.round(math.log(2.0 / 3.0) * 1e6))
  }
}
