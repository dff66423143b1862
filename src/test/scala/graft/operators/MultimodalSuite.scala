package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multimodal binary plumbing: blob construction and byte-exact payload
  * dedup (the q33/q34/q50/q112 shapes, unit-scale). */
class MultimodalSuite extends SparkSpec {

  test("exactBinaryDedup collapses byte-identical payloads within a kind") {
    implicit val sp: SparkSession = spark
    import spark.implicits._
    // ids 3,6 → kind image with IDENTICAL text → one group of 2;
    // id 9 → image, different bytes; ids 1,2 → other kinds
    val docs = Seq(
      (3L, "same bytes"), (6L, "same bytes"), (9L, "other"),
      (1L, "same bytes"), (2L, "same bytes")).toDF("doc_id", "text")
    val got = Multimodal.exactBinaryDedup(
      Multimodal.blobsFromText(docs, "doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    // same bytes in THREE kinds: image {3,6}, audio {1}, video {2}
    assert(got == Set(
      ("image", 3L, 2L), ("image", 9L, 1L),
      ("audio", 1L, 1L), ("video", 2L, 1L)), got)
  }

  test("byteGramSimhash60: single gram = its md5-60 hash; shorter than w = 0") {
    import graft.functions.SketchImpl
    // one 4-byte gram → one vote per bit → signature IS the gram hash
    val s = "abcd"
    assert(SketchImpl.byteGramSimhash60(s.getBytes("UTF-8"), 4) ==
      SketchImpl.md5hash60(s))
    assert(SketchImpl.byteGramSimhash60("abc".getBytes("UTF-8"), 4) == 0L)
    assert(SketchImpl.byteGramSimhash60(Array.empty[Byte], 4) == 0L)
  }

  test("perceptual near-dup: catches re-encoded twins that exact binary dedup misses") {
    implicit val sp: SparkSession = spark
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "wanders across the wide open field looking for something to eat"
    // ids ≡ 0 (mod 5) get a re-encoded variant at id + 3e9 (same kind)
    val docs = (0L until 12L).map(i => (i, s"$base variation number $i"))
      .toDF("doc_id", "text")
    val blobs = Multimodal.blobsWithReencodes(docs, "doc_id", "text", everyK = 5)
    // exact dedup does NOT collapse the byte-perturbed twins
    val exact = Multimodal.exactBinaryDedup(blobs)
    assert(exact.filter(col("dup_count") > 1).count() == 0)
    // the perceptual pass finds every (original, variant) twin: the 2-byte
    // tail moves only 5 of ~115 grams (twin distances here: 4, 3, 1 bits —
    // externally recomputed), inside the 4-bit radius (block-subset
    // tables: C(6,2) intact pairs of 10-bit blocks at maxDist=4)
    val pairs = Multimodal.perceptualNearDupPairs(blobs, maxDist = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    for (i <- Seq(0L, 5L, 10L)) {
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      assert(pairs.contains((kind, i, i + 3000000000L)),
        s"variant twin of $i missing from $pairs")
    }
    // every reported pair is same-kind by construction of the output
    assert(pairs.forall { case (k, a, b) =>
      Seq("image", "audio", "video")((a % 3).toInt) == k && a < b })
  }

  test("perceptual near-dup: banded LSH recall is EXACT vs brute-force popcount") {
    implicit val sp: SparkSession = spark
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      val twist = if (i % 4 == 0) "shared common prefix text across docs"
        else s"unique payload body $i with different words ${i * 7}"
      (i, s"$twist tail segment ${i % 3}")
    }.toDF("doc_id", "text")
    val blobs = Multimodal.blobsFromText(docs, "doc_id", "text")
    val sigs = Multimodal.perceptualSignature(blobs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val brute = (for {
      (ia, ka, sa) <- sigs; (ib, kb, sb) <- sigs
      if ka == kb && ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
    } yield (ka, ia, ib, d)).toSet
    val got = Multimodal.perceptualNearDupPairs(blobs, maxDist = 3)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == brute, s"banded=$got brute=$brute")
  }

  test("perceptualDedupSurvivors: highest-fidelity copy survives, cluster = min id") {
    implicit val sp: SparkSession = spark
    import spark.implicits._
    // two byte-identical payloads (ids 3, 6 → both image) plus one clearly
    // unrelated asset per kind; identical payloads pair at hamming 0
    val same = "an identical media payload travelling twice through the crawl"
    val docs = Seq(
      (3L, same), (6L, same),
      (9L, "a completely different image asset body with other words"),
      (1L, "some audio-kind payload standing alone"),
      (2L, "some video-kind payload standing alone")).toDF("doc_id", "text")
    val blobs = Multimodal.blobsFromText(docs, "doc_id", "text")
    val got = Multimodal.perceptualDedupSurvivors(blobs, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // equal byte_len tie → min id 3 survives, labeled by the min id 3;
    // id 6 is gone; singletons keep a null cluster
    assert(got.contains((3L, "image", 3L)), got)
    assert(!got.exists(_._1 == 6L), got)
    assert(got.filter(t => Set(1L, 2L, 9L)(t._1)).forall(_._3 == -1L), got)
  }
}
