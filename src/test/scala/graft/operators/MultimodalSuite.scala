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

  test("decoded-plane: PNG and BMP of the same pixels hash identically; bytes differ") {
    implicit val sp: SparkSession = spark
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "")).toDF("doc_id", "text")
    val blobs = Multimodal.imageBlobsFromDocs(docs, "doc_id", "text")
      .collect()
    // the codec twins share NO payload bytes (different container formats)
    val byId = blobs.map(b => b.media_id -> b.payload).toMap
    for (id <- Seq(1L, 2L, 3L))
      assert(!java.util.Arrays.equals(byId(id), byId(id + 3000000000L)))
    // but decode back to the identical plane → identical 64-bit aHash
    val sigMap = Multimodal.decodedSignature(
        spark.createDataset(blobs.toIndexedSeq))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(sigMap.size == 6)
    for (id <- Seq(1L, 2L, 3L)) {
      assert(sigMap(id)._1 == "image:decoded", sigMap(id))
      assert(sigMap(id) == sigMap(id + 3000000000L), s"id=$id")
    }
    // distinct docs land on distinct signatures (md5-derived planes)
    assert(Seq(1L, 2L, 3L).map(sigMap(_)._2).distinct.size == 3)
  }

  test("decoded-plane: undecodable payloads fall back to the byte-stream family") {
    implicit val sp: SparkSession = spark
    import spark.implicits._
    val raw = Seq(Multimodal.MediaBlob(7L, "audio",
      "not an image at all".getBytes("UTF-8")))
    val got = Multimodal.decodedSignature(spark.createDataset(raw))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.head._2 == "audio:raw")
    assert(got.head._3 == graft.functions.SketchImpl
      .byteGramSimhash60("not an image at all".getBytes("UTF-8"), 4))
  }

  test("decoded near-dup: banding recall is EXACT vs brute-force popcount at 64 bits") {
    implicit val sp: SparkSession = spark
    import spark.implicits._
    // perturbed planes at CONTROLLED distances: the ground truth is the
    // brute-force popcount over the actual decoded signatures, so this
    // pins the 8×8-bit block-subset banding (not the fixture structure)
    val base = Multimodal.docPlane(42L, "seed text")
    def enc(plane: Array[Int], fmt: String) = Multimodal.encodePlane(plane, fmt)
    val variants = (0 until 24).map { i =>
      val p = base.clone()
      // push i cells hard in one direction — signatures spread over a
      // range of Hamming distances from the base
      for (k <- 0 until i * 8) p(k % 256) = if (k % 2 == 0) 255 else 0
      Multimodal.MediaBlob(i.toLong, "image", enc(p, if (i % 2 == 0) "png" else "bmp"))
    }
    val ds = spark.createDataset(variants)
    val sigs = Multimodal.decodedSignature(ds)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(brute.nonEmpty, "fixture produced no close pairs — weak test")
    val got = Multimodal.decodedNearDupPairs(ds, maxDist = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == brute, s"banded=$got brute=$brute")
  }
}
