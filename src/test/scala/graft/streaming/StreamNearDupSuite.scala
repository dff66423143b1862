package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** One streamed document: event time, id, text. */
final case class NearDoc(ts: java.sql.Timestamp, doc_id: Long, text: String)

/** Streaming near-dup detection (StreamNearDup): a near-duplicate
  * arriving within the watermark horizon is detected and suppressible at
  * the sink; one arriving past the horizon is not (state evicted); a
  * replayed corpus reproduces the batch MinHash-LSH pairs exactly. */
class StreamNearDupSuite extends SparkSpec {

  private def tmp(prefix: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/test-tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away today"
  private val nearDup = // one-word edit of `base` — high shingle overlap
    "the quick brown fox jumps over the lazy dog and runs far away tonight"
  private val unrelated =
    "completely different text about spark structured streaming state"

  private def runPairs(batches: Seq[Seq[NearDoc]], delay: String,
      threshold: Double = 0.5): Array[(Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[NearDoc]
    val name = "neardup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamNearDup.nearDupPairsStream(src.toDF(), "doc_id", "ts",
        "text", delay, threshold = threshold, maxSketch = 4096)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmp("ckpt"))
      .start()
    batches.foreach { b => src.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getAs[Long]("first_id"), r.getAs[Long]("dup_id"),
        r.getAs[Double]("jaccard")))
  }

  test("near-dup within the watermark is detected and suppressible; unrelated passes") {
    val docs = Seq(
      Seq(NearDoc(ts(1000), 1L, base)),
      Seq(NearDoc(ts(2000), 2L, nearDup), NearDoc(ts(3000), 3L, unrelated)))
    val pairs = runPairs(docs, "1 hour")
    // exactly the near-dup pair, oriented by arrival (2 is the duplicate)
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)), pairs.toSeq)
    assert(pairs.head._3 >= 0.5)
    // sink-side suppression (the foreachBatch composition): anti-join the
    // arriving docs against the suppressed ids — the later near-dup goes,
    // the first copy and the unrelated doc land
    val suppressed = pairs.map(_._2).toSet
    val landed = docs.flatten.map(_.doc_id).filterNot(suppressed)
    assert(landed == Seq(1L, 3L))
  }

  test("state is watermark-bounded: a near-dup past the horizon is NOT detected") {
    val pairs = runPairs(Seq(
      Seq(NearDoc(ts(0), 1L, base)),
      // advances the watermark to 90s — doc 1's bucket entries expire
      Seq(NearDoc(ts(100000), 2L, unrelated)),
      Seq(NearDoc(ts(101000), 3L, nearDup))), "10 seconds")
    assert(pairs.isEmpty, pairs.toSeq)
  }

  test("replay == batch: a replayed corpus reproduces Dedup.minhashLshPairs exactly") {
    import spark.implicits._
    // three near-dup clusters + noise, interleaved across micro-batches
    val texts = Seq(
      1L -> base, 2L -> nearDup,
      3L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      4L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda",
      5L -> unrelated,
      6L -> "numbers one two three four five six seven eight nine ten",
      7L -> "numbers one two three four five six seven eight nine zero",
      8L -> "sparse singleton text with no duplicate partner anywhere here")
    val batch = Dedup.minhashLshPairs(
        texts.toDF("doc_id", "text"), "doc_id", "text",
        w = 3, bands = 32, rowsPerBand = 2, threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(batch.nonEmpty, "batch oracle found no pairs — test corpus broken")
    val streamed = runPairs(
      Seq(texts.take(3), texts.slice(3, 6), texts.drop(6)).map(_.zipWithIndex.map {
        case ((id, t), i) => NearDoc(ts(1000 + id * 100 + i), id, t)
      }), "1 hour")
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2), p._3)).toSet
    // same pair set; jaccard agrees to the shared micro rounding
    assert(streamed.map(p => (p._1, p._2)) == batch.map(p => (p._1, p._2)),
      s"stream=$streamed batch=$batch")
    for (((a, b, js)) <- streamed; (x, y, jb) <- batch if x == a && y == b)
      assert(math.abs(js - jb) < 1e-6, s"jaccard drift on ($a,$b): $js vs $jb")
  }
}
