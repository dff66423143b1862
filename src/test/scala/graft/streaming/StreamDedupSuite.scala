package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** One streamed element: event time, element id, payload text. */
final case class StreamedDoc(ts: java.sql.Timestamp, element_id: String,
    text: String)

/** Streaming ingest dedup: duplicate element ids and duplicate content
  * collapse within the watermark horizon; fresh elements pass. */
class StreamDedupSuite extends SparkSpec {

  private def tmp(prefix: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/test-tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  private def run(transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      batches: Seq[Seq[StreamedDoc]]): Array[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[StreamedDoc]
    val name = "dedup_test_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = transform(src.toDF()).writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmp("ckpt"))
      .start()
    batches.foreach { b => src.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
  }

  test("dedupElements: redelivered element ids land once, fresh ids pass") {
    val out = run(StreamDedup.dedupElements(_, "ts", "10 minutes", Seq("element_id")),
      Seq(
        // batch 1: e1 delivered twice in the same batch
        Seq(StreamedDoc(ts(1000), "e1", "a"), StreamedDoc(ts(1500), "e1", "a"),
          StreamedDoc(ts(2000), "e2", "b")),
        // batch 2: e1 redelivered across batches (within watermark), e3 new
        Seq(StreamedDoc(ts(1000), "e1", "a"), StreamedDoc(ts(3000), "e3", "c"))))
    val ids = out.map(_.getAs[String]("element_id")).sorted
    assert(ids.sameElements(Array("e1", "e2", "e3")))
  }

  test("dedupByContent: case/punctuation variants collapse, payloads differ pass") {
    val out = run(StreamDedup.dedupByContent(_, "ts", "10 minutes", "text"),
      Seq(
        Seq(StreamedDoc(ts(1000), "a", "Hello, World!"),
          StreamedDoc(ts(1500), "b", "hello world"),
          StreamedDoc(ts(2000), "c", "something else")),
        Seq(StreamedDoc(ts(2500), "d", "HELLO... world"),
          StreamedDoc(ts(3000), "e", "genuinely new"))))
    // a/b/d share the canonical fingerprint; first arrival (a) survives
    val ids = out.map(_.getAs[String]("element_id")).sorted
    assert(ids.sameElements(Array("a", "c", "e")))
    // the helper fingerprint column does not leak into the output schema
    assert(!out.head.schema.fieldNames.contains("__fp"))
  }

  test("ingest pipeline: content dedup then quality gate, one streaming query") {
    // the batch map-only kernels (qualityFeatures) compose into the
    // streaming ingest unchanged — dedup first (cheapest reject), then
    // threshold on the quality features, all in a single streaming plan
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions._
    val good = "a sensible document with several reasonable words inside it"
    val out = run(df => {
      val deduped = StreamDedup.dedupByContent(df, "ts", "10 minutes", "text")
      TextAnalysis.qualityFeatures(deduped, col("text"))
        .filter(col("n_tokens") >= 5 && col("punct_ratio") <= 0.2)
        .select("element_id", "n_tokens")
    }, Seq(
      Seq(StreamedDoc(ts(1000), "a", good),
        StreamedDoc(ts(1500), "b", good.toUpperCase), // dup of a → dropped
        StreamedDoc(ts(2000), "c", "too short"),      // fails n_tokens gate
        StreamedDoc(ts(2500), "d", "!!! ??? ... ### $$$ %%% ^^^ &&& *** @@@")),
      Seq(StreamedDoc(ts(3000), "e", "another perfectly ordinary document of plain words"))))
    assert(out.map(_.getAs[String]("element_id")).sorted.sameElements(Array("a", "e")))
    assert(out.forall(_.getAs[Int]("n_tokens") >= 5))
  }
}
