package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.CorpusStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** One streamed labeled document for classifier maintenance. */
final case class LabeledStreamDoc(doc_id: Long, text: String, curated: Boolean)

/** Incremental model maintenance: the streaming count state, finished
  * through the shared smoothing step, is byte-identical to the batch
  * fit over every prefix of the stream; the Update-mode sink contract
  * (merge changed rows by tok) reconstructs the same state. */
class StreamModelSuite extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/test-tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private val batches: Seq[Seq[LabeledStreamDoc]] = Seq(
    Seq(LabeledStreamDoc(1L, "good clean good", curated = true),
      LabeledStreamDoc(2L, "spam junk the", curated = false)),
    Seq(LabeledStreamDoc(3L, "good the", curated = true),
      LabeledStreamDoc(4L, "junk junk", curated = false)),
    Seq(LabeledStreamDoc(5L, "clean good words the", curated = true)))

  test("nbCountsStream: every prefix snapshot finishes to the exact batch model") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[LabeledStreamDoc]
    val name = "nbcounts_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamModel.nbCountsStream(src.toDF(), "text", col("curated"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", tmp("ckpt"))
      .start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        src.addData(b); q.processAllAvailable()
        val streamed = CorpusStats.nbModelFromCounts(spark.table(name))
          .collect().map(_.toSeq).toSet
        val prefix = batches.take(i + 1).flatten
          .toDF("doc_id", "text", "curated")
        val batch = CorpusStats.nbQualityModel(prefix, "doc_id", "text",
          col("curated")).collect().map(_.toSeq).toSet
        assert(streamed == batch, s"prefix through batch $i diverged")
      }
    } finally q.stop()
  }

  test("priorCountsStream: prefix prior equals the batch prior log-odds") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[LabeledStreamDoc]
    val name = "nbprior_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamModel.priorCountsStream(src.toDF(), col("curated"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", tmp("ckpt"))
      .start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        src.addData(b); q.processAllAvailable()
        val streamed = StreamModel.priorDeltaFromCounts(spark.table(name))
          .collect().head.getLong(0)
        val prefix = batches.take(i + 1).flatten
          .toDF("doc_id", "text", "curated")
        val batch = CorpusStats.nbPriorDelta(prefix, col("curated"))
          .collect().head.getLong(0)
        assert(streamed == batch, s"prior diverged at batch $i")
      }
    } finally q.stop()
  }

  test("Update-mode sink contract: merging changed rows by tok rebuilds the state") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[LabeledStreamDoc]
    // the production sink: per micro-batch, upsert the UPDATED vocabulary
    // rows into the model store — only touched tokens ship
    val store = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val rowsPerBatch = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val q = StreamModel.nbCountsStream(src.toDF(), "text", col("curated"))
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", tmp("ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect()
        rowsPerBatch.add(rows.length)
        rows.foreach(r => store.put(r.getString(0), (r.getLong(1), r.getLong(2))))
      }
      .start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val merged = store.asScala.map { case (tok, (cp, cn)) => (tok, cp, cn) }.toSet
    val all = batches.flatten.toDF("doc_id", "text", "curated")
    val batchCounts = CorpusStats.nbTokenCounts(all, "text", col("curated"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == batchCounts)
    // update mode ships only touched vocabulary rows: batch 3 touches
    // {clean, good, words, the}, not the full accumulated vocabulary
    assert(rowsPerBatch.asScala.last == 4, rowsPerBatch.asScala.toList)
  }
}
