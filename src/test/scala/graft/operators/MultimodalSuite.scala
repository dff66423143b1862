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
}
