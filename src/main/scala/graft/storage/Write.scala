package graft.storage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Write ingestion (S7). The reference ingests via gRPC client streams with
 * entity→shard routing and replication (banyand/liaison/grpc/measure.go:93-360,
 * publishToNodes :304; measure/v1/write.proto:47-84). Spark-first this is:
 *
 * - batch append: [[Layout.append]] — one map-only pass deriving the
 *   (seg, shard) routing columns, then a partitioned parquet write. No
 *   shuffle; each task appends to the directories its rows route to.
 * - continuous ingestion: [[Write.streamSink]] — the same routing applied to
 *   a streaming source, written by the exactly-once file-sink protocol
 *   (checkpoint + manifest replaces the reference's write-ahead replication).
 *
 * Durability/replication is delegated to the object store under the parquet
 * root, which is the idiomatic Spark deployment answer to the reference's
 * replica sets.
 */
object Write {

  /** Batch ingestion of a micro-batch or backfill frame. */
  def append(df: DataFrame, root: String, spec: LayoutSpec): Unit =
    Layout.append(df, root, spec)

  /**
   * Continuous ingestion: route and append each micro-batch into the layout.
   * Returns the started query; callers own its lifecycle.
   */
  def streamSink(stream: DataFrame, root: String, spec: LayoutSpec,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    Layout.routed(stream, spec).writeStream
      .format("parquet")
      .option("path", Layout.path(root, spec))
      .option("checkpointLocation", checkpoint)
      .partitionBy(Layout.SegCol, Layout.ShardCol)
      .trigger(trigger)
      .start()
}
