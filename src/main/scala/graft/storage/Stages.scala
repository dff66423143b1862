package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Lifecycle-stage routing (hot/warm/cold): one layout ROOT per stage,
 * selected at scan-build time.
 *
 * The reference attaches lifecycle `stages` to a group
 * (common/v1/common.proto:65-94 LifecycleStage; docs/concept/
 * data-model.md:26-60) and routes queries to the per-stage nodes holding
 * that tier; a background job migrates expired segments tier-to-tier
 * (banyand/backup/lifecycle/). The Spark shape: each stage is a layout
 * root on its own storage class (NVMe / object store / archive class) and
 * a query `ON (hot) STAGES` plans scans over ONLY the selected roots —
 * stage selection is directory selection, before any file is listed.
 * Within each root the usual (seg, shard) partition pruning still applies.
 */
final case class StageRoots(roots: Map[String, String]) {
  require(roots.nonEmpty, "at least one stage root required")
  def root(stage: String): String = roots.getOrElse(stage,
    throw new IllegalArgumentException(
      s"unknown lifecycle stage '$stage' (have: ${roots.keys.toSeq.sorted.mkString(",")})"))
}

object Stages {

  /** Scan the selected stages (all stages when `stages` is empty —
    * query.proto: unspecified = query every stage). One parquet scan per
    * selected root, unioned; an unselected stage's directories are never
    * listed. */
  def read(spark: SparkSession, spec: LayoutSpec, sr: StageRoots,
      stages: Seq[String] = Nil): DataFrame = {
    val sel = if (stages.isEmpty) sr.roots.keys.toSeq.sorted else stages
    sel.map(st => Layout.read(spark, sr.root(st), spec))
      .reduce(_.unionByName(_))
  }

  /** Ingest into one stage's root (writes normally land in `hot`). */
  def appendTo(df: DataFrame, stage: String, sr: StageRoots, spec: LayoutSpec,
      mode: String = "append"): Unit =
    Layout.append(df, sr.root(stage), spec, mode)

  /**
   * Lifecycle migration (banyand/backup/lifecycle/): move whole segments
   * older than the horizon from one stage tier to the next. Segment-
   * granular like TTL — the moved unit is a directory, so at scale this
   * is a copy + prefix-delete, never a row-level rewrite. Returns the
   * migrated segment ids.
   */
  def migrate(spark: SparkSession, spec: LayoutSpec, sr: StageRoots,
      from: String, to: String, olderThan: java.time.Instant): Seq[Int] = {
    val horizon = Layout.segFor(spec, olderThan)
    val src = Layout.read(spark, sr.root(from), spec)
      .filter(col(Layout.SegCol) < horizon)
    // rows are already routed (seg/shard are partition columns of the
    // source layout) — write them straight into the target's directories
    src.repartition(col(Layout.SegCol), col(Layout.ShardCol))
      .write.mode("append")
      .partitionBy(Layout.SegCol, Layout.ShardCol)
      .parquet(Layout.path(sr.root(to), spec))
    Layout.enforceTtl(spark, sr.root(from), spec, olderThan)
  }
}
