package graft.storage

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Catalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trace finalization sampling (reference CHANGES.md §0.11.0
  * PIPELINE_EVENT_FINALIZE): the cooled-segment sweep that force-samples
  * late-arriving spans, generation-stamped so a crash cannot
  * double-sample. */
class FinalizeSuite extends SparkSpec {

  private def tmp(prefix: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/test-tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private val spec = LayoutSpec(
    group = "t", name = "spans",
    entity = Seq("trace_id"), tsCol = "ts_ns", tsIsNanos = true,
    shardNum = 2, segmentDays = 7)

  private lazy val spans = Catalog.load(spark, sf0001, "events")
    .withColumn("trace_id", pmod(col("event_id"), lit(97L)))
    .withColumn("status",
      when(col("event_type") === "error", "error").otherwise("success"))

  private val sampler = (df: DataFrame) => graft.operators.TracePipeline
    .latencyStatusSample(df, "trace_id", "value", "status", thresholdMs = 400)

  private val sweepNow = java.time.Instant.parse("2030-01-01T00:00:00Z")

  private def rows(root: String) =
    Layout.read(spark, root, spec)
      .select("seg", "trace_id", "event_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

  test("sweep samples late arrivals exactly once; finalized files never re-enter the sampler") {
    val root = tmp("finalize")
    val late = pmod(col("event_id"), lit(10L)) === 7
    Layout.append(spans.filter(!late), root, spec, mode = "overwrite")
    val r1 = Finalize.finalizeSegments(spark, root, spec, sampler,
      now = sweepNow, graceDays = 1)
    assert(r1.nonEmpty && r1.forall(_.gen == 1L))
    val afterFirst = rows(root)
    // a second sweep with NOTHING new is a no-op (all files finalized)
    assert(Finalize.finalizeSegments(spark, root, spec, sampler,
      now = sweepNow, graceDays = 1).isEmpty)
    assert(rows(root) == afterFirst, "no-op sweep mutated the table")

    // late arrivals missed the first sweep → only THEIR files get sampled
    Layout.append(spans.filter(late), root, spec)
    val r2 = Finalize.finalizeSegments(spark, root, spec, sampler,
      now = sweepNow, graceDays = 1)
    assert(r2.nonEmpty && r2.forall(_.gen == 2L))
    val finalRows = rows(root)
    // on-time rows are untouched by the late round
    assert(afterFirst.subsetOf(finalRows),
      "finalize round dropped already-finalized rows")
    // and the late batch was genuinely sampled: per-(seg, trace) verdict
    // over the late spans alone — recompute expected survivors
    val seg = Layout.segExprFor(spec)
    val lateVerdict = spans.filter(late).withColumn("seg", seg)
      .groupBy("seg", "trace_id")
      .agg((!(max(col("value")) < 400 &&
        (when(max(when(col("status") === "error", 1).otherwise(0)) === 1, "error")
          .otherwise(max(col("status")))) === "success")).as("keep"))
    val expectedLate = spans.filter(late).withColumn("seg", seg)
      .join(lateVerdict, Seq("seg", "trace_id"))
      .filter(col("keep"))
      .select("seg", "trace_id", "event_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(finalRows -- afterFirst == expectedLate,
      "late batch not sampled with per-(seg, trace) verdicts")
  }

  test("crash between commit manifest and apply completes without re-sampling (finalizeGen discipline)") {
    val root = tmp("finalize_crash")
    Layout.append(spans, root, spec, mode = "overwrite")
    // build the crash state by hand: a committed round whose manifest
    // exists but was never applied — a staged survivor file plus
    // MOVE/DEL/STATE lines, exactly what a crash right after the
    // manifest rename leaves behind
    val table = new java.io.File(Layout.path(root, spec))
    val victim = (for {
      seg <- table.listFiles().toSeq if seg.getName.startsWith("seg=")
      sh <- seg.listFiles().toSeq if sh.getName.startsWith("shard=")
    } yield sh).head
    val old = victim.listFiles().filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith(".")).toSeq
    val one = new java.io.File(table, ".crash-tmp")
    spark.read.parquet(victim.toString).limit(5).coalesce(1)
      .write.mode("overwrite").parquet(one.toString)
    val part = one.listFiles().filter(_.getName.endsWith(".parquet")).head
    val staging = new java.io.File(victim, ".finalize-staging")
    staging.mkdirs()
    val stagedPart = new java.io.File(staging, part.getName)
    assert(part.renameTo(stagedPart))
    val state = (s"1" :: "1" :: List(part.getName).sorted).mkString("\\n")
    val manifest = (s"MOVE\t$stagedPart\t$victim/${part.getName}" +:
      old.map(f => s"DEL\t$f") :+ s"STATE\t$state").mkString("", "\n", "\n")
    java.nio.file.Files.write(
      new java.io.File(victim, ".finalize-commit").toPath,
      manifest.getBytes("UTF-8"))

    // next sweep: recovery applies the pending round FIRST, then treats
    // its output as finalized — the 5 committed rows must survive even
    // under a sampler that would drop EVERYTHING (proof nothing
    // committed is ever re-sampled)
    val dropAll = (df: DataFrame) => df.filter(lit(false))
    Finalize.finalizeSegments(spark, root, spec, dropAll,
      now = sweepNow, graceDays = 1)
    spark.catalog.refreshByPath(Layout.path(root, spec))
    val live = victim.listFiles().filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith(".")).map(_.getName)
    assert(live.toSeq == Seq(part.getName),
      s"recovery must install exactly the committed round, got ${live.toSeq}")
    assert(!new java.io.File(victim, ".finalize-commit").exists())
    assert(spark.read.parquet(victim.toString).count() == 5,
      "committed rows were re-sampled after the crash")
  }

  test("compaction preserves finalized state: committed survivors never re-enter the sampler") {
    val root = tmp("finalize_compact")
    // many small appends → multi-file directories worth compacting
    (0 until 3).foreach { i =>
      Layout.append(spans.filter(pmod(col("event_id"), lit(3L)) === i), root, spec)
    }
    val r1 = Finalize.finalizeSegments(spark, root, spec, sampler,
      now = sweepNow, graceDays = 1)
    assert(r1.nonEmpty)
    val afterSweep = rows(root)
    // compact the fully-finalized layout, then sweep with a DROP-ALL
    // sampler: if compaction lost the finalized state, the committed
    // survivors would all vanish here
    assert(Layout.compactSegments(spark, root, spec).nonEmpty)
    val dropAll = (df: DataFrame) => df.filter(lit(false))
    assert(Finalize.finalizeSegments(spark, root, spec, dropAll,
      now = sweepNow, graceDays = 1).isEmpty,
      "compacted fully-finalized directories re-entered the sweep")
    assert(rows(root) == afterSweep, "compaction+sweep mutated committed rows")

    // mixed case: new un-finalized rows land, then compaction merges them
    // with finalized files — min-propagation makes the whole directory
    // re-enter the sweep (and the keep-stable sampler keeps survivors)
    Layout.append(spans.limit(50), root, spec)
    assert(Layout.compactSegments(spark, root, spec).nonEmpty)
    val r2 = Finalize.finalizeSegments(spark, root, spec, sampler,
      now = sweepNow, graceDays = 1)
    assert(r2.nonEmpty, "mixed directory must re-enter the sweep")
    assert(afterSweep.subsetOf(rows(root)),
      "keep-stable sampler dropped previously committed rows in the mixed re-sweep")
  }

  test("segments inside the grace window are left alone") {
    val root = tmp("finalize_grace")
    Layout.append(spans, root, spec, mode = "overwrite")
    val before = rows(root)
    // sweep clock inside the data's own window → nothing is cooled
    val r = Finalize.finalizeSegments(spark, root, spec, sampler,
      now = java.time.Instant.parse("2024-01-02T00:00:00Z"), graceDays = 30)
    assert(r.isEmpty)
    assert(rows(root) == before)
  }
}
