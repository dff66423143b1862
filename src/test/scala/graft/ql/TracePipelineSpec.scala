package graft.ql

import graft.SparkSpec
import graft.operators.TracePipeline
import graft.sources.TableDef
import org.apache.spark.sql.functions._

/**
 * Golden-corpus slab: the TRACEPIPELINE family (test/cases/tracepipeline/
 * data/input — t_drop_*.ql / t_keep_*.ql). The queries are point lookups;
 * the semantics under test is the latency-status sampler
 * (test/cases/tracepipeline/ops.go:146-177): a trace is DROPPED iff its
 * duration < thresholdMs AND its status is "success". Fixture traces
 * mirror the reference's: errfast/errslow (errors, kept regardless of
 * latency), highlat (success ≥ threshold, kept), boundary (success at
 * exactly the threshold, kept — drop is strict <), nostatus (kept:
 * fail-open), drop_1/drop_2 (fast successes, dropped).
 */
class TracePipelineSpec extends SparkSpec {

  import spark.implicits._

  // (trace_id, span_id, duration_ms, status) — two spans per trace; the
  // root span carries the trace duration
  private lazy val spans = Seq(
    ("t-drop-1", 1L, 120L, "success"), ("t-drop-1", 2L, 40L, "success"),
    ("t-drop-2", 1L, 499L, "success"), ("t-drop-2", 2L, 10L, "success"),
    ("t-keep-boundary", 1L, 500L, "success"), ("t-keep-boundary", 2L, 20L, "success"),
    ("t-keep-errfast", 1L, 50L, "error"), ("t-keep-errfast", 2L, 10L, "success"),
    ("t-keep-errslow", 1L, 900L, "error"), ("t-keep-errslow", 2L, 800L, "success"),
    ("t-keep-highlat", 1L, 750L, "success"), ("t-keep-highlat", 2L, 30L, "success"),
    ("t-keep-nostatus", 1L, 90L, null), ("t-keep-nostatus", 2L, 10L, null))
    .toDF("trace_id", "span_id", "duration_ms", "status")

  private def keptIds(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("trace_id").distinct().collect().map(_.getString(0)).toSet

  test("t_keep_* / t_drop_*: latency-status verdicts at thresholdMs=500") {
    val sampled = TracePipeline.latencyStatusSample(
      spans, "trace_id", "duration_ms", "status", thresholdMs = 500)
    assert(keptIds(sampled) == Set("t-keep-boundary", "t-keep-errfast",
      "t-keep-errslow", "t-keep-highlat", "t-keep-nostatus"))
    // each golden query is a point lookup over the retained store
    for (t <- Seq("t-keep-boundary", "t-keep-errfast", "t-keep-errslow",
        "t-keep-highlat", "t-keep-nostatus"))
      assert(sampled.filter(col("trace_id") === t).count() == 2, t)
    for (t <- Seq("t-drop-1", "t-drop-2"))
      assert(sampled.filter(col("trace_id") === t).count() == 0, t)
  }

  test("update variant (ops.go:106-108): thresholdMs=200 flips fast successes") {
    val sampled = TracePipeline.latencyStatusSample(
      spans, "trace_id", "duration_ms", "status", thresholdMs = 200)
    // t-drop-2 (499ms success) is now ≥ 200 → kept; t-drop-1 (120ms) still drops
    assert(keptIds(sampled) ==
      keptIds(spans.filter(col("trace_id") =!= "t-drop-1")))
  }

  test("fail-open (ops.go:110-118): a NULL verdict retains the trace") {
    // verdict expression that 'crashes' (NULL) for every trace — the
    // engine's recover wrapper keeps everything
    val sampled = TracePipeline.sampleTraces(spans, "trace_id",
      max(lit(null).cast("boolean")))
    assert(keptIds(sampled) == keptIds(spans))
  }

  test("remove (ops.go:61-66): no pipeline = all traces retained") {
    val sampled = TracePipeline.sampleTraces(spans, "trace_id", max(lit(true)))
    assert(sampled.count() == spans.count())
  }

  // cases: t_drop_1.ql · t_drop_2.ql · t_keep_boundary.ql · t_keep_errfast.ql ·
  // t_keep_errslow.ql · t_keep_highlat.ql · t_keep_nostatus.ql
  test("t_drop_1.ql / t_drop_2.ql / t_keep_{boundary,errfast,errslow,highlat,nostatus}.ql: " +
      "the named golden queries over the retained store") {
    // statements verbatim (modulo the resource binding): point lookups
    // against the `filter` trace in test-trace-pipeline; the two drops are
    // WantEmpty after the filtering merge, the five keeps return one trace
    val sampled = TracePipeline.latencyStatusSample(
      spans, "trace_id", "duration_ms", "status", thresholdMs = 500)
      .withColumn("ts_ns", col("span_id") * 1000000L)
    val res = Map("filter" -> graft.ql.BydbQL.Resource(sampled,
      TableDef("filter", tsCol = Some("ts_ns")),
      traceIdCol = Some("trace_id"), spanStruct = Seq("span_id", "duration_ms")))
    def q(tid: String) = graft.ql.BydbQL.run(
      s"""SELECT trace_id FROM TRACE filter IN test-trace-pipeline
         |WHERE trace_id = '$tid'
         |LIMIT 10""".stripMargin, res)
    for (t <- Seq("t-drop-1", "t-drop-2"))
      assert(q(t).isEmpty, t)
    for (t <- Seq("t-keep-boundary", "t-keep-errfast", "t-keep-errslow",
        "t-keep-highlat", "t-keep-nostatus")) {
      val rows = q(t).collect()
      assert(rows.length == 1 && rows.head.getString(0) == t &&
        rows.head.getLong(1) == 2L, t) // one trace, both spans retained
    }
  }

  test("retained store answers the trace read path (spans intact)") {
    val sampled = TracePipeline.latencyStatusSample(
      spans, "trace_id", "duration_ms", "status", thresholdMs = 500)
    val out = graft.engine.Planners.traceSpanGroups(
      sampled.withColumn("ts_ns", col("span_id") * 1000000L),
      TableDef("traces", tsCol = Some("ts_ns")),
      graft.model.TraceQuery(groups = Seq("g"), name = "traces", limit = 10),
      traceIdCol = "trace_id", spanStruct = Seq("span_id", "duration_ms"))
    assert(out.count() == 5)
    assert(out.select("span_count").collect().forall(_.getLong(0) == 2))
  }
}
