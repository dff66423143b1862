package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Tail-based trace retention (the reference's trace pipeline,
 * `common/v1/common.proto:156-177` TracePipelineConfig + the
 * latency-status sampler exercised by `test/cases/tracepipeline/
 * ops.go:146-177`): a group-scoped sampler decides KEEP or DROP per
 * complete trace when parts merge; dropped traces never reach long-term
 * storage.
 *
 * Spark shape: the verdict is a trace-level AGGREGATE over the span
 * frame, and retention is a semi-join of spans against the kept trace
 * ids — two partial-aggregated shuffles on the trace id, nothing
 * unbounded. On a 100 TB span stream the same plan runs per time window
 * (the analogue of per-merge sampling), with AQE free to broadcast the
 * kept-id side when a window's trace count is small.
 *
 * Fail-open (`ops.go:110-118` NewPanicPipelineConfig: a panicking sampler
 * retains all traces): a verdict of NULL — the expression analogue of a
 * crashed plugin — KEEPS the trace via the coalesce in [[sampleTraces]].
 */
object TracePipeline {

  /**
   * The latency-status verdict (`ops.go:146-151`): DROP a trace iff its
   * duration is below `thresholdMs` AND its status is "success"; errors,
   * high-latency traces, and traces with no status survive. SQL NULL
   * propagation does the no-status arm for free: `null === "success"` is
   * NULL, and NULL verdicts are kept.
   */
  def latencyStatusKeep(durationMs: Column, status: Column, thresholdMs: Long): Column =
    !(durationMs < lit(thresholdMs) && status === "success")

  /**
   * Retain only the spans of kept traces. `keepAgg` is any aggregate
   * Column over one trace's spans evaluating to a keep verdict —
   * NULL/true keep, false drops (fail-open).
   */
  def sampleTraces(spans: DataFrame, traceIdCol: String, keepAgg: Column): DataFrame = {
    val kept = spans.groupBy(col(traceIdCol))
      .agg(keepAgg.as("__keep"))
      .filter(coalesce(col("__keep"), lit(true)))
      .select(traceIdCol)
    spans.join(kept, Seq(traceIdCol), "left_semi")
  }

  /**
   * The canonical pipeline: latency-status sampling over a span frame
   * carrying per-span duration (ms) and status tags. Trace duration is
   * the max span duration (the root span covers the trace); trace status
   * is "error" if ANY span errored, else "success" if any span reported
   * success, else NULL (no status → kept).
   */
  def latencyStatusSample(spans: DataFrame, traceIdCol: String,
      durationMsCol: String, statusCol: String, thresholdMs: Long = 500): DataFrame = {
    val traceStatus = when(max(when(col(statusCol) === "error", 1).otherwise(0)) === 1, "error")
      .otherwise(max(col(statusCol)))
    sampleTraces(spans, traceIdCol,
      latencyStatusKeep(max(col(durationMsCol)), traceStatus, thresholdMs))
  }
}
