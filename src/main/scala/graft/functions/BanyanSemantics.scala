package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The semantic quirks of the reference that plain SQL gets WRONG, each as a
 * composable Column/DataFrame transform (SURVEY.md §2.4, §7.3). All are
 * built from codegen'd built-ins — no UDFs — so they stay inside
 * whole-stage codegen and scale like any native aggregate.
 */
object BanyanSemantics {

  /**
   * MEAN over an INT field (pkg/query/aggregation/function.go:31-40,62-71):
   * `sum / count` computed in the field's type — i.e. *integer division*
   * for int64 fields — then clamped so any result < 1 becomes 1.
   * Spark's `avg` (double division, no clamp) is wrong; this is the
   * faithful aggregate. Works as a grouped or global aggregate; partial
   * aggregation (map-side sum+count combine) is native.
   */
  def banyanMeanLong(field: Column): Column = {
    val q = longDiv(sum(field), count(field))
    when(q < 1, lit(1L)).otherwise(q)
  }

  /** int64 division with truncation toward zero (Go semantics) — Spark's
    * `DIV` (IntegralDivide) has exactly this behavior. */
  def longDiv(a: Column, b: Column): Column = call_function("div", a, b)

  /**
   * MEAN over a FLOAT field: plain double division, same <1→1 clamp
   * (function.go applies the clamp for both types).
   */
  def banyanMeanDouble(field: Column): Column = {
    val m = sum(field) / count(field)
    when(m < 1.0, lit(1.0)).otherwise(m)
  }

  /**
   * Latest-version-wins dedup (banyand/measure/query.go:966-1026): among
   * rows sharing (series, timestamp), only the highest `version` survives.
   * Must run BEFORE any aggregation or counts drift (SURVEY §7.4.2).
   *
   * Scale shape: [[MinStructAgg.minStruct]] over (-version, payload) —
   * the lexicographic minimum IS the max-version row. Same
   * ObjectHashAggregate plan as [[firstSeenRow]]: partial aggregation
   * (map-side combine collapses duplicate versions before the shuffle),
   * ONE buffered row per (series, ts), no per-partition sort — a
   * `Window.partitionBy` here pays a full sort of every row for a
   * row_number that is immediately filtered to 1, and breaks version
   * ties nondeterministically; the aggregate refines ties to the
   * lexicographic payload minimum. Version must be numeric (int64 in
   * the reference, model/v1/common.proto DataPoint.version). On a layout
   * bucketed by entity the shuffle disappears entirely.
   */
  def latestVersion(df: DataFrame, seriesCols: Seq[String], tsCol: String,
      versionCol: String, keep: Option[Seq[String]] = None): DataFrame = {
    val keys = seriesCols :+ tsCol
    // `keep` prunes the buffered payload to what the query actually needs:
    // Catalyst cannot prune columns INSIDE an aggregate's struct child, so
    // without it every wide column rides through the buffers and shuffle.
    val payload = keep
      .map(k => (k :+ versionCol).distinct.filterNot(keys.contains)
        .filter(df.columns.contains))
      .getOrElse(df.columns.filterNot(keys.contains).toSeq)
    val fields = negate(col(versionCol)).as("__negv") +: payload.map(col(_))
    df.groupBy(keys.map(col): _*)
      .agg(MinStructAgg.minStruct(struct(fields: _*)).as("__lv"))
      .select(keys.map(col) ++ payload.map(c => col(s"__lv.`$c`").as(c)): _*)
  }

  /**
   * GROUP BY without aggregation emits the FIRST-SEEN row per group with
   * all projected tags/fields (measure_plan_aggregation.go absent-agg case;
   * vec contract pkg/query/vectorized/measure/plan/analyzer.go:55-58).
   * "First-seen" in the reference is scan order = (series, ts) order; we
   * make it deterministic as (ts, version) — Spark's `first()` is
   * explicitly non-deterministic and must not be used here.
   *
   * Scale shape: [[MinStructAgg.minStruct]] over a struct whose leading
   * fields are the order key — lexicographic struct ordering makes this
   * exactly "row with the smallest (order key, payload)", and the
   * aggregate partial-aggregates (ObjectHashAggregate, map-side combine,
   * ONE buffered row per group). The reference's normal group keys are
   * LOW cardinality (a handful of tag values,
   * measure_plan_groupby.go:127-188), which would funnel whole groups
   * through single tasks under a `Window.partitionBy`; the aggregate form
   * never does. Payload columns participate in the comparison after the
   * order key, which only matters on exact order-key ties — where the
   * reference's own result is scan-order-dependent; taking the
   * lexicographic minimum is a deterministic refinement of it.
   *
   * `orderCols` must be plain ascending columns (the first-seen order is
   * always (ts, version) asc in the reference's merge).
   */
  def firstSeenRow(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      payload: Seq[String]): DataFrame = {
    val ordFields = orderCols.zipWithIndex.map { case (c, i) => c.as(s"__ord$i") }
    val fields = ordFields ++ payload.map(col)
    val agged = df.groupBy(groupCols.map(col): _*)
      .agg(MinStructAgg.minStruct(struct(fields: _*)).as("__fs"))
    agged.select(groupCols.map(col) ++ payload.map(c => col(s"__fs.`$c`").as(c)): _*)
  }

  /**
   * Stream element dedup (stream_plan_distributed.go:187-207;
   * vec distinct.go:31-60): first occurrence per element_id after the
   * global sorted merge. Kept as a window (unlike [[firstSeenRow]]):
   * element_id is HIGH cardinality (one group per element), so partitions
   * are tiny and plentiful — no single-task funnel — and the window
   * supports the query's arbitrary asc/desc sort order directly.
   */
  def dedupByElementId(df: DataFrame, elementIdCol: String, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(elementIdCol)).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
