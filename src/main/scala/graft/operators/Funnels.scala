package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-sequence analytics over the stream/measure surface: ordered
 * conversion funnels and cohort retention — the two queries every
 * event-analytics deployment runs on exactly the data shape the engine
 * stores (entity, event time, event type).
 *
 * Scale shapes: [[funnel]] is one partial-aggregated shuffle on the
 * entity per STEP (steps are a small fixed list — k aggregates, no
 * per-entity event collection, no window over history). [[retention]]
 * is two partial-aggregated shuffles (first-seen cohort, then distinct
 * active periods). Nothing collects events per entity into memory —
 * unlike the collect-and-fold funnel form, a billion-event entity costs
 * only its aggregate updates.
 */
object Funnels {

  /**
   * Ordered funnel: for each entity, the earliest time it completed each
   * step of `steps` IN ORDER — step k counts only strictly AFTER the
   * entity's step-(k−1) completion time (the strict inequality makes
   * equal-timestamp events unambiguous across engines). A null step time
   * means the funnel stopped there; `depth` is the number of completed
   * steps.
   *
   * @param steps predicate values of `stepCol`, in funnel order
   * @return (entityCol, t0_ms..t{k-1}_ms, depth)
   */
  def funnel(df: DataFrame, entityCol: String, tsNsCol: String,
      stepCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = df.select(col(entityCol), expr(s"$tsNsCol DIV 1000000").as("__ts"),
      col(stepCol).as("__step"))
    // t0 over all entities; each later step left-joins the previous
    // frontier and keeps min ts strictly after it
    val first = e.filter(col("__step") === steps.head)
      .groupBy(entityCol).agg(min("__ts").as("t0_ms"))
    val full = steps.zipWithIndex.tail.foldLeft(first) { case (acc, (s, i)) =>
      val prev = s"t${i - 1}_ms"
      val cur = s"t${i}_ms"
      val nxt = e.filter(col("__step") === s)
        .join(acc.select(col(entityCol), col(prev)), entityCol)
        .filter(col("__ts") > col(prev))
        .groupBy(entityCol).agg(min("__ts").as(cur))
      acc.join(nxt.select(col(entityCol), col(cur)), Seq(entityCol), "left")
    }
    val depth = steps.indices.map(i => when(col(s"t${i}_ms").isNotNull, 1)
      .otherwise(0)).reduce(_ + _)
    full.withColumn("depth", depth.cast("long"))
  }

  /** Per-stage conversion counts from a [[funnel]] result: how many
    * entities reached at least stage k. */
  def funnelCounts(funnelDf: DataFrame, nSteps: Int): DataFrame =
    funnelDf.select((0 until nSteps).map(i =>
        sum(when(col("depth") > i, 1L).otherwise(0L)).as(s"n_stage$i")): _*)

  /**
   * Cohort retention: entities cohort by the period of their FIRST event;
   * retention at offset k = how many of a cohort's entities were active
   * k periods after it. Standard weekly/monthly retention triangle when
   * `periodMs` is a week/month.
   *
   * @return (cohort_ms, k, n_entities), k ≥ 0
   */
  def retention(df: DataFrame, entityCol: String, tsNsCol: String,
      periodMs: Long): DataFrame = {
    require(periodMs > 0, "periodMs must be positive")
    import graft.functions.BanyanSemantics.longDiv
    val period = longDiv(expr(s"$tsNsCol DIV 1000000"), lit(periodMs))
    val active = df.select(col(entityCol), period.as("__p")).distinct()
    val cohort = active.groupBy(entityCol).agg(min("__p").as("__c"))
    active.join(cohort, entityCol)
      .groupBy((col("__c") * periodMs).as("cohort_ms"),
        (col("__p") - col("__c")).as("k"))
      .agg(count(lit(1)).as("n_entities"))
  }
}
