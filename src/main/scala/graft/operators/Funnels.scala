package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Event-sequence analytics over the stream/measure surface: ordered
 * conversion funnels and cohort retention — the two queries every
 * event-analytics deployment runs on exactly the data shape the engine
 * stores (entity, event time, event type).
 *
 * Scale shapes: [[funnel]] is ONE shuffle on the entity — step events
 * hash-partition once, sort within partitions by (entity, time), and a
 * streaming per-partition fold carries an O(k) frontier per entity (no
 * per-entity event collection, no window buffering, no join per step;
 * the earlier k-join form paid k−1 entity shuffles). [[retention]]
 * is two partial-aggregated shuffles (first-seen cohort, then distinct
 * active periods). Nothing collects events per entity into memory —
 * a billion-event entity costs only its sorted scan.
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
   * The per-entity recurrence (t_k = earliest step-k event after t_{k−1})
   * is inherently sequential in event time, so it cannot partial-aggregate
   * in arbitrary order; the scalable exact form is the one every columnar
   * event store uses: co-locate an entity's step events with one hash
   * exchange, external-sort within partitions, fold each entity's run with
   * a k-slot frontier. `mapPartitions` is justified here (not a
   * convenience): the fold's state transition reads its OWN earlier
   * output, which no Catalyst aggregate/window can express without
   * buffering whole entity histories.
   *
   * @param steps predicate values of `stepCol`, in funnel order (repeats
   *              allowed — each occurrence must be strictly later)
   * @return (entityCol, t0_ms..t{k-1}_ms, depth); entities that never
   *         completed step 0 are absent
   */
  def funnel(df: DataFrame, entityCol: String, tsNsCol: String,
      stepCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val k = steps.size
    // step value → ascending indices it satisfies (repeated step names
    // mean "the same event type again, strictly later")
    val stepsOf: Map[String, Array[Int]] =
      steps.zipWithIndex.groupBy(_._1).map { case (s, xs) =>
        s -> xs.map(_._2).sorted.toArray
      }
    val e = df
      .filter(col(stepCol).isin(steps.map(lit): _*) &&
        col(tsNsCol).isNotNull)
      .select(col(entityCol).as("__e"),
        expr(s"$tsNsCol DIV 1000000").as("__ts"),
        col(stepCol).cast("string").as("__s"))
    val prepared = e.repartition(col("__e"))
      .sortWithinPartitions(col("__e"), col("__ts"))
    val entityField = df.schema(entityCol)
    val outSchema = StructType(
      StructField(entityCol, entityField.dataType, entityField.nullable) +:
        (0 until k).map(i => StructField(s"t${i}_ms", LongType, nullable = true)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val folded = prepared.mapPartitions { rows =>
      new Iterator[Row] {
        private val f = Array.fill(k)(Long.MinValue) // per-step frontier
        private var cur: Any = null
        private var open = false
        private var out: Row = null
        private def close(): Row = {
          val vals = new Array[Any](k + 1)
          vals(0) = cur
          var i = 0
          while (i < k) {
            vals(i + 1) = if (f(i) == Long.MinValue) null else f(i)
            i += 1
          }
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        }
        private def consume(r: Row): Unit = {
          val ent = r.get(0)
          if (!open || ent != cur) {
            if (open && f(0) != Long.MinValue) out = close()
            cur = ent; open = true
            var i = 0; while (i < k) { f(i) = Long.MinValue; i += 1 }
          }
          val t = r.getLong(1)
          // getOrElse: the isin filter matches via native type coercion,
          // but the map is keyed on the caller's step strings — a
          // non-string stepCol can pass the filter yet render differently
          // (double 1.0 matches step "1", renders "1.0"). Such rows
          // advance no step rather than crash the fold.
          val idxs = stepsOf.getOrElse(r.getString(2), Array.emptyIntArray)
          var j = 0
          while (j < idxs.length) {
            val i = idxs(j)
            if (i == 0) { if (f(0) == Long.MinValue) f(0) = t }
            else if (f(i) == Long.MinValue && f(i - 1) != Long.MinValue &&
              t > f(i - 1)) f(i) = t
            j += 1
          }
        }
        def hasNext: Boolean = {
          while (out == null && rows.hasNext) consume(rows.next())
          if (out == null && open) {
            if (f(0) != Long.MinValue) out = close()
            open = false
          }
          out != null
        }
        def next(): Row = {
          if (!hasNext) throw new NoSuchElementException("empty funnel fold")
          val r = out; out = null; r
        }
      }
    }
    val depth = steps.indices.map(i => when(col(s"t${i}_ms").isNotNull, 1)
      .otherwise(0)).reduce(_ + _)
    folded.withColumn("depth", depth.cast("long"))
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
