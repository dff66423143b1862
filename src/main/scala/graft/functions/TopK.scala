package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate flowing into the top-k aggregate. */
final case class ScoredId(sim: Double, id: Long)

/**
 * Bounded top-k aggregate: keeps at most k (sim desc, id asc)-best entries
 * per group, in every PARTIAL aggregation buffer. This replaces the
 * `Window.partitionBy(query_id)` + row_number pattern, which funnels the
 * entire scored corpus for one query through a single task. Here each map
 * task reduces its slice to ≤ k entries before the shuffle, so state and
 * shuffle volume are O(k × queries × partitions) regardless of corpus
 * size — the shape that survives a 100× scale-up.
 *
 * Mirrors the reference's bounded result heaps
 * (pkg/query/logical/measure/measure_plan_top.go:44-168, topn heaps
 * pkg/flow/streaming/topn_heap.go) at the Spark Aggregator altitude.
 */
final class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  /** true when a ranks strictly before b: sim desc, id asc tiebreak. */
  private def before(a: ScoredId, b: ScoredId): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.id < b.id)

  private def insert(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
    if (buf.size >= k && !before(a, buf.last)) buf
    else {
      val idx = buf.indexWhere(e => before(a, e))
      val out = if (idx < 0) buf :+ a
        else (buf.take(idx) :+ a) ++ buf.drop(idx)
      if (out.size > k) out.take(k) else out
    }
  }

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = insert(buf, a)
  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    b2.foldLeft(b1)(insert)
  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf
  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

/** One ranked entity flowing into the bounded per-bucket top-n aggregate. */
final case class RankedEntity(entity: String, value: Long)

/**
 * Bounded per-group top-n entity aggregate — the batch analogue of the
 * reference's `counters_number` heap (pkg/flow/streaming/topn.go:50-120):
 * every partial buffer holds at most n (value, entity) entries, ordered
 * (value desc|asc, entity asc). Replaces the per-bucket rank window, whose
 * state is unbounded (ALL aggregated entities of a bucket funnel through
 * one task before the `rank <= n` filter drops them).
 */
final class TopNEntityAggregator(n: Int, desc: Boolean)
    extends Aggregator[RankedEntity, Seq[RankedEntity], Seq[RankedEntity]] {

  /** true when a ranks strictly before b: value desc|asc, entity asc. */
  private def before(a: RankedEntity, b: RankedEntity): Boolean =
    if (a.value != b.value) { if (desc) a.value > b.value else a.value < b.value }
    else a.entity < b.entity

  private def insert(buf: Seq[RankedEntity], a: RankedEntity): Seq[RankedEntity] = {
    if (buf.size >= n && !before(a, buf.last)) buf
    else {
      val idx = buf.indexWhere(e => before(a, e))
      val out = if (idx < 0) buf :+ a
        else (buf.take(idx) :+ a) ++ buf.drop(idx)
      if (out.size > n) out.take(n) else out
    }
  }

  override def zero: Seq[RankedEntity] = Vector.empty
  override def reduce(buf: Seq[RankedEntity], a: RankedEntity): Seq[RankedEntity] = insert(buf, a)
  override def merge(b1: Seq[RankedEntity], b2: Seq[RankedEntity]): Seq[RankedEntity] =
    b2.foldLeft(b1)(insert)
  override def finish(buf: Seq[RankedEntity]): Seq[RankedEntity] = buf
  override def bufferEncoder: Encoder[Seq[RankedEntity]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[RankedEntity]]()
  override def outputEncoder: Encoder[Seq[RankedEntity]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[RankedEntity]]()
}

object TopK {
  /** Column function: topK(k)(simCol, idCol) → array<struct<sim,id>>,
    * best-first. */
  def topK(k: Int)(sim: Column, id: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[ScoredId]).apply(sim, id)

  /** Column function: topNEntities(n, desc)(entityCol, valueCol) →
    * array<struct<entity,value>>, rank order. */
  def topNEntities(n: Int, desc: Boolean)(entity: Column, value: Column): Column =
    udaf(new TopNEntityAggregator(n, desc), Encoders.product[RankedEntity])
      .apply(entity, value)
}
