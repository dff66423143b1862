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

object TopK {
  /** Column function: topK(k)(simCol, idCol) → array<struct<sim,id>>,
    * best-first. */
  def topK(k: Int)(sim: Column, id: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[ScoredId]).apply(sim, id)
}
