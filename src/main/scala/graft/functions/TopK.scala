package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/**
 * Bounded top-k aggregate: keeps at most k rows per group — in every
 * PARTIAL aggregation buffer — ordered by the given struct fields. This
 * replaces the `Window.partitionBy(query_id)` + row_number pattern, which
 * funnels an entire group through a single task: here each map task
 * reduces its slice to ≤ k entries before the shuffle, so state and
 * shuffle volume are O(k × groups × partitions) regardless of input size.
 *
 * Mirrors the reference's bounded result heaps
 * (pkg/query/logical/measure/measure_plan_top.go:44-168, the
 * `counters_number` heap pkg/flow/streaming/topn_heap.go) at the Spark
 * aggregate altitude. A native TypedImperativeAggregate rather than a
 * udaf `Aggregator`: plans into ObjectHashAggregate either way, but
 * without the ExpressionEncoder serialization machinery — less generated
 * code (single-shot queries pay janino compilation up front) and no
 * per-row case-class conversion.
 *
 * `orderKeys` are (struct field index, descending) pairs compared
 * lexicographically; include a unique field (id/entity) for deterministic
 * results. Nulls order first, matching Spark's ascending-sort default.
 */
final class TopKRows(val rows: java.util.ArrayList[InternalRow])

case class BoundedTopKAgg(
    child: Expression,
    n: Int,
    orderKeys: Seq[(Int, Boolean)],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRows] with UnaryLike[Expression] {

  require(n > 0, "top-k bound must be positive")

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val fieldOrds: Array[(Int, Boolean, Ordering[Any])] =
    orderKeys.map { case (idx, desc) =>
      (idx, desc, org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(structType(idx).dataType))
    }.toArray

  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  /** lexicographic rank comparison: negative when a ranks before b. */
  private def compare(a: InternalRow, b: InternalRow): Int = {
    var i = 0
    while (i < fieldOrds.length) {
      val (idx, desc, ord) = fieldOrds(i)
      val dt = structType(idx).dataType
      val (x, y) = (a.get(idx, dt), b.get(idx, dt))
      val c =
        if (x == null && y == null) 0
        else if (x == null) -1
        else if (y == null) 1
        else ord.compare(x, y)
      if (c != 0) return if (desc) -c else c
      i += 1
    }
    0
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"

  override def createAggregationBuffer(): TopKRows =
    new TopKRows(new java.util.ArrayList[InternalRow](n))

  private def insert(buf: TopKRows, row: InternalRow, copy: Boolean): Unit = {
    val rows = buf.rows
    val size = rows.size()
    if (size >= n && compare(row, rows.get(size - 1)) >= 0) return
    // binary search for the first element `row` ranks strictly before
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (compare(row, rows.get(mid)) < 0) hi = mid else lo = mid + 1
    }
    rows.add(lo, if (copy) row.copy() else row)
    if (rows.size() > n) rows.remove(n)
  }

  override def update(buffer: TopKRows, input: InternalRow): TopKRows = {
    val v = child.eval(input)
    if (v != null) insert(buffer, v.asInstanceOf[InternalRow], copy = true)
    buffer
  }

  override def merge(buffer: TopKRows, other: TopKRows): TopKRows = {
    val it = other.rows.iterator()
    while (it.hasNext) insert(buffer, it.next(), copy = false)
    buffer
  }

  override def eval(buffer: TopKRows): Any =
    new GenericArrayData(buffer.rows.toArray.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKRows): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buffer.rows.size())
    val it = buffer.rows.iterator()
    while (it.hasNext) {
      val bytes = toUnsafe(it.next()).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKRows = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val count = in.readInt()
    val rows = new java.util.ArrayList[InternalRow](math.max(count, n))
    var i = 0
    while (i < count) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(structType.length)
      row.pointTo(b, len)
      rows.add(row)
      i += 1
    }
    new TopKRows(rows)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopKAgg =
    copy(child = newChild)
}

object TopK {
  private def agg(c: Column, n: Int, orderKeys: Seq[(Int, Boolean)]): Column =
    Bridge.column(
      BoundedTopKAgg(Bridge.expression(c), n, orderKeys).toAggregateExpression())

  /** topK(k)(simCol, idCol) → array<struct<sim,id>>, best-first
    * (sim desc, id asc). */
  def topK(k: Int)(sim: Column, id: Column): Column =
    agg(struct(sim.as("sim"), id.as("id")), k, Seq((0, true), (1, false)))

  /** topNEntities(n, desc)(entityCol, valueCol) →
    * array<struct<entity,value>> in rank order (value desc|asc, entity asc). */
  def topNEntities(n: Int, desc: Boolean)(entity: Column, value: Column): Column =
    agg(struct(entity.as("entity"), value.as("value")), n, Seq((1, desc), (0, false)))
}
