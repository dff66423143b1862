package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Lexicographic minimum over a struct input — the aggregate behind the
 * reference's GROUP-BY-without-aggregation "first-seen row per group"
 * (measure_plan_aggregation.go absent-agg case): pack (order key, payload)
 * into a struct, keep the smallest.
 *
 * Why not `min(struct(...))`: Spark's declarative `Min` over a struct
 * carries the struct in the aggregation buffer, which the UnsafeRow-based
 * HashAggregate cannot hold — the plan silently degrades to SortAggregate
 * (a full per-partition sort of the input by the group key). This
 * TypedImperativeAggregate plans into ObjectHashAggregate instead: hash
 * probing with exactly ONE buffered row per group, partial aggregation
 * (map-side combine) included, no sort and no window — the shape that
 * survives the reference's low-cardinality group keys at 100 TB.
 */
/** Mutable one-row buffer (a bare InternalRow type parameter would clash
  * with TypedImperativeAggregate's final untyped overloads). */
final class MinRowBuffer(var row: InternalRow)

case class MinStructAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinRowBuffer] with UnaryLike[Expression] {

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val ordering: Ordering[InternalRow] =
    org.apache.spark.sql.catalyst.expressions.RowOrdering
      .createNaturalAscendingOrdering(structType.fields.map(_.dataType).toSeq)

  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "min_struct"

  override def createAggregationBuffer(): MinRowBuffer = new MinRowBuffer(null)

  override def update(buffer: MinRowBuffer, input: InternalRow): MinRowBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // incoming rows are often reused mutable buffers — copy before keeping
      if (buffer.row == null || ordering.compare(row, buffer.row) < 0)
        buffer.row = row.copy()
    }
    buffer
  }

  override def merge(buffer: MinRowBuffer, other: MinRowBuffer): MinRowBuffer = {
    if (other.row != null &&
        (buffer.row == null || ordering.compare(other.row, buffer.row) < 0))
      buffer.row = other.row
    buffer
  }

  override def eval(buffer: MinRowBuffer): Any = buffer.row

  override def serialize(buffer: MinRowBuffer): Array[Byte] =
    if (buffer.row == null) Array.emptyByteArray
    else toUnsafe(buffer.row).getBytes

  override def deserialize(bytes: Array[Byte]): MinRowBuffer =
    if (bytes.isEmpty) new MinRowBuffer(null)
    else {
      val row = new UnsafeRow(structType.length)
      row.pointTo(bytes, bytes.length)
      new MinRowBuffer(row)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinStructAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinStructAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinStructAgg =
    copy(child = newChild)
}

object MinStructAgg {
  /** Column form: minStruct(struct(...)) → the lexicographically smallest
    * struct value of the group. */
  def minStruct(c: Column): Column =
    Bridge.column(MinStructAgg(Bridge.expression(c)).toAggregateExpression())
}
