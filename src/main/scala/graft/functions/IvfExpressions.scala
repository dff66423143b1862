package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * Native kernel for IVF coarse-quantizer cell assignment
 * ([[graft.operators.Similarity.ivfTopK]]): score a vector against all
 * `nlist` centroids (cosine, double accumulation in dimension-ascending
 * order — bit-identical to [[CosineSimilarity]] and the SQL oracle's
 * recomputation) and return the `nprobe` nearest cell ids, nearest first,
 * ties to the LOWER centroid id.
 *
 * Why a kernel and not composed Columns: the composed form built an
 * `array(struct(cosine(v, [literal…]), -cid), …)` with nlist cosine
 * subtrees — at production nlist (thousands) that is a megabyte-scale
 * generated expression evaluated once per row PER REFERENCE (best cell and
 * probe list each inlined it). Here the centroid matrix is ONE flat
 * double[] reference object and the whole assignment is one fused
 * primitive loop: nlist×dim multiply-adds plus an O(nlist·nprobe)
 * partial selection, codegen'd, evaluated exactly once per row.
 */
object IvfImpl {

  /** nprobe nearest centroid ids for `vec`; cents is [c*dim + d] flat. */
  def probeCells(vec: ArrayData, cents: Array[Double], cids: Array[Long],
      dim: Int, nprobe: Int, isFloat: Boolean): ArrayData = {
    val n = cids.length
    val scores = new Array[Double](n)
    val m = math.min(dim, vec.numElements())
    var c = 0
    while (c < n) {
      val base = c * dim
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var d = 0
      while (d < m) {
        val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
        val y = cents(base + d)
        dot += x * y; na += x * x; nb += y * y
        d += 1
      }
      scores(c) = if (na == 0.0 || nb == 0.0) 0.0
        else dot / (math.sqrt(na) * math.sqrt(nb))
      c += 1
    }
    val k = math.min(nprobe, n)
    val taken = new Array[Boolean](n)
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      var best = -1
      var i = 0
      while (i < n) {
        if (!taken(i) && (best < 0 || scores(i) > scores(best) ||
          (scores(i) == scores(best) && cids(i) < cids(best)))) best = i
        i += 1
      }
      taken(best) = true
      out(j) = cids(best)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** ivfProbeCells(vec) → array<long> of the nprobe nearest cell ids. */
case class IvfProbeCellsExpr(child: Expression, cents: Array[Double],
    cids: Array[Long], dim: Int, nprobe: Int) extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"ivfProbeCells requires array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    IvfImpl.probeCells(input.asInstanceOf[ArrayData], cents, cids, dim, nprobe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[]")
    val idRef = ctx.addReferenceObj("ivfCids", cids, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IvfImpl.probeCells($c, $cRef, $idRef, $dim, $nprobe, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfFunctions {
  /** The nprobe nearest cells, nearest first (element 1 = best cell). */
  def probeCells(vec: Column, cents: Array[Double], cids: Array[Long],
      dim: Int, nprobe: Int): Column =
    Bridge.column(IvfProbeCellsExpr(Bridge.expression(vec), cents, cids, dim, nprobe))
}
