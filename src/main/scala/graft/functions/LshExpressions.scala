package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * Native kernel for the random-hyperplane LSH bucket id
 * ([[graft.operators.Similarity.lshBucket]] semantics, bit-identical):
 * bit p is set iff Σ_d vec[d]·sign(p,d) ≥ 0, signs from the fixed LCG
 * (engine-portable — the SQL oracle recomputes them).
 *
 * The composed form (`aggregate`/`zip_with` higher-order functions) is
 * evaluated INTERPRETED — nPlanes×dim lambda invocations per row outside
 * whole-stage codegen, the exact pattern [[SketchExpressions]] exists to
 * avoid. Here the sign matrix is resolved to a flat double[] at plan time
 * and the whole bucket computation is one fused primitive loop, codegen'd.
 * Summation order is d ascending per plane — identical floating-point
 * association to the interpreted fold and the oracle's list_reduce.
 */
object LshImpl {

  /** ±1 hyperplane entries from the fixed LCG, flat [p*dim + d] layout —
    * the literal form of Similarity.planeSign. */
  def signs(dim: Int, nPlanes: Int): Array[Double] = {
    val out = new Array[Double](nPlanes * dim)
    var p = 0
    while (p < nPlanes) {
      var d = 0
      while (d < dim) {
        val h = (1103515245L * (p.toLong * dim + d + 1) + 12345L) % 2147483647L
        out(p * dim + d) = if (h < 1073741823L) 1.0 else -1.0
        d += 1
      }
      p += 1
    }
    out
  }

  /** bucket id over a double[] vector (already cast). */
  def bucket(vec: ArrayData, signs: Array[Double], dim: Int, nPlanes: Int,
      isFloat: Boolean): Long = {
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      val base = p * dim
      var d = 0
      while (d < dim) {
        val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
        acc += x * signs(base + d)
        d += 1
      }
      if (acc >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }
}

/** lshBucket(vec, dim, nPlanes) → long sign-pattern bucket id. */
case class LshBucketExpr(child: Expression, dim: Int, nPlanes: Int)
    extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"lshBucket requires array<float|double>, got $other")
  }

  @transient private lazy val signsArr: Array[Double] = LshImpl.signs(dim, nPlanes)

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    LshImpl.bucket(input.asInstanceOf[ArrayData], signsArr, dim, nPlanes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshSigns", signsArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshImpl.bucket($c, $ref, $dim, $nPlanes, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshFunctions {
  def lshBucket(vec: Column, dim: Int, nPlanes: Int): Column =
    Bridge.column(LshBucketExpr(Bridge.expression(vec), dim, nPlanes))
}
