package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * Native kernels for product quantization (Jégou et al. 2011, "Product
 * Quantization for Nearest Neighbor Search") — the memory-side ANN scale
 * path beside IVF's data-pruning one: a `dim`-float vector compresses to
 * `nBlocks` small codes (one byte each at 256 codes/block), and search
 * scores the CODES against a query without decompressing the corpus. At
 * 100 TB this is what makes an in-memory candidate rerank possible at
 * all: 64 floats (256 B) become 8 codes (8 B), a 32× smaller index.
 *
 * Distance contract (engine-portable, oracle-recomputable):
 * - per block `b`, `dsq_b = Σ_i (x_i − c_i)²` accumulated in
 *   dimension-ascending order (IEEE binary64 — any engine repeating the
 *   order computes the identical double);
 * - encode: `code_b = argmin_c dsq_b(c)`, ties to the LOWER code;
 * - asymmetric distance (ADC): `Σ_b round(dsq_b · 1e6)` as int64 — each
 *   block's contribution is rounded to integer micros BEFORE the
 *   cross-block sum, so the total is an exact integer sum, order-free
 *   (the same micros trick as [[graft.operators.CorpusStats]]).
 *
 * Why kernels: the composed-Column form of encode is `codesPerBlock`
 * nested struct-min subtrees per block — megabytes of generated code at
 * production sizes, evaluated per row. Here the codebook is ONE flat
 * double[] reference object and both encode and ADC are single fused
 * primitive loops (`nBlocks·codesPerBlock·sub` multiply-adds), codegen'd.
 */
object PqImpl {

  /** argmin-L2 code per block; cb is [((b·codesPerBlock)+c)·sub + i] flat. */
  def encode(vec: ArrayData, cb: Array[Double], nBlocks: Int,
      codesPerBlock: Int, isFloat: Boolean): ArrayData = {
    val sub = cb.length / (nBlocks * codesPerBlock)
    val out = new Array[Any](nBlocks)
    var b = 0
    while (b < nBlocks) {
      var bestCode = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < codesPerBlock) {
        val base = (b * codesPerBlock + c) * sub
        var acc = 0.0
        var i = 0
        while (i < sub) {
          val x = if (isFloat) vec.getFloat(b * sub + i).toDouble
            else vec.getDouble(b * sub + i)
          val t = x - cb(base + i)
          acc += t * t
          i += 1
        }
        if (acc < bestD) { bestD = acc; bestCode = c }
        c += 1
      }
      out(b) = bestCode.toLong
      b += 1
    }
    new GenericArrayData(out)
  }

  /** ADC micros between a code array and a raw query vector. */
  def adcMicros(codes: ArrayData, qvec: ArrayData, cb: Array[Double],
      nBlocks: Int, codesPerBlock: Int, isFloat: Boolean): Long = {
    val sub = cb.length / (nBlocks * codesPerBlock)
    var total = 0L
    var b = 0
    while (b < nBlocks) {
      val code = codes.getLong(b).toInt
      val base = (b * codesPerBlock + code) * sub
      var acc = 0.0
      var i = 0
      while (i < sub) {
        val x = if (isFloat) qvec.getFloat(b * sub + i).toDouble
          else qvec.getDouble(b * sub + i)
        val t = x - cb(base + i)
        acc += t * t
        i += 1
      }
      total += Math.round(acc * 1e6)
      b += 1
    }
    total
  }

  /** Exact squared-L2 micros between two raw vectors (dimension-ascending
    * accumulation, ONE rounding at the end) — the ground-truth metric the
    * PQ paths approximate. */
  def l2sqMicros(a: ArrayData, bv: ArrayData, aFloat: Boolean,
      bFloat: Boolean): Long = {
    val n = math.min(a.numElements(), bv.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) bv.getFloat(i).toDouble else bv.getDouble(i)
      val t = x - y
      acc += t * t
      i += 1
    }
    Math.round(acc * 1e6)
  }

  def isFloatArr(dt: DataType, what: String): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"$what requires array<float|double>, got $other")
  }
}

/** pqEncode(vec) → array<long> of length nBlocks (argmin-L2 codes). */
case class PqEncodeExpr(child: Expression, cb: Array[Double], nBlocks: Int,
    codesPerBlock: Int) extends UnaryExpression {

  private def isFloat: Boolean = PqImpl.isFloatArr(child.dataType, "pqEncode")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PqImpl.encode(input.asInstanceOf[ArrayData], cb, nBlocks, codesPerBlock, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", cb, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqImpl.encode($c, $ref, $nBlocks, $codesPerBlock, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pqAdcMicros(codes, qvec) → int64 asymmetric distance in micros. */
case class PqAdcMicrosExpr(left: Expression, right: Expression,
    cb: Array[Double], nBlocks: Int, codesPerBlock: Int)
  extends BinaryExpression {

  private def qIsFloat: Boolean = PqImpl.isFloatArr(right.dataType, "pqAdcMicros")

  override def dataType: DataType = LongType

  override def nullSafeEval(codes: Any, qvec: Any): Any =
    PqImpl.adcMicros(codes.asInstanceOf[ArrayData], qvec.asInstanceOf[ArrayData],
      cb, nBlocks, codesPerBlock, qIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", cb, "double[]")
    defineCodeGen(ctx, ev, (c, q) =>
      s"graft.functions.PqImpl.adcMicros($c, $q, $ref, $nBlocks, $codesPerBlock, $qIsFloat)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** l2sqMicros(a, b) → int64 exact squared-L2 distance in micros. */
case class L2SqMicrosExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  private def aFloat: Boolean = PqImpl.isFloatArr(left.dataType, "l2sqMicros")
  private def bFloat: Boolean = PqImpl.isFloatArr(right.dataType, "l2sqMicros")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    PqImpl.l2sqMicros(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PqImpl.l2sqMicros($a, $b, $aFloat, $bFloat)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PqFunctions {
  def pqEncode(vec: Column, cb: Array[Double], nBlocks: Int,
      codesPerBlock: Int): Column =
    Bridge.column(PqEncodeExpr(Bridge.expression(vec), cb, nBlocks, codesPerBlock))

  def pqAdcMicros(codes: Column, qvec: Column, cb: Array[Double],
      nBlocks: Int, codesPerBlock: Int): Column =
    Bridge.column(PqAdcMicrosExpr(Bridge.expression(codes),
      Bridge.expression(qvec), cb, nBlocks, codesPerBlock))

  def l2sqMicros(a: Column, b: Column): Column =
    Bridge.column(L2SqMicrosExpr(Bridge.expression(a), Bridge.expression(b)))
}
