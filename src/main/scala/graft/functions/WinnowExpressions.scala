package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native winnowing kernel (Schleimer/Wilkinson/Aiken, SIGMOD 2003):
 * one pass over the canonical text computing the md5-prefix hash of every
 * `k`-char gram and the minimum of every `w`-hash window via a monotonic
 * deque — O(grams) total, each hash pushed/popped at most once.
 *
 * Semantically identical to the composable higher-order-function form
 * (`transform(sequence(...), i -> conv(substring(md5(substr(c,i,k)),1,15),
 * 16,10))` + per-window `array_min(slice(...))` + `array_distinct`) that
 * any SQL engine can run — the hash IS the same md5 value: the first 15
 * hex chars of a digest parsed base-16 are exactly the first 8 digest
 * bytes read big-endian shifted right 4 bits, so the kernel goes digest →
 * long with no hex-string round-trip. That skip (hex encode + conv parse
 * per gram, ~300 grams/doc) plus the O(w)-per-window `slice` allocations
 * the deque replaces is the entire speedup; outputs are byte-identical
 * (asserted in CorpusShapingSuite against the composable form).
 */
object WinnowImpl {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Distinct winnowed fingerprints of `canon` (already-canonicalized
    * ASCII text): fewer than one gram → empty; fewer than `w` grams →
    * the single global minimum. First-selection order, like
    * `array_distinct` over the window scan. */
  def fingerprints(canon: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = canon.getBytes
    val m = bytes.length - (k - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val md = digests.get()
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      md.update(bytes, i, k)
      val d = md.digest()
      // first 15 hex chars base-16 == first 8 bytes big-endian >>> 4
      val h = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      hashes(i) = h >>> 4
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (m < w) {
      var min = hashes(0)
      i = 1
      while (i < m) { if (hashes(i) < min) min = hashes(i); i += 1 }
      out.add(min)
    } else {
      // monotonic deque of candidate indices, increasing hash values;
      // ties keep the EARLIEST index (strict < eviction) so the selected
      // VALUE matches array_min exactly on every window
      val deque = new Array[Int](m)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < m) {
        while (tail > head && hashes(deque(tail - 1)) > hashes(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) out.add(hashes(deque(head)))
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }
}

/** winnowFingerprints(canon, k, w) → array<long> of distinct selected
  * 60-bit md5-prefix hashes. */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "need k > 0 and w > 0")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WinnowImpl.fingerprints(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowImpl.fingerprints($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFunctions {
  def fingerprints(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprintsExpr(Bridge.expression(c), k, w))
}
