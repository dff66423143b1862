package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native tokenizer kernel for the MATCH analyzers (pkg/index/analyzer/
 * analyzer.go:36-62). Semantically identical to the previous
 * `filter(split(lower(c), pat), t => t =!= "")` composition (same Java
 * regex classes, same UTF8String lowercasing), but as ONE compact
 * expression: a MATCH criteria tree no longer inlines a five-node
 * split/lambda subtree per analyzer reference, which matters twice —
 * per-row cost (one precompiled-pattern pass, no lambda-variable
 * machinery) and GENERATED-CODE SIZE. The latter dominates single-shot
 * analytics queries: a two-analyzer OR tree (q38) spent ~4× its execution
 * time in janino compilation before this kernel.
 */
object AnalyzerImpl {
  /** standard/url token class: unicode letters+digits. */
  private val ALNUM = Pattern.compile("[^\\p{L}\\p{N}]+")
  /** simple token class: unicode letters only (digits split). */
  private val ALPHA = Pattern.compile("[^\\p{L}]+")

  val MODE_STANDARD = 0 // lowercase, [letter|digit] runs
  val MODE_SIMPLE = 1   // lowercase, letter runs
  val MODE_URL = 2      // case preserved, [letter|digit] runs
  val MODE_KEYWORD = 3  // entire input as ONE lowercased token

  def tokenize(text: UTF8String, mode: Int): ArrayData = {
    if (mode == MODE_KEYWORD)
      return new GenericArrayData(Array[Any](text.toLowerCase))
    val s =
      if (mode == MODE_URL) text.toString
      else text.toLowerCase.toString // UTF8String lowercasing = Spark `lower`
    val p = if (mode == MODE_SIMPLE) ALPHA else ALNUM
    val parts = p.split(s, -1) // limit -1: Spark `split` semantics
    var n = 0
    var i = 0
    while (i < parts.length) { if (!parts(i).isEmpty) n += 1; i += 1 }
    val out = new Array[Any](n)
    var j = 0; i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) { out(j) = UTF8String.fromString(parts(i)); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** analyzerTokens(text, mode) → array<string> of non-empty tokens. */
case class AnalyzerTokensExpr(child: Expression, mode: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    AnalyzerImpl.tokenize(input.asInstanceOf[UTF8String], mode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AnalyzerImpl.tokenize($c, $mode)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AnalyzerFunctions {
  def tokens(c: Column, mode: Int): Column =
    Bridge.column(AnalyzerTokensExpr(Bridge.expression(c), mode))
}
