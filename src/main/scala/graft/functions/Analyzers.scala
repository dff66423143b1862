package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The four full-text analyzers of the reference
 * (pkg/index/analyzer/analyzer.go:36-62; semantics documented at
 * database/v1/schema.proto:180-189), each backed by the native
 * [[AnalyzerTokensExpr]] kernel — one compact codegen'd call per
 * tokenization instead of a `lower`/`split`/`filter`-lambda subtree,
 * which keeps MATCH inside whole-stage codegen AND keeps the generated
 * class small (see AnalyzerExpressions for why that matters).
 *
 * The reference tokenizes at *index build time* (pkg/index/inverted/).
 * Queries over ad-hoc frames tokenize at query time; layouts written with
 * `LayoutSpec.analyzerColumns` materialize the token arrays at ingest and
 * MATCH criteria filter the stored column instead (CriteriaTranslator
 * resolves the materialized name) — same expression, paid once.
 */
object Analyzers {

  /** bluge standard analyzer: unicode word tokens, lowercased. */
  def standard(c: Column): Column = AnalyzerFunctions.tokens(c, AnalyzerImpl.MODE_STANDARD)

  /** bluge simple analyzer: letter-run tokens, lowercased (digits split). */
  def simple(c: Column): Column = AnalyzerFunctions.tokens(c, AnalyzerImpl.MODE_SIMPLE)

  /** bluge keyword analyzer: entire input as ONE token, matched
    * case-insensitively (analyzer.go:36-62; SURVEY §2.6) — both the doc
    * column and the query values pass through the same lowercasing, so
    * MATCH('EN','keyword') hits a 'en' tag. Routed through the same
    * native kernel as the other three modes: one codegen call, and the
    * SQL surface (`graft_tokens(c, 'keyword')`) covers all four. */
  def keyword(c: Column): Column = AnalyzerFunctions.tokens(c, AnalyzerImpl.MODE_KEYWORD)

  /** reference URL analyzer: letter-or-number runs, case preserved
    * (analyzer.go:46-56 CharacterTokenizer + alphanumericFilter). */
  def url(c: Column): Column = AnalyzerFunctions.tokens(c, AnalyzerImpl.MODE_URL)

  def byName(name: String): Column => Column = name match {
    case "standard" => standard
    case "simple"   => simple
    case "keyword"  => keyword
    case "url"      => url
    case other => throw new IllegalArgumentException(s"unknown analyzer: $other")
  }

  /**
   * MATCH predicate (tag_filter.go:546-578; QL docs
   * docs/interacting/bydbql.md:262-389): tokenize both the column and the
   * query values with the same analyzer; AND → column tokens ⊇ all query
   * tokens, OR → any overlap.
   */
  def matches(col: Column, values: Seq[String], analyzer: String, andSemantics: Boolean): Column =
    matchesTokens(byName(analyzer)(col), values, analyzer, andSemantics)

  /** MATCH over an ALREADY-TOKENIZED doc column — the read side of
    * ingest-time tokenization (LayoutSpec.analyzerColumns): the stored
    * token array is filtered directly, no per-query re-analysis. */
  def matchesTokens(docTokens: Column, values: Seq[String], analyzer: String,
      andSemantics: Boolean): Column = {
    val an = byName(analyzer)
    val queryTokens = flatten(array(values.map(v => an(lit(v))): _*))
    // Both forms reference docTokens exactly ONCE: a higher-order
    // `forall(queryTokens, t => array_contains(docTokens, t))` re-evaluates
    // the tokenizer subtree per query token (lambda bodies get no
    // common-subexpression elimination), i.e. |query| full tokenizations
    // per row. AND ⇔ no query token missing from the doc tokens.
    if (andSemantics) size(array_except(queryTokens, docTokens)) === 0
    else arrays_overlap(docTokens, queryTokens)
  }
}
