package graft.engine

import graft.functions.Analyzers
import graft.model._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Criteria tree → Catalyst predicate.
 *
 * The reference splits every criteria tree into an index filter (pushed
 * into inverted/skipping/tree indexes, index_filter.go:35-204) and a
 * residual row filter (tag_filter.go:73-607). On Spark both are ONE
 * `filter()` — Catalyst performs the pushdown split itself (parquet
 * PushedFilters for EQ/range/IN, residual for array/match predicates), so
 * this translator is the whole filtering layer.
 */
object CriteriaTranslator {

  /** `avail` = the frame's column set; a MATCH whose (tag, analyzer) has a
    * materialized ingest-time token column (LayoutSpec.analyzerColumns,
    * the reference's index-build tokenization pkg/index/inverted/) filters
    * the stored array instead of re-tokenizing per query. */
  def toColumn(c: Criteria, avail: Set[String] = Set.empty): Column = c match {
    case And(l, r) => toColumn(l, avail) && toColumn(r, avail)
    case Or(l, r)  => toColumn(l, avail) || toColumn(r, avail)
    case Cond(tag, Op.Match(analyzer, mop), values)
        if avail.contains(graft.storage.Layout.tokenColName(tag, analyzer)) =>
      Analyzers.matchesTokens(
        col(graft.storage.Layout.tokenColName(tag, analyzer)),
        values.map(_.toString), analyzer, mop == MatchOp.And)
    case Cond(tag, op, values) => cond(Planners.qcol(tag), op, values)
  }

  private def litOf(v: Any): Column = lit(v)

  private def cond(c: Column, op: Op, values: Seq[Any]): Column = op match {
    // EQ/NE are also valid on array tags — exact array equality
    // (tag_filter.go:413-442).
    case Op.Eq if values.size > 1 => c === array(values.map(litOf): _*)
    // `tag = NULL` selects rows where the tag is unset — the topn golden
    // case null_group.ql matches pre-agg groups whose group tag is null
    // (test/cases/topn/data/want/null_group.yaml).
    case Op.Eq if values.head == null => c.isNull
    case Op.Eq => c === litOf(values.head)
    case Op.Ne if values.size > 1 => c =!= array(values.map(litOf): _*)
    case Op.Ne if values.head == null => c.isNotNull
    case Op.Ne => c =!= litOf(values.head)
    case Op.Lt => c < litOf(values.head)
    case Op.Gt => c > litOf(values.head)
    case Op.Le => c <= litOf(values.head)
    case Op.Ge => c >= litOf(values.head)
    case Op.In => c.isin(values: _*)
    case Op.NotIn => !c.isin(values: _*)
    // array tag ⊇ all given values (tag_filter.go:580-607).
    case Op.Having => forall(array(values.map(litOf): _*), v => array_contains(c, v))
    case Op.NotHaving => !forall(array(values.map(litOf): _*), v => array_contains(c, v))
    case Op.Match(analyzer, mop) =>
      Analyzers.matches(c, values.map(_.toString), analyzer, mop == MatchOp.And)
  }

  /**
   * Entity-tag restriction (index_filter.go:50-60 ParseExprOrEntity): on
   * entity (series-key) tags only EQ and IN are legal — they select series
   * (partition pruning), any other operator is an error in the reference.
   * Catalyst prunes automatically; we replicate the *validation*.
   */
  /**
   * Mirror of `logical.ParseEntities` (pkg/query/logical/parser.go:119-186)
   * as a VALIDATION: walk the criteria tree computing the series-key
   * assignments each branch pins. AND-merging branches that pin the same
   * entity position to DIFFERENT concrete values yields no resolvable
   * series (the reference returns nil entities and the measure query
   * fails — golden case gen_tree_depth5_deep_or, WantErr). Measures
   * reject such criteria; streams scan them normally (stream.go:134
   * registers the same tree as a passing case), so only the measure
   * planner calls this.
   */
  def validateEntityResolvable(c: Criteria, entityTags: Seq[String]): Unit =
    if (entityTags.nonEmpty &&
        entitiesOf(c, entityTags.zipWithIndex.toMap, entityTags.length).isEmpty)
      throw new IllegalArgumentException(
        "criteria AND pins an entity tag to conflicting values: no resolvable series")

  /** Per-branch entity assignments; inner Vector = one candidate series
    * key, None = any value at that position. An EMPTY result is the
    * reference's nil — a conflicting AND merge. Nil is treated as "any" by
    * an ENCLOSING merge (parser.go:124-134 anyEntity iterates a nil slice
    * vacuously, so `if leftAny { return right }` recovers), and only an
    * empty result AT THE ROOT fails the query — e.g. ((a=1 AND a=2) AND
    * a=1) resolves to a=1 while gen_tree_depth5_deep_or stays an error. */
  private def entitiesOf(c: Criteria, pos: Map[String, Int],
      n: Int): Seq[Vector[Option[Any]]] = {
    val any = Vector.fill[Option[Any]](n)(None)
    def isAny(es: Seq[Vector[Option[Any]]]) = es.forall(_.forall(_.isEmpty))
    c match {
      case Cond(tag, Op.Eq, values) if pos.contains(tag) && values.size == 1 =>
        Seq(any.updated(pos(tag), Some(values.head)))
      case Cond(tag, Op.In, values) if pos.contains(tag) =>
        values.map(v => any.updated(pos(tag), Some(v)))
      case _: Cond => Seq(any)
      case And(l, r) =>
        val (le, re) = (entitiesOf(l, pos, n), entitiesOf(r, pos, n))
        if (isAny(le)) re
        else if (isAny(re)) le
        else {
          val merged = le ++ re
          val perPos = Vector.tabulate(n)(i => merged.flatMap(_(i)).distinct)
          if (perPos.exists(_.size > 1)) Nil // nil-as-any (parser.go:148-162)
          else Seq(perPos.map(_.headOption))
        }
      case Or(l, r) =>
        val (le, re) = (entitiesOf(l, pos, n), entitiesOf(r, pos, n))
        if (isAny(le)) le else if (isAny(re)) re else le ++ re
    }
  }

  /** Reject MATCH anywhere in a criteria tree (trace queries — the trace
    * index is an int64 TREE sidx with no analyzer). */
  /** All tag names a criteria tree references. */
  def tags(c: Criteria): Seq[String] = c match {
    case And(l, r) => tags(l) ++ tags(r)
    case Or(l, r)  => tags(l) ++ tags(r)
    case Cond(t, _, _) => Seq(t)
  }

  def rejectMatch(c: Criteria, model: String): Unit = c match {
    case And(l, r) => rejectMatch(l, model); rejectMatch(r, model)
    case Or(l, r)  => rejectMatch(l, model); rejectMatch(r, model)
    case Cond(tag, _: Op.Match, _) => throw new IllegalArgumentException(
      s"MATCH is not supported on $model queries (tag '$tag')")
    case _ => ()
  }

  /** MATCH needs an index rule WITH an analyzer (pkg/index/analyzer/;
    * index_filter.go MATCH path). A resource that declares its
    * analyzer-indexed tags rejects MATCH on any other tag — the stream
    * golden case gen_err_match_trace_id (WantErr) matches on `trace_id`,
    * whose index rule has no analyzer. */
  def validateMatchable(c: Criteria, matchable: Set[String]): Unit = c match {
    case And(l, r) => validateMatchable(l, matchable); validateMatchable(r, matchable)
    case Or(l, r)  => validateMatchable(l, matchable); validateMatchable(r, matchable)
    case Cond(tag, _: Op.Match, _) if !matchable.contains(tag) =>
      throw new IllegalArgumentException(
        s"tag '$tag' has no analyzer index rule: MATCH is not supported")
    case _ => ()
  }

  /** IndexRuleBinding effective window (database/v1/schema.proto:203-214):
    * the reference's metadata client skips bindings with begin_at after
    * now or expire_at before now when resolving a subject's index rules
    * (banyand/metadata/client.go:438-445) — a MATCH whose binding is not
    * yet in effect or has expired therefore finds no analyzer rule, the
    * same failure as an unindexed tag. Window inclusive on both ends,
    * mirroring the client's skip conditions. */
  def validateBindingWindows(c: Criteria,
      windows: Map[String, (java.time.Instant, java.time.Instant)],
      now: java.time.Instant): Unit = c match {
    case And(l, r) =>
      validateBindingWindows(l, windows, now)
      validateBindingWindows(r, windows, now)
    case Or(l, r) =>
      validateBindingWindows(l, windows, now)
      validateBindingWindows(r, windows, now)
    case Cond(tag, _: Op.Match, _) =>
      windows.get(tag).foreach { case (begin, expire) =>
        if (now.isBefore(begin) || now.isAfter(expire))
          throw new IllegalArgumentException(
            s"index rule binding for tag '$tag' is not in effect " +
              s"(valid [$begin, $expire], now $now): MATCH is not supported")
      }
    case _ => ()
  }

  def validateEntityOps(c: Criteria, entityTags: Set[String]): Unit = c match {
    case And(l, r) => validateEntityOps(l, entityTags); validateEntityOps(r, entityTags)
    case Or(l, r)  => validateEntityOps(l, entityTags); validateEntityOps(r, entityTags)
    case Cond(tag, op, _) if entityTags.contains(tag) => op match {
      case Op.Eq | Op.In => ()
      case other => throw new IllegalArgumentException(
        s"only EQ and IN are supported on entity tag '$tag', got $other")
    }
    case _ => ()
  }

  /** Array tags admit exact equality, HAVING containment, and MATCH —
    * membership/range operators are errors in the reference
    * (pkg/query/logical/tag_filter.go; stream golden case err_in_arr,
    * WantErr), not coercions. */
  def validateArrayOps(c: Criteria, arrayTags: Set[String]): Unit = c match {
    case And(l, r) => validateArrayOps(l, arrayTags); validateArrayOps(r, arrayTags)
    case Or(l, r)  => validateArrayOps(l, arrayTags); validateArrayOps(r, arrayTags)
    case Cond(tag, op, _) if arrayTags.contains(tag) => op match {
      case Op.Eq | Op.Ne | Op.Having | Op.NotHaving | _: Op.Match => ()
      case other => throw new IllegalArgumentException(
        s"op $other is not supported on array tag '$tag'")
    }
    case _ => ()
  }
}
