package graft.ql

/**
 * BydbQL abstract syntax tree, mirroring the reference grammar
 * (pkg/bydbql/grammar.go:33-416; language spec docs/interacting/bydbql.md).
 * Two statement forms: SELECT (stream/measure/trace/property) and
 * SHOW TOP N (pre-aggregated TopN read). Parameters (`?`) carry their
 * positional index, assigned in lex order (pkg/bydbql/prepared.go).
 */
sealed trait QlValue
final case class QlString(v: String) extends QlValue
final case class QlInt(v: Long) extends QlValue
case object QlNull extends QlValue
final case class QlParam(index: Int) extends QlValue

/** A projection / group-by / predicate column reference. `spec` is the
  * `::TAG` / `::FIELD` disambiguator (grammar.go:100-105). */
final case class QlColumn(
    agg: Option[(String, String)], // (function, column) for SUM(x) etc
    name: Option[String],
    spec: Option[String])

final case class QlTopNProj(
    n: QlValue,
    orderField: String,
    direction: Option[String], // ASC | DESC
    others: Seq[QlColumn])

sealed trait QlProjection
case object ProjAll extends QlProjection
/** `SELECT ()` — trace raw-span projection (docs bydbql.md:952-967). */
case object ProjEmpty extends QlProjection
final case class ProjTop(top: QlTopNProj) extends QlProjection
final case class ProjColumns(cols: Seq[QlColumn]) extends QlProjection

final case class QlFrom(
    resourceType: String, // STREAM | MEASURE | TRACE | PROPERTY
    name: String,
    groups: Seq[String],
    stages: Seq[String])

/** TIME value: a literal (string/int rendered as string) or a parameter. */
final case class QlTimeValue(raw: Option[String], param: Option[Int])

sealed trait QlTime
final case class QlTimeCmp(op: String, value: QlTimeValue) extends QlTime
final case class QlTimeBetween(begin: QlTimeValue, end: QlTimeValue) extends QlTime

sealed trait QlExpr
final case class QlOr(l: QlExpr, r: QlExpr) extends QlExpr
final case class QlAndE(l: QlExpr, r: QlExpr) extends QlExpr
final case class QlCompare(ident: String, op: String, value: QlValue) extends QlExpr
final case class QlMatchE(ident: String, values: Seq[QlValue],
    analyzer: Option[String], operator: Option[String]) extends QlExpr
final case class QlInE(ident: String, not: Boolean, values: Seq[QlValue]) extends QlExpr
final case class QlHavingE(ident: String, not: Boolean, values: Seq[QlValue]) extends QlExpr

final case class QlGroupCol(name: String, spec: Option[String])
/** ORDER BY: `ident` None = order by timestamp (dir-only form). */
final case class QlOrderBy(ident: Option[String], desc: Option[Boolean])

sealed trait QlStatement

final case class QlSelect(
    projection: QlProjection,
    from: QlFrom,
    time: Option[QlTime],
    where: Option[QlExpr],
    groupBy: Seq[QlGroupCol],
    orderBy: Option[QlOrderBy],
    limit: Option[QlValue],
    offset: Option[QlValue],
    withQueryTrace: Boolean) extends QlStatement

final case class QlShowTopN(
    n: QlValue,
    from: QlFrom,
    time: Option[QlTime],
    where: Option[QlExpr], // AND-only expression (grammar.go:170-173)
    aggregateBy: Option[String],
    orderDesc: Option[Boolean],
    withQueryTrace: Boolean) extends QlStatement

final case class QlParseException(msg: String, pos: Int)
  extends RuntimeException(s"syntax error at $pos: $msg")
