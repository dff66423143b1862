package graft.model

import java.time.Instant

/**
 * Typed query model mirroring the reference's proto surface
 * (reference: api/proto/banyandb/model/v1/query.proto:45-130,
 * measure/v1/query.proto, stream/v1/query.proto, trace/v1/query.proto,
 * property/v1/rpc.proto:74-98). This is the IR between the BydbQL
 * front-end and the Spark DataFrame plan builder — the Spark analogue of
 * the reference's `logical.UnresolvedPlan`.
 *
 * Design note: the reference's distributed plan nodes
 * (measure_plan_distributed.go) have no counterpart here — Spark's own
 * exchange/partial-agg machinery replaces them.
 */

/** Condition operators, model/v1/query.proto:45-80. */
sealed trait Op
object Op {
  case object Eq extends Op
  case object Ne extends Op
  case object Lt extends Op
  case object Gt extends Op
  case object Le extends Op
  case object Ge extends Op
  case object In extends Op
  case object NotIn extends Op
  /** array tag contains ALL given values ("contains and"). */
  case object Having extends Op
  case object NotHaving extends Op
  /** full-text match with analyzer; model/v1/query.proto MATCH + analyzer
    * semantics at database/v1/schema.proto:180-189. */
  final case class Match(analyzer: String = "standard", operator: MatchOp = MatchOp.Or) extends Op
}

sealed trait MatchOp
object MatchOp {
  case object And extends MatchOp
  case object Or extends MatchOp
}

/** Binary AND/OR criteria tree (model/v1/query.proto:83-101). There is no
  * NOT node in the reference — negation exists only via NE/NOT_IN/NOT_HAVING. */
sealed trait Criteria
final case class Cond(tag: String, op: Op, values: Seq[Any]) extends Criteria
final case class And(left: Criteria, right: Criteria) extends Criteria
final case class Or(left: Criteria, right: Criteria) extends Criteria

/** `[begin, end)` — left-inclusive, right-exclusive
  * (model/v1/query.proto:125-130). */
final case class TimeRange(begin: Instant, end: Instant)

/** Sort spec: by an indexed tag or by timestamp when `tag` is None
  * (model/v1/query.proto:103-114). */
final case class OrderBy(tag: Option[String], desc: Boolean)

/** Aggregation functions (model/v1/common.proto:74-81). */
sealed trait AggFn
object AggFn {
  case object Mean extends AggFn   // integer division + <1→1 clamp for INT fields
  case object Max extends AggFn
  case object Min extends AggFn
  case object Count extends AggFn
  case object Sum extends AggFn
}

/** Query-phase TOP N over a field (measure/v1/query.proto:123-136):
  * desc = top, asc = bottom; runs after aggregation when present. */
final case class TopSpec(number: Int, fieldName: String, desc: Boolean = true)

/**
 * Measure query (measure/v1/query.proto). `groups` > 1 means the
 * multi-group schema-merged union (measure_analyzer.go:96-108).
 */
final case class MeasureQuery(
    groups: Seq[String],
    name: String,
    /** lifecycle stage selection (hot/warm/cold), measure/v1/query.proto:147-148;
      * routed to the storage tier by the catalog layer. */
    stages: Seq[String] = Nil,
    timeRange: Option[TimeRange] = None,
    criteria: Option[Criteria] = None,
    tagProjection: Seq[String] = Nil,
    fieldProjection: Seq[String] = Nil,
    groupByTags: Seq[String] = Nil,
    agg: Option[(AggFn, String)] = None,
    top: Option[TopSpec] = None,
    orderBy: Option[OrderBy] = None,
    offset: Int = 0,
    limit: Int = 0, // 0 → default 100 (measure_analyzer.go:32)
    /** index_mode measures store the whole point in the index and skip the
      * version-dedup merge pass (banyand/measure/query.go:506). */
    indexMode: Boolean = false)

/** Stream query (stream/v1/query.proto): tags only, element dedup, no agg. */
final case class StreamQuery(
    groups: Seq[String],
    name: String,
    stages: Seq[String] = Nil,
    timeRange: Option[TimeRange] = None,
    criteria: Option[Criteria] = None,
    projection: Seq[String] = Nil,
    orderBy: Option[OrderBy] = None,
    offset: Int = 0,
    limit: Int = 0)

/** Trace query (trace/v1/query.proto:31-56): result grouped per trace id,
  * LIMIT counts traces, not spans. */
final case class TraceQuery(
    groups: Seq[String],
    name: String,
    stages: Seq[String] = Nil,
    timeRange: Option[TimeRange] = None,
    criteria: Option[Criteria] = None,
    projection: Seq[String] = Nil,
    orderBy: Option[OrderBy] = None,
    offset: Int = 0,
    limit: Int = 0)

/** Property query (property/v1/rpc.proto:74-98): mutable docs keyed
  * group/name/id, last-writer-wins by mod_revision; no time range. */
final case class PropertyQuery(
    groups: Seq[String],
    name: String,
    ids: Seq[String] = Nil,
    criteria: Option[Criteria] = None,
    projection: Seq[String] = Nil,
    orderBy: Option[OrderBy] = None,
    limit: Int = 0)

/** Pre-aggregated Top-N read (measure/v1/topn.proto:55-75): ranked entities
  * per time bucket, optional cross-bucket re-aggregation, EQ-only conditions. */
final case class TopNQuery(
    groups: Seq[String],
    name: String,
    stages: Seq[String] = Nil,
    timeRange: Option[TimeRange] = None,
    topN: Int = 10,
    desc: Boolean = true,
    agg: Option[AggFn] = None,
    conditions: Seq[Cond] = Nil)
