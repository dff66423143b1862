package graft.engine.fuzz

import graft.model._

/**
 * Mechanical StreamQuery / TraceQuery / PropertyQuery → DuckDB SQL
 * derivation — independent encodings of the semantics specs
 * `Planners.stream` / `Planners.traceSpanGroups` / `Planners.property`
 * implement (SURVEY §2 S3/S4/S8): element dedup AFTER the sorted merge,
 * trace LIMIT counting traces surfaced at their first span value in
 * scan direction, property last-writer-wins + tombstone hiding. Like
 * FuzzTwin, everything is derived from the QUERY VALUE alone.
 *
 * Trace results are compared FLATTENED (one row per surviving span,
 * carrying its trace's tid/span_count/start_ts): the engine's nested
 * span array is exploded by the suite, and the twin joins the trace cut
 * back to the span rows — the same multiset iff grouping, ordering and
 * the trace cut agree. Intra-array span ORDER is canonical sorting,
 * pinned by the golden trace cases, not re-proved here.
 */
object SurfaceFuzzTwin {
  import FuzzTwin.{lit, critSql, nsSat, dir}
  import SurfaceFuzzFixtures._

  private def timePred(tr: Option[TimeRange]): String =
    tr.fold("TRUE") { r => s"ts >= ${nsSat(r.begin)} AND ts < ${nsSat(r.end)}" }

  private def critPred(c: Option[Criteria]): String =
    // DefaultSpec's array-tag set (labels/ports) matches every surface
    // fixture's — the only part of the spec critSql consults
    c.fold("TRUE")(critSql(_)(FuzzTwin.DefaultSpec))

  /** Mirror of Planners.orderCols for a (tsCol=ts, entity=svc,inst) tdef:
    * primary (tag or ts) then (ts, entity) ascending tie-breaks, skipping
    * a tie column the primary already names. */
  private def streamOrder(ob: Option[OrderBy]): String = {
    val primary = ob match {
      case Some(OrderBy(tag, desc)) => Seq(s"${tag.getOrElse("ts")} ${dir(desc)}")
      case None => Seq(s"ts ${dir(desc = false)}")
    }
    val ties = Seq("ts", "svc", "inst")
      .filterNot(c => ob.fold(c == "ts")(o => o.tag.contains(c)))
      .map(c => s"$c ${dir(desc = false)}")
    (primary ++ ties).mkString(", ")
  }

  def streamSql(q: StreamQuery): String = {
    val ord = streamOrder(q.orderBy)
    val outCols = (if (q.projection.nonEmpty) q.projection else streamCols)
      .mkString(", ")
    val effLimit = if (q.limit <= 0) graft.engine.Planners.DefaultLimit else q.limit
    s"""WITH base AS (SELECT * FROM $StreamName WHERE ${timePred(q.timeRange)}),
       |filt AS (SELECT * FROM base WHERE ${critPred(q.criteria)}),
       |ded AS (SELECT ${streamCols.mkString(", ")} FROM (
       |  SELECT *, row_number() OVER (PARTITION BY eid ORDER BY $ord) AS __rn
       |  FROM filt) WHERE __rn = 1)
       |SELECT $outCols FROM (
       |  SELECT * FROM ded ORDER BY $ord LIMIT $effLimit OFFSET ${q.offset})""".stripMargin
  }

  def traceSql(q: TraceQuery): String = {
    val (sortSrc, sortDesc) = q.orderBy match {
      case Some(OrderBy(tag, d)) =>
        (tag.filterNot(_ == "timestamp").getOrElse("ts"), d)
      case None => ("ts", false)
    }
    val sortAgg = if (sortDesc) s"max($sortSrc)" else s"min($sortSrc)"
    val span = if (q.projection.nonEmpty) q.projection else spanCols
    val effLimit = if (q.limit <= 0) graft.engine.Planners.DefaultLimit else q.limit
    s"""WITH base AS (SELECT * FROM $TraceName WHERE ${timePred(q.timeRange)}),
       |filt AS (SELECT * FROM base WHERE ${critPred(q.criteria)}),
       |g AS (SELECT tid, count(*) AS span_count, min(ts) AS start_ts,
       |  $sortAgg AS __sort FROM filt GROUP BY tid),
       |cut AS (SELECT tid, span_count, start_ts FROM g
       |  ORDER BY __sort ${dir(sortDesc)}, tid ${dir(desc = false)}
       |  LIMIT $effLimit OFFSET ${q.offset})
       |SELECT c.tid, c.span_count, c.start_ts, ${span.map(s => s"f.$s AS $s").mkString(", ")}
       |FROM cut c JOIN filt f ON c.tid = f.tid""".stripMargin
  }

  def propertySql(q: PropertyQuery): String = {
    val idsPred =
      if (q.ids.isEmpty) "TRUE"
      else s"id IN (${q.ids.map(lit(_)).mkString(", ")})"
    val OrderBy(obTag, obDesc) = q.orderBy.getOrElse(OrderBy(None, desc = false))
    val ord = s"${obTag.getOrElse("id")} ${dir(obDesc)}, id ${dir(desc = false)}"
    val limitSql = if (q.limit > 0) s" LIMIT ${q.limit}" else ""
    val outCols = (if (q.projection.nonEmpty) q.projection else propertyCols)
      .mkString(", ")
    s"""WITH latest AS (SELECT ${propertyCols.mkString(", ")} FROM (
       |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY rev DESC) AS __rn
       |  FROM $PropertyName) WHERE __rn = 1),
       |live AS (SELECT * FROM latest WHERE NOT coalesce(deleted, FALSE)),
       |sel AS (SELECT * FROM live WHERE $idsPred AND ${critPred(q.criteria)})
       |SELECT $outCols FROM (SELECT * FROM sel ORDER BY $ord$limitSql)""".stripMargin
  }
}
