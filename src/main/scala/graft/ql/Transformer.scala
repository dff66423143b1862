package graft.ql

import java.time.{Instant, OffsetDateTime}

import graft.model._
import org.apache.spark.sql.types._

/**
 * BydbQL AST → typed query model, the Spark analogue of the reference's
 * transformer (pkg/bydbql/transformer.go:232-631 per-model transforms,
 * time conversion :1313-1380). Schema information (tag vs field, value
 * types) comes from [[QlSchema]], playing the role of the reference's
 * schema registry lookups.
 */
final case class QlSchema(
    struct: StructType,
    /** field (aggregatable value) column names; everything else is a tag. */
    fields: Set[String],
    /** schema-flexible resources (Property documents carry per-document tag
      * sets, docs/concept/data-model.md:256-293): tags outside the fixed
      * columns are legal — they resolve per document, null where absent. */
    flexible: Boolean = false) {

  def has(name: String): Boolean = flexible || struct.fieldNames.contains(name)

  /** Coerce a QL literal to the column's Spark type (the reference converts
    * by the registered tag type, transformer.go:1230-1310). */
  def coerce(column: String, v: QlValue): Any = v match {
    case QlNull => null
    case QlParam(i) => throw new IllegalArgumentException(s"unbound parameter ?$i")
    case QlInt(n) => struct.find(_.name == column).map(_.dataType) match {
      case Some(DoubleType | FloatType) => n.toDouble
      case _ => n
    }
    case QlString(s) => struct.find(_.name == column).map(_.dataType) match {
      case Some(LongType | IntegerType | ShortType) =>
        try s.toLong catch { case _: NumberFormatException => s }
      case Some(DoubleType | FloatType) =>
        try s.toDouble catch { case _: NumberFormatException => s }
      case _ => s
    }
  }
}

object QlSchema {
  def of(df: org.apache.spark.sql.DataFrame, fields: Set[String] = Set.empty): QlSchema =
    QlSchema(df.schema, fields)
}

/** Transform result: one wrapper per data model. */
sealed trait TypedQuery
final case class MeasureStatement(q: MeasureQuery) extends TypedQuery
final case class StreamStatement(q: StreamQuery) extends TypedQuery
final case class TraceStatement(q: TraceQuery) extends TypedQuery
final case class PropertyStatement(q: PropertyQuery) extends TypedQuery
final case class TopNStatement(q: TopNQuery) extends TypedQuery

object Transformer {

  /** Unix epoch, the open lower bound for `TIME < t` (transformer.go:42). */
  private val DefaultBegin = Instant.EPOCH

  // -- parameter binding ----------------------------------------------------

  /** Bind `?` placeholders positionally (pkg/bydbql/binder.go). Values may
    * be String / Long / Int / Seq (for IN lists — expanded in place). */
  def bind(stmt: QlStatement, params: Seq[Any]): QlStatement = {
    def bv(v: QlValue): QlValue = v match {
      case QlParam(i) =>
        if (i >= params.length)
          throw new IllegalArgumentException(s"missing bind value for ?$i")
        params(i) match {
          case s: String => QlString(s)
          case n: Long => QlInt(n)
          case n: Int => QlInt(n.toLong)
          case null => QlNull
          case other => QlString(other.toString)
        }
      case other => other
    }
    def bvs(vs: Seq[QlValue]): Seq[QlValue] = vs.flatMap {
      case QlParam(i) if i < params.length && params(i).isInstanceOf[Seq[_]] =>
        params(i).asInstanceOf[Seq[Any]].map {
          case s: String => QlString(s)
          case n: Long => QlInt(n)
          case n: Int => QlInt(n.toLong)
          case other => QlString(other.toString)
        }
      case v => Seq(bv(v))
    }
    def btv(tv: QlTimeValue): QlTimeValue = tv.param match {
      case Some(i) =>
        if (i >= params.length)
          throw new IllegalArgumentException(s"missing bind value for ?$i")
        QlTimeValue(Some(params(i).toString), None)
      case None => tv
    }
    def bt(t: QlTime): QlTime = t match {
      case QlTimeCmp(op, v) => QlTimeCmp(op, btv(v))
      case QlTimeBetween(b, e) => QlTimeBetween(btv(b), btv(e))
    }
    def be(e: QlExpr): QlExpr = e match {
      case QlOr(l, r) => QlOr(be(l), be(r))
      case QlAndE(l, r) => QlAndE(be(l), be(r))
      case QlCompare(id, op, v) => QlCompare(id, op, bv(v))
      case QlMatchE(id, vs, a, o) => QlMatchE(id, bvs(vs), a, o)
      case QlInE(id, n, vs) => QlInE(id, n, bvs(vs))
      case QlHavingE(id, n, vs) => QlHavingE(id, n, bvs(vs))
    }
    stmt match {
      case s: QlSelect => s.copy(
        time = s.time.map(bt), where = s.where.map(be),
        limit = s.limit.map(bv), offset = s.offset.map(bv),
        projection = s.projection match {
          case ProjTop(t) => ProjTop(t.copy(n = bv(t.n)))
          case other => other
        })
      case t: QlShowTopN => t.copy(
        n = bv(t.n), time = t.time.map(bt), where = t.where.map(be))
    }
  }

  // -- time parsing ---------------------------------------------------------

  private val DurPart = "([0-9]+)(ms|s|m|h|d|w)".r

  /** RFC3339 absolute | `now` | signed duration like `-30m`, `1d2h`
    * (str2duration semantics, transformer.go:1362-1380). */
  def parseTimestamp(now: Instant, raw: String): Instant = {
    val t = raw.trim
    try return OffsetDateTime.parse(t).toInstant
    catch { case _: java.time.format.DateTimeParseException => }
    if (t.equalsIgnoreCase("now")) return now
    val (sign, body) =
      if (t.startsWith("-")) (-1L, t.substring(1))
      else if (t.startsWith("+")) (1L, t.substring(1))
      else (1L, t)
    val parts = DurPart.findAllMatchIn(body).toSeq
    val consumed = parts.map(_.matched.length).sum
    if (parts.isEmpty || consumed != body.length)
      throw new IllegalArgumentException(s"invalid timestamp format: $raw")
    val millis = parts.map { m =>
      val n = m.group(1).toLong
      m.group(2) match {
        case "ms" => n
        case "s" => n * 1000L
        case "m" => n * 60000L
        case "h" => n * 3600000L
        case "d" => n * 86400000L
        case "w" => n * 7L * 86400000L
      }
    }.sum
    now.plusMillis(sign * millis)
  }

  private def truncMs(i: Instant): Instant =
    Instant.ofEpochMilli(i.toEpochMilli)

  /** TIME clause → [begin, end) range (transformer.go:1313-1360):
    * `>` / `>=` → (t, now); `<` / `<=` → (epoch, t); `=` → (t, t). */
  def convertTimeRange(now: Instant, time: Option[QlTime]): Option[TimeRange] = time.map {
    case QlTimeBetween(b, e) =>
      TimeRange(truncMs(parseTimestamp(now, raw(b))), truncMs(parseTimestamp(now, raw(e))))
    case QlTimeCmp(op, v) =>
      val t = parseTimestamp(now, raw(v))
      op match {
        case "=" => TimeRange(truncMs(t), truncMs(t))
        case ">" | ">=" => TimeRange(truncMs(t), truncMs(now))
        case "<" | "<=" => TimeRange(truncMs(DefaultBegin), truncMs(t))
        case other => throw new IllegalArgumentException(s"unsupported time comparator: $other")
      }
  }

  private def raw(tv: QlTimeValue): String = tv.raw.getOrElse(
    throw new IllegalArgumentException(s"unbound time parameter ?${tv.param.get}"))

  // -- criteria -------------------------------------------------------------

  private def compareOp(op: String): Op = op match {
    case "=" => Op.Eq
    case "!=" => Op.Ne
    case ">" => Op.Gt
    case "<" => Op.Lt
    case ">=" => Op.Ge
    case "<=" => Op.Le
  }

  /** WHERE on a tag the resource doesn't have is an error, not an empty
    * result (golden case filter_non_existent_tag, WantErr — the reference
    * rejects the criteria during analysis). */
  private def requireTag(schema: QlSchema, id: String): Unit =
    if (!schema.has(id)) throw new IllegalArgumentException(
      s"tag '$id' not found in the queried resource")

  def convertExpr(e: QlExpr, schema: QlSchema): Criteria = e match {
    case QlOr(l, r) => Or(convertExpr(l, schema), convertExpr(r, schema))
    case QlAndE(l, r) => And(convertExpr(l, schema), convertExpr(r, schema))
    case QlCompare(id, op, v) =>
      requireTag(schema, id)
      Cond(id, compareOp(op), Seq(schema.coerce(id, v)))
    case QlMatchE(id, vs, analyzer, operator) =>
      requireTag(schema, id)
      // MATCH is full-text — legal only on string(-array) tags; the
      // reference rejects it on other types at analysis time
      // (gen_err_match_int golden case, WantErr).
      schema.struct.find(_.name == id).map(_.dataType) match {
        case Some(StringType) | Some(ArrayType(StringType, _)) => ()
        case Some(other) => throw new IllegalArgumentException(
          s"MATCH requires a string tag, '$id' is $other")
        case None => ()
      }
      val mop = operator match {
        case Some("AND") => MatchOp.And
        case _ => MatchOp.Or // reference default is OR (OPERATOR_UNSPECIFIED → or)
      }
      // an EMPTY analyzer name means "the tag's indexed analyzer" in the
      // reference (entity_match.ql passes MATCH('…', '', 'AND')); absent
      // and empty both resolve to the default
      Cond(id, Op.Match(analyzer.filter(_.nonEmpty).getOrElse("standard"), mop),
        vs.map(schema.coerce(id, _)))
    case QlInE(id, not, vs) =>
      requireTag(schema, id)
      Cond(id, if (not) Op.NotIn else Op.In, vs.map(schema.coerce(id, _)))
    case QlHavingE(id, not, vs) =>
      requireTag(schema, id)
      Cond(id, if (not) Op.NotHaving else Op.Having, vs.map(schema.coerce(id, _)))
  }

  // -- aggregation helpers --------------------------------------------------

  private def aggFn(name: String): AggFn = name match {
    case "SUM" => AggFn.Sum
    case "MEAN" | "AVG" => AggFn.Mean
    case "COUNT" => AggFn.Count
    case "MAX" => AggFn.Max
    case "MIN" => AggFn.Min
  }

  /** The planner's output column name for an aggregate
    * (Planners.aggColumn naming). */
  def aggOutputName(fn: AggFn, field: String): String = fn match {
    case AggFn.Sum => s"sum_$field"
    case AggFn.Count => s"count_$field"
    case AggFn.Max => s"max_$field"
    case AggFn.Min => s"min_$field"
    case AggFn.Mean => s"mean_$field"
  }

  private def intOf(v: QlValue, what: String): Int = v match {
    // uint32 limits above Int.MaxValue clamp (stream all_max_limit.ql uses 4294967295)
    case QlInt(n) => if (n > Int.MaxValue) Int.MaxValue else n.toInt
    case QlParam(i) => throw new IllegalArgumentException(s"unbound parameter ?$i in $what")
    case other => throw new IllegalArgumentException(s"expected integer for $what, got $other")
  }

  // -- statement transforms -------------------------------------------------

  def transform(stmt: QlStatement, schema: QlSchema, now: Instant = Instant.now()): TypedQuery =
    stmt match {
      case s: QlSelect => s.from.resourceType match {
        case "MEASURE" => MeasureStatement(measure(s, schema, now))
        case "STREAM" => StreamStatement(stream(s, schema, now))
        case "TRACE" => TraceStatement(trace(s, schema, now))
        case "PROPERTY" => PropertyStatement(property(s, schema))
      }
      case t: QlShowTopN => TopNStatement(topn(t, schema, now))
    }

  private def isField(c: QlColumn, schema: QlSchema): Boolean =
    c.spec.contains("FIELD") ||
      (c.spec.isEmpty && c.name.exists(schema.fields.contains))

  private def splitColumns(cols: Seq[QlColumn], schema: QlSchema)
      : (Seq[String], Seq[String], Option[(AggFn, String)]) = {
    var tags = Vector.empty[String]
    var fields = Vector.empty[String]
    var agg: Option[(AggFn, String)] = None
    cols.foreach { c =>
      c.agg match {
        case Some((fn, field)) =>
          if (agg.isDefined)
            throw new IllegalArgumentException("only one aggregate function is allowed")
          agg = Some((aggFn(fn), field))
        case None =>
          val n = c.name.get
          // projecting an unknown column is an error, not a null column
          // (golden cases project_non_existent_tag / project_non_existent_field,
          // both WantErr in the reference)
          if (!schema.has(n)) throw new IllegalArgumentException(
            s"${if (isField(c, schema)) "field" else "tag"} '$n' not found in the queried resource")
          if (isField(c, schema)) fields :+= n else tags :+= n
      }
    }
    (tags, fields, agg)
  }

  def measure(s: QlSelect, schema: QlSchema, now: Instant): MeasureQuery = {
    val (cols, top) = s.projection match {
      case ProjAll => (Nil, None)
      case ProjEmpty =>
        throw new IllegalArgumentException("empty projection is only valid for TRACE queries")
      case ProjColumns(cs) => (cs, None)
      case ProjTop(t) => (t.others, Some(t))
    }
    val (tags, fields, agg) = splitColumns(cols, schema)
    // GROUP BY columns: field entries name the aggregated field (the
    // reference requires agg+groupBy to include the field, transformer.go
    // transformMeasureQuery); tag entries become group keys.
    val (gbFields, gbTags) = s.groupBy.partition(g =>
      g.spec.contains("FIELD") || (g.spec.isEmpty && schema.fields.contains(g.name)))
    if (agg.isDefined && s.groupBy.nonEmpty && gbFields.isEmpty)
      throw new IllegalArgumentException(
        "when aggregation and group by are both present, group by must include a field")
    val topSpec = top.map { t =>
      val n = intOf(t.n, "TOP n")
      val fieldName = agg match {
        case Some((fn, f)) if f == t.orderField => aggOutputName(fn, f)
        case _ => t.orderField
      }
      TopSpec(n, fieldName, desc = !t.direction.contains("ASC"))
    }
    MeasureQuery(
      groups = s.from.groups,
      name = s.from.name,
      stages = s.from.stages,
      timeRange = convertTimeRange(now, s.time),
      criteria = s.where.map(convertExpr(_, schema)),
      tagProjection = tags,
      fieldProjection = fields,
      groupByTags = gbTags.map(_.name),
      agg = agg,
      top = topSpec,
      orderBy = s.orderBy.map(o => OrderBy(o.ident, o.desc.getOrElse(false))),
      offset = s.offset.map(intOf(_, "OFFSET")).getOrElse(0),
      limit = s.limit.map(intOf(_, "LIMIT")).getOrElse(0))
  }

  def stream(s: QlSelect, schema: QlSchema, now: Instant): StreamQuery = {
    val cols = s.projection match {
      case ProjAll => Nil
      case ProjColumns(cs) =>
        if (cs.exists(_.agg.isDefined))
          throw new IllegalArgumentException("STREAM queries do not support aggregation")
        // projecting an unknown tag is an error (stream golden case
        // project_non_existent_tag, WantErr), not a null column
        cs.map(_.name.get).map { n =>
          if (!schema.has(n)) throw new IllegalArgumentException(
            s"tag '$n' not found in the queried resource")
          n
        }
      case _ =>
        throw new IllegalArgumentException("invalid projection for STREAM query")
    }
    StreamQuery(
      groups = s.from.groups,
      name = s.from.name,
      stages = s.from.stages,
      timeRange = convertTimeRange(now, s.time),
      criteria = s.where.map(convertExpr(_, schema)),
      projection = cols,
      orderBy = s.orderBy.map(o => OrderBy(o.ident, o.desc.getOrElse(false))),
      offset = s.offset.map(intOf(_, "OFFSET")).getOrElse(0),
      limit = s.limit.map(intOf(_, "LIMIT")).getOrElse(0))
  }

  def trace(s: QlSelect, schema: QlSchema, now: Instant): TraceQuery = {
    val cols = s.projection match {
      case ProjAll | ProjEmpty => Nil
      case ProjColumns(cs) => cs.map(_.name.get)
      case _ => throw new IllegalArgumentException("invalid projection for TRACE query")
    }
    TraceQuery(
      groups = s.from.groups,
      name = s.from.name,
      stages = s.from.stages,
      timeRange = convertTimeRange(now, s.time),
      criteria = s.where.map(convertExpr(_, schema)),
      projection = cols,
      orderBy = s.orderBy.map(o => OrderBy(o.ident, o.desc.getOrElse(false))),
      offset = s.offset.map(intOf(_, "OFFSET")).getOrElse(0),
      limit = s.limit.map(intOf(_, "LIMIT")).getOrElse(0))
  }

  /** PROPERTY: top-level AND-chained `id = v` / `id IN (...)` conditions
    * select document ids (transformer.go:1711-1850 extractIDsAndCriteria);
    * the rest stays criteria. */
  def property(s: QlSelect, schema: QlSchema): PropertyQuery = {
    val cols = s.projection match {
      case ProjAll => Nil
      case ProjColumns(cs) => cs.map(_.name.get)
      case _ => throw new IllegalArgumentException("invalid projection for PROPERTY query")
    }
    var ids = Vector.empty[String]
    def strVal(v: QlValue): String = v match {
      case QlString(x) => x
      case QlInt(n) => n.toString
      case other => throw new IllegalArgumentException(s"invalid id value: $other")
    }
    // split the top-level AND chain into id-selectors and residual criteria
    def walk(e: QlExpr): Option[QlExpr] = e match {
      case QlAndE(l, r) => (walk(l), walk(r)) match {
        case (Some(a), Some(b)) => Some(QlAndE(a, b))
        case (a, b) => a.orElse(b)
      }
      case QlCompare("id", "=", v) => ids :+= strVal(v); None
      case QlInE("id", false, vs) => ids ++= vs.map(strVal); None
      case other => Some(other)
    }
    val residual = s.where.flatMap(walk)
    PropertyQuery(
      groups = s.from.groups,
      name = s.from.name,
      ids = ids,
      criteria = residual.map(convertExpr(_, schema)),
      projection = cols,
      orderBy = s.orderBy.map(o => OrderBy(o.ident, o.desc.getOrElse(false))),
      limit = s.limit.map(intOf(_, "LIMIT")).getOrElse(0))
  }

  def topn(t: QlShowTopN, schema: QlSchema, now: Instant): TopNQuery = {
    // flatten the AND-only WHERE into EQ conditions (topn.proto:66-67;
    // Planners.topNRead re-validates EQ-only)
    def conds(e: QlExpr): Seq[Cond] = e match {
      case QlAndE(l, r) => conds(l) ++ conds(r)
      case QlCompare(id, "=", v) => Seq(Cond(id, Op.Eq, Seq(schema.coerce(id, v))))
      case other =>
        throw new IllegalArgumentException(s"topN query conditions must be EQ, got $other")
    }
    TopNQuery(
      groups = t.from.groups,
      name = t.from.name,
      stages = t.from.stages,
      timeRange = convertTimeRange(now, t.time),
      topN = intOf(t.n, "TOP n"),
      desc = t.orderDesc.getOrElse(true),
      agg = t.aggregateBy.map(aggFn),
      conditions = t.where.map(conds).getOrElse(Nil))
  }
}
