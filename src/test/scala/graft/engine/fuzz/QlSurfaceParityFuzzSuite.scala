package graft.engine.fuzz

import graft.SparkSpec
import graft.model._
import graft.ql._
import scala.util.Random

/**
 * QL-vs-typed-AST parity fuzzing for the STREAM / TRACE / PROPERTY
 * surfaces — the measure and SHOW TOP N renders live in
 * [[QlParityFuzzSuite]]; together the five cover every statement form.
 * The reference pairs golden cases with `.ql` files across ALL models
 * (test/cases/stream/data/input, trace, property directories); this is
 * that discipline applied to the generated case space: every renderable
 * [[SurfaceFuzzGen]] case becomes BydbQL text, round-trips through
 * Parser/Transformer, and the typed query must be STRUCTURALLY EQUAL to
 * the generated original.
 *
 * Unrenderable model values (array-literal EQ/NE — the criteria grammar
 * compares one scalar — and saturating extreme time bounds) are skipped;
 * each suite asserts the renderable share stays a corpus (≥500 at the
 * default sizes).
 *
 * Half the round-tripped cases ALSO re-render with every WHERE literal
 * (and, for property, every id literal) as a positional `?` parameter
 * and round-trip through `BydbQL.bind` — the prepared-statement path the
 * reference binder covers for all models (pkg/bydbql/binder.go); the
 * measure/TopN bound variants live in [[QlParityFuzzSuite]].
 */
class QlSurfaceParityFuzzSuite extends SparkSpec {

  private val now = java.time.Instant.parse("2024-01-15T00:00:00Z")

  // schema registries for the three fixtures (the fuzz fixtures never
  // need to exist on disk — parity is a front-end property)
  private val streamSchema = QlSchema(SurfaceFuzzFixtures.streamSchema, fields = Set.empty)
  private val traceSchema = QlSchema(SurfaceFuzzFixtures.traceSchema, fields = Set.empty)
  // property documents are schema-flexible (docs/concept/data-model.md:256-293)
  private val propertySchema =
    QlSchema(SurfaceFuzzFixtures.propertySchema, fields = Set.empty, flexible = true)

  // ---------- rendering ----------

  private def renderValue(v: Any): Option[String] = v match {
    case null => Some("NULL")
    case s: String => Some("'" + s.replace("'", "''") + "'")
    case l: Long => Some(l.toString)
    case i: Int => Some(i.toString)
    case d: Double => Some("'" + d.toString + "'") // coerce() restores the double
    case _ => None // array literals are not in the criteria grammar
  }

  private def renderCond(c: Criteria): Option[String] = c match {
    case And(l, r) => for (a <- renderCond(l); b <- renderCond(r)) yield s"($a AND $b)"
    case Or(l, r) => for (a <- renderCond(l); b <- renderCond(r)) yield s"($a OR $b)"
    case Cond(tag, op, values) =>
      def one = renderValue(values.head)
      def list = {
        val vs = values.map(renderValue)
        if (vs.exists(_.isEmpty)) None else Some(vs.flatten.mkString("(", ", ", ")"))
      }
      op match {
        case Op.Eq if values.size == 1 => one.map(v => s"$tag = $v")
        case Op.Ne if values.size == 1 => one.map(v => s"$tag != $v")
        case Op.Lt => one.map(v => s"$tag < $v")
        case Op.Gt => one.map(v => s"$tag > $v")
        case Op.Le => one.map(v => s"$tag <= $v")
        case Op.Ge => one.map(v => s"$tag >= $v")
        case Op.In => list.map(l => s"$tag IN $l")
        case Op.NotIn => list.map(l => s"$tag NOT IN $l")
        case Op.Having => list.map(l => s"$tag HAVING $l")
        case Op.NotHaving => list.map(l => s"$tag NOT HAVING $l")
        case Op.Match(analyzer, mop) if analyzer.nonEmpty =>
          // default analyzer+operator use the short MATCH(v) form — the
          // transformer resolves absent analyzer → standard, absent
          // operator → OR, so the short form round-trips exactly
          val vs = values.map(renderValue)
          if (vs.exists(_.isEmpty)) None
          else {
            val vpart =
              if (values.size == 1) vs.head.get
              else vs.flatten.mkString("(", ", ", ")")
            val opStr = if (mop == MatchOp.And) "AND" else "OR"
            if (analyzer == "standard" && mop == MatchOp.Or)
              Some(s"$tag MATCH($vpart)")
            else Some(s"$tag MATCH($vpart, '$analyzer', '$opStr')")
          }
        case _ => None // multi-value EQ/NE (array compare), empty analyzer
      }
  }

  /** Saturating extreme bounds have no ISO text form the ms-truncating
    * parse would round-trip. */
  private def timeOk(tr: Option[TimeRange]): Boolean = tr.forall(t =>
    t.begin.getEpochSecond.abs < 4102444800L && t.end.getEpochSecond.abs < 4102444800L)

  private def renderTime(tr: Option[TimeRange]): String =
    tr.map(t => s" TIME BETWEEN '${t.begin}' AND '${t.end}'").getOrElse("")

  private def renderOrder(ob: Option[OrderBy]): String = ob.map { o =>
    val dir = if (o.desc) "DESC" else "ASC"
    o.tag.fold(s" ORDER BY $dir")(t => s" ORDER BY $t $dir")
  }.getOrElse("")

  /** Shared SELECT assembly for stream/trace: kind, projection (with the
    * trace-only `()` empty form), time, where, order, limit, offset.
    * `whereText` is pre-rendered (literal or `?`-parameterized form). */
  private def renderSelect(kind: String, name: String, groups: Seq[String],
      projection: Seq[String], emptyProj: Boolean, tr: Option[TimeRange],
      whereText: Option[String], orderBy: Option[OrderBy],
      limit: Int, offset: Int): Option[String] = {
    if (!timeOk(tr)) return None
    val proj =
      if (emptyProj) "()"
      else if (projection.isEmpty) "*"
      else projection.mkString(", ")
    val where = whereText.map(w => s" WHERE $w").getOrElse("")
    val lim = if (limit > 0) s" LIMIT $limit" else ""
    val off = if (offset > 0) s" OFFSET $offset" else ""
    Some(s"SELECT $proj FROM $kind $name IN ${groups.mkString(", ")}" +
      renderTime(tr) + where + renderOrder(orderBy) + lim + off)
  }

  /** Literal WHERE text for a query's criteria: None if the query HAS
    * criteria that are unrenderable (the whole case is skipped). */
  private def whereLiteral(criteria: Option[Criteria]): Option[Option[String]] = {
    val rendered = criteria.map(renderCond)
    if (rendered.exists(_.isEmpty)) None else Some(rendered.flatten)
  }

  def renderStreamQl(q: StreamQuery, where: Option[Option[String]] = None): Option[String] =
    where.orElse(whereLiteral(q.criteria)).flatMap(w =>
      renderSelect("STREAM", q.name, q.groups, q.projection, emptyProj = false,
        q.timeRange, w, q.orderBy, q.limit, q.offset))

  /** Trace renders the empty projection as `()` (docs bydbql.md:952-967)
    * or `*` — both transform to Nil; `emptyProj` picks per case. */
  def renderTraceQl(q: TraceQuery, emptyProj: Boolean,
      where: Option[Option[String]] = None): Option[String] =
    where.orElse(whereLiteral(q.criteria)).flatMap(w =>
      renderSelect("TRACE", q.name, q.groups, q.projection,
        emptyProj = emptyProj && q.projection.isEmpty,
        q.timeRange, w, q.orderBy, q.limit, q.offset))

  /** Property: ids render as top-level AND-chained `id = v` / `id IN (...)`
    * ahead of the residual criteria — the transformer's
    * extractIDsAndCriteria walk re-captures them in render order.
    * `idText`/`where` override with pre-rendered (parameterized) forms. */
  def renderPropertyQl(q: PropertyQuery, idText: Option[Option[String]] = None,
      where: Option[Option[String]] = None): Option[String] = {
    val idPart = idText.getOrElse {
      if (q.ids.isEmpty) None
      else if (q.ids.size == 1) Some(s"id = '${q.ids.head}'")
      else Some(q.ids.map(i => s"'$i'").mkString("id IN (", ", ", ")"))
    }
    val critPart = where.orElse(whereLiteral(q.criteria)) match {
      case None => return None
      case Some(w) => w
    }
    val whereStr = (idPart, critPart) match {
      case (Some(a), Some(b)) => s" WHERE $a AND $b"
      case (Some(a), None) => s" WHERE $a"
      case (None, Some(b)) => s" WHERE $b"
      case (None, None) => ""
    }
    val proj = if (q.projection.isEmpty) "*" else q.projection.mkString(", ")
    val lim = if (q.limit > 0) s" LIMIT ${q.limit}" else ""
    Some(s"SELECT $proj FROM PROPERTY ${q.name} IN ${q.groups.mkString(", ")}" +
      whereStr + renderOrder(q.orderBy) + lim)
  }

  // ---------- positional-bind variants ----------

  /** Every bindable WHERE literal becomes `?` (lex order = emission
    * order); unbindable conds (NULL — bind() has no parameter form for
    * it — MATCH analyzer/operator names, array literals) keep their
    * literal render, mixed freely with the parameters. */
  private def parameterize(c: Criteria,
      params: scala.collection.mutable.ArrayBuffer[Any]): Option[String] = c match {
    case And(l, r) =>
      for (a <- parameterize(l, params); b <- parameterize(r, params)) yield s"($a AND $b)"
    case Or(l, r) =>
      for (a <- parameterize(l, params); b <- parameterize(r, params)) yield s"($a OR $b)"
    case Cond(tag, op, values) =>
      def bindable = values.forall {
        case _: String | _: Long | _: Int | _: Double => true
        case _ => false
      }
      def mark(vs: Seq[Any]): String = {
        vs.foreach(params += _); Seq.fill(vs.size)("?").mkString("(", ", ", ")")
      }
      def one(v: Any): String = { params += v; "?" }
      op match {
        case Op.Eq if values.size == 1 && bindable => Some(s"$tag = ${one(values.head)}")
        case Op.Ne if values.size == 1 && bindable => Some(s"$tag != ${one(values.head)}")
        case Op.Lt if bindable => Some(s"$tag < ${one(values.head)}")
        case Op.Gt if bindable => Some(s"$tag > ${one(values.head)}")
        case Op.Le if bindable => Some(s"$tag <= ${one(values.head)}")
        case Op.Ge if bindable => Some(s"$tag >= ${one(values.head)}")
        case Op.In if bindable => Some(s"$tag IN ${mark(values)}")
        case Op.NotIn if bindable => Some(s"$tag NOT IN ${mark(values)}")
        case Op.Having if bindable => Some(s"$tag HAVING ${mark(values)}")
        case Op.NotHaving if bindable => Some(s"$tag NOT HAVING ${mark(values)}")
        case _ => renderCond(c)
      }
  }

  /** The `?`-form statement + bind list for a case, or None when there is
    * nothing to bind (no criteria and, for property, no ids). */
  private def bindVariant[Q](q: Q,
      params: scala.collection.mutable.ArrayBuffer[Any]): Option[String] = q match {
    case s: StreamQuery =>
      s.criteria.flatMap(c => parameterize(c, params).flatMap(w =>
        renderStreamQl(s, where = Some(Some(w)))))
    case t: TraceQuery =>
      t.criteria.flatMap(c => parameterize(c, params).flatMap(w =>
        renderTraceQl(t, emptyProj = false, where = Some(Some(w)))))
    case p: PropertyQuery =>
      if (p.ids.isEmpty && p.criteria.isEmpty) None
      else {
        val idText =
          if (p.ids.isEmpty) None
          else if (p.ids.size == 1) { params += p.ids.head; Some("id = ?") }
          else Some(p.ids.map { i => params += i; "?" }.mkString("id IN (", ", ", ")"))
        val wherePart = p.criteria.map(c => parameterize(c, params))
        if (wherePart.exists(_.isEmpty)) None
        else renderPropertyQl(p, idText = Some(idText), where = Some(wherePart.flatten))
      }
    case _ => None
  }

  // ---------- drive ----------

  private def drive[Q](label: String, schema: QlSchema,
      gen: Random => SurfaceFuzzGen.SurfaceCase[Q],
      render: (Q, Random) => Option[String],
      unwrap: PartialFunction[TypedQuery, Q]): Unit = {
    val n = sys.env.get("SPARK_GRAFT_FUZZ_QL_N").map(_.toInt).getOrElse(1000)
    val passes = FuzzSeeds.passes("SPARK_GRAFT_SURFACE_FUZZ_SEED", salt = 4,
      pinned = FuzzSeeds.PinnedA, pinnedN = 100, n = n)
    val total = passes.map(_._2).sum
    var rendered = 0
    var skipped = 0
    var bound = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((sd, m) <- passes; i <- 0 until m) {
      val rnd = new Random(sd + i * 104729L)
      val fc = gen(rnd)
      render(fc.q, rnd) match {
        case None => skipped += 1
        case Some(text) =>
          rendered += 1
          val got = try Right(Transformer.transform(Parser.parse(text), schema, now))
            catch { case t: Throwable => Left(t) }
          got match {
            case Right(tq) if unwrap.isDefinedAt(tq) && unwrap(tq) == fc.q => ()
            case Right(tq) if failures.size < 5 =>
              failures += s"$label case #$i (replay: SPARK_GRAFT_SURFACE_FUZZ_SEED=$sd) " +
                s"AST mismatch:\n  ql: $text\n  want: ${fc.q}\n  got:  $tq"
            case Left(t) if failures.size < 5 =>
              failures += s"$label case #$i (replay: SPARK_GRAFT_SURFACE_FUZZ_SEED=$sd) " +
                s"transform threw: ${t.getMessage}\n  ql: $text"
            case _ => failures += s"$label case #$i (suppressed)"
          }
          // prepared-statement variant on half the round-tripped cases
          if (i % 2 == 0 && failures.isEmpty) {
            val params = scala.collection.mutable.ArrayBuffer.empty[Any]
            bindVariant(fc.q, params).foreach { ptext =>
              val bgot = try {
                val stmt = BydbQL.bind(Parser.parse(ptext), params.toSeq)
                Right(Transformer.transform(stmt, schema, now))
              } catch { case t: Throwable => Left(t) }
              bound += 1
              bgot match {
                case Right(tq) if unwrap.isDefinedAt(tq) && unwrap(tq) == fc.q => ()
                case other if failures.size < 5 =>
                  failures += s"$label case #$i (replay: SPARK_GRAFT_SURFACE_FUZZ_SEED=$sd) " +
                    s"bind mismatch:\n  ql: $ptext\n  params: $params\n  want: ${fc.q}\n  got:  $other"
                case _ => failures += s"$label case #$i (bind, suppressed)"
              }
            }
          }
      }
    }
    info(s"$label ql parity: $rendered rendered, $bound bound-variants, $skipped skipped " +
      s"(passes=${passes.map { case (s0, m) => s"$m@seed=$s0" }.mkString(", ")})")
    assert(failures.isEmpty, s"\n${failures.size} parity failure(s):\n${failures.mkString("\n")}")
    assert(rendered >= total / 2, s"only $rendered/$total $label cases were QL-renderable")
    assert(bound >= 200, s"only $bound $label bound-variants round-tripped (want ≥200)")
  }

  test("QL parity: stream renders round-trip to the same StreamQuery") {
    drive[StreamQuery]("stream", streamSchema, SurfaceFuzzGen.genStreamCase,
      (q, _) => renderStreamQl(q), { case StreamStatement(q) => q })
  }

  test("QL parity: trace renders (incl. the `()` span projection) round-trip") {
    drive[TraceQuery]("trace", traceSchema, SurfaceFuzzGen.genTraceCase,
      (q, rnd) => renderTraceQl(q, emptyProj = rnd.nextBoolean()),
      { case TraceStatement(q) => q })
  }

  test("QL parity: property renders (id extraction) round-trip") {
    drive[PropertyQuery]("property", propertySchema, SurfaceFuzzGen.genPropertyCase,
      (q, _) => renderPropertyQl(q), { case PropertyStatement(q) => q })
  }
}
