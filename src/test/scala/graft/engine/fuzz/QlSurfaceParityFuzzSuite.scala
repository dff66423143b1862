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
    * trace-only `()` empty form), time, where, order, limit, offset. */
  private def renderSelect(kind: String, name: String, groups: Seq[String],
      projection: Seq[String], emptyProj: Boolean, tr: Option[TimeRange],
      criteria: Option[Criteria], orderBy: Option[OrderBy],
      limit: Int, offset: Int): Option[String] = {
    if (!timeOk(tr)) return None
    val whereOpt: Option[Option[String]] = criteria.map(renderCond)
    if (whereOpt.exists(_.isEmpty)) return None
    val proj =
      if (emptyProj) "()"
      else if (projection.isEmpty) "*"
      else projection.mkString(", ")
    val where = whereOpt.flatten.map(w => s" WHERE $w").getOrElse("")
    val lim = if (limit > 0) s" LIMIT $limit" else ""
    val off = if (offset > 0) s" OFFSET $offset" else ""
    Some(s"SELECT $proj FROM $kind $name IN ${groups.mkString(", ")}" +
      renderTime(tr) + where + renderOrder(orderBy) + lim + off)
  }

  def renderStreamQl(q: StreamQuery): Option[String] =
    renderSelect("STREAM", q.name, q.groups, q.projection, emptyProj = false,
      q.timeRange, q.criteria, q.orderBy, q.limit, q.offset)

  /** Trace renders the empty projection as `()` (docs bydbql.md:952-967)
    * or `*` — both transform to Nil; `emptyProj` picks per case. */
  def renderTraceQl(q: TraceQuery, emptyProj: Boolean): Option[String] =
    renderSelect("TRACE", q.name, q.groups, q.projection,
      emptyProj = emptyProj && q.projection.isEmpty,
      q.timeRange, q.criteria, q.orderBy, q.limit, q.offset)

  /** Property: ids render as top-level AND-chained `id = v` / `id IN (...)`
    * ahead of the residual criteria — the transformer's
    * extractIDsAndCriteria walk re-captures them in render order. */
  def renderPropertyQl(q: PropertyQuery): Option[String] = {
    val idPart =
      if (q.ids.isEmpty) None
      else if (q.ids.size == 1) Some(s"id = '${q.ids.head}'")
      else Some(q.ids.map(i => s"'$i'").mkString("id IN (", ", ", ")"))
    val critPart: Option[Option[String]] = q.criteria.map(renderCond)
    if (critPart.exists(_.isEmpty)) return None
    val where = (idPart, critPart.flatten) match {
      case (Some(a), Some(b)) => s" WHERE $a AND $b"
      case (Some(a), None) => s" WHERE $a"
      case (None, Some(b)) => s" WHERE $b"
      case (None, None) => ""
    }
    val proj = if (q.projection.isEmpty) "*" else q.projection.mkString(", ")
    val lim = if (q.limit > 0) s" LIMIT ${q.limit}" else ""
    Some(s"SELECT $proj FROM PROPERTY ${q.name} IN ${q.groups.mkString(", ")}" +
      where + renderOrder(q.orderBy) + lim)
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
      }
    }
    info(s"$label ql parity: $rendered rendered, $skipped skipped " +
      s"(passes=${passes.map { case (s0, m) => s"$m@seed=$s0" }.mkString(", ")})")
    assert(failures.isEmpty, s"\n${failures.size} parity failure(s):\n${failures.mkString("\n")}")
    assert(rendered >= total / 2, s"only $rendered/$total $label cases were QL-renderable")
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
