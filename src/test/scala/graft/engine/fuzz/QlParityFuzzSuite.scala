package graft.engine.fuzz

import graft.SparkSpec
import graft.model._
import graft.ql._
import scala.util.Random

/**
 * QL-vs-typed-AST parity fuzzing: every renderable generated fuzz case is
 * ALSO rendered as BydbQL text, round-tripped through Parser/Transformer,
 * and the resulting typed MeasureQuery asserted STRUCTURALLY EQUAL to the
 * original — the reference pairs every golden `.yaml` with a `.ql` for
 * exactly this (test/cases/measure/data/input &lt;case&gt;.ql), and AST equality is
 * the strongest form of "identical plan/result". Half the cases also
 * re-render with every WHERE literal as a positional `?` parameter and
 * round-trip through `Transformer.bind` (the prepared-statement path,
 * reference pkg/bydbql/prepared.go).
 *
 * Not all model values are QL-expressible: array-literal EQ/NE (the
 * criteria grammar compares one scalar) and saturating extreme time
 * bounds have no text form — those cases are skipped and the suite
 * asserts the renderable share stays a corpus.
 */
class QlParityFuzzSuite extends SparkSpec {

  private val now = java.time.Instant.parse("2024-01-15T00:00:00Z")

  private lazy val schema = {
    val df = FuzzFixture.write(spark, "target/fuzz", seed = 7L, n = 700)
    QlSchema.of(df, fields = Set("value", "load", "dur"))
  }

  // ---------- rendering ----------

  /** None = not expressible in BydbQL text. */
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
        case _ => None // multi-value EQ/NE (array compare), MATCH
      }
  }

  private def renderAggCol(fn: AggFn, field: String): String = {
    val name = fn match {
      case AggFn.Sum => "SUM"; case AggFn.Count => "COUNT"
      case AggFn.Max => "MAX"; case AggFn.Min => "MIN"; case AggFn.Mean => "MEAN"
    }
    s"$name($field)"
  }

  def renderQl(q: MeasureQuery): Option[String] = {
    // index mode is resource metadata in BydbQL (Resource.indexMode via
    // the registry), not statement text — no QL form to round-trip
    if (q.indexMode) return None
    val whereOpt: Option[Option[String]] = q.criteria.map(renderCond)
    if (whereOpt.exists(_.isEmpty)) return None
    renderWith(q, whereOpt.flatten)
  }

  /** Clause assembly with the WHERE text supplied — the parameterized
    * variant splices its `?`-form criteria into the same clause slot. */
  private def renderWith(q: MeasureQuery, whereStr: Option[String]): Option[String] = {
    // extreme instants saturate in nanos; they have no ISO text form the
    // transformer's ms-truncating parse would round-trip
    val timeOk = q.timeRange.forall(tr =>
      tr.begin.getEpochSecond.abs < 4102444800L && tr.end.getEpochSecond.abs < 4102444800L)
    if (!timeOk) return None

    val cols = q.tagProjection ++ q.fieldProjection ++
      q.agg.map { case (fn, f) => renderAggCol(fn, f) }.toSeq
    val projection = q.top match {
      case Some(TopSpec(n, field, desc)) =>
        // top over the agg output names the RAW field in QL; the
        // transformer re-derives the output name
        val orderField = q.agg match {
          case Some((fn, f)) if Transformer.aggOutputName(fn, f) == field => f
          case _ => field
        }
        val dir = if (desc) "DESC" else "ASC"
        (s"TOP $n $orderField $dir" +: cols).mkString(", ")
      case None => if (cols.isEmpty) "*" else cols.mkString(", ")
    }

    val time = q.timeRange.map(tr =>
      s" TIME BETWEEN '${tr.begin}' AND '${tr.end}'").getOrElse("")
    val where = whereStr.map(w => s" WHERE $w").getOrElse("")
    val groupBy =
      if (q.groupByTags.isEmpty && q.agg.isEmpty) ""
      else if (q.groupByTags.isEmpty) "" // scalar agg: no GROUP BY clause
      else {
        // agg + GROUP BY must name the aggregated field too (the
        // reference's transformMeasureQuery rule)
        val entries = q.groupByTags ++ q.agg.map(_._2).toSeq
        s" GROUP BY ${entries.mkString(", ")}"
      }
    val orderBy = q.orderBy.map { ob =>
      val dir = if (ob.desc) "DESC" else "ASC"
      ob.tag.fold(s" ORDER BY $dir")(t => s" ORDER BY $t $dir")
    }.getOrElse("")
    val limit = if (q.limit > 0) s" LIMIT ${q.limit}" else ""
    val offset = if (q.offset > 0) s" OFFSET ${q.offset}" else ""

    Some(s"SELECT $projection FROM MEASURE ${q.name} IN ${q.groups.mkString(", ")}" +
      time + where + groupBy + orderBy + limit + offset)
  }

  /** Parameterized variant: every WHERE literal becomes `?` (lex order =
    * emission order), values returned as the bind list. */
  private def parameterize(c: Criteria, params: scala.collection.mutable.ArrayBuffer[Any])
      : Option[String] = c match {
    case And(l, r) =>
      for (a <- parameterize(l, params); b <- parameterize(r, params)) yield s"($a AND $b)"
    case Or(l, r) =>
      for (a <- parameterize(l, params); b <- parameterize(r, params)) yield s"($a OR $b)"
    case Cond(tag, op, values) =>
      def scalarOk = values.forall {
        case null | _: String | _: Long | _: Int | _: Double => true
        case _ => false
      }
      // NULL has no parameter form in bind(); doubles bind via toString →
      // coerce, same as literals
      def bindable = scalarOk && !values.contains(null)
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
        case _ => renderCond(c) // fall back to the literal form
      }
  }

  private def transformed(text: String): MeasureQuery =
    Transformer.transform(Parser.parse(text), schema, now) match {
      case MeasureStatement(m) => m
      case other => fail(s"expected MeasureStatement, got $other")
    }

  test("QL parity: rendered fuzz cases round-trip Parser/Transformer to the same AST") {
    val n = sys.env.get("SPARK_GRAFT_FUZZ_QL_N").map(_.toInt).getOrElse(1000)
    val passes = FuzzSeeds.passes("SPARK_GRAFT_FUZZ_SEED", salt = 1,
      pinned = FuzzSeeds.PinnedA, pinnedN = 100, n = n)
    val total = passes.map(_._2).sum
    var rendered = 0
    var skipped = 0
    var bound = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((sd, m) <- passes; i <- 0 until m) {
      val fc = FuzzGen.genCase(new Random(sd + i * 7919L))
      renderQl(fc.q) match {
        case None => skipped += 1
        case Some(text) =>
          rendered += 1
          val got = try Right(transformed(text)) catch { case t: Throwable => Left(t) }
          got match {
            case Right(m) if m == fc.q => ()
            case Right(m) if failures.size < 5 =>
              failures += s"case #$i AST mismatch:\n  ql: $text\n  want: ${fc.q}\n  got:  $m"
            case Left(t) if failures.size < 5 =>
              failures += s"case #$i transform threw: ${t.getMessage}\n  ql: $text"
            case _ => failures += s"case #$i (suppressed)"
          }
          // prepared-statement variant on the same criteria tree
          if (i % 2 == 0 && fc.q.criteria.isDefined && failures.isEmpty) {
            val params = scala.collection.mutable.ArrayBuffer.empty[Any]
            val whereP = parameterize(fc.q.criteria.get, params)
            whereP.flatMap(w => renderWith(fc.q, Some(w))).foreach { paramText =>
              val stmt = BydbQL.bind(Parser.parse(paramText), params.toSeq)
              val m = Transformer.transform(stmt, schema, now) match {
                case MeasureStatement(mm) => mm
                case other => fail(s"expected MeasureStatement, got $other")
              }
              bound += 1
              if (m != fc.q && failures.size < 5)
                failures += s"case #$i bind mismatch:\n  ql: $paramText\n  params: $params\n  want: ${fc.q}\n  got:  $m"
            }
          }
      }
    }
    info(s"ql parity: $rendered rendered, $bound bound-variants, $skipped skipped " +
      s"(passes=${passes.map { case (s0, m) => s"$m@seed=$s0" }.mkString(", ")}; " +
      s"replay via SPARK_GRAFT_FUZZ_SEED)")
    assert(failures.isEmpty, s"\n${failures.size} parity failure(s):\n${failures.mkString("\n")}")
    assert(rendered >= total * 55 / 100, s"only $rendered/$total cases were QL-renderable")
  }

  // ---------- SHOW TOP N parity ----------

  /** Schema of the pre-agg TopN bucket table the conditions coerce
    * against (FIXTURES.md A7 shape). */
  private lazy val topnSchema = QlSchema(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bucket_start",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("entity",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("region",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.LongType))),
    fields = Set("value"))

  private def renderTopNQl(q: TopNQuery): String = {
    val time = q.timeRange.map(tr =>
      s" TIME BETWEEN '${tr.begin}' AND '${tr.end}'").getOrElse("")
    val where =
      if (q.conditions.isEmpty) ""
      else " WHERE " + q.conditions.map { c =>
        val v = c.values.head match {
          case null => "NULL"
          case s: String => "'" + s.replace("'", "''") + "'"
          case other => other.toString
        }
        val op = c.op match {
          case Op.Eq => "="; case Op.Ne => "!="; case Op.Lt => "<"
          case other => fail(s"unrenderable topN condition op $other")
        }
        s"${c.tag} $op $v"
      }.mkString(" AND ")
    val aggBy = q.agg.map { fn =>
      val name = fn match {
        case AggFn.Sum => "SUM"; case AggFn.Count => "COUNT"
        case AggFn.Max => "MAX"; case AggFn.Min => "MIN"; case AggFn.Mean => "MEAN"
      }
      s" AGGREGATE BY $name"
    }.getOrElse("")
    val order = if (q.desc) " ORDER BY DESC" else " ORDER BY ASC"
    s"SHOW TOP ${q.topN} FROM MEASURE ${q.name} IN ${q.groups.mkString(", ")}" +
      time + where + aggBy + order
  }

  test("QL parity: SHOW TOP N renders round-trip to the same TopNQuery") {
    val n = sys.env.get("SPARK_GRAFT_FUZZ_QL_N").map(_.toInt).getOrElse(1000)
    val passes = FuzzSeeds.passes("SPARK_GRAFT_TOPN_FUZZ_SEED", salt = 2,
      pinned = FuzzSeeds.PinnedB, pinnedN = 100, n = n)
    val total = passes.map(_._2).sum
    var rendered = 0
    var rejected = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((sd, m) <- passes; i <- 0 until m) {
      // the render covers Op.In separately: IN parses to QlIn, which the
      // transformer must reject on the TopN surface (topn.proto:66-67) —
      // those cases land in the invalid branch below
      val fc = TopNFuzzGen.genCase(new Random(sd + i * 7919L))
      val renderable = fc.q.conditions.forall(c =>
        c.op == Op.Eq || c.op == Op.Ne || c.op == Op.Lt)
      if (renderable) {
        val text = renderTopNQl(fc.q)
        val got = try Right(Transformer.transform(Parser.parse(text), topnSchema, now))
          catch { case t: Throwable => Left(t) }
        (got, fc.deliberatelyInvalid) match {
          case (Right(TopNStatement(m)), false) if m == fc.q => rendered += 1
          case (Left(t), true)
              if Option(t.getMessage).exists(_.contains("topN query conditions must be EQ")) =>
            rejected += 1
          case (Right(TopNStatement(m)), false) if failures.size < 5 =>
            failures += s"case #$i AST mismatch:\n  ql: $text\n  want: ${fc.q}\n  got:  $m"
          case (Right(_), true) if failures.size < 5 =>
            failures += s"case #$i: transformer accepted an invalid TopN query\n  ql: $text"
          case (Left(t), false) if failures.size < 5 =>
            failures += s"case #$i transform threw: ${t.getMessage}\n  ql: $text"
          case other if failures.size < 5 =>
            failures += s"case #$i unexpected outcome: $other"
          case _ => failures += s"case #$i (suppressed)"
        }
      }
    }
    info(s"topn ql parity: $rendered round-tripped, $rejected invalid-rejected " +
      s"(passes=${passes.map { case (s0, m) => s"$m@seed=$s0" }.mkString(", ")}; " +
      s"replay via SPARK_GRAFT_TOPN_FUZZ_SEED)")
    assert(failures.isEmpty, s"\n${failures.size} parity failure(s):\n${failures.mkString("\n")}")
    assert(rendered >= total / 2, s"only $rendered/$total TopN cases round-tripped")
  }
}
