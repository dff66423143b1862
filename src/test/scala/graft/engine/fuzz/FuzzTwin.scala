package graft.engine.fuzz

import graft.model._

/**
 * Mechanical MeasureQuery → DuckDB SQL derivation — the oracle side of
 * the differential fuzzer. This is an INDEPENDENT encoding of the same
 * semantics spec `Planners.measure` implements (SURVEY §2: dedup before
 * filter, MEAN integer-trunc-division + <1→1 clamp, first-row extras,
 * hidden-tag ordering, deterministic tie-breaks, offset-after-top), so a
 * divergence means one side mis-encodes the spec. Everything here is
 * derived from the QUERY VALUE alone — no peeking at the engine's plan.
 *
 * Notes pinned by probe against DuckDB v1.0.0 (see DifferentialFuzzSuite):
 * `//` truncates toward zero (Go/Spark `div` semantics), `x // 0` → NULL,
 * `list_has_all(NULL, …)` → NULL, list comparisons are lexicographic with
 * shorter-prefix-first — all matching Spark.
 */
object FuzzTwin {
  import FuzzFixture.{Name, cols => tableCols}

  /** What the renderer needs to know about one fixture frame: the SQL
    * producing its rows (a table name or a whole UNION subquery — the
    * multi-group merge renders here, mirroring how BydbQL.resolve unions
    * BEFORE planning), its column order, and which columns are
    * float/array-typed. Keys/entity/ts/version are shared — the engine
    * itself requires them uniform across merged groups (BydbQL.resolve). */
  final case class TwinSpec(
      baseSql: String,
      cols: Seq[String],
      floatCols: Set[String],
      arrayTags: Set[String],
      groups: Set[Seq[String]])

  val DefaultSpec: TwinSpec = TwinSpec(
    baseSql = s"SELECT * FROM $Name",
    cols = tableCols,
    floatCols = Set("ratio", "load"),
    arrayTags = Set("labels", "ports"),
    groups = Set(Seq(Name), Seq.empty, Seq("fuzz")))

  private val keys = Seq("svc", "inst", "ts")
  private val entity = Seq("svc", "inst")
  private val tsCol = "ts"
  private val versionCol = "version"

  def aggOutName(fn: AggFn, field: String): String = fn match {
    case AggFn.Sum => s"sum_$field"
    case AggFn.Count => s"count_$field"
    case AggFn.Max => s"max_$field"
    case AggFn.Min => s"min_$field"
    case AggFn.Mean => s"mean_$field"
  }

  private def isFloatCol(c: String)(implicit spec: TwinSpec): Boolean =
    spec.floatCols.contains(c)

  /** Saturating Instant→nanos, the exact arithmetic Planners.applyTime
    * uses for LongType ts columns. */
  def nsSat(i: java.time.Instant): Long =
    try Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000000L), i.getNano.toLong)
    catch { case _: ArithmeticException =>
      if (i.getEpochSecond < 0) Long.MinValue else Long.MaxValue }

  // ---------- literal rendering ----------

  def lit(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case l: Long => l.toString
    case i: Int => i.toString
    // route through a VARCHAR cast: a bare 9.99 parses as DECIMAL(3,2)
    // in DuckDB, and we want the exact IEEE double Spark's lit() uses
    case d: Double => s"CAST('${d.toString}' AS DOUBLE)"
    case seq: scala.collection.Seq[_] => seq.map(lit).mkString("[", ", ", "]")
    case arr: Array[_] => arr.toSeq.map(lit).mkString("[", ", ", "]")
    case other => throw new IllegalArgumentException(s"unrenderable literal $other")
  }

  // ---------- criteria rendering ----------

  def critSql(c: Criteria)(implicit spec: TwinSpec): String = c match {
    case And(l, r) => s"(${critSql(l)} AND ${critSql(r)})"
    case Or(l, r) => s"(${critSql(l)} OR ${critSql(r)})"
    case Cond(tag, op, values) => condSql(tag, op, values)
  }

  /** Flatten the two encodings of an array-valued comparison the model
    * admits (flat multi-value Seq, or one nested Seq/Array). */
  private def arrayValues(values: Seq[Any]): Seq[Any] = values match {
    case Seq(inner: scala.collection.Seq[_]) => inner.toSeq
    case Seq(inner: Array[_]) => inner.toSeq
    case flat => flat
  }

  private def condSql(tag: String, op: Op, values: Seq[Any])(
      implicit spec: TwinSpec): String = op match {
    case Op.Eq if spec.arrayTags.contains(tag) && values.headOption.contains(null) =>
      s"$tag IS NULL"
    case Op.Eq if spec.arrayTags.contains(tag) => s"$tag = ${lit(arrayValues(values))}"
    case Op.Ne if spec.arrayTags.contains(tag) && values.headOption.contains(null) =>
      s"$tag IS NOT NULL"
    case Op.Ne if spec.arrayTags.contains(tag) => s"$tag <> ${lit(arrayValues(values))}"
    case Op.Eq if values.head == null => s"$tag IS NULL"
    case Op.Eq => s"$tag = ${lit(values.head)}"
    case Op.Ne if values.head == null => s"$tag IS NOT NULL"
    case Op.Ne => s"$tag <> ${lit(values.head)}"
    case Op.Lt => s"$tag < ${lit(values.head)}"
    case Op.Gt => s"$tag > ${lit(values.head)}"
    case Op.Le => s"$tag <= ${lit(values.head)}"
    case Op.Ge => s"$tag >= ${lit(values.head)}"
    case Op.In => s"$tag IN (${values.map(lit).mkString(", ")})"
    case Op.NotIn => s"$tag NOT IN (${values.map(lit).mkString(", ")})"
    case Op.Having => s"list_has_all($tag, ${lit(values)})"
    case Op.NotHaving => s"NOT list_has_all($tag, ${lit(values)})"
    case m: Op.Match =>
      throw new IllegalArgumentException(s"MATCH not in the differential surface: $m")
  }

  private def critTags(c: Criteria): Seq[String] = c match {
    case And(l, r) => critTags(l) ++ critTags(r)
    case Or(l, r) => critTags(l) ++ critTags(r)
    case Cond(t, _, _) => Seq(t)
  }

  // ---------- column-order mirror of Planners.measure ----------

  /** (dedupOutputCols, coreCols, postProject) — the exact column sets and
    * ORDER the engine's plan carries at each stage; tie-breaking and the
    * final select depend on them. */
  def corePlan(q: MeasureQuery)(implicit spec: TwinSpec = DefaultSpec)
      : (Seq[String], Seq[String], Option[Seq[String]]) = {
    val keep: Option[Seq[String]] =
      if (q.tagProjection.isEmpty && q.fieldProjection.isEmpty) None
      else Some((q.tagProjection ++ q.fieldProjection ++
        q.criteria.toSeq.flatMap(critTags) ++
        q.orderBy.flatMap(_.tag).toSeq ++ q.groupByTags ++
        q.agg.map(_._2).toSeq ++ q.top.map(_.fieldName).toSeq).distinct)
    val payload = keep
      .map(k => (k :+ versionCol).distinct.filterNot(keys.contains)
        .filter(spec.cols.contains))
      .getOrElse(spec.cols.filterNot(keys.contains))
    val dedupCols = keys ++ payload

    val projected: Seq[String] =
      if (q.tagProjection.nonEmpty || q.fieldProjection.nonEmpty)
        (q.tagProjection ++ q.fieldProjection).distinct
      else dedupCols

    (q.groupByTags, q.agg) match {
      case (Nil, None) => (dedupCols, dedupCols, Some(projected))
      case (gk, Some((fn, field))) if gk.nonEmpty =>
        val extras = q.tagProjection.filterNot(gk.contains)
        val core = gk ++ (aggOutName(fn, field) +: extras)
        val post = if (q.tagProjection.isEmpty) None
          else Some(q.tagProjection.distinct :+ aggOutName(fn, field))
        (dedupCols, core, post)
      case (Nil, Some((fn, field))) =>
        val core = aggOutName(fn, field) +: q.tagProjection
        val post = if (q.tagProjection.isEmpty) None
          else Some(q.tagProjection.distinct :+ aggOutName(fn, field))
        (dedupCols, core, post)
      case (gk, None) =>
        val need = (projected ++ q.orderBy.flatMap(_.tag).toSeq ++
          Seq(tsCol) ++ entity ++ Seq(versionCol))
          .distinct.filterNot(gk.contains)
        (dedupCols, gk ++ need, Some(projected))
    }
  }

  // ---------- aggregate expression rendering ----------

  private def aggExprSql(fn: AggFn, field: String)(implicit spec: TwinSpec): String = {
    val float = isFloatCol(field)
    val exactSum = s"CAST(sum(CAST($field AS DECIMAL(25,6))) AS DOUBLE)"
    val expr = fn match {
      case AggFn.Sum => if (float) exactSum else s"CAST(sum($field) AS BIGINT)"
      case AggFn.Count =>
        if (float) s"CAST(count($field) AS DOUBLE)" else s"count($field)"
      case AggFn.Max => s"max($field)"
      case AggFn.Min => s"min($field)"
      case AggFn.Mean =>
        if (float)
          s"""CASE WHEN count($field) = 0 THEN NULL
             | WHEN $exactSum / count($field) < 1.0 THEN 1.0
             | ELSE $exactSum / count($field) END""".stripMargin.replace("\n", "")
        else
          // DuckDB // truncates toward zero (probed) = Spark div = Go
          s"""CAST(CASE WHEN count($field) = 0 THEN NULL
             | WHEN (sum($field) // count($field)) < 1 THEN 1
             | ELSE sum($field) // count($field) END AS BIGINT)"""
            .stripMargin.replace("\n", "")
    }
    s"$expr AS ${aggOutName(fn, field)}"
  }

  // ---------- ordering mirrors ----------

  private[fuzz] def dir(desc: Boolean): String =
    if (desc) "DESC NULLS LAST" else "ASC NULLS FIRST" // Spark's defaults

  /** Planners.orderCols: primary (tag or ts) + (ts, entity) tie-breaks. */
  private def orderColsSql(ob: Option[OrderBy]): Seq[String] = {
    val primary = ob match {
      case Some(OrderBy(tag, desc)) => Seq(s"${tag.getOrElse(tsCol)} ${dir(desc)}")
      case None => Seq(s"$tsCol ${dir(desc = false)}")
    }
    val ties = (Seq(tsCol) ++ entity)
      .filterNot(c => ob.fold(c == tsCol)(o => o.tag.contains(c)))
      .map(c => s"$c ${dir(desc = false)}")
    primary ++ ties
  }

  // ---------- whole-query rendering ----------

  def sql(q: MeasureQuery)(implicit spec: TwinSpec = DefaultSpec): String = {
    require(spec.groups.contains(q.groups),
      s"twin spec does not render groups ${q.groups}")
    val (dedupCols, coreCols, postProject) = corePlan(q)

    val timePred = q.timeRange.map { tr =>
      s"ts >= ${nsSat(tr.begin)} AND ts < ${nsSat(tr.end)}"
    }
    val base = s"SELECT * FROM (${spec.baseSql}) AS __b" +
      timePred.fold("")(p => s" WHERE $p")
    // index-mode scans skip the latest-version dedup (S2)
    val ded =
      if (q.indexMode) s"SELECT ${dedupCols.mkString(", ")} FROM base"
      else
        s"""SELECT ${dedupCols.mkString(", ")} FROM (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY svc, inst, ts ORDER BY version DESC) AS __rn
           |  FROM base) WHERE __rn = 1""".stripMargin
    val filt = "SELECT * FROM ded" +
      q.criteria.fold("")(c => s" WHERE ${critSql(c)}")

    // core stage per Planners' (groupBy, agg) case split
    val coreCte: String = (q.groupByTags, q.agg) match {
      case (Nil, None) => "SELECT * FROM filt"
      case (gk, Some((fn, field))) if gk.nonEmpty =>
        val extras = q.tagProjection.filterNot(gk.contains)
        val frCols = if (extras.isEmpty) "" else ", " + extras.mkString(", ")
        val joinCond = gk.map(k => s"ag.$k IS NOT DISTINCT FROM fr.$k").mkString(" AND ")
        val sel = (gk.map(k => s"ag.$k") :+ s"ag.${aggOutName(fn, field)}") ++
          extras.map(e => s"fr.$e")
        s"""SELECT ${sel.mkString(", ")} FROM
           |  (SELECT ${gk.mkString(", ")}, ${aggExprSql(fn, field)}
           |   FROM filt GROUP BY ${gk.mkString(", ")}) ag
           |LEFT JOIN
           |  (SELECT ${gk.mkString(", ")}$frCols FROM (
           |     SELECT *, row_number() OVER (
           |       PARTITION BY ${gk.mkString(", ")}
           |       ORDER BY $tsCol, $versionCol) AS __fr FROM filt)
           |   WHERE __fr = 1) fr
           |ON $joinCond""".stripMargin
      case (Nil, Some((fn, field))) =>
        val extras = q.tagProjection
        if (extras.isEmpty)
          s"SELECT ${aggExprSql(fn, field)} FROM filt"
        else
          s"""SELECT ag.${aggOutName(fn, field)}, ${extras.map(e => s"fr.$e").mkString(", ")}
             |FROM (SELECT ${aggExprSql(fn, field)} FROM filt) ag
             |LEFT JOIN
             |  (SELECT ${extras.mkString(", ")} FROM (
             |     SELECT *, row_number() OVER (
             |       ORDER BY $tsCol, $versionCol) AS __fr FROM filt)
             |   WHERE __fr = 1) fr ON TRUE""".stripMargin
      case (gk, None) =>
        val sel = coreCols.mkString(", ")
        s"""SELECT $sel FROM (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY ${gk.mkString(", ")}
           |    ORDER BY $tsCol, $versionCol) AS __fr FROM filt)
           |WHERE __fr = 1""".stripMargin
    }

    val afterAgg = q.agg.isDefined
    val effLimit = if (q.limit <= 0) graft.engine.Planners.DefaultLimit else q.limit

    // ORDER BY + LIMIT/OFFSET, composed exactly as Planners pages:
    // top's limit(n) runs first, then offset, then the request limit.
    val (orderSql, limitSql) = q.top match {
      case Some(TopSpec(n, field, desc)) =>
        val ties = coreCols.filterNot(_ == field).map(c => s"$c ${dir(desc = false)}")
        val ord = (s"$field ${dir(desc)}" +: ties).mkString(", ")
        val lim = math.max(0, math.min(n - q.offset, effLimit))
        (s" ORDER BY $ord", s" LIMIT $lim OFFSET ${q.offset}")
      case None =>
        val ord =
          if (!afterAgg) orderColsSql(q.orderBy).mkString(", ")
          else q.orderBy match {
            case Some(OrderBy(Some(tag), desc)) if coreCols.contains(tag) =>
              s"$tag ${dir(desc)}"
            case _ => ""
          }
        (if (ord.isEmpty) "" else s" ORDER BY $ord",
          s" LIMIT $effLimit OFFSET ${q.offset}")
    }

    val finalSelect = postProject.fold("*")(_.mkString(", "))
    s"""WITH base AS ($base),
       |ded AS ($ded),
       |filt AS ($filt),
       |core AS ($coreCte)
       |SELECT $finalSelect FROM (
       |  SELECT * FROM core$orderSql$limitSql)""".stripMargin
  }
}
