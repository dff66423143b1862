package graft.engine.fuzz

import graft.model._
import scala.util.Random

/**
 * Seeded random TopN-pipeline cases for the differential fuzzer — the
 * one query surface the measure/stream/trace/property fuzzers do not
 * touch. A case is the WHOLE pipeline the reference runs for a TopN
 * request with no (or stale) pre-agg table (`rewrite_agg_top_n_result`,
 * measure/v1/query.proto:149-150): bucket the raw measure to the
 * interval, rank entities per bucket under the bounded counter limit
 * (`counters_number`, pkg/flow/streaming/topn.go:50-120), then the TopN
 * read — time range over bucket starts, EQ-only conditions, optional
 * cross-bucket AGGREGATE BY, order, top-N cut.
 *
 * The generated space crosses interval × counter bound × ranked-value
 * column (long / nullable long / double) × entity column (string and
 * NULLABLE LONG — null entities exercise the rank order's nulls-first
 * corner) × group tag × agg fn × direction × conditions (in-domain,
 * missing, IS NULL) × bucket-time ranges, plus deliberately-invalid
 * non-EQ conditions the read path must reject (topn.proto:66-67).
 */
object TopNFuzzGen {
  import FuzzFixture.{BaseSec, TsSlots, Svcs, Insts, Regions}

  /** The bucket pre-compute's knobs — everything `Planners.topNFromRaw`
    * takes besides the TopNQuery itself. */
  final case class PipeSpec(
      entityCol: String,
      valueCol: String,
      intervalMs: Long,
      countersN: Int,
      groupCols: Seq[String])

  final case class TopNFuzzCase(pipe: PipeSpec, q: TopNQuery,
      deliberatelyInvalid: Boolean) {
    override def toString: String =
      s"TopNFuzzCase(invalid=$deliberatelyInvalid, $pipe, $q)"
  }

  private def pick[A](rnd: Random, xs: Seq[A]): A = xs(rnd.nextInt(xs.size))

  /** In-domain value for an EQ condition on a bucket-table column. */
  private def condValue(rnd: Random, pipe: PipeSpec, tag: String): Any =
    tag match {
      case "entity" =>
        val domain = pipe.entityCol match {
          case "svc" => Svcs
          case "inst" => Insts
          case "code" => FuzzFixture.Codes.map(_.toString)
        }
        if (rnd.nextDouble() < 0.12) "no_such_entity" else pick(rnd, domain)
      case "region" =>
        val r = rnd.nextDouble()
        if (r < 0.12) null // IS NULL — region has planted nulls
        else if (r < 0.22) "zzz"
        else pick(rnd, Regions)
    }

  def genCase(rnd: Random): TopNFuzzCase = {
    val pipe = PipeSpec(
      entityCol = pick(rnd, Vector("svc", "inst", "code")),
      valueCol = pick(rnd, Vector("value", "dur", "load")),
      intervalMs = pick(rnd, Vector(1000L, 5000L, 60000L)),
      countersN = 1 + rnd.nextInt(4),
      groupCols = if (rnd.nextDouble() < 0.40) Seq("region") else Nil)

    // time range over BUCKET STARTS (epoch millis), not raw nanos
    val timeRange =
      if (rnd.nextDouble() < 0.45) None
      else {
        def at(slotMs: Long) = java.time.Instant.ofEpochMilli(BaseSec * 1000L + slotMs)
        if (rnd.nextDouble() < 0.10) { // empty / inverted
          val a = rnd.nextInt(TsSlots) * 1000L
          Some(TimeRange(at(a), at(a - rnd.nextInt(3) * 1000L)))
        } else {
          // sometimes bucket-aligned, sometimes straddling a bucket edge
          val a = rnd.nextInt(TsSlots + 4) * 1000L - 2000L + rnd.nextInt(3) * 500L
          val b = a + 500L + rnd.nextInt(TsSlots * 1000)
          Some(TimeRange(at(a), at(b)))
        }
      }

    var invalid = false
    val condTags = Vector("entity") ++ (if (pipe.groupCols.nonEmpty) Vector("region") else Vector())
    val conditions: Seq[Cond] =
      (0 until rnd.nextInt(3)).map { _ =>
        val tag = pick(rnd, condTags)
        if (rnd.nextDouble() < 0.06) { // non-EQ must be rejected
          invalid = true
          Cond(tag, pick(rnd, Vector(Op.Ne, Op.Lt, Op.In)), Seq(condValue(rnd, pipe, tag)))
        } else Cond(tag, Op.Eq, Seq(condValue(rnd, pipe, tag)))
      }

    val agg: Option[AggFn] =
      if (rnd.nextDouble() < 0.45) None
      else Some(pick(rnd, Vector(AggFn.Sum, AggFn.Count, AggFn.Max, AggFn.Min, AggFn.Mean)))

    val q = TopNQuery(groups = Seq(FuzzFixture.Name), name = FuzzFixture.Name,
      timeRange = timeRange, topN = 1 + rnd.nextInt(8),
      desc = rnd.nextBoolean(), agg = agg, conditions = conditions)
    TopNFuzzCase(pipe, q, invalid)
  }
}

/**
 * Mechanical (PipeSpec, TopNQuery) → DuckDB SQL derivation — an
 * INDEPENDENT SQL encoding of the TopN pipeline's semantics spec:
 * truncating bucket division, per-bucket bounded rank ordered
 * (value ⟨desc NULLS LAST | asc NULLS FIRST⟩, entity ASC NULLS FIRST)
 * exactly like the engine's BoundedTopKAgg comparator (null = smallest
 * in both directions), `[begin, end)` on bucket starts, EQ conditions,
 * cross-bucket aggregate with the reference's MEAN integer-division +
 * <1→1 clamp (or the float variants for a DOUBLE ranked value), and the
 * final (value, entity) order with Spark's null placement (DESC NULLS
 * LAST / ASC NULLS FIRST).
 */
object TopNFuzzTwin {
  import TopNFuzzGen.{PipeSpec, TopNFuzzCase}
  import FuzzFixture.Name

  private def isFloat(pipe: PipeSpec): Boolean = pipe.valueCol == "load"

  /** rank direction: the engine's comparator treats NULL as SMALLEST in
    * both directions (BoundedTopKAgg.compare yields c=-1 for a null
    * field and the desc flag flips that c like any other) — so a
    * descending rank puts nulls LAST, ascending puts them FIRST, exactly
    * Spark's sort defaults. The soak fuzzer caught the twin pinning
    * NULLS FIRST for desc: 10/1500 divergences, all null-valued sums at
    * the counter boundary. */
  private def rankDir(desc: Boolean): String =
    if (desc) "DESC NULLS LAST" else "ASC NULLS FIRST"

  private def lit(v: Any): String = FuzzTwin.lit(v)

  private def condSql(c: Cond): String = c match {
    case Cond(tag, Op.Eq, Seq(null)) => s"$tag IS NULL"
    case Cond(tag, Op.Eq, vs) => s"$tag = ${lit(vs.head)}"
    case other => throw new IllegalArgumentException(s"non-EQ condition $other")
  }

  /** Cross-bucket AGGREGATE BY over the per-entity `value`, mirroring
    * Planners.aggColumn (integral vs float paths). */
  private def aggSql(fn: AggFn, float: Boolean): String = {
    val exactSum = "CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)"
    fn match {
      case AggFn.Sum => if (float) exactSum else "CAST(sum(value) AS BIGINT)"
      case AggFn.Count =>
        if (float) "CAST(count(value) AS DOUBLE)" else "count(value)"
      case AggFn.Max => "max(value)"
      case AggFn.Min => "min(value)"
      case AggFn.Mean =>
        if (float)
          s"""CASE WHEN count(value) = 0 THEN NULL
             | WHEN $exactSum / count(value) < 1.0 THEN 1.0
             | ELSE $exactSum / count(value) END""".stripMargin.replace("\n", "")
        else
          """CAST(CASE WHEN count(value) = 0 THEN NULL
            | WHEN (sum(value) // count(value)) < 1 THEN 1
            | ELSE sum(value) // count(value) END AS BIGINT)"""
            .stripMargin.replace("\n", "")
    }
  }

  /** `baseSql` overrides the raw-measure source — the composed fuzzer
    * points it at the two-group union subquery (ComposedFuzzSuite). */
  def sql(fc: TopNFuzzCase, baseSql: String = s"SELECT * FROM $Name"): String = {
    val TopNFuzzCase(pipe, q, _) = fc
    val float = isFloat(pipe)
    val groupSel = pipe.groupCols.map(g => s"$g, ").mkString
    val bucketPart = (Seq("bucket_ms") ++ pipe.groupCols).mkString(", ")
    // sums of the fixture's dyadic doubles are exact in plain IEEE
    // addition, so a bare sum matches Spark's plain double sum bit-exactly
    val sumExpr =
      if (float) s"sum(${pipe.valueCol})" else s"CAST(sum(${pipe.valueCol}) AS BIGINT)"

    val agged =
      s"""SELECT ((ts // 1000000) // ${pipe.intervalMs}) * ${pipe.intervalMs} AS bucket_ms,
         |  ${groupSel}CAST(${pipe.entityCol} AS VARCHAR) AS entity, $sumExpr AS value
         |FROM ($baseSql) AS __src GROUP BY ALL""".stripMargin
    val ranked =
      s"""SELECT *, row_number() OVER (PARTITION BY $bucketPart
         |  ORDER BY value ${rankDir(q.desc)}, entity ASC NULLS FIRST) AS __rk
         |FROM agged""".stripMargin
    val buckets =
      s"SELECT bucket_ms AS bucket_start, ${groupSel}entity, value " +
        s"FROM ranked WHERE __rk <= ${pipe.countersN}"

    val timePred = q.timeRange.map { tr =>
      s"bucket_start >= ${tr.begin.toEpochMilli} AND bucket_start < ${tr.end.toEpochMilli}"
    }
    val preds = timePred.toSeq ++ q.conditions.map(condSql)
    val filt = "SELECT * FROM buckets" +
      (if (preds.isEmpty) "" else preds.mkString(" WHERE ", " AND ", ""))

    val read = q.agg match {
      case Some(fn) =>
        s"SELECT entity, ${aggSql(fn, float)} AS value FROM filt GROUP BY entity"
      case None =>
        val best = if (q.desc) "max(value)" else "min(value)"
        s"SELECT entity, $best AS value FROM filt GROUP BY entity"
    }
    // Spark's .desc = DESC NULLS LAST, .asc = ASC NULLS FIRST
    val ord = if (q.desc) "value DESC NULLS LAST" else "value ASC NULLS FIRST"
    s"""WITH agged AS ($agged),
       |ranked AS ($ranked),
       |buckets AS ($buckets),
       |filt AS ($filt),
       |rd AS ($read)
       |SELECT entity, value FROM rd
       |ORDER BY $ord, entity ASC NULLS FIRST LIMIT ${q.topN}""".stripMargin
  }
}
