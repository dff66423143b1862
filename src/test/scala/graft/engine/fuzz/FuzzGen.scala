package graft.engine.fuzz

import graft.model._
import scala.util.Random

/**
 * Seeded random MeasureQuery generator — the Spark-side analogue of the
 * reference's generated-case families (gen_leaf / gen_tree / gen_feat,
 * built by its `Makefile generate-test-cases` target): random criteria
 * trees over every op × tag type × NULL placement, crossed with
 * agg × groupBy × top × orderBy × offset/limit combos.
 *
 * Determinism discipline: every generated COMPARE case has a fully
 * deterministic result set (total sort orders before any LIMIT cut), so
 * an engine/oracle multiset mismatch is always a semantics bug, never a
 * tie artifact. Where the planner's ordering is not total (post-agg
 * ORDER BY a non-unique key, or no surviving order), the generator
 * disables the cut (limit 10000 ≥ any group count) instead.
 *
 * A slice of cases is DELIBERATELY INVALID (range ops on array tags,
 * non-EQ/IN ops on entity tags, array group keys) — those assert the
 * validation layer rejects, mirroring the reference's WantErr cases.
 */
object FuzzGen {
  import FuzzFixture._

  final case class FuzzCase(q: MeasureQuery, deliberatelyInvalid: Boolean) {
    override def toString: String =
      s"FuzzCase(invalid=$deliberatelyInvalid, $q)"
  }

  private val scalarTags = Vector("region", "code", "ratio")
  private val entityTags = Vector("svc", "inst")
  private val arrTags = Vector("labels", "ports")
  private val groupables = Vector("svc", "inst", "region", "code")
  private val numericCols = Vector("value", "load", "dur", "code", "ts", "version")
  private val aggFields = Vector("value", "load", "dur")
  private val allTags = Vector("svc", "inst", "region", "code", "ratio", "labels", "ports")
  private val fns = Vector(AggFn.Sum, AggFn.Count, AggFn.Max, AggFn.Min, AggFn.Mean)

  private def pick[A](rnd: Random, xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
  private def subset[A](rnd: Random, xs: Seq[A], max: Int): Seq[A] =
    rnd.shuffle(xs.toList).take(1 + rnd.nextInt(max)).toSeq

  /** In-domain value mostly, out-of-domain sometimes — misses matter. */
  private def scalarValue(rnd: Random, tag: String): Any = tag match {
    case "region" => if (rnd.nextDouble() < 0.15) "zzz" else pick(rnd, Regions)
    case "code" => if (rnd.nextDouble() < 0.15) 999L else pick(rnd, Codes)
    case "ratio" => if (rnd.nextDouble() < 0.15) 9.99 else pick(rnd, Ratios)
    case "svc" => if (rnd.nextDouble() < 0.10) "svc_9" else pick(rnd, Svcs)
    case "inst" => if (rnd.nextDouble() < 0.10) "i9" else pick(rnd, Insts)
    case other => throw new IllegalArgumentException(other)
  }

  private def arrayValue(rnd: Random, tag: String, n: Int): Seq[Any] = {
    val pool: Seq[Any] = if (tag == "labels") LabelPool else PortPool
    rnd.shuffle(pool.toList).take(n).toSeq
  }

  // ---------- criteria trees ----------

  private def leaf(rnd: Random): (Criteria, Boolean) = {
    val r = rnd.nextDouble()
    if (r < 0.05) invalidLeaf(rnd)
    else if (r < 0.20) entityLeaf(rnd)
    else if (r < 0.45) arrayLeaf(rnd)
    else scalarLeaf(rnd)
  }

  private def scalarLeaf(rnd: Random): (Criteria, Boolean) = {
    val tag = pick(rnd, scalarTags)
    val ops = Vector("eq", "ne", "lt", "gt", "le", "ge", "in", "notin")
    val c = pick(rnd, ops) match {
      case "eq" =>
        val v = if (rnd.nextDouble() < 0.12) null else scalarValue(rnd, tag)
        Cond(tag, Op.Eq, Seq(v))
      case "ne" =>
        val v = if (rnd.nextDouble() < 0.12) null else scalarValue(rnd, tag)
        Cond(tag, Op.Ne, Seq(v))
      case "lt" => Cond(tag, Op.Lt, Seq(scalarValue(rnd, tag)))
      case "gt" => Cond(tag, Op.Gt, Seq(scalarValue(rnd, tag)))
      case "le" => Cond(tag, Op.Le, Seq(scalarValue(rnd, tag)))
      case "ge" => Cond(tag, Op.Ge, Seq(scalarValue(rnd, tag)))
      case "in" =>
        Cond(tag, Op.In, Seq.fill(1 + rnd.nextInt(3))(scalarValue(rnd, tag)).distinct)
      case "notin" =>
        Cond(tag, Op.NotIn, Seq.fill(1 + rnd.nextInt(3))(scalarValue(rnd, tag)).distinct)
    }
    (c, false)
  }

  private def entityLeaf(rnd: Random): (Criteria, Boolean) = {
    val tag = pick(rnd, entityTags)
    val c =
      if (rnd.nextBoolean()) Cond(tag, Op.Eq, Seq(scalarValue(rnd, tag)))
      else Cond(tag, Op.In, Seq.fill(1 + rnd.nextInt(2))(scalarValue(rnd, tag)).distinct)
    (c, false)
  }

  private def arrayLeaf(rnd: Random): (Criteria, Boolean) = {
    val tag = pick(rnd, arrTags)
    val c = rnd.nextInt(6) match {
      case 0 => // flat multi-value EQ — the translator's array() branch
        Cond(tag, Op.Eq, arrayValue(rnd, tag, 2))
      case 1 => // nested single-array EQ — the litOf(Array) branch
        // type the array properly: Literal rejects Array[Object]
        val inner: Any =
          if (tag == "labels")
            arrayValue(rnd, tag, 1 + rnd.nextInt(2)).map(_.asInstanceOf[String]).toArray
          else arrayValue(rnd, tag, 1 + rnd.nextInt(2)).map(_.asInstanceOf[Long]).toArray
        Cond(tag, Op.Eq, Seq(inner))
      case 2 => Cond(tag, Op.Ne, arrayValue(rnd, tag, 2))
      case 3 => Cond(tag, Op.Eq, Seq(null)) // NULL array
      case 4 => Cond(tag, Op.Having, arrayValue(rnd, tag, 1 + rnd.nextInt(2)))
      case 5 => Cond(tag, Op.NotHaving, arrayValue(rnd, tag, 1 + rnd.nextInt(2)))
    }
    (c, false)
  }

  /** Ops the validation layer must reject (golden WantErr shapes). */
  private def invalidLeaf(rnd: Random): (Criteria, Boolean) = {
    val c = rnd.nextInt(4) match {
      case 0 => Cond(pick(rnd, arrTags), Op.Lt, Seq("a")) // range op on array
      case 1 => Cond(pick(rnd, arrTags), Op.In, arrayValue(rnd, "labels", 2))
      case 2 => Cond(pick(rnd, entityTags), Op.Ne, Seq(scalarValue(rnd, "svc")))
      case 3 => Cond(pick(rnd, entityTags), Op.Gt, Seq(scalarValue(rnd, "svc")))
    }
    (c, true)
  }

  private def genTree(rnd: Random, depth: Int): (Criteria, Boolean) =
    if (depth <= 0 || rnd.nextDouble() < 0.45) leaf(rnd)
    else {
      val (l, li) = genTree(rnd, depth - 1)
      val (r, ri) = genTree(rnd, depth - 1)
      (if (rnd.nextBoolean()) And(l, r) else Or(l, r), li || ri)
    }

  // ---------- whole cases ----------

  def genCase(rnd: Random): FuzzCase = {
    val timeRange =
      if (rnd.nextDouble() < 0.40) None
      else {
        def inst(slot: Long) = java.time.Instant.ofEpochSecond(BaseSec + slot)
        val r = rnd.nextDouble()
        if (r < 0.05) Some(TimeRange(java.time.Instant.MIN, java.time.Instant.MAX))
        else if (r < 0.10) { // empty / inverted
          val a = rnd.nextInt(TsSlots).toLong
          Some(TimeRange(inst(a), inst(a - rnd.nextInt(3))))
        } else {
          val a = rnd.nextInt(TsSlots + 4).toLong - 2
          val b = a + 1 + rnd.nextInt(TsSlots)
          Some(TimeRange(inst(a), inst(b)))
        }
      }

    val (criteria, invalid) =
      if (rnd.nextDouble() < 0.25) (None, false)
      else {
        val (c, i) = genTree(rnd, 1 + rnd.nextInt(3))
        (Some(c), i)
      }

    var groupBy: Seq[String] =
      if (rnd.nextDouble() < 0.45) Nil else subset(rnd, groupables, 2)
    // deliberately-invalid variant: array group key
    val invalidGroup = rnd.nextDouble() < 0.02
    if (invalidGroup) groupBy = groupBy :+ pick(rnd, arrTags)

    val agg: Option[(AggFn, String)] =
      if (groupBy.nonEmpty && !invalidGroup) {
        if (rnd.nextDouble() < 0.70) Some((pick(rnd, fns), pick(rnd, aggFields))) else None
      } else if (rnd.nextDouble() < 0.30) Some((pick(rnd, fns), pick(rnd, aggFields)))
      else None

    val tagProjection =
      if (rnd.nextDouble() < 0.50) Nil
      else subset(rnd, allTags, 3)
    val fieldProjection =
      if (rnd.nextDouble() < 0.60) Nil
      else subset(rnd, Vector("value", "load", "dur"), 2)

    // draft query (top/order/limit filled below against its core shape)
    var q = MeasureQuery(groups = Seq(Name), name = Name,
      timeRange = timeRange, criteria = criteria,
      tagProjection = tagProjection, fieldProjection = fieldProjection,
      groupByTags = groupBy, agg = agg)

    val deliberatelyInvalid = invalid || invalidGroup

    // top: field must live in the core the planner will build
    if (rnd.nextDouble() < 0.25 && !deliberatelyInvalid) {
      val (_, coreCols, _) = FuzzTwin.corePlan(q)
      val candidates = agg match {
        case Some((fn, field)) =>
          val aggName = FuzzTwin.aggOutName(fn, field)
          if (rnd.nextDouble() < 0.70 || groupBy.isEmpty) Seq(aggName)
          else Seq(pick(rnd, groupBy))
        case None => coreCols.filter(numericCols.contains)
      }
      if (candidates.nonEmpty)
        q = q.copy(top = Some(TopSpec(1 + rnd.nextInt(20),
          pick(rnd, candidates), desc = rnd.nextBoolean())))
    }

    // orderBy: raw paths carry full tie-breaks (always total); post-agg
    // ordering is only total when it IS the single group key
    if (q.top.isEmpty && rnd.nextDouble() < 0.45) {
      if (agg.isEmpty) {
        val tag =
          if (rnd.nextDouble() < 0.40) None
          else Some(pick(rnd, Vector("region", "code", "ratio", "svc", "inst")))
        q = q.copy(orderBy = Some(OrderBy(tag, desc = rnd.nextBoolean())))
      } else if (groupBy.size == 1 && rnd.nextBoolean()) {
        q = q.copy(orderBy = Some(OrderBy(Some(groupBy.head), desc = rnd.nextBoolean())))
      }
    }

    // limit/offset: a cut is only allowed under a total order
    val totalOrder = agg.isEmpty ||
      q.top.isDefined ||
      (groupBy.size == 1 && q.orderBy.exists(_.tag.contains(groupBy.head)))
    if (totalOrder) {
      val limit = if (rnd.nextDouble() < 0.50) 0 else 1 + rnd.nextInt(200)
      val offset = if (rnd.nextDouble() < 0.70) 0 else 1 + rnd.nextInt(30)
      q = q.copy(limit = limit, offset = offset)
    } else q = q.copy(limit = 10000, offset = 0)

    FuzzCase(q, deliberatelyInvalid)
  }
}
