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
 *
 * The machinery is parameterized by a [[FuzzGen.Domain]] so the same
 * generator drives both the single-fixture surface and the multi-group
 * union surface (UnionFuzzSuite), whose merged frame has different tag
 * domains (a type-widened string `code`, a B-only `zone`).
 */
object FuzzGen {
  import FuzzFixture._

  final case class FuzzCase(q: MeasureQuery, deliberatelyInvalid: Boolean) {
    override def toString: String =
      s"FuzzCase(invalid=$deliberatelyInvalid, $q)"
  }

  /** One fuzzable measure frame: its tag/field taxonomy, per-tag value
    * domains, and the TwinSpec the oracle renders it with. */
  final case class Domain(
      groups: Seq[String],
      name: String,
      scalarTags: Vector[String],
      entityTags: Vector[String],
      arrTags: Vector[String],
      groupables: Vector[String],
      numericCols: Vector[String],
      aggFields: Vector[String],
      allTags: Vector[String],
      scalarValue: (Random, String) => Any,
      arrayValue: (Random, String, Int) => Seq[Any],
      spec: FuzzTwin.TwinSpec)

  /** In-domain value mostly, out-of-domain sometimes — misses matter. */
  private def fuzzmScalarValue(rnd: Random, tag: String): Any = tag match {
    case "region" => if (rnd.nextDouble() < 0.15) "zzz" else pick(rnd, Regions)
    case "code" => if (rnd.nextDouble() < 0.15) 999L else pick(rnd, Codes)
    case "ratio" => if (rnd.nextDouble() < 0.15) 9.99 else pick(rnd, Ratios)
    case "svc" => if (rnd.nextDouble() < 0.10) "svc_9" else pick(rnd, Svcs)
    case "inst" => if (rnd.nextDouble() < 0.10) "i9" else pick(rnd, Insts)
    case other => throw new IllegalArgumentException(other)
  }

  private def fuzzmArrayValue(rnd: Random, tag: String, n: Int): Seq[Any] = {
    val pool: Seq[Any] = if (tag == "labels") LabelPool else PortPool
    rnd.shuffle(pool.toList).take(n).toSeq
  }

  val fuzzmDomain: Domain = Domain(
    groups = Seq(Name), name = Name,
    scalarTags = Vector("region", "code", "ratio"),
    entityTags = Vector("svc", "inst"),
    arrTags = Vector("labels", "ports"),
    groupables = Vector("svc", "inst", "region", "code"),
    numericCols = Vector("value", "load", "dur", "code", "ts", "version"),
    aggFields = Vector("value", "load", "dur"),
    allTags = Vector("svc", "inst", "region", "code", "ratio", "labels", "ports"),
    scalarValue = fuzzmScalarValue,
    arrayValue = fuzzmArrayValue,
    spec = FuzzTwin.DefaultSpec)

  private def pick[A](rnd: Random, xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
  private def subset[A](rnd: Random, xs: Seq[A], max: Int): Seq[A] =
    rnd.shuffle(xs.toList).take(1 + rnd.nextInt(max)).toSeq

  // ---------- criteria trees ----------

  private def leaf(rnd: Random, dom: Domain): (Criteria, Boolean) = {
    val r = rnd.nextDouble()
    if (r < 0.05) invalidLeaf(rnd, dom)
    else if (r < 0.20) entityLeaf(rnd, dom)
    else if (r < 0.45) arrayLeaf(rnd, dom)
    else scalarLeaf(rnd, dom)
  }

  private def scalarLeaf(rnd: Random, dom: Domain): (Criteria, Boolean) = {
    val tag = pick(rnd, dom.scalarTags)
    val ops = Vector("eq", "ne", "lt", "gt", "le", "ge", "in", "notin")
    val c = pick(rnd, ops) match {
      case "eq" =>
        val v = if (rnd.nextDouble() < 0.12) null else dom.scalarValue(rnd, tag)
        Cond(tag, Op.Eq, Seq(v))
      case "ne" =>
        val v = if (rnd.nextDouble() < 0.12) null else dom.scalarValue(rnd, tag)
        Cond(tag, Op.Ne, Seq(v))
      case "lt" => Cond(tag, Op.Lt, Seq(dom.scalarValue(rnd, tag)))
      case "gt" => Cond(tag, Op.Gt, Seq(dom.scalarValue(rnd, tag)))
      case "le" => Cond(tag, Op.Le, Seq(dom.scalarValue(rnd, tag)))
      case "ge" => Cond(tag, Op.Ge, Seq(dom.scalarValue(rnd, tag)))
      case "in" =>
        Cond(tag, Op.In, Seq.fill(1 + rnd.nextInt(3))(dom.scalarValue(rnd, tag)).distinct)
      case "notin" =>
        Cond(tag, Op.NotIn, Seq.fill(1 + rnd.nextInt(3))(dom.scalarValue(rnd, tag)).distinct)
    }
    (c, false)
  }

  private def entityLeaf(rnd: Random, dom: Domain): (Criteria, Boolean) = {
    val tag = pick(rnd, dom.entityTags)
    val c =
      if (rnd.nextBoolean()) Cond(tag, Op.Eq, Seq(dom.scalarValue(rnd, tag)))
      else Cond(tag, Op.In, Seq.fill(1 + rnd.nextInt(2))(dom.scalarValue(rnd, tag)).distinct)
    (c, false)
  }

  private def arrayLeaf(rnd: Random, dom: Domain): (Criteria, Boolean) = {
    val tag = pick(rnd, dom.arrTags)
    val c = rnd.nextInt(6) match {
      case 0 => // flat multi-value EQ — the translator's array() branch
        Cond(tag, Op.Eq, dom.arrayValue(rnd, tag, 2))
      case 1 => // nested single-array EQ — the litOf(Array) branch
        // type the array properly: Literal rejects Array[Object]
        val vs = dom.arrayValue(rnd, tag, 1 + rnd.nextInt(2))
        val inner: Any = vs.headOption match {
          case Some(_: String) => vs.map(_.asInstanceOf[String]).toArray
          case _ => vs.map(_.asInstanceOf[Long]).toArray
        }
        Cond(tag, Op.Eq, Seq(inner))
      case 2 => Cond(tag, Op.Ne, dom.arrayValue(rnd, tag, 2))
      case 3 => Cond(tag, Op.Eq, Seq(null)) // NULL array
      case 4 => Cond(tag, Op.Having, dom.arrayValue(rnd, tag, 1 + rnd.nextInt(2)))
      case 5 => Cond(tag, Op.NotHaving, dom.arrayValue(rnd, tag, 1 + rnd.nextInt(2)))
    }
    (c, false)
  }

  /** Ops the validation layer must reject (golden WantErr shapes). */
  private def invalidLeaf(rnd: Random, dom: Domain): (Criteria, Boolean) = {
    val c = rnd.nextInt(4) match {
      case 0 => Cond(pick(rnd, dom.arrTags), Op.Lt, Seq("a")) // range op on array
      case 1 => Cond(pick(rnd, dom.arrTags), Op.In, dom.arrayValue(rnd, dom.arrTags.head, 2))
      case 2 => Cond(pick(rnd, dom.entityTags), Op.Ne,
        Seq(dom.scalarValue(rnd, dom.entityTags.head)))
      case 3 => Cond(pick(rnd, dom.entityTags), Op.Gt,
        Seq(dom.scalarValue(rnd, dom.entityTags.head)))
    }
    (c, true)
  }

  private def genTree(rnd: Random, dom: Domain, depth: Int): (Criteria, Boolean) =
    if (depth <= 0 || rnd.nextDouble() < 0.45) leaf(rnd, dom)
    else {
      val (l, li) = genTree(rnd, dom, depth - 1)
      val (r, ri) = genTree(rnd, dom, depth - 1)
      (if (rnd.nextBoolean()) And(l, r) else Or(l, r), li || ri)
    }

  // ---------- whole cases ----------

  def genCase(rnd: Random): FuzzCase = genCase(rnd, fuzzmDomain)

  def genCase(rnd: Random, dom: Domain): FuzzCase = {
    implicit val spec: FuzzTwin.TwinSpec = dom.spec
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
        val (c, i) = genTree(rnd, dom, 1 + rnd.nextInt(3))
        (Some(c), i)
      }

    var groupBy: Seq[String] =
      if (rnd.nextDouble() < 0.45) Nil else subset(rnd, dom.groupables, 2)
    // deliberately-invalid variant: array group key
    val invalidGroup = rnd.nextDouble() < 0.02
    if (invalidGroup) groupBy = groupBy :+ pick(rnd, dom.arrTags)

    val agg: Option[(AggFn, String)] = {
      val fns = Vector(AggFn.Sum, AggFn.Count, AggFn.Max, AggFn.Min, AggFn.Mean)
      if (groupBy.nonEmpty && !invalidGroup) {
        if (rnd.nextDouble() < 0.70) Some((pick(rnd, fns), pick(rnd, dom.aggFields))) else None
      } else if (rnd.nextDouble() < 0.30) Some((pick(rnd, fns), pick(rnd, dom.aggFields)))
      else None
    }

    val tagProjection =
      if (rnd.nextDouble() < 0.50) Nil
      else subset(rnd, dom.allTags, 3)
    val fieldProjection =
      if (rnd.nextDouble() < 0.60) Nil
      else subset(rnd, dom.aggFields, 2)

    // index-mode measures skip the latest-version dedup pass entirely
    // (S2, banyand/measure/query.go:506) — q43 pins one shape, this
    // crosses the skip with every other clause
    val indexMode = rnd.nextDouble() < 0.12

    // draft query (top/order/limit filled below against its core shape)
    var q = MeasureQuery(groups = dom.groups, name = dom.name,
      timeRange = timeRange, criteria = criteria,
      tagProjection = tagProjection, fieldProjection = fieldProjection,
      groupByTags = groupBy, agg = agg, indexMode = indexMode)

    val deliberatelyInvalid = invalid || invalidGroup

    // top: field must live in the core the planner will build
    if (rnd.nextDouble() < 0.25 && !deliberatelyInvalid) {
      val (_, coreCols, _) = FuzzTwin.corePlan(q)
      val candidates = agg match {
        case Some((fn, field)) =>
          val aggName = FuzzTwin.aggOutName(fn, field)
          if (rnd.nextDouble() < 0.70 || groupBy.isEmpty) Seq(aggName)
          else Seq(pick(rnd, groupBy))
        case None => coreCols.filter(dom.numericCols.contains)
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
          else Some(pick(rnd, dom.scalarTags ++ dom.entityTags))
        q = q.copy(orderBy = Some(OrderBy(tag, desc = rnd.nextBoolean())))
      } else if (groupBy.size == 1 && rnd.nextBoolean()) {
        q = q.copy(orderBy = Some(OrderBy(Some(groupBy.head), desc = rnd.nextBoolean())))
      }
    }

    // limit/offset: a cut is only allowed under a total order. With
    // index mode, duplicate (entity, ts) triples survive (no version
    // dedup), so the (ts, entity) tie-breaks are NOT total on the raw
    // path — and not on the groupBy-no-agg path either: two groups'
    // first-seen rows can carry the SAME (entity, ts) triple, tying
    // under the final sort (the 8160003 soak caught exactly that). No
    // cut for any index-mode case without agg/top; TOP stays safe — its
    // tie-break spans every core column incl. the unique version.
    val totalOrder = (agg.isEmpty ||
      q.top.isDefined ||
      (groupBy.size == 1 && q.orderBy.exists(_.tag.contains(groupBy.head)))) &&
      !(indexMode && agg.isEmpty && q.top.isEmpty)
    if (totalOrder) {
      val limit = if (rnd.nextDouble() < 0.50) 0 else 1 + rnd.nextInt(200)
      val offset = if (rnd.nextDouble() < 0.70) 0 else 1 + rnd.nextInt(30)
      q = q.copy(limit = limit, offset = offset)
    } else q = q.copy(limit = 10000, offset = 0)

    FuzzCase(q, deliberatelyInvalid)
  }
}
