package graft.engine.fuzz

import graft.model._
import scala.util.Random

/**
 * Seeded random query generators for the stream / trace / property
 * surfaces — FuzzGen's criteria-tree machinery generalized over a
 * [[TagUniverse]] so each fixture declares which tags are scalar /
 * entity / array and what in-domain values look like. The same
 * determinism discipline as FuzzGen applies: every COMPARE case has a
 * total result order (unique ts / trace-id / id tie-breaks are built
 * into the fixtures), so limit+offset cuts can be fuzzed freely.
 */
object SurfaceFuzzGen {
  import FuzzFixture.{Svcs, Insts, Regions, Codes, Ratios, LabelPool, PortPool, BaseSec, TsSlots}

  /** What the criteria generator may reference for one fixture. */
  final case class TagUniverse(
      scalarTags: Vector[String],
      entityTags: Vector[String],
      arrTags: Vector[String])

  private def pick[A](rnd: Random, xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
  private def subset[A](rnd: Random, xs: Seq[A], max: Int): Seq[A] =
    rnd.shuffle(xs.toList).take(1 + rnd.nextInt(max)).toSeq

  /** In-domain mostly, out-of-domain sometimes — misses matter. */
  private def scalarValue(rnd: Random, tag: String): Any = tag match {
    case "region" => if (rnd.nextDouble() < 0.15) "zzz" else pick(rnd, Regions)
    case "code" => if (rnd.nextDouble() < 0.15) 999L else pick(rnd, Codes)
    case "ratio" => if (rnd.nextDouble() < 0.15) 9.99 else pick(rnd, Ratios)
    case "dur" => if (rnd.nextDouble() < 0.15) 99L else rnd.nextInt(40).toLong - 10L
    case "svc" => if (rnd.nextDouble() < 0.10) "svc_9" else pick(rnd, Svcs)
    case "inst" => if (rnd.nextDouble() < 0.10) "i9" else pick(rnd, Insts)
    case other => throw new IllegalArgumentException(other)
  }

  private def arrayValue(rnd: Random, tag: String, n: Int): Seq[Any] = {
    val pool: Seq[Any] = if (tag == "labels") LabelPool else PortPool
    rnd.shuffle(pool.toList).take(n).toSeq
  }

  // ---------- criteria trees (FuzzGen's shapes over a universe) ----------

  private def scalarLeaf(rnd: Random, u: TagUniverse): (Criteria, Boolean) = {
    val tag = pick(rnd, u.scalarTags)
    val c = pick(rnd, Vector("eq", "ne", "lt", "gt", "le", "ge", "in", "notin")) match {
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

  private def entityLeaf(rnd: Random, u: TagUniverse): (Criteria, Boolean) = {
    val tag = pick(rnd, u.entityTags)
    val c =
      if (rnd.nextBoolean()) Cond(tag, Op.Eq, Seq(scalarValue(rnd, tag)))
      else Cond(tag, Op.In, Seq.fill(1 + rnd.nextInt(2))(scalarValue(rnd, tag)).distinct)
    (c, false)
  }

  private def arrayLeaf(rnd: Random, u: TagUniverse): (Criteria, Boolean) = {
    val tag = pick(rnd, u.arrTags)
    val c = rnd.nextInt(6) match {
      case 0 => Cond(tag, Op.Eq, arrayValue(rnd, tag, 2))
      case 1 =>
        val inner: Any =
          if (tag == "labels")
            arrayValue(rnd, tag, 1 + rnd.nextInt(2)).map(_.asInstanceOf[String]).toArray
          else arrayValue(rnd, tag, 1 + rnd.nextInt(2)).map(_.asInstanceOf[Long]).toArray
        Cond(tag, Op.Eq, Seq(inner))
      case 2 => Cond(tag, Op.Ne, arrayValue(rnd, tag, 2))
      case 3 => Cond(tag, Op.Eq, Seq(null))
      case 4 => Cond(tag, Op.Having, arrayValue(rnd, tag, 1 + rnd.nextInt(2)))
      case 5 => Cond(tag, Op.NotHaving, arrayValue(rnd, tag, 1 + rnd.nextInt(2)))
    }
    (c, false)
  }

  /** Shapes the validation layer must reject (golden WantErr analogues). */
  private def invalidLeaf(rnd: Random, u: TagUniverse): (Criteria, Boolean) = {
    val shapes = Vector.newBuilder[() => Criteria]
    if (u.arrTags.nonEmpty) {
      shapes += (() => Cond(pick(rnd, u.arrTags), Op.Lt, Seq("a")))
      shapes += (() => Cond(pick(rnd, u.arrTags), Op.In, arrayValue(rnd, "labels", 2)))
    }
    if (u.entityTags.nonEmpty) {
      shapes += (() => Cond(pick(rnd, u.entityTags), Op.Ne, Seq(scalarValue(rnd, "svc"))))
      shapes += (() => Cond(pick(rnd, u.entityTags), Op.Gt, Seq(scalarValue(rnd, "svc"))))
    }
    val all = shapes.result()
    if (all.isEmpty) scalarLeaf(rnd, u) else (pick(rnd, all)(), true)
  }

  private def leaf(rnd: Random, u: TagUniverse, allowInvalid: Boolean): (Criteria, Boolean) = {
    val r = rnd.nextDouble()
    if (allowInvalid && r < 0.05 && (u.arrTags.nonEmpty || u.entityTags.nonEmpty))
      invalidLeaf(rnd, u)
    else if (r < 0.20 && u.entityTags.nonEmpty) entityLeaf(rnd, u)
    else if (r < 0.45 && u.arrTags.nonEmpty) arrayLeaf(rnd, u)
    else scalarLeaf(rnd, u)
  }

  def genTree(rnd: Random, u: TagUniverse, depth: Int,
      allowInvalid: Boolean = true): (Criteria, Boolean) =
    if (depth <= 0 || rnd.nextDouble() < 0.45) leaf(rnd, u, allowInvalid)
    else {
      val (l, li) = genTree(rnd, u, depth - 1, allowInvalid)
      val (r, ri) = genTree(rnd, u, depth - 1, allowInvalid)
      (if (rnd.nextBoolean()) And(l, r) else Or(l, r), li || ri)
    }

  def genTimeRange(rnd: Random): Option[TimeRange] =
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
        Some(TimeRange(inst(a), inst(a + 1 + rnd.nextInt(TsSlots))))
      }
    }

  // ---------- whole cases ----------

  final case class SurfaceCase[Q](q: Q, deliberatelyInvalid: Boolean) {
    override def toString: String = s"SurfaceCase(invalid=$deliberatelyInvalid, $q)"
  }

  private val streamUniverse = TagUniverse(
    scalarTags = Vector("region", "code", "ratio", "dur"),
    entityTags = Vector("svc", "inst"),
    arrTags = Vector("labels", "ports"))

  def genStreamCase(rnd: Random): SurfaceCase[StreamQuery] = {
    val (criteria, invalid) =
      if (rnd.nextDouble() < 0.25) (None, false)
      else {
        val (c, i) = genTree(rnd, streamUniverse, 1 + rnd.nextInt(3))
        (Some(c), i)
      }
    val orderBy =
      if (rnd.nextDouble() < 0.40) None
      else {
        val tag =
          if (rnd.nextDouble() < 0.35) None // explicit ts ordering
          else Some(pick(rnd, Vector("region", "code", "ratio", "svc", "inst", "dur")))
        Some(OrderBy(tag, desc = rnd.nextBoolean()))
      }
    val projection =
      if (rnd.nextDouble() < 0.50) Nil
      else subset(rnd, SurfaceFuzzFixtures.streamCols, 4)
    val limit = if (rnd.nextDouble() < 0.40) 0 else 1 + rnd.nextInt(250)
    val offset = if (rnd.nextDouble() < 0.70) 0 else 1 + rnd.nextInt(40)
    SurfaceCase(StreamQuery(groups = Seq(SurfaceFuzzFixtures.StreamName),
      name = SurfaceFuzzFixtures.StreamName, timeRange = genTimeRange(rnd),
      criteria = criteria, projection = projection, orderBy = orderBy,
      offset = offset, limit = limit), invalid)
  }

  private val traceUniverse = TagUniverse(
    scalarTags = Vector("svc", "region", "code", "ratio", "dur"),
    entityTags = Vector.empty,
    arrTags = Vector.empty)

  def genTraceCase(rnd: Random): SurfaceCase[TraceQuery] = {
    var invalid = false
    val criteria =
      if (rnd.nextDouble() < 0.30) None
      else if (rnd.nextDouble() < 0.04) {
        // MATCH anywhere in a trace criteria tree must be rejected — the
        // trace sidx is an int64 tree with no analyzer (gen_err_match_sw)
        invalid = true
        val (inner, _) = genTree(rnd, traceUniverse, 1)
        Some(And(inner, Cond("svc", Op.Match(), Seq("svc_0"))))
      } else Some(genTree(rnd, traceUniverse, 1 + rnd.nextInt(2))._1)
    var projection =
      if (rnd.nextDouble() < 0.55) Nil
      else subset(rnd, SurfaceFuzzFixtures.spanCols, 3)
    if (rnd.nextDouble() < 0.03) { // unknown projected tag is an error, not null
      projection = projection :+ "no_such_tag"
      invalid = true
    }
    val orderBy =
      if (rnd.nextDouble() < 0.40) None
      else {
        val tag = rnd.nextInt(4) match {
          case 0 => None
          case 1 => Some("timestamp")
          case _ => Some(pick(rnd, Vector("svc", "region", "code", "ratio", "dur")))
        }
        Some(OrderBy(tag, desc = rnd.nextBoolean()))
      }
    val limit = if (rnd.nextDouble() < 0.40) 0 else 1 + rnd.nextInt(40)
    val offset = if (rnd.nextDouble() < 0.70) 0 else 1 + rnd.nextInt(10)
    SurfaceCase(TraceQuery(groups = Seq(SurfaceFuzzFixtures.TraceName),
      name = SurfaceFuzzFixtures.TraceName, timeRange = genTimeRange(rnd),
      criteria = criteria, projection = projection, orderBy = orderBy,
      offset = offset, limit = limit), invalid)
  }

  private val propertyUniverse = TagUniverse(
    scalarTags = Vector("region", "code", "ratio"),
    entityTags = Vector.empty,
    arrTags = Vector("labels"))

  def genPropertyCase(rnd: Random): SurfaceCase[PropertyQuery] = {
    val ids =
      if (rnd.nextDouble() < 0.60) Nil
      else {
        val known = Seq.fill(1 + rnd.nextInt(4))(
          f"p${rnd.nextInt(SurfaceFuzzFixtures.PropIds)}%03d").distinct
        if (rnd.nextDouble() < 0.15) known :+ "p999" else known
      }
    // the property read path has no array-op validation layer, so only
    // generate array shapes its translator genuinely supports
    val criteria =
      if (rnd.nextDouble() < 0.55) None
      else Some(genTree(rnd, propertyUniverse, 1 + rnd.nextInt(2),
        allowInvalid = false)._1)
    val projection =
      if (rnd.nextDouble() < 0.50) Nil
      else subset(rnd, SurfaceFuzzFixtures.propertyCols, 3)
    val orderBy =
      if (rnd.nextDouble() < 0.50) None
      else Some(OrderBy(
        if (rnd.nextDouble() < 0.30) None
        else Some(pick(rnd, Vector("region", "code", "ratio"))),
        desc = rnd.nextBoolean()))
    val limit = if (rnd.nextDouble() < 0.50) 0 else 1 + rnd.nextInt(30)
    SurfaceCase(PropertyQuery(groups = Seq(SurfaceFuzzFixtures.PropertyName),
      name = SurfaceFuzzFixtures.PropertyName, ids = ids, criteria = criteria,
      projection = projection, orderBy = orderBy, limit = limit),
      deliberatelyInvalid = false)
  }
}
