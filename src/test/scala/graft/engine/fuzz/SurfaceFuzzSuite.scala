package graft.engine.fuzz

import graft.SparkSpec
import graft.engine.Planners
import graft.model._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/**
 * Randomized differential fuzzers for the three surfaces the measure
 * fuzzer does not touch: stream element-dedup reads, trace span-group
 * reads, and property last-writer-wins reads — each executed through
 * its Planner AND through a mechanically derived DuckDB twin
 * ([[SurfaceFuzzTwin]]), compared as canonical multisets, with failing
 * cases shrunk against the live oracle. The reference fuzz-gates these
 * models too (stream gen_* golden families; the 0.11 trace generator
 * under `test/cases/trace/cmd/generate`).
 *
 * Seeds/sizes replay via SPARK_GRAFT_SURFACE_FUZZ_SEED / _N.
 */
class SurfaceFuzzSuite extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private def pythonDuckAvailable: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb").start()
      .waitFor() == 0
    catch { case _: java.io.IOException => false }

  private var cached: Seq[DataFrame] = Nil
  private lazy val fixtures: Map[String, DataFrame] = {
    val fx = SurfaceFuzzFixtures.writeAll(spark)
    fx.values.foreach(df => df.cache().count()) // hundreds of plans re-scan these
    cached = fx.values.toSeq
    fx
  }

  // the shared session outlives this suite — drop the fixture caches so
  // storage-hygiene assertions elsewhere see only their own RDDs
  override protected def afterAll(): Unit = {
    cached.foreach(_.unpersist(blocking = false))
    super.afterAll()
  }

  private def passes(default: Int): Seq[(Long, Int)] = {
    val n = sys.env.get("SPARK_GRAFT_SURFACE_FUZZ_N").map(_.toInt).getOrElse(default)
    FuzzSeeds.passes("SPARK_GRAFT_SURFACE_FUZZ_SEED", salt = 4,
      pinned = FuzzSeeds.PinnedA, pinnedN = 40, n = n)
  }

  private def collect(df: DataFrame): (Seq[String], Seq[Seq[CVal]]) = {
    val cols = df.columns.toSeq
    val rows = df.collect().toSeq.map(r =>
      (0 until r.length).map(i => CVal.ofSpark(r.get(i))))
    (cols, rows)
  }

  private def compare(engine: (Seq[String], Seq[Seq[CVal]]),
      oracle: (Seq[String], Seq[Seq[CVal]])): Option[String] = {
    val (ec, er) = engine
    val (oc, or) = oracle
    if (ec != oc) return Some(s"columns: spark=$ec duck=$oc")
    if (er.size != or.size) return Some(s"rows: spark=${er.size} duck=${or.size}")
    val es = er.map(_.map(_.render).mkString("|")).sorted
    val os = or.map(_.map(_.render).mkString("|")).sorted
    es.zip(os).zipWithIndex.collectFirst {
      case ((e, o), i) if e != o =>
        val showE = er.map(_.map(_.show).mkString(", ")).sorted
        val showO = or.map(_.map(_.show).mkString(", ")).sorted
        s"row $i: spark=(${showE(i)}) duck=(${showO(i)})"
    }
  }

  /** One surface's wiring: engine runner, twin renderer, shrink moves,
    * and which engine rejections the validation layer is EXPECTED to
    * produce (the golden WantErr analogues). */
  private final case class Surface[Q](
      engine: Q => DataFrame,
      twin: Q => String,
      shrinks: Q => Seq[Q],
      acceptedRejections: Seq[String])

  sealed private trait Outcome
  private case object Agreed extends Outcome
  private case object Rejected extends Outcome
  private case class Diverged(detail: String) extends Outcome

  private def runEngine[Q](s: Surface[Q], q: Q): Either[Throwable, (Seq[String], Seq[Seq[CVal]])] =
    try Right(collect(s.engine(q)))
    catch { case t: Throwable => Left(t) }

  private def runCase[Q](s: Surface[Q], q: Q, invalid: Boolean,
      oracle: DuckOracle): Outcome =
    runEngine(s, q) match {
      case Left(e: IllegalArgumentException)
          if s.acceptedRejections.exists(m => Option(e.getMessage).exists(_.contains(m))) =>
        Rejected
      case Left(e) =>
        Diverged(s"engine threw unexpectedly: ${e.getClass.getSimpleName}: ${e.getMessage}")
      case Right(_) if invalid =>
        Diverged("validator failed to reject a deliberately-invalid query")
      case Right(engineRes) =>
        oracle.query(s.twin(q)) match {
          case Left(err) => Diverged(s"oracle rejected twin SQL: $err")
          case Right(oracleRes) =>
            compare(engineRes, oracleRes).map(Diverged(_)).getOrElse(Agreed)
        }
    }

  private def stillDiverges[Q](s: Surface[Q], q: Q, oracle: DuckOracle): Boolean =
    runEngine(s, q) match {
      case Left(_) => false
      case Right(engineRes) =>
        oracle.query(s.twin(q)) match {
          case Left(_) => false
          case Right(oracleRes) => compare(engineRes, oracleRes).isDefined
        }
    }

  private def shrink[Q](s: Surface[Q], q0: Q, oracle: DuckOracle): Q = {
    var q = q0
    var progress = true
    var steps = 0
    while (progress && steps < 60) {
      progress = false
      s.shrinks(q).find(stillDiverges(s, _, oracle)).foreach { smaller =>
        q = smaller; progress = true
      }
      steps += 1
    }
    q
  }

  private def subtrees(c: Criteria): Seq[Criteria] = c match {
    case And(l, r) => Seq(l, r) ++ subtrees(l) ++ subtrees(r)
    case Or(l, r) => Seq(l, r) ++ subtrees(l) ++ subtrees(r)
    case _: Cond => Nil
  }

  private def critShrinks[Q](c: Option[Criteria], set: Option[Criteria] => Q): Seq[Q] =
    c.toSeq.flatMap(cr => (None +: subtrees(cr).map(Some(_))).map(set))

  private def driveSurface[Q](label: String, ps: Seq[(Long, Int)], s: Surface[Q],
      gen: Random => SurfaceFuzzGen.SurfaceCase[Q], oracle: DuckOracle): Unit = {
    var agreed = 0
    var rejected = 0
    val total = ps.map(_._2).sum
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((sd, m) <- ps; i <- 0 until m) {
      val fc = gen(new Random(sd + i * 104729L))
      runCase(s, fc.q, fc.deliberatelyInvalid, oracle) match {
        case Agreed => agreed += 1
        case Rejected => rejected += 1
        case Diverged(detail) if failures.size < 5 =>
          val minimal = shrink(s, fc.q, oracle)
          failures += s"""$label case #$i (replay: SPARK_GRAFT_SURFACE_FUZZ_SEED=$sd): $detail
             |  original: ${fc.q}
             |  minimal:  $minimal
             |  twin SQL: ${scala.util.Try(s.twin(minimal)).getOrElse("<unrenderable>")}
             |""".stripMargin
        case Diverged(_) => failures += s"$label case #$i (detail suppressed)"
      }
    }
    info(s"$label fuzz: $agreed agreed, $rejected rejected, " +
      s"${failures.size} diverged (passes=${ps.map { case (s0, m) => s"$m@seed=$s0" }.mkString(", ")})")
    assert(failures.isEmpty,
      s"\n${failures.size} divergence(s):\n${failures.mkString("\n")}")
    assert(agreed >= total * 4 / 5, s"only $agreed/$total $label cases reached the compare")
  }

  // ---------- stream ----------

  private lazy val streamSurface = Surface[StreamQuery](
    engine = q => Planners.stream(
      fixtures(SurfaceFuzzFixtures.StreamName), SurfaceFuzzFixtures.streamTdef, q, "eid"),
    twin = SurfaceFuzzTwin.streamSql,
    shrinks = q => Seq(
      q.copy(orderBy = None), q.copy(offset = 0), q.copy(limit = 10000),
      q.copy(timeRange = None), q.copy(projection = Nil)).filterNot(_ == q) ++
      critShrinks(q.criteria, nc => q.copy(criteria = nc)),
    acceptedRejections = Seq(
      "only EQ and IN are supported on entity tag",
      "is not supported on array tag"))

  test("differential fuzz: stream element-dedup reads match the DuckDB twin") {
    assume(pythonDuckAvailable, "python3+duckdb unavailable — differential oracle skipped")
    fixtures
    val oracle = new DuckOracle(SurfaceFuzzFixtures.Dir)
    try driveSurface("stream", passes(100), streamSurface,
      SurfaceFuzzGen.genStreamCase, oracle)
    finally oracle.close()
  }

  // ---------- trace ----------

  /** The engine's nested span array, flattened to one row per span for the
    * multiset compare (see SurfaceFuzzTwin's scaladoc on why). */
  private def flattenTrace(res: DataFrame): DataFrame =
    res.select(col("tid"), col("span_count"), col("start_ts"),
        explode(col("spans")).as("__sp"))
      .select(col("tid"), col("span_count"), col("start_ts"), col("__sp.*"))

  private lazy val traceSurface = Surface[TraceQuery](
    engine = q => flattenTrace(Planners.traceSpanGroups(
      fixtures(SurfaceFuzzFixtures.TraceName), SurfaceFuzzFixtures.traceTdef, q,
      "tid", SurfaceFuzzFixtures.spanCols)),
    twin = SurfaceFuzzTwin.traceSql,
    shrinks = q => Seq(
      q.copy(orderBy = None), q.copy(offset = 0), q.copy(limit = 10000),
      q.copy(timeRange = None), q.copy(projection = Nil)).filterNot(_ == q) ++
      critShrinks(q.criteria, nc => q.copy(criteria = nc)),
    acceptedRejections = Seq(
      "MATCH is not supported on trace queries",
      "not found in the queried resource"))

  test("differential fuzz: trace span-group reads match the DuckDB twin") {
    assume(pythonDuckAvailable, "python3+duckdb unavailable — differential oracle skipped")
    fixtures
    val oracle = new DuckOracle(SurfaceFuzzFixtures.Dir)
    try driveSurface("trace", passes(100), traceSurface,
      SurfaceFuzzGen.genTraceCase, oracle)
    finally oracle.close()
  }

  // ---------- property ----------

  private lazy val propertySurface = Surface[PropertyQuery](
    engine = q => Planners.property(
      fixtures(SurfaceFuzzFixtures.PropertyName), q, "id", "rev", Some("deleted")),
    twin = SurfaceFuzzTwin.propertySql,
    shrinks = q => Seq(
      q.copy(ids = Nil), q.copy(orderBy = None), q.copy(limit = 0),
      q.copy(projection = Nil)).filterNot(_ == q) ++
      critShrinks(q.criteria, nc => q.copy(criteria = nc)),
    acceptedRejections = Nil)

  test("differential fuzz: property last-writer-wins reads match the DuckDB twin") {
    assume(pythonDuckAvailable, "python3+duckdb unavailable — differential oracle skipped")
    fixtures
    val oracle = new DuckOracle(SurfaceFuzzFixtures.Dir)
    try driveSurface("property", passes(80), propertySurface,
      SurfaceFuzzGen.genPropertyCase, oracle)
    finally oracle.close()
  }
}
