package graft.engine.fuzz

import graft.SparkSpec
import graft.engine.Planners
import graft.model._
import scala.util.Random

/**
 * Differential fuzzer for the multi-group union surface (T6): the same
 * seeded measure-case machinery as DifferentialFuzzSuite, but run over
 * the SCHEMA-MERGED frame of two groups — group A (`fuzzm`, int `code`)
 * unioned with group B (`fuzzm_b`, string `code`, B-only `zone`, missing
 * `ratio`/`ports`/`load`) exactly as BydbQL.resolve composes them:
 * `Planners.unionGroups` first, ONE measure plan over the merged frame.
 * The DuckDB twin renders the union in its base SQL (UnionFuzzFixture
 * .mergedSpec), so every fuzzed query exercises type widening, null-fill
 * of one-sided columns, and cross-group latest-version dedup against an
 * independent encoding.
 *
 * The fixed queries (q20/q59) pin two union shapes; golden case
 * multi_group_tag_type pins the widening rule on one row — this covers
 * the combinatorial rest. Seed/size replay via
 * SPARK_GRAFT_UNION_FUZZ_SEED / _N.
 */
class UnionFuzzSuite extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val fixtureDir = "target/fuzz"

  private def pythonDuckAvailable: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb").start()
      .waitFor() == 0
    catch { case _: java.io.IOException => false }

  private implicit val spec: FuzzTwin.TwinSpec = UnionFuzzFixture.mergedSpec

  private var cached: Option[org.apache.spark.sql.DataFrame] = None

  // the shared session outlives this suite — drop the fixture cache so
  // storage-hygiene assertions elsewhere see only their own RDDs
  override protected def afterAll(): Unit = {
    cached.foreach(_.unpersist(blocking = false))
    super.afterAll()
  }

  private lazy val mergedDf = {
    val a = FuzzFixture.write(spark, fixtureDir, seed = 7L, n = 700)
    val b = UnionFuzzFixture.write(spark, fixtureDir, seed = 11L, n = 500)
    val merged = Planners.unionGroups(Seq(a, b))
    // the twin's column mirror is only valid if the engine's merge landed
    // on the spec'd shape — pin it once, loudly
    assert(merged.columns.toSeq == spec.cols,
      s"merged column order drifted: ${merged.columns.toSeq}")
    assert(merged.schema("code").dataType ==
      org.apache.spark.sql.types.StringType,
      "type-conflicted `code` must widen to string")
    merged.cache().count()
    cached = Some(merged)
    merged
  }

  private def runEngine(q: MeasureQuery): Either[Throwable, (Seq[String], Seq[Seq[CVal]])] =
    try {
      val res = Planners.measure(mergedDf, FuzzFixture.tdef, q)
      val cols = res.columns.toSeq
      val rows = res.collect().toSeq.map(r =>
        (0 until r.length).map(i => CVal.ofSpark(r.get(i))))
      Right((cols, rows))
    } catch { case t: Throwable => Left(t) }

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

  private val acceptedRejections = Seq(
    "invalid group-by tag",
    "only EQ and IN are supported on entity tag",
    "is not supported on array tag",
    "criteria AND pins an entity tag to conflicting values")

  sealed private trait Outcome
  private case object Agreed extends Outcome
  private case object Rejected extends Outcome
  private case class Diverged(detail: String) extends Outcome

  private def runCase(fc: FuzzGen.FuzzCase, oracle: DuckOracle): Outcome =
    runEngine(fc.q) match {
      case Left(e: IllegalArgumentException)
          if acceptedRejections.exists(m => Option(e.getMessage).exists(_.contains(m))) =>
        Rejected
      case Left(e) =>
        Diverged(s"engine threw unexpectedly: ${e.getClass.getSimpleName}: ${e.getMessage}")
      case Right(_) if fc.deliberatelyInvalid =>
        Diverged("validator failed to reject a deliberately-invalid query")
      case Right(engineRes) =>
        oracle.query(FuzzTwin.sql(fc.q)) match {
          case Left(err) => Diverged(s"oracle rejected twin SQL: $err")
          case Right(oracleRes) =>
            compare(engineRes, oracleRes).map(Diverged(_)).getOrElse(Agreed)
        }
    }

  private def stillDiverges(q: MeasureQuery, oracle: DuckOracle): Boolean =
    runEngine(q) match {
      case Left(_) => false
      case Right(engineRes) =>
        oracle.query(FuzzTwin.sql(q)) match {
          case Left(_) => false
          case Right(oracleRes) => compare(engineRes, oracleRes).isDefined
        }
    }

  private def subtrees(c: Criteria): Seq[Criteria] = c match {
    case And(l, r) => Seq(l, r) ++ subtrees(l) ++ subtrees(r)
    case Or(l, r) => Seq(l, r) ++ subtrees(l) ++ subtrees(r)
    case _: Cond => Nil
  }

  private def shrinkCandidates(q: MeasureQuery): Seq[MeasureQuery] = {
    val structural = Seq(
      q.copy(top = None),
      q.copy(orderBy = None),
      q.copy(offset = 0),
      q.copy(limit = 10000),
      q.copy(timeRange = None),
      q.copy(agg = None),
      q.copy(groupByTags = Nil),
      q.copy(tagProjection = Nil, fieldProjection = Nil)).filterNot(_ == q)
    val crit = q.criteria.toSeq.flatMap { c =>
      (None +: subtrees(c).map(Some(_))).map(nc => q.copy(criteria = nc))
    }.filterNot(_ == q)
    structural ++ crit
  }

  private def shrink(q0: MeasureQuery, oracle: DuckOracle): MeasureQuery = {
    var q = q0
    var progress = true
    var steps = 0
    while (progress && steps < 60) {
      progress = false
      shrinkCandidates(q).find(stillDiverges(_, oracle)).foreach { smaller =>
        q = smaller; progress = true
      }
      steps += 1
    }
    q
  }

  test("differential fuzz: multi-group union cases match the DuckDB twin") {
    assume(pythonDuckAvailable, "python3+duckdb unavailable — differential oracle skipped")
    // default sized for the driver's verify window (see
    // DifferentialFuzzSuite); full depth: SPARK_GRAFT_UNION_FUZZ_N=300
    val n = sys.env.get("SPARK_GRAFT_UNION_FUZZ_N").map(_.toInt).getOrElse(100)
    val passes = FuzzSeeds.passes("SPARK_GRAFT_UNION_FUZZ_SEED", salt = 3,
      pinned = FuzzSeeds.PinnedB, pinnedN = 50, n = n)
    val total = passes.map(_._2).sum
    mergedDf // force both fixtures before the oracle views the directory
    val oracle = new DuckOracle(fixtureDir)
    try {
      var agreed = 0
      var rejected = 0
      val failures = scala.collection.mutable.ArrayBuffer.empty[String]
      for ((sd, m) <- passes; i <- 0 until m) {
        val fc = FuzzGen.genCase(new Random(sd + i * 104729L), UnionFuzzFixture.domain)
        runCase(fc, oracle) match {
          case Agreed => agreed += 1
          case Rejected => rejected += 1
          case Diverged(detail) if failures.size < 5 =>
            val minimal = shrink(fc.q, oracle)
            failures += s"""case #$i (replay: SPARK_GRAFT_UNION_FUZZ_SEED=$sd): $detail
               |  original: ${fc.q}
               |  minimal:  $minimal
               |  twin SQL: ${scala.util.Try(FuzzTwin.sql(minimal)).getOrElse("<unrenderable>")}
               |""".stripMargin
          case Diverged(_) => failures += s"case #$i (detail suppressed)"
        }
      }
      info(s"union fuzz: $agreed agreed, $rejected rejected, " +
        s"${failures.size} diverged (passes=${passes.map { case (s, m) => s"$m@seed=$s" }.mkString(", ")})")
      assert(failures.isEmpty,
        s"\n${failures.size} divergence(s):\n${failures.mkString("\n")}")
      assert(agreed >= total * 55 / 100,
        s"only $agreed/$total cases reached the differential compare")
    } finally oracle.close()
  }
}
