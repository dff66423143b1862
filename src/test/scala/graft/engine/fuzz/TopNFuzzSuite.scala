package graft.engine.fuzz

import graft.SparkSpec
import graft.engine.Planners
import graft.model._
import org.apache.spark.sql.functions.col
import scala.util.Random

/**
 * Differential fuzzer for the TopN pipeline (S5/T2/T3 + the batch form
 * of ST1/ST3/ST5): seeded random (bucket pre-compute × TopN read) cases
 * executed through `Planners.topNFromRaw` AND through a mechanically
 * derived DuckDB twin ([[TopNFuzzTwin]]), compared as canonical
 * multisets, with failing cases shrunk against the live oracle. The
 * fixed queries (q18/q19/q40/q41) pin a handful of shapes; this covers
 * the combinatorial rest — counter-bound truncation, null-valued and
 * null-entity ranks, bucket-edge time ranges, cross-bucket aggregation.
 *
 * Seed/size replay via SPARK_GRAFT_TOPN_FUZZ_SEED / _N.
 */
class TopNFuzzSuite extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import TopNFuzzGen.TopNFuzzCase

  private val fixtureDir = "target/fuzz"

  private def pythonDuckAvailable: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb").start()
      .waitFor() == 0
    catch { case _: java.io.IOException => false }

  private var cached: Option[org.apache.spark.sql.DataFrame] = None
  private lazy val fixtureDf = {
    val df = FuzzFixture.write(spark, fixtureDir, seed = 7L, n = 700)
    df.cache().count()
    cached = Some(df)
    df
  }

  // the shared session outlives this suite — drop the fixture cache so
  // storage-hygiene assertions elsewhere see only their own RDDs
  override protected def afterAll(): Unit = {
    cached.foreach(_.unpersist(blocking = false))
    super.afterAll()
  }

  private def runEngine(fc: TopNFuzzCase): Either[Throwable, (Seq[String], Seq[Seq[CVal]])] =
    try {
      val res = Planners.topNFromRaw(fixtureDf, "ts", fc.pipe.entityCol,
        col(fc.pipe.valueCol), fc.pipe.intervalMs, fc.pipe.countersN, fc.q,
        groupCols = fc.pipe.groupCols)
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

  sealed private trait Outcome
  private case object Agreed extends Outcome
  private case object Rejected extends Outcome
  private case class Diverged(detail: String) extends Outcome

  private def runCase(fc: TopNFuzzCase, oracle: DuckOracle): Outcome =
    runEngine(fc) match {
      case Left(e: IllegalArgumentException)
          if Option(e.getMessage).exists(_.contains("topN query conditions must be EQ")) =>
        Rejected
      case Left(e) =>
        Diverged(s"engine threw unexpectedly: ${e.getClass.getSimpleName}: ${e.getMessage}")
      case Right(_) if fc.deliberatelyInvalid =>
        Diverged("validator failed to reject a deliberately-invalid query")
      case Right(engineRes) =>
        oracle.query(TopNFuzzTwin.sql(fc)) match {
          case Left(err) => Diverged(s"oracle rejected twin SQL: $err")
          case Right(oracleRes) =>
            compare(engineRes, oracleRes).map(Diverged(_)).getOrElse(Agreed)
        }
    }

  private def stillDiverges(fc: TopNFuzzCase, oracle: DuckOracle): Boolean =
    runEngine(fc) match {
      case Left(_) => false
      case Right(engineRes) =>
        oracle.query(TopNFuzzTwin.sql(fc)) match {
          case Left(_) => false
          case Right(oracleRes) => compare(engineRes, oracleRes).isDefined
        }
    }

  private def shrinkCandidates(fc: TopNFuzzCase): Seq[TopNFuzzCase] = {
    val q = fc.q
    val qs = Seq(
      q.copy(timeRange = None),
      q.copy(agg = None),
      q.copy(topN = 10000),
      q.copy(conditions = Nil)) ++
      q.conditions.indices.map(i =>
        q.copy(conditions = q.conditions.patch(i, Nil, 1)))
    val pipes = Seq(
      fc.pipe.copy(countersN = 100), // remove the counter-bound truncation
      fc.pipe.copy(groupCols = Nil))
    (qs.map(nq => fc.copy(q = nq)) ++ pipes.map(p => fc.copy(pipe = p)))
      .filterNot(_ == fc)
  }

  private def shrink(fc0: TopNFuzzCase, oracle: DuckOracle): TopNFuzzCase = {
    var fc = fc0
    var progress = true
    var steps = 0
    while (progress && steps < 40) {
      progress = false
      shrinkCandidates(fc).find(stillDiverges(_, oracle)).foreach { smaller =>
        fc = smaller; progress = true
      }
      steps += 1
    }
    fc
  }

  test("differential fuzz: TopN pipeline cases match the DuckDB twin") {
    assume(pythonDuckAvailable, "python3+duckdb unavailable — differential oracle skipped")
    // default sized for the driver's verify window (see
    // DifferentialFuzzSuite); full depth: SPARK_GRAFT_TOPN_FUZZ_N=300
    val n = sys.env.get("SPARK_GRAFT_TOPN_FUZZ_N").map(_.toInt).getOrElse(100)
    val passes = FuzzSeeds.passes("SPARK_GRAFT_TOPN_FUZZ_SEED", salt = 2,
      pinned = FuzzSeeds.PinnedB, pinnedN = 50, n = n)
    val total = passes.map(_._2).sum
    fixtureDf
    val oracle = new DuckOracle(fixtureDir)
    try {
      var agreed = 0
      var rejected = 0
      val failures = scala.collection.mutable.ArrayBuffer.empty[String]
      for ((sd, m) <- passes; i <- 0 until m) {
        val fc = TopNFuzzGen.genCase(new Random(sd + i * 7919L))
        runCase(fc, oracle) match {
          case Agreed => agreed += 1
          case Rejected => rejected += 1
          case Diverged(detail) if failures.size < 5 =>
            val minimal = shrink(fc, oracle)
            failures += s"""case #$i (replay: SPARK_GRAFT_TOPN_FUZZ_SEED=$sd): $detail
               |  original: $fc
               |  minimal:  $minimal
               |  twin SQL: ${scala.util.Try(TopNFuzzTwin.sql(minimal)).getOrElse("<unrenderable>")}
               |""".stripMargin
          case Diverged(_) => failures += s"case #$i (detail suppressed)"
        }
      }
      info(s"topn fuzz: $agreed agreed, $rejected rejected, " +
        s"${failures.size} diverged (passes=${passes.map { case (s, m) => s"$m@seed=$s" }.mkString(", ")})")
      assert(failures.isEmpty,
        s"\n${failures.size} divergence(s):\n${failures.mkString("\n")}")
      assert(agreed >= total * 4 / 5, s"only $agreed/$total cases reached the compare")
    } finally oracle.close()
  }
}
