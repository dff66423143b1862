package graft.engine.fuzz

import graft.SparkSpec
import graft.engine.Planners
import graft.model._
import org.apache.spark.sql.functions.col
import scala.util.Random

/**
 * Composed-feature differential fuzzing (r13 verdict: cross the fuzz
 * spaces the way the reference's generated families cross features —
 * its gen_feat_* cases are agg×group×top×order pairwise products). The
 * per-surface fuzzers draw each feature independently, so rare
 * conjunctions get thin coverage by chance; this suite FORCES the
 * compositions by drawing from the same generators and keeping only the
 * target slice, so every case in CI is a genuine cross-product:
 *
 *  1. index-mode × multi-group union — the no-version-dedup scan over
 *     the schema-merged two-group frame (type-widened `code`, one-sided
 *     nulls, B-only `zone`), ~12% of random draws otherwise;
 *  2. union × offset/limit paging — deterministic page cuts over the
 *     merged frame (offset AND a real limit together, ~15% by chance);
 *  3. TopN pipeline × union — the bucket pre-compute and TopN read run
 *     over the MERGED frame (a surface no per-suite fuzzer touches),
 *     with group tags × conditions × AGGREGATE BY forced present.
 *
 * Twins: the measure slices render through FuzzTwin with the union
 * mergedSpec; the TopN slice points TopNFuzzTwin's base at the union
 * subquery. ≥150 cases per slice in CI, shrink-free (replay via the
 * printed seed + the dedicated suites' machinery).
 */
class ComposedFuzzSuite extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import TopNFuzzGen.TopNFuzzCase

  private val fixtureDir = "target/fuzz"

  private def pythonDuckAvailable: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb").start()
      .waitFor() == 0
    catch { case _: java.io.IOException => false }

  private implicit val spec: FuzzTwin.TwinSpec = UnionFuzzFixture.mergedSpec

  private var cached: Option[org.apache.spark.sql.DataFrame] = None
  private lazy val mergedDf = {
    val a = FuzzFixture.write(spark, fixtureDir, seed = 7L, n = 700)
    val b = UnionFuzzFixture.write(spark, fixtureDir, seed = 11L, n = 500)
    val merged = Planners.unionGroups(Seq(a, b))
    merged.cache().count()
    cached = Some(merged)
    merged
  }

  override protected def afterAll(): Unit = {
    cached.foreach(_.unpersist(blocking = false))
    super.afterAll()
  }

  private def collectRows(res: org.apache.spark.sql.DataFrame)
      : (Seq[String], Seq[Seq[CVal]]) = {
    val cols = res.columns.toSeq
    val rows = res.collect().toSeq.map(r =>
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

  private val acceptedRejections = Seq(
    "invalid group-by tag",
    "only EQ and IN are supported on entity tag",
    "is not supported on array tag",
    "criteria AND pins an entity tag to conflicting values",
    "topN query conditions must be EQ")

  /** Draw from `gen` until `want` cases satisfying `keep` are collected
    * (the composition filter); caps total draws so a drifted generator
    * fails loudly instead of spinning. */
  private def slice[C](rnd: Random, want: Int, gen: Random => C, keep: C => Boolean): Seq[C] = {
    val out = Vector.newBuilder[C]
    var got = 0
    var draws = 0
    val maxDraws = want * 80
    while (got < want && draws < maxDraws) {
      val c = gen(new Random(rnd.nextLong()))
      if (keep(c)) { out += c; got += 1 }
      draws += 1
    }
    assert(got == want, s"only $got/$want composed cases in $draws draws — generator drifted?")
    out.result()
  }

  private def drive[C](label: String, cases: Seq[C], seed: Long,
      engine: C => org.apache.spark.sql.DataFrame, twin: C => String,
      invalid: C => Boolean, oracle: DuckOracle): Unit = {
    var agreed = 0
    var rejected = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    cases.zipWithIndex.foreach { case (c, i) =>
      val engineRes =
        try Right(collectRows(engine(c)))
        catch { case t: Throwable => Left(t) }
      engineRes match {
        case Left(e: IllegalArgumentException)
            if acceptedRejections.exists(m => Option(e.getMessage).exists(_.contains(m))) =>
          rejected += 1
        case Left(e) if failures.size < 5 =>
          failures += s"$label #$i (replay: SPARK_GRAFT_COMPOSED_FUZZ_SEED=$seed) " +
            s"engine threw: ${e.getClass.getSimpleName}: ${e.getMessage}\n  case: $c"
        case Left(_) => failures += s"$label #$i (suppressed)"
        case Right(_) if invalid(c) =>
          failures += s"$label #$i: validator failed to reject an invalid case\n  case: $c"
        case Right(er) =>
          oracle.query(twin(c)) match {
            case Left(err) if failures.size < 5 =>
              failures += s"$label #$i oracle rejected twin SQL: $err\n  case: $c"
            case Left(_) => failures += s"$label #$i (suppressed)"
            case Right(or) => compare(er, or) match {
              case None => agreed += 1
              case Some(detail) if failures.size < 5 =>
                failures += s"$label #$i (replay: SPARK_GRAFT_COMPOSED_FUZZ_SEED=$seed) " +
                  s"diverged: $detail\n  case: $c\n  twin SQL: ${twin(c)}"
              case Some(_) => failures += s"$label #$i (suppressed)"
            }
          }
      }
    }
    info(s"$label: $agreed agreed, $rejected rejected of ${cases.size} (seed=$seed)")
    assert(failures.isEmpty, s"\n${failures.size} failure(s):\n${failures.mkString("\n")}")
    assert(agreed >= cases.size * 3 / 5, s"only $agreed/${cases.size} $label cases compared")
  }

  private def seedOf: Long = FuzzSeeds.resolve("SPARK_GRAFT_COMPOSED_FUZZ_SEED", salt = 5)
  private def nOf(default: Int): Int =
    sys.env.get("SPARK_GRAFT_COMPOSED_FUZZ_N").map(_.toInt).getOrElse(default)

  private def measureEngine(q: MeasureQuery): org.apache.spark.sql.DataFrame =
    Planners.measure(mergedDf, FuzzFixture.tdef, q)

  test("composed fuzz: index-mode × multi-group union") {
    assume(pythonDuckAvailable, "python3+duckdb unavailable — differential oracle skipped")
    mergedDf
    val seed = seedOf
    val cases = slice[FuzzGen.FuzzCase](new Random(seed), nOf(60),
      r => FuzzGen.genCase(r, UnionFuzzFixture.domain), _.q.indexMode)
    val oracle = new DuckOracle(fixtureDir)
    try drive[FuzzGen.FuzzCase]("indexmode×union", cases, seed,
      fc => measureEngine(fc.q), fc => FuzzTwin.sql(fc.q),
      _.deliberatelyInvalid, oracle)
    finally oracle.close()
  }

  test("composed fuzz: union × offset/limit paging") {
    assume(pythonDuckAvailable, "python3+duckdb unavailable — differential oracle skipped")
    mergedDf
    val seed = seedOf
    val cases = slice[FuzzGen.FuzzCase](new Random(seed + 1), nOf(60),
      r => FuzzGen.genCase(r, UnionFuzzFixture.domain),
      fc => fc.q.offset > 0 && fc.q.limit > 0 && fc.q.limit <= 200)
    val oracle = new DuckOracle(fixtureDir)
    try drive[FuzzGen.FuzzCase]("union×paging", cases, seed,
      fc => measureEngine(fc.q), fc => FuzzTwin.sql(fc.q),
      _.deliberatelyInvalid, oracle)
    finally oracle.close()
  }

  test("composed fuzz: TopN pipeline × union, group tags × conditions × aggregate") {
    assume(pythonDuckAvailable, "python3+duckdb unavailable — differential oracle skipped")
    mergedDf
    val seed = seedOf
    val cases = slice[TopNFuzzCase](new Random(seed + 2), nOf(60),
      TopNFuzzGen.genCase,
      fc => fc.pipe.groupCols.nonEmpty && fc.q.conditions.nonEmpty && fc.q.agg.isDefined)
    val oracle = new DuckOracle(fixtureDir)
    try drive[TopNFuzzCase]("topn×union", cases, seed,
      fc => Planners.topNFromRaw(mergedDf, "ts", fc.pipe.entityCol,
        col(fc.pipe.valueCol), fc.pipe.intervalMs, fc.pipe.countersN, fc.q,
        groupCols = fc.pipe.groupCols),
      fc => TopNFuzzTwin.sql(fc, UnionFuzzFixture.mergedSpec.baseSql),
      _.deliberatelyInvalid, oracle)
    finally oracle.close()
  }
}
