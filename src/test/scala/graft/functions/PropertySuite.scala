package graft.functions

import java.time.Instant

import graft.SparkSpec
import graft.ql.Transformer
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks of the semantic kernels: the bounded top-k
  * aggregator, the BanyanDB MEAN quirk, the analyzers, and relative-time
  * parsing — each against an independent plain-Scala model. */
class PropertySuite extends SparkSpec {

  /** Run a scalacheck property under scalatest (no bridge artifact in the
    * offline cache, so drive scalacheck's Test runner directly). */
  private def check(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ---- TopKAggregator ------------------------------------------------------

  private def model(xs: Seq[ScoredId], k: Int): Seq[ScoredId] =
    xs.sortBy(s => (-s.sim, s.id)).take(k)

  private val scoredGen: Gen[ScoredId] = for {
    sim <- Gen.chooseNum(-1.0, 1.0)
    id <- Gen.chooseNum(0L, 50L)
  } yield ScoredId(sim, id)

  test("TopKAggregator.reduce equals sort-and-take for any input") {
    check(Prop.forAll(Gen.listOf(scoredGen), Gen.choose(1, 8)) { (xs, k) =>
      val agg = new TopKAggregator(k)
      xs.foldLeft(agg.zero)(agg.reduce) == model(xs, k)
    })
  }

  test("TopKAggregator.merge is consistent with reducing the concatenation") {
    check(Prop.forAll(Gen.listOf(scoredGen), Gen.listOf(scoredGen), Gen.choose(1, 8)) {
      (xs, ys, k) =>
        val agg = new TopKAggregator(k)
        val merged = agg.merge(
          xs.foldLeft(agg.zero)(agg.reduce),
          ys.foldLeft(agg.zero)(agg.reduce))
        merged == model(xs ++ ys, k)
    })
  }

  // ---- BanyanDB MEAN (A2) --------------------------------------------------

  test("banyanMeanLong = truncating integer division with <1→1 clamp") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L))) { vs =>
      val expectRaw = vs.sum / vs.length // JVM Long division truncates like Go
      val expect = if (expectRaw < 1) 1L else expectRaw
      val got = vs.toDF("v").agg(BanyanSemantics.banyanMeanLong(col("v")))
        .as[Long].head()
      got == expect
    }, n = 15)
  }

  // ---- Analyzers (§2.6) ----------------------------------------------------

  private def modelTokens(s: String, pattern: String): Seq[String] =
    s.split(pattern).toSeq.filter(_.nonEmpty)

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', '/', 'É', 'ü', '9', '_', '-')))
      .map(_.mkString)

  test("analyzers match their plain-Scala models on arbitrary text") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(20, textGen)) { texts =>
      val df = texts.toDF("t")
      val got = df.select(
        Analyzers.standard(col("t")), Analyzers.simple(col("t")),
        Analyzers.keyword(col("t")), Analyzers.url(col("t")))
        .as[(Seq[String], Seq[String], Seq[String], Seq[String])].collect()
      texts.zip(got).forall { case (s, (st, si, kw, ur)) =>
        st == modelTokens(s.toLowerCase, "[^\\p{L}\\p{N}]+") &&
          si == modelTokens(s.toLowerCase, "[^\\p{L}]+") &&
          kw == Seq(s.toLowerCase) &&
          ur == modelTokens(s, "[^\\p{L}\\p{N}]+")
      }
    }, n = 10)
  }

  test("keyword MATCH is case-insensitive equality (SURVEY §2.6)") {
    import spark.implicits._
    val df = Seq("EN", "en", "En", "fr", "EN ").toDF("lang")
    val hits = df.filter(Analyzers.matches(col("lang"), Seq("eN"), "keyword",
      andSemantics = false)).as[String].collect().toSet
    assert(hits == Set("EN", "en", "En"))
  }

  // ---- Relative time (transformer.go:1362-1380) ----------------------------

  test("relative durations compose additively around `now`") {
    val now = Instant.parse("2024-06-15T12:00:00Z")
    val units = Map("ms" -> 1L, "s" -> 1000L, "m" -> 60000L,
      "h" -> 3600000L, "d" -> 86400000L, "w" -> 604800000L)
    val partGen = for {
      n <- Gen.choose(0L, 500L)
      u <- Gen.oneOf(units.keys.toSeq)
    } yield (n, u)
    check(Prop.forAll(Gen.nonEmptyListOf(partGen), Gen.oneOf(-1L, 1L)) { (parts, sign) =>
      val raw = (if (sign < 0) "-" else "") +
        parts.map { case (n, u) => s"$n$u" }.mkString
      val expect = now.plusMillis(sign * parts.map { case (n, u) => n * units(u) }.sum)
      Transformer.parseTimestamp(now, raw) == expect
    })
  }

  test("absolute RFC3339 and `now` parse; garbage is rejected") {
    val now = Instant.parse("2024-06-15T12:00:00Z")
    assert(Transformer.parseTimestamp(now, "now") == now)
    assert(Transformer.parseTimestamp(now, "2024-01-02T03:04:05Z") ==
      Instant.parse("2024-01-02T03:04:05Z"))
    intercept[IllegalArgumentException] {
      Transformer.parseTimestamp(now, "3 fortnights")
    }
  }
}
