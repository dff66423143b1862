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

  // ---- BoundedTopKAgg ------------------------------------------------------

  private case class Scored(sim: Double, id: Long)

  private def model(xs: Seq[Scored], k: Int): Seq[Scored] =
    xs.sortBy(s => (-s.sim, s.id)).take(k)

  private val scoredGen: Gen[Scored] = for {
    sim <- Gen.chooseNum(-1.0, 1.0)
    id <- Gen.chooseNum(0L, 50L)
  } yield Scored(sim, id)

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{BoundReference, CreateStruct}
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types.{DoubleType, LongType}

  /** (sim desc, id asc) top-k over (double, long) input rows. */
  private def mkAgg(k: Int): BoundedTopKAgg = BoundedTopKAgg(
    CreateStruct(Seq(BoundReference(0, DoubleType, nullable = false),
      BoundReference(1, LongType, nullable = false))),
    k, Seq((0, true), (1, false)))

  private def reduceAll(agg: BoundedTopKAgg, xs: Seq[Scored]): TopKRows =
    xs.foldLeft(agg.createAggregationBuffer()) { (b, x) =>
      agg.update(b, InternalRow(x.sim, x.id))
    }

  private def resultOf(agg: BoundedTopKAgg, buf: TopKRows): Seq[Scored] = {
    val arr = agg.eval(buf).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      Scored(r.getDouble(0), r.getLong(1))
    }
  }

  test("BoundedTopKAgg.update equals sort-and-take for any input") {
    check(Prop.forAll(Gen.listOf(scoredGen), Gen.choose(1, 8)) { (xs, k) =>
      val agg = mkAgg(k)
      resultOf(agg, reduceAll(agg, xs)) == model(xs, k)
    })
  }

  test("BoundedTopKAgg.merge + serde is consistent with reducing the concatenation") {
    check(Prop.forAll(Gen.listOf(scoredGen), Gen.listOf(scoredGen), Gen.choose(1, 8)) {
      (xs, ys, k) =>
        val agg = mkAgg(k)
        // partial buffers cross the wire: exercise serialize/deserialize too
        val right = agg.deserialize(agg.serialize(reduceAll(agg, ys)))
        val merged = agg.merge(reduceAll(agg, xs), right)
        resultOf(agg, merged) == model(xs ++ ys, k)
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
