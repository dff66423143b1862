package graft.ql

import java.time.Instant

import graft.SparkSpec
import graft.sources.{Catalog, TableDef}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Golden-corpus slab: the hand-written STREAM cases (test/cases/stream/
 * data/input beyond the gen_* matrices) and EXECUTING trace cases
 * (test/cases/trace/data/input — the earlier port checked IR shapes only;
 * these run the span-grouping planner and check row-level results).
 * Binding (GoldenFamiliesSpec conventions):
 *
 *   stream `sw` → events (element_id = event_id) · duration → value ·
 *   service_id/db.instance → event_type · state → user_id (entity) ·
 *   span_id → event_type · extended_tags → a derived array tag ·
 *   trace sw/zipkin → events + trace_id = event_id mod 97 ·
 *   start_time → ts_ns
 *
 * `now` pinned at 2024-01-20, windows widened to 30 days. Every executing
 * case is checked against an independently computed DataFrame mirror.
 */
class GoldenStreamTraceFamilySpec extends SparkSpec {

  private val now = Instant.parse("2024-01-20T00:00:00Z")
  private def ns(i: Instant) = i.getEpochSecond * 1000000000L
  private val tLo = ns(now.minusSeconds(30L * 86400))
  private val tHi = ns(now)
  private def inWin = col("ts_ns") >= tLo && col("ts_ns") < tHi

  private lazy val events = Catalog.load(spark, sf0001, "events")

  // == STREAM named cases ===================================================

  private lazy val swStream = events
    .withColumn("element_id", col("event_id").cast("string"))
    // extended_tags: a derived array tag (the reference's sw stream carries
    // a string-array tag); contains the event type and a suffixed variant
    .withColumn("extended_tags", array(col("event_type"),
      concat(col("event_type"), lit("-x"))))
  private val swDef = Catalog.defs("events").copy(arrayTags = Set("extended_tags"))

  private def swRes(df: DataFrame = swStream): Map[String, BydbQL.Resource] = Map(
    "sw" -> BydbQL.Resource(df, swDef, elementIdCol = Some("element_id")))

  private def runSw(ql: String, r: Map[String, BydbQL.Resource] = swRes()): Seq[Seq[Any]] =
    BydbQL.run(ql, r, Nil, now).collect().map(_.toSeq).toSeq

  private def mirrorSw(filter: Column, ord: Seq[Column], proj: Seq[String],
      limit: Int = 100, offset: Int = 0, src: DataFrame = swStream): Seq[Seq[Any]] = {
    var d = src.filter(inWin && filter).orderBy(ord: _*)
    if (offset > 0) d = d.offset(offset)
    d.limit(limit).select(proj.map(col): _*).collect().map(_.toSeq).toSeq
  }

  private val tsOrd: Seq[Column] = Seq(col("ts_ns").asc, col("user_id").asc)
  private def valOrd(desc: Boolean): Seq[Column] =
    Seq(if (desc) col("value").desc else col("value").asc,
      col("ts_ns").asc, col("user_id").asc)

  test("filter_tag.ql: tag EQ AND entity EQ") {
    assert(runSw(
      """SELECT event_id, value FROM STREAM sw IN default TIME > '-30d'
        |WHERE event_type = 'click' AND user_id = 1""".stripMargin) ==
      mirrorSw(col("event_type") === "click" && col("user_id") === 1L,
        tsOrd, Seq("event_id", "value")))
  }

  test("filter_tag_empty.ql: satisfiable tags, empty intersection") {
    assert(runSw(
      """SELECT event_id FROM STREAM sw IN default TIME > '-30d'
        |WHERE event_type = 'click' AND user_id = -1""".stripMargin).isEmpty)
  }

  test("having.ql: HAVING two values on an array tag") {
    assert(runSw(
      """SELECT event_id, event_type FROM STREAM sw IN default TIME > '-30d'
        |WHERE extended_tags HAVING ('click', 'click-x')""".stripMargin) ==
      mirrorSw(col("event_type") === "click", tsOrd, Seq("event_id", "event_type")))
  }

  test("err_in_arr.ql: IN on an array tag is an error (WantErr)") {
    val e = intercept[IllegalArgumentException] {
      runSw(
        """SELECT event_id FROM STREAM sw IN default TIME > '-30d'
          |WHERE extended_tags IN ('c', 'b')""".stripMargin)
    }
    assert(e.getMessage.contains("array tag"))
  }

  test("less.ql / less_eq.ql: range ops on the duration tag") {
    assert(runSw(
      """SELECT event_id, value FROM STREAM sw IN default TIME > '-30d'
        |WHERE value < 50""".stripMargin) ==
      mirrorSw(col("value") < 50.0, tsOrd, Seq("event_id", "value")))
    assert(runSw(
      """SELECT event_id, value FROM STREAM sw IN default TIME > '-30d'
        |WHERE value <= 50""".stripMargin) ==
      mirrorSw(col("value") <= 50.0, tsOrd, Seq("event_id", "value")))
  }

  test("logical.ql: AND binds tighter than OR") {
    assert(runSw(
      """SELECT event_id, value FROM STREAM sw IN default TIME > '-30d'
        |WHERE value < 200 AND event_type = 'click' OR value < 10""".stripMargin) ==
      mirrorSw((col("value") < 200.0 && col("event_type") === "click") ||
        col("value") < 10.0, tsOrd, Seq("event_id", "value")))
  }

  test("offset.ql: LIMIT 1 OFFSET 3") {
    assert(runSw(
      """SELECT event_id FROM STREAM sw IN default TIME > '-30d'
        |LIMIT 1 OFFSET 3""".stripMargin) ==
      mirrorSw(lit(true), tsOrd, Seq("event_id"), limit = 1, offset = 3))
  }

  test("search.ql: MATCH on a stream tag") {
    assert(runSw(
      """SELECT event_id, event_type FROM STREAM sw IN default TIME > '-30d'
        |WHERE event_type MATCH('click')""".stripMargin) ==
      mirrorSw(col("event_type") === "click", tsOrd, Seq("event_id", "event_type")))
  }

  test("sort_duration_no_index_limit.ql: EQ + ORDER BY tag DESC + LIMIT") {
    assert(runSw(
      """SELECT event_id, value FROM STREAM sw IN default TIME > '-30d'
        |WHERE event_type = 'view' ORDER BY value DESC LIMIT 2""".stripMargin) ==
      mirrorSw(col("event_type") === "view", valOrd(desc = true),
        Seq("event_id", "value"), limit = 2))
  }

  test("sort_empty.ql: no-match filter with ORDER BY is empty") {
    assert(runSw(
      """SELECT event_id FROM STREAM sw IN default TIME > '-30d'
        |WHERE event_type = 'no_such_type' ORDER BY value DESC""".stripMargin).isEmpty)
  }

  test("sort_filter.ql: range filter + ORDER BY the same tag") {
    assert(runSw(
      """SELECT event_id, value FROM STREAM sw IN default TIME > '-30d'
        |WHERE value < 50 ORDER BY value DESC""".stripMargin) ==
      mirrorSw(col("value") < 50.0, valOrd(desc = true), Seq("event_id", "value")))
  }

  test("filter_order_desc.ql: bare ORDER BY DESC = time descending") {
    assert(runSw(
      """SELECT event_id, value FROM STREAM sw IN default TIME > '-30d'
        |WHERE value < 50 ORDER BY DESC LIMIT 2""".stripMargin) ==
      mirrorSw(col("value") < 50.0,
        Seq(col("ts_ns").desc, col("ts_ns").asc, col("user_id").asc),
        Seq("event_id", "value"), limit = 2))
  }

  test("filter_no_indexed_or.ql: OR of tag EQ with (int-tag EQ AND entity EQ)") {
    val someTs = swStream.filter(inWin).orderBy("ts_ns")
      .select("ts_ns").head.getLong(0)
    assert(runSw(
      s"""SELECT event_id, event_type FROM STREAM sw IN default TIME > '-30d'
         |WHERE event_type = 'view' OR ts_ns = $someTs AND user_id = 1""".stripMargin) ==
      mirrorSw(col("event_type") === "view" ||
        (col("ts_ns") === someTs && col("user_id") === 1L),
        tsOrd, Seq("event_id", "event_type")))
  }

  test("global_index.ql: point lookup by a global-indexed tag") {
    val someId = swStream.filter(inWin).orderBy("ts_ns")
      .select("event_id").head.getLong(0)
    val got = runSw(
      s"""SELECT event_id, user_id, value FROM STREAM sw IN default TIME > '-30d'
         |WHERE event_id = $someId""".stripMargin)
    assert(got == mirrorSw(col("event_id") === someId, tsOrd,
      Seq("event_id", "user_id", "value")) && got.size == 1)
  }

  test("duplicated_all.ql / deduplication_test_limit_25.ql: element dedup + limits") {
    // the duplicated group: every element appears twice with different
    // values; dedup must keep exactly one row per element id
    val dup = swStream.unionByName(swStream.withColumn("value", col("value") + 1000.0))
    for (lim <- Seq(25, 100)) {
      val got = runSw(
        s"""SELECT element_id, event_id, value FROM STREAM sw IN default
           |TIME > '-30d' LIMIT $lim""".stripMargin, swRes(dup))
      assert(got.size == lim, s"limit $lim")
      assert(got.map(_.head).distinct.size == lim, s"distinct elements at limit $lim")
    }
  }

  test("duplicated_entity_filter.ql: dedup composes with an entity filter") {
    val dup = swStream.unionByName(swStream.withColumn("value", col("value") + 1000.0))
    val got = runSw(
      """SELECT element_id, event_id FROM STREAM sw IN default TIME > '-30d'
        |WHERE user_id = 3 LIMIT 100000""".stripMargin, swRes(dup))
    val want = swStream.filter(inWin && col("user_id") === 3L).count()
    assert(got.size == want && got.map(_.head).distinct.size == got.size)
  }

  // == TRACE executing cases ================================================

  private lazy val traceDf = events.withColumn("trace_id", pmod(col("event_id"), lit(97L)))
  private val traceDef = TableDef("traces", tsCol = Some("ts_ns"))
  private val spanCols = Seq("event_id", "event_type", "value", "ts_ns")

  private def traceRes: Map[String, BydbQL.Resource] = Map(
    "sw" -> BydbQL.Resource(traceDf, traceDef, traceIdCol = Some("trace_id"),
      spanStruct = spanCols))

  private def runTrace(ql: String): Seq[Seq[Any]] =
    BydbQL.run(ql, traceRes, Nil, now).collect().map(_.toSeq).toSeq

  /** Mirror of the span-grouping read: window → filter → group per trace →
    * rank by the first span value in scan direction (min asc / max desc) →
    * page. */
  private def mirrorTrace(filter: Column, sortSrc: String, desc: Boolean,
      limit: Int = 100, offset: Int = 0): Seq[Seq[Any]] = {
    val key = if (desc) max(col(sortSrc)) else min(col(sortSrc))
    var d = traceDf.filter(inWin && filter).groupBy("trace_id").agg(
      count(lit(1)).as("span_count"), min(col("ts_ns")).as("start_ts"),
      key.as("__k"),
      sort_array(collect_list(struct(spanCols.map(col): _*))).as("spans"))
      .orderBy(if (desc) col("__k").desc else col("__k").asc, col("trace_id").asc)
      .drop("__k")
    if (offset > 0) d = d.offset(offset)
    d.limit(limit).collect().map(_.toSeq).toSeq
  }

  test("trace all.ql executing: ORDER BY timestamp DESC LIMIT 100") {
    val got = runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group TIME > '-30d'
        |ORDER BY timestamp DESC LIMIT 100""".stripMargin)
    assert(got == mirrorTrace(lit(true), "ts_ns", desc = true) && got.size == 97)
  }

  test("eq_service_order_timestamp_desc.ql: tag EQ + ORDER BY timestamp DESC") {
    val got = runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group TIME > '-30d'
        |WHERE event_type = 'click' ORDER BY timestamp DESC""".stripMargin)
    assert(got == mirrorTrace(col("event_type") === "click", "ts_ns", desc = true)
      && got.nonEmpty)
  }

  test("duration_range_order_timestamp.ql: duration range + ORDER BY ts DESC LIMIT 10") {
    val got = runTrace(
      """SELECT () FROM TRACE sw IN zipkinTrace TIME > '-30d'
        |WHERE value >= 10 AND value <= 100 ORDER BY timestamp DESC
        |LIMIT 10""".stripMargin)
    assert(got == mirrorTrace(col("value") >= 10.0 && col("value") <= 100.0,
      "ts_ns", desc = true, limit = 10) && got.size == 10)
  }

  test("gen_feat_order_duration_asc_limit5_proj_explicit_6.ql: trace at its MIN span value") {
    val got = runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group TIME > '-30d'
        |ORDER BY value ASC LIMIT 5""".stripMargin)
    assert(got == mirrorTrace(lit(true), "value", desc = false, limit = 5)
      && got.size == 5)
  }

  test("gen_feat_order_timestamp_desc_filter_duration_range_limit2_9.ql") {
    val got = runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group TIME > '-30d'
        |WHERE (value >= 20 AND value <= 100) ORDER BY timestamp DESC
        |LIMIT 2""".stripMargin)
    assert(got == mirrorTrace(col("value") >= 20.0 && col("value") <= 100.0,
      "ts_ns", desc = true, limit = 2) && got.size == 2)
  }

  test("gen_feat_traceid_0.ql: trace point lookup") {
    val got = runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group TIME > '-30d'
        |WHERE trace_id = 42""".stripMargin)
    assert(got == mirrorTrace(col("trace_id") === 42L, "ts_ns", desc = false)
      && got.size == 1)
  }

  test("eq_trace_id_and_service_unknown.ql: satisfiable tags, empty intersection") {
    assert(runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group TIME > '-30d'
        |WHERE trace_id = 42 AND event_type = 'unknown_service'""".stripMargin).isEmpty)
  }

  test("duration_range_and_ipv4_order_timestamp.ql: three-way AND + order + limit") {
    val got = runTrace(
      """SELECT () FROM TRACE sw IN zipkinTrace TIME > '-30d'
        |WHERE value >= 10 AND value <= 500 AND event_type = 'view'
        |ORDER BY timestamp DESC LIMIT 10""".stripMargin)
    assert(got == mirrorTrace(
      col("value") >= 10.0 && col("value") <= 500.0 && col("event_type") === "view",
      "ts_ns", desc = true, limit = 10) && got.size == 10)
  }

  // element-dedup determinism: the kept row for a duplicated element is the
  // FIRST in the stream's total order (ord tiebreaks), not an arbitrary one
  test("duplicated_index_filter.ql: kept duplicate is deterministic under order") {
    val dup = swStream.unionByName(swStream.withColumn("value", col("value") + 1000.0))
    val got = runSw(
      """SELECT element_id, value FROM STREAM sw IN default TIME > '-30d'
        |WHERE user_id = 3 ORDER BY value ASC LIMIT 100000""".stripMargin, swRes(dup))
    // per element, the row surviving dedup then sorted by value: the dedup
    // keeps the first row in (value asc, ts, entity) order = the low copy
    val w = Window.partitionBy("element_id")
      .orderBy(col("value").asc, col("ts_ns").asc, col("user_id").asc)
    val want = dup.filter(inWin && col("user_id") === 3L)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .orderBy(col("value").asc, col("ts_ns").asc, col("user_id").asc)
      .select("element_id", "value").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }
}
