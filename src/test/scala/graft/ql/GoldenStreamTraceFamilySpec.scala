package graft.ql

import java.time.Instant

import graft.SparkSpec
import graft.engine.Planners
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

  test("stream 'nothing' / 'excludes data expired beyond TTL' (WantEmpty window variants)") {
    // stream.go registers `all` under extra windows: [epoch, epoch+1ms)
    // ("nothing") and a window entirely before the data's TTL horizon
    // ("excludes data expired beyond TTL", Offset -156h) — both WantEmpty
    import graft.engine.Planners
    import graft.model.{StreamQuery, TimeRange}
    val df = swStream
    def run(tr: TimeRange) = Planners.stream(df, swDef,
      StreamQuery(groups = Seq("default"), name = "sw",
        timeRange = Some(tr), projection = Seq("event_id")), "element_id")
    assert(run(TimeRange(Instant.EPOCH, Instant.ofEpochMilli(1L))).isEmpty)
    // a 24h window wholly before the dataset's oldest row (the reference
    // offsets -156h against hour-old data; our events start 2024-01-01)
    assert(run(TimeRange(Instant.parse("2023-12-01T00:00:00Z"),
      Instant.parse("2023-12-02T00:00:00Z"))).isEmpty)
  }

  test("stream 'invalid time range': int64-ns-span bounds return everything (no overflow)") {
    // stream.go's "invalid time range" runs `all` with Begin/End at the
    // extremes of the int64-nanosecond span and still WANTS the full
    // result — the conversion must saturate, not wrap. Instants BEYOND
    // the representable span (Instant.MIN/MAX) must also clamp.
    import graft.engine.Planners
    import graft.model.{StreamQuery, TimeRange}
    def run(tr: TimeRange) = Planners.stream(swStream, swDef,
      StreamQuery(groups = Seq("default"), name = "sw",
        timeRange = Some(tr), projection = Seq("event_id"),
        limit = Int.MaxValue), "element_id")
    val all = swStream.count()
    val int64Span = TimeRange(
      Instant.ofEpochSecond(-9223372036L), Instant.ofEpochSecond(9223372036L))
    assert(run(int64Span).count() == all)
    assert(run(TimeRange(Instant.MIN, Instant.MAX)).count() == all,
      "Instant.MIN/MAX must saturate to the widest int64-ns window")
  }

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

  // == STREAM round-5 remainder =============================================

  test("sort_desc.ql: bare ORDER BY duration DESC") {
    assert(runSw(
      """SELECT event_id, value FROM STREAM sw IN default TIME > '-30d'
        |ORDER BY value DESC""".stripMargin) ==
      mirrorSw(lit(true), valOrd(desc = true), Seq("event_id", "value")))
  }

  test("filter_no_indexed.ql: EQ on a non-indexed tag") {
    assert(runSw(
      """SELECT event_id, event_type FROM STREAM sw IN default TIME > '-30d'
        |WHERE event_type = 'view'""".stripMargin) ==
      mirrorSw(col("event_type") === "view", tsOrd, Seq("event_id", "event_type")))
  }

  test("all_with_http_method.ql: projection of a DOTTED tag name") {
    // the sw stream's `http.method` tag — dots are part of the tag name,
    // not a path (qcol backtick-quotes them for Catalyst)
    val dotted = swStream.withColumn("http.method",
      when(col("event_type") === "click", lit("GET")).otherwise(lit("POST")))
    val got = runSw(
      """SELECT event_id, http.method, props FROM STREAM sw IN default
        |TIME > '-30d' LIMIT 5""".stripMargin,
      Map("sw" -> BydbQL.Resource(dotted, swDef, elementIdCol = Some("element_id"))))
    val want = dotted.filter(inWin).orderBy(tsOrd: _*).limit(5)
      .select(col("event_id"), col("`http.method`"), col("props"))
      .collect().map(_.toSeq).toSeq
    assert(got == want && got.size == 5)
  }

  test("deduplication_test_limit_40.ql / deduplication_test_limit_100.ql") {
    val dup = swStream.unionByName(swStream.withColumn("value", col("value") + 1000.0))
    for (lim <- Seq(40, 100)) {
      val got = runSw(
        s"""SELECT element_id, event_id, value FROM STREAM sw IN default
           |TIME > '-30d' LIMIT $lim""".stripMargin, swRes(dup))
      assert(got.size == lim && got.map(_.head).distinct.size == lim, s"limit $lim")
    }
  }

  test("duplicated_order_by_filter.ql: EQ filter + ORDER BY tag DESC over duplicates") {
    val dup = swStream.unionByName(swStream.withColumn("value", col("value") + 1000.0))
    val someId = swStream.filter(inWin).orderBy("ts_ns")
      .select("event_id").head.getLong(0)
    val got = runSw(
      s"""SELECT element_id, event_id, value FROM STREAM sw IN default
         |TIME > '-30d' WHERE event_id = $someId ORDER BY value DESC""".stripMargin,
      swRes(dup))
    // one element survives dedup; the kept copy is the first in (value
    // desc, ts, entity) order = the high copy
    assert(got.size == 1 && got.head(2).asInstanceOf[Double] > 1000.0)
  }

  test("global_indices.ql: multi-point IN incl a no-match member") {
    val ids = swStream.filter(inWin).orderBy("ts_ns").select("event_id")
      .limit(3).collect().map(_.getLong(0))
    val got = runSw(
      s"""SELECT event_id, props FROM STREAM sw IN default TIME > '-30d'
         |WHERE event_id IN (${ids.mkString(", ")}, -1)""".stripMargin)
    assert(got == mirrorSw(col("event_id").isin(ids: _*), tsOrd,
      Seq("event_id", "props")) && got.size == 3)
  }

  test("having_non_indexed.ql: HAVING with a BARE scalar value (no parens)") {
    assert(runSw(
      """SELECT event_id, extended_tags, props FROM STREAM sw IN default
        |TIME > '-30d' WHERE extended_tags HAVING 'click'""".stripMargin) ==
      mirrorSw(col("event_type") === "click", tsOrd,
        Seq("event_id", "extended_tags", "props")))
  }

  test("having_non_indexed_arr.ql / gen_leaf_having_extended_tags.ql / " +
      "gen_leaf_not_having_extended_tags.ql") {
    assert(runSw(
      """SELECT event_id, extended_tags, props FROM STREAM sw IN default
        |TIME > '-30d' WHERE extended_tags HAVING ('click-x', 'click')""".stripMargin) ==
      mirrorSw(col("event_type") === "click", tsOrd,
        Seq("event_id", "extended_tags", "props")))
    assert(runSw(
      """SELECT event_id, event_type FROM STREAM sw IN default
        |TIME > '-30d' WHERE extended_tags NOT HAVING ('click')""".stripMargin) ==
      mirrorSw(col("event_type") =!= "click", tsOrd, Seq("event_id", "event_type")))
  }

  test("hybrid_index.ql: HAVING on an array tag AND a point lookup") {
    val someId = swStream.filter(inWin && col("event_type") === "click")
      .orderBy("ts_ns").select("event_id").head.getLong(0)
    val got = runSw(
      s"""SELECT event_id, extended_tags, props FROM STREAM sw IN default
         |TIME > '-30d'
         |WHERE extended_tags HAVING ('click-x', 'click') AND event_id = $someId""".stripMargin)
    assert(got == mirrorSw(col("event_type") === "click" && col("event_id") === someId,
      tsOrd, Seq("event_id", "extended_tags", "props")) && got.size == 1)
  }

  test("gen_tree_depth2_contradict_and.ql: contradictory range AND is empty (WantEmpty)") {
    assert(runSw(
      """SELECT event_id, value FROM STREAM sw IN default TIME > '-30d'
        |WHERE (value > 500 AND value < 500) ORDER BY value DESC""".stripMargin).isEmpty)
  }

  test("gen_leaf_{eq,ne,lt,gt,le,ge}_duration.ql + gen_leaf_{eq,in}_state.ql") {
    // duration (an INT tag in the sw schema) → floor(value) · state →
    // user_id (entity: EQ/IN legal). Literals stay integral — the grammar
    // has no float literal, faithfully: tag types are int64/string only.
    val durDf = swStream.withColumn("duration", floor(col("value")).cast("long"))
    val durRes = swRes(durDf)
    val someD = durDf.filter(inWin).orderBy("ts_ns").select("duration").head.getLong(0)
    val cases: Seq[(String, String, Column)] = Seq(
      ("gen_leaf_eq_duration", s"duration = $someD", col("duration") === someD),
      ("gen_leaf_ne_duration", s"duration != $someD", col("duration") =!= someD),
      ("gen_leaf_lt_duration", "duration < 1000", col("duration") < 1000L),
      ("gen_leaf_gt_duration", "duration > 200", col("duration") > 200L),
      ("gen_leaf_le_duration", "duration <= 1000", col("duration") <= 1000L),
      ("gen_leaf_ge_duration", "duration >= 200", col("duration") >= 200L),
      ("gen_leaf_eq_state", "user_id = 1", col("user_id") === 1L),
      ("gen_leaf_in_state", "user_id IN (0, 1)", col("user_id").isin(0L, 1L)))
    for ((name, where, m) <- cases) {
      assert(runSw(
        s"""SELECT event_id, user_id, duration, props FROM STREAM sw IN default
           |TIME > '-30d' WHERE $where""".stripMargin, durRes) ==
        mirrorSw(m, tsOrd, Seq("event_id", "user_id", "duration", "props"),
          src = durDf), name)
    }
  }

  /** the reference sw stream has TWO entity tags (service_id, state) —
    * event_type plays service_id here so EQ/IN pass and every other op
    * errors (F6). */
  private lazy val svcEntityDef = swDef.copy(entity = Seq("event_type", "user_id"))
  private def svcRes = Map("sw" -> BydbQL.Resource(swStream, svcEntityDef,
    elementIdCol = Some("element_id")))

  test("gen_leaf_eq_service_id.ql / gen_leaf_in_service_id.ql: entity EQ and IN") {
    assert(runSw(
      """SELECT event_id, event_type, value FROM STREAM sw IN default
        |TIME > '-30d' WHERE event_type = 'click'""".stripMargin, svcRes) ==
      mirrorSw(col("event_type") === "click", tsOrd,
        Seq("event_id", "event_type", "value")))
    assert(runSw(
      """SELECT event_id, event_type, value FROM STREAM sw IN default
        |TIME > '-30d'
        |WHERE event_type IN ('click', 'missing_id')""".stripMargin, svcRes) ==
      mirrorSw(col("event_type") === "click", tsOrd,
        Seq("event_id", "event_type", "value")))
  }

  test("gen_err_ne_service_id.ql / gen_err_not_in_service_id.ql (WantErr)") {
    for (p <- Seq("event_type != 'webapp_id'", "event_type NOT IN ('webapp_id')")) {
      val e = intercept[IllegalArgumentException] {
        runSw(s"SELECT event_id FROM STREAM sw IN default TIME > '-30d' WHERE $p", svcRes)
      }
      assert(e.getMessage.contains("only EQ and IN"), p)
    }
  }

  // cases: gen_err_ne_state.ql · gen_err_lt_state.ql · gen_err_gt_state.ql ·
  // gen_err_le_state.ql · gen_err_ge_state.ql · gen_err_not_in_state.ql
  test("gen_err_{ne,lt,gt,le,ge,not_in}_state.ql: every non-EQ/IN op on the " +
      "second entity tag rejects (stream.go:113-123, all WantErr)") {
    // state is the sw stream's SECOND entity tag (user_id here) — the
    // range ops exercise a different validator branch than string NE on
    // the first tag, so each statement runs verbatim-modulo-binding
    for (p <- Seq("user_id != 1", "user_id < 1", "user_id > 1",
        "user_id <= 1", "user_id >= 1", "user_id NOT IN (1, 2)")) {
      val e = intercept[IllegalArgumentException] {
        runSw(s"SELECT event_id FROM STREAM sw IN default TIME > '-30d' WHERE $p", svcRes)
      }
      assert(e.getMessage.contains("only EQ and IN"), p)
    }
  }

  test("gen_err_match_trace_id.ql: MATCH on a tag with NO analyzer rule (WantErr)") {
    // the resource declares its analyzer-indexed tags; trace_id (here
    // element_id) carries no analyzer → MATCH rejects
    val r = Map("sw" -> BydbQL.Resource(swStream,
      swDef.copy(matchableTags = Some(Set("event_type"))),
      elementIdCol = Some("element_id")))
    val e = intercept[IllegalArgumentException] {
      runSw(
        """SELECT event_id FROM STREAM sw IN default TIME > '-30d'
          |WHERE element_id MATCH ('1')""".stripMargin, r)
    }
    assert(e.getMessage.contains("no analyzer"))
    // a MATCH on the declared tag still passes through the same resource
    assert(runSw(
      """SELECT event_id, event_type FROM STREAM sw IN default TIME > '-30d'
        |WHERE event_type MATCH ('click')""".stripMargin, r) ==
      mirrorSw(col("event_type") === "click", tsOrd, Seq("event_id", "event_type")))
  }

  test("IndexRuleBinding effective window gates MATCH (schema.proto:203-214, WantErr)") {
    // the reference's metadata client filters bindings by wall-clock now
    // (banyand/metadata/client.go:438-445): an expired or not-yet-begun
    // binding contributes no index rules, so MATCH fails like an
    // unindexed tag; inside the window the same query plans normally
    val now = java.time.Instant.now()
    def res(begin: java.time.Instant, expire: java.time.Instant) =
      Map("sw" -> BydbQL.Resource(swStream,
        swDef.copy(matchableTags = Some(Set("event_type")),
          matchableWindows = Map("event_type" -> (begin, expire))),
        elementIdCol = Some("element_id")))
    val q = """SELECT event_id, event_type FROM STREAM sw IN default
              |TIME > '-30d' WHERE event_type MATCH ('click')""".stripMargin

    // live binding: [now-1h, now+1h] — query passes
    assert(runSw(q, res(now.minusSeconds(3600), now.plusSeconds(3600))) ==
      mirrorSw(col("event_type") === "click", tsOrd, Seq("event_id", "event_type")))
    // expired binding: expire_at < now
    val e1 = intercept[IllegalArgumentException] {
      runSw(q, res(now.minusSeconds(7200), now.minusSeconds(3600)))
    }
    assert(e1.getMessage.contains("not in effect"))
    // future binding: begin_at > now
    val e2 = intercept[IllegalArgumentException] {
      runSw(q, res(now.plusSeconds(3600), now.plusSeconds(7200)))
    }
    assert(e2.getMessage.contains("not in effect"))
    // the window gates only MATCH — a plain EQ on the same tag still runs
    assert(runSw(
      """SELECT event_id, event_type FROM STREAM sw IN default
        |TIME > '-30d' WHERE event_type = 'click'""".stripMargin,
      res(now.minusSeconds(7200), now.minusSeconds(3600))) ==
      mirrorSw(col("event_type") === "click", tsOrd, Seq("event_id", "event_type")))
  }

  test("gen_leaf_match_db.instance.ql: MATCH on a DOTTED tag name") {
    val dotted = swStream.withColumn("db.instance",
      when(col("event_type") === "click", lit("mysql-primary"))
        .otherwise(lit("pg-replica")))
    val got = runSw(
      """SELECT event_id, db.instance FROM STREAM sw IN default TIME > '-30d'
        |WHERE db.instance MATCH ('mysql')""".stripMargin,
      Map("sw" -> BydbQL.Resource(dotted, swDef, elementIdCol = Some("element_id"))))
    val want = dotted.filter(inWin && col("`db.instance`") === "mysql-primary")
      .orderBy(tsOrd: _*).limit(100)
      .select(col("event_id"), col("`db.instance`")).collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("multi_group_new_tag.ql: second group's new tag null-fills (IgnoreElementID)") {
    val updated = swStream
      .withColumn("event_id", col("event_id") + 10000000L)
      .withColumn("element_id", col("event_id").cast("string"))
      .withColumn("new_tag", concat(lit("n-"), col("event_type")))
    val r = Map(
      "default/sw" -> BydbQL.Resource(swStream, swDef, elementIdCol = Some("element_id")),
      "updated/sw" -> BydbQL.Resource(updated, swDef, elementIdCol = Some("element_id")))
    val got = BydbQL.run(
      """SELECT event_id, event_type, new_tag FROM STREAM sw IN default, updated
        |TIME > '-30d' LIMIT 100000""".stripMargin, r, Nil, now)
      .collect().map(_.toSeq).toSeq
    assert(got.size == 2 * swStream.filter(inWin).count())
    assert(got.exists(_(2) == null) && got.exists(_(2) != null))
  }

  test("multi_group_tag_type.ql: conflicting tag type widens to UNSPECIFIED") {
    // status_code is INT in `default` and STRING in `updated`
    // (logical/schema.go:240-246): the merged column renders each group's
    // native value; want file keeps int rows and str rows side by side
    val dflt = swStream.withColumn("status_code", (col("user_id") % 5L + 200L))
    val updated = swStream
      .withColumn("event_id", col("event_id") + 10000000L)
      .withColumn("element_id", col("event_id").cast("string"))
      .withColumn("status_code", concat(lit("HTTP-"), col("event_type")))
    val r = Map(
      "default/sw" -> BydbQL.Resource(dflt, swDef, elementIdCol = Some("element_id")),
      "updated/sw" -> BydbQL.Resource(updated, swDef, elementIdCol = Some("element_id")))
    val got = BydbQL.run(
      """SELECT event_id, event_type, status_code FROM STREAM sw IN default, updated
        |TIME > '-30d' LIMIT 100000""".stripMargin, r, Nil, now)
      .collect().map(_.toSeq).toSeq
    assert(got.size == 2 * swStream.filter(inWin).count())
    val codes = got.map(_(2).asInstanceOf[String]).distinct
    assert(codes.exists(_.startsWith("HTTP-")) && codes.exists(_.forall(_.isDigit)))
  }

  test("multi_group_sort_duration.ql: ORDER BY across merged groups") {
    val updated = swStream
      .withColumn("event_id", col("event_id") + 10000000L)
      .withColumn("element_id", col("event_id").cast("string"))
      .withColumn("value", col("value") + 0.5)
    val r = Map(
      "default/sw" -> BydbQL.Resource(swStream, swDef, elementIdCol = Some("element_id")),
      "updated/sw" -> BydbQL.Resource(updated, swDef, elementIdCol = Some("element_id")))
    val got = BydbQL.run(
      """SELECT event_id, value FROM STREAM sw IN default, updated
        |TIME > '-30d' ORDER BY value DESC""".stripMargin, r, Nil, now)
      .collect().map(_.toSeq).toSeq
    assert(got.size == 100)
    assert(got == mirrorSw(lit(true), valOrd(desc = true), Seq("event_id", "value"),
      src = swStream.unionByName(updated)))
  }

  test("binary-tag cases: BinaryType data_binary projects, orders, and widens in union") {
    // the sw stream's data_binary is a BINARY tag (streams/sw.json); the
    // gen matrices project it in every proj_all case. Here it is an actual
    // BinaryType column, not a string stand-in: bytes must round-trip
    // through scan → time window → order → limit → projection untouched
    val binA = swStream.withColumn("data_binary", encode(col("event_type"), "UTF-8"))
    val rA = Map("sw" -> BydbQL.Resource(binA, swDef, elementIdCol = Some("element_id")))
    val got = BydbQL.run(
      """SELECT event_id, data_binary FROM STREAM sw IN default
        |TIME > '-30d' LIMIT 5""".stripMargin, rA, Nil, now).collect()
    val want = binA.filter(inWin).orderBy(tsOrd: _*).limit(5)
      .select("event_id", "data_binary").collect()
    def render(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), new String(r.getAs[Array[Byte]](1), "UTF-8"))).toSeq
    assert(render(got) == render(want) && got.length == 5)

    // multi-group union where the OTHER group declares data_binary as a
    // string: conflicting tag types widen to string (T6, multi_group_tag_type
    // rule) — the binary side decodes rather than failing the merge
    val binB = swStream
      .withColumn("event_id", col("event_id") + 10000000L)
      .withColumn("element_id", col("event_id").cast("string"))
      .withColumn("data_binary", col("event_type"))
    val r2 = Map(
      "default/sw" -> BydbQL.Resource(binA, swDef, elementIdCol = Some("element_id")),
      "updated/sw" -> BydbQL.Resource(binB, swDef, elementIdCol = Some("element_id")))
    val u = BydbQL.run(
      """SELECT event_id, data_binary FROM STREAM sw IN default, updated
        |TIME > '-30d' LIMIT 4294967295""".stripMargin, r2, Nil, now)
    assert(u.schema("data_binary").dataType ==
      org.apache.spark.sql.types.StringType)
    val inWindow = binA.filter(inWin).count()
    assert(u.count() == 2 * inWindow)
    // widened values are the decoded text on both sides
    assert(u.select("data_binary").distinct().collect().map(_.getString(0)).toSet
      == swStream.filter(inWin).select("event_type").distinct()
        .collect().map(_.getString(0)).toSet)
  }

  test("stream project_non_existent_tag.ql: unknown projected tag errors (WantErr)") {
    val e = intercept[IllegalArgumentException] {
      runSw(
        """SELECT event_id, nonexistent_tag FROM STREAM sw IN default
          |TIME > '-30d'""".stripMargin)
    }
    assert(e.getMessage.contains("not found"))
  }

  test("stream write_mixed.ql: two schema-evolution groups + IN spanning both") {
    val spec1 = swStream.filter(col("user_id") < 8L)
    val spec2 = swStream.filter(col("user_id") >= 8L)
      .withColumn("span_id", concat(col("event_type"), lit("#"), col("event_id")))
    val r = Map(
      "default-spec/sw" -> BydbQL.Resource(spec1, swDef, elementIdCol = Some("element_id")),
      "default-spec2/sw" -> BydbQL.Resource(spec2, swDef, elementIdCol = Some("element_id")))
    val got = BydbQL.run(
      """SELECT event_id, user_id, value FROM STREAM sw IN default-spec, default-spec2
        |TIME > '-30d' WHERE user_id IN (3, 7, 8, 12) LIMIT 100000""".stripMargin,
      r, Nil, now).collect().map(_.toSeq).toSeq
    assert(got == mirrorSw(col("user_id").isin(3L, 7L, 8L, 12L), tsOrd,
      Seq("event_id", "user_id", "value"), limit = 100000))
    assert(got.map(_(1).asInstanceOf[Long]).toSet == Set(3L, 7L, 8L, 12L))
  }

  // == TRACE round-5 remainder ==============================================

  /** explicit-projection mirror: spans carry ONLY the projected tags
    * (trace/v1/query.proto:31-56; gen_feat_*_proj_explicit_*). */
  private def mirrorTraceProj(filter: Column, sortSrc: String, desc: Boolean,
      proj: Seq[String], limit: Int = 100, offset: Int = 0,
      src: DataFrame = traceDf): Seq[Seq[Any]] = {
    val key = if (desc) max(qc(sortSrc)) else min(qc(sortSrc))
    var d = src.filter(inWin && filter).groupBy("trace_id").agg(
      count(lit(1)).as("span_count"), min(col("ts_ns")).as("start_ts"),
      key.as("__k"),
      sort_array(collect_list(struct(proj.map(qc): _*))).as("spans"))
      .orderBy(if (desc) col("__k").desc else col("__k").asc, col("trace_id").asc)
      .drop("__k")
    if (offset > 0) d = d.offset(offset)
    d.limit(limit).collect().map(_.toSeq).toSeq
  }

  private def qc(name: String): Column =
    if (name.contains(".")) col("`" + name + "`") else col(name)

  private def traceResOf(df: DataFrame, td: TableDef = traceDef)
      : Map[String, BydbQL.Resource] =
    Map("sw" -> BydbQL.Resource(df, td, traceIdCol = Some("trace_id"),
      spanStruct = spanCols))

  test("order_duration_desc.ql / order_timestamp_desc.ql / order_timestamp_desc_limit.ql") {
    assert(runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group TIME > '-30d'
        |ORDER BY value DESC""".stripMargin) ==
      mirrorTrace(lit(true), "value", desc = true))
    assert(runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group TIME > '-30d'
        |ORDER BY timestamp DESC""".stripMargin) ==
      mirrorTrace(lit(true), "ts_ns", desc = true))
    val got = runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group TIME > '-30d'
        |ORDER BY timestamp DESC
        |LIMIT 2""".stripMargin)
    assert(got == mirrorTrace(lit(true), "ts_ns", desc = true, limit = 2)
      && got.size == 2)
  }

  test("eq_endpoint_order_duration_asc.ql / eq_service_instance_order_time_asc.ql / " +
      "eq_service_instance_and_endpoint_order_timestamp_asc.ql") {
    // endpoint_id → event_type · service_instance_id → user_id
    assert(runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group TIME > '-30d'
        |WHERE event_type = 'click'
        |ORDER BY value ASC""".stripMargin) ==
      mirrorTrace(col("event_type") === "click", "value", desc = false))
    assert(runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group TIME > '-30d'
        |WHERE user_id = '1'
        |ORDER BY timestamp ASC""".stripMargin) ==
      mirrorTrace(col("user_id") === 1L, "ts_ns", desc = false))
    assert(runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group TIME > '-30d'
        |WHERE user_id = '1' AND event_type = 'click'
        |ORDER BY timestamp ASC""".stripMargin) ==
      mirrorTrace(col("user_id") === 1L && col("event_type") === "click",
        "ts_ns", desc = false))
  }

  // cases: in_trace_ids.ql · gen_leaf_in_trace_id.ql · gen_leaf_ne_trace_id.ql ·
  // gen_leaf_not_in_trace_id.ql · gen_leaf_eq_trace_id.ql
  test("in_trace_ids.ql + gen_leaf_{in,ne,not_in}_trace_id.ql + gen_leaf_eq_trace_id.ql") {
    assert(runTrace(
      """SELECT trace_id FROM TRACE sw IN test-trace-group TIME > '-30d'
        |WHERE trace_id IN ('11', '12', '13')""".stripMargin) ==
      mirrorTraceProj(col("trace_id").isin(11L, 12L, 13L), "ts_ns",
        desc = false, Seq("trace_id")))
    assert(runTrace(
      """SELECT trace_id, event_id, event_type, value FROM TRACE sw IN test-trace-group
        |TIME > '-30d' WHERE trace_id = '42'""".stripMargin) ==
      mirrorTraceProj(col("trace_id") === 42L, "ts_ns", desc = false,
        Seq("trace_id", "event_id", "event_type", "value")))
    assert(runTrace(
      """SELECT trace_id FROM TRACE sw IN test-trace-group TIME > '-30d'
        |WHERE trace_id != '42'
        |ORDER BY timestamp DESC""".stripMargin) ==
      mirrorTraceProj(col("trace_id") =!= 42L, "ts_ns", desc = true,
        Seq("trace_id")))
    assert(runTrace(
      """SELECT trace_id FROM TRACE sw IN test-trace-group TIME > '-30d'
        |WHERE trace_id NOT IN ('999999')
        |ORDER BY timestamp DESC""".stripMargin) ==
      mirrorTraceProj(lit(true), "ts_ns", desc = true, Seq("trace_id")))
  }

  test("trace 'excludes data expired beyond TTL': pre-data window is empty (WantEmpty)") {
    // trace.go registers `all` under a window wholly before the data's
    // TTL horizon (Offset -156h, Duration 24h) — the span-grouping read
    // must return zero traces, not zero-span groups
    assert(runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group
        |TIME BETWEEN '2023-12-01T00:00:00Z' AND '2023-12-02T00:00:00Z'""".stripMargin)
      .isEmpty)
  }

  test("in_empty_span_ids.ql: IN () matches nothing (WantEmpty)") {
    assert(runTrace(
      """SELECT trace_id FROM TRACE sw IN test-trace-group TIME > '-30d'
        |WHERE event_id IN ()
        |ORDER BY timestamp DESC""".stripMargin).isEmpty)
  }

  test("trace gen_leaf duration/state/service_id matrix (proj_explicit shape)") {
    // duration (INT tag) → floor(value) · state → user_id · service_id →
    // event_type; traces have NO entity restriction, so range ops on state
    // pass here (unlike streams). gen_leaf_{eq,ne,lt,gt,le,ge}_duration,
    // gen_leaf_{eq,ne,lt,gt,le,ge}_state, gen_leaf_{eq,ne,in,not_in}_service_id
    val durDf = traceDf.withColumn("duration", floor(col("value")).cast("long"))
    val durRes = traceResOf(durDf)
    val someD = durDf.filter(inWin).orderBy("ts_ns").select("duration").head.getLong(0)
    val proj = Seq("trace_id", "event_id", "event_type", "duration")
    val cases: Seq[(String, String, Column)] = Seq(
      ("gen_leaf_eq_duration", s"duration = $someD", col("duration") === someD),
      ("gen_leaf_ne_duration", s"duration != $someD", col("duration") =!= someD),
      ("gen_leaf_lt_duration", "duration < 1000", col("duration") < 1000L),
      ("gen_leaf_gt_duration", "duration > 200", col("duration") > 200L),
      ("gen_leaf_le_duration", "duration <= 1000", col("duration") <= 1000L),
      ("gen_leaf_ge_duration", "duration >= 200", col("duration") >= 200L),
      ("gen_leaf_eq_state", "user_id = 1", col("user_id") === 1L),
      ("gen_leaf_ne_state", "user_id != 0", col("user_id") =!= 0L),
      ("gen_leaf_lt_state", "user_id < 1", col("user_id") < 1L),
      ("gen_leaf_gt_state", "user_id > 0", col("user_id") > 0L),
      ("gen_leaf_le_state", "user_id <= 1", col("user_id") <= 1L),
      ("gen_leaf_ge_state", "user_id >= 0", col("user_id") >= 0L),
      ("gen_leaf_eq_service_id", "event_type = 'click'", col("event_type") === "click"),
      ("gen_leaf_ne_service_id", "event_type != 'error'", col("event_type") =!= "error"),
      ("gen_leaf_in_service_id", "event_type IN ('click', 'missing_service')",
        col("event_type") === "click"),
      ("gen_leaf_not_in_service_id", "event_type NOT IN ('missing_service')",
        lit(true)))
    for ((name, where, m) <- cases) {
      val got = BydbQL.run(
        s"""SELECT trace_id, event_id, event_type, duration FROM TRACE sw IN test-trace-group
           |TIME > '-30d' WHERE $where
           |ORDER BY timestamp DESC""".stripMargin, durRes, Nil, now)
        .collect().map(_.toSeq).toSeq
      assert(got == mirrorTraceProj(m, "ts_ns", desc = true, proj, src = durDf), name)
    }
  }

  test("gen_leaf_eq_service_id_null.ql: = NULL over a never-null tag (WantEmpty)") {
    assert(runTrace(
      """SELECT trace_id, event_id, event_type, value FROM TRACE sw IN test-trace-group
        |TIME > '-30d' WHERE event_type = NULL
        |ORDER BY timestamp DESC""".stripMargin).isEmpty)
  }

  // cases: gen_feat_traceid_limit2_5.ql · gen_feat_traceid_proj_explicit_4.ql ·
  // gen_feat_traceid_limit5_offset3_proj_explicit_2.ql
  test("gen_feat_traceid_{limit2_5,proj_explicit_4,limit5_offset3_proj_explicit_2}.ql") {
    val got = runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group TIME > '-30d'
        |WHERE trace_id = '7'
        |LIMIT 2""".stripMargin)
    assert(got == mirrorTrace(col("trace_id") === 7L, "ts_ns", desc = false,
      limit = 2) && got.size == 1) // one trace matches; LIMIT 2 caps traces
    assert(runTrace(
      """SELECT trace_id, event_id, event_type, value FROM TRACE sw IN test-trace-group
        |TIME > '-30d' WHERE trace_id = '7'""".stripMargin) ==
      mirrorTraceProj(col("trace_id") === 7L, "ts_ns", desc = false,
        Seq("trace_id", "event_id", "event_type", "value")))
    // offset 3 past the single matching trace → empty (WantEmpty)
    assert(runTrace(
      """SELECT trace_id, event_id, event_type, value FROM TRACE sw IN test-trace-group
        |TIME > '-30d' WHERE trace_id = '7'
        |LIMIT 5
        |OFFSET 3""".stripMargin).isEmpty)
  }

  // cases: gen_feat_order_duration_asc_limit2_offset1_proj_explicit_1.ql ·
  // gen_feat_order_duration_desc_proj_explicit_3.ql ·
  // gen_feat_order_timestamp_asc_filter_state_eq_limit5_offset1_proj_explicit_8.ql
  test("gen_feat_order_{duration_asc_limit2_offset1,duration_desc,timestamp_asc_filter_state_eq_limit5_offset1}_proj_explicit_{1,3,8}.ql") {
    val proj = Seq("trace_id", "event_id", "event_type", "value")
    val got1 = runTrace(
      s"""SELECT ${proj.mkString(", ")} FROM TRACE sw IN test-trace-group
         |TIME > '-30d'
         |ORDER BY value ASC
         |LIMIT 2
         |OFFSET 1""".stripMargin)
    assert(got1 == mirrorTraceProj(lit(true), "value", desc = false, proj,
      limit = 2, offset = 1) && got1.size == 2)
    assert(runTrace(
      s"""SELECT ${proj.mkString(", ")} FROM TRACE sw IN test-trace-group
         |TIME > '-30d'
         |ORDER BY value DESC""".stripMargin) ==
      mirrorTraceProj(lit(true), "value", desc = true, proj))
    val got8 = runTrace(
      s"""SELECT ${proj.mkString(", ")} FROM TRACE sw IN test-trace-group
         |TIME > '-30d'
         |WHERE user_id = 1
         |ORDER BY timestamp ASC
         |LIMIT 5
         |OFFSET 1""".stripMargin)
    assert(got8 == mirrorTraceProj(col("user_id") === 1L, "ts_ns", desc = false,
      proj, limit = 5, offset = 1) && got8.size == 5)
  }

  test("having_query_tag.ql / having_query_tag_cond.ql: array tag + HYPHENATED order tag") {
    // zipkin trace: `query` is a string-array tag, `zipkin-timestamp` the
    // designated timestamp tag (hyphen is part of the tag name)
    val zipkin = traceDf
      .withColumn("query", when(col("event_type") === "click",
        array(lit("SELECT * FROM users"), lit("COMMIT")))
        .otherwise(array(lit("COMMIT"))))
      .withColumn("zipkin-timestamp", col("ts_ns"))
    val zres = traceResOf(zipkin, traceDef.copy(arrayTags = Set("query")))
    val proj = Seq("trace_id", "event_id", "query")
    val got = BydbQL.run(
      """SELECT trace_id, event_id, query FROM TRACE sw IN zipkinTrace
        |TIME > '-30d'
        |WHERE query HAVING ('SELECT * FROM users')
        |ORDER BY zipkin-timestamp DESC""".stripMargin, zres, Nil, now)
      .collect().map(_.toSeq).toSeq
    assert(got == mirrorTraceProj(col("event_type") === "click",
      "zipkin-timestamp", desc = true, proj, src = zipkin) && got.nonEmpty)
    val got2 = BydbQL.run(
      """SELECT trace_id, event_id, query FROM TRACE sw IN zipkinTrace
        |TIME > '-30d'
        |WHERE query HAVING ('SELECT * FROM users') AND (user_id = '2' AND event_type = 'click')
        |ORDER BY zipkin-timestamp DESC""".stripMargin, zres, Nil, now)
      .collect().map(_.toSeq).toSeq
    assert(got2 == mirrorTraceProj(
      col("event_type") === "click" && col("user_id") === 2L,
      "zipkin-timestamp", desc = true, proj, src = zipkin) && got2.nonEmpty)
  }

  test("state_duration_range_and_ids_order_timestamp_desc.ql: deep AND chain") {
    val got = runTrace(
      """SELECT () FROM TRACE sw IN test-trace-group
        |TIME > '-30d'
        |WHERE user_id = 0
        |  AND event_type = 'click'
        |  AND value >= 15
        |  AND value <= 120
        |ORDER BY timestamp DESC
        |LIMIT 20""".stripMargin)
    assert(got == mirrorTrace(col("user_id") === 0L && col("event_type") === "click" &&
      col("value") >= 15.0 && col("value") <= 120.0, "ts_ns", desc = true,
      limit = 20) && got.nonEmpty)
  }

  test("trace multi_group_sort_duration.ql + multi_group_tag_type.ql + write_mixed.ql") {
    val g2 = traceDf
      .withColumn("trace_id", col("trace_id") + 100L)
      .withColumn("value", col("value") + 0.25)
    // sort across merged groups
    val r = Map(
      "test-trace-group/sw" -> BydbQL.Resource(traceDf, traceDef,
        traceIdCol = Some("trace_id"), spanStruct = spanCols),
      "test-trace-updated/sw" -> BydbQL.Resource(g2, traceDef,
        traceIdCol = Some("trace_id"), spanStruct = spanCols))
    val got = BydbQL.run(
      """SELECT trace_id, value FROM TRACE sw IN test-trace-group, test-trace-updated
        |TIME > '-30d'
        |WHERE value >= 100
        |ORDER BY value DESC
        |LIMIT 3""".stripMargin, r, Nil, now).collect().map(_.toSeq).toSeq
    assert(got == mirrorTraceProj(col("value") >= 100.0, "value", desc = true,
      Seq("trace_id", "value"), limit = 3, src = traceDf.unionByName(g2))
      && got.size == 3)
    // tag-type widening through the trace path: state INT in g1, STRING in g2
    val t1 = traceDf.withColumn("state", pmod(col("user_id"), lit(2L)))
    val t2 = g2.withColumn("state",
      when(pmod(col("user_id"), lit(2L)) === 0L, lit("ok")).otherwise(lit("err")))
    val rt = Map(
      "test-trace-group/sw" -> BydbQL.Resource(t1, traceDef,
        traceIdCol = Some("trace_id"), spanStruct = spanCols),
      "test-trace-updated/sw" -> BydbQL.Resource(t2, traceDef,
        traceIdCol = Some("trace_id"), spanStruct = spanCols))
    val gotT = BydbQL.run(
      """SELECT trace_id, event_type, state FROM TRACE sw IN test-trace-group, test-trace-updated
        |TIME > '-30d'
        |WHERE trace_id IN ('7', '107')""".stripMargin, rt, Nil, now)
      .collect().map(_.toSeq).toSeq
    assert(gotT == mirrorTraceProj(col("trace_id").isin(7L, 107L), "ts_ns",
      desc = false, Seq("trace_id", "event_type", "state"),
      src = Planners.unionGroups(Seq(t1, t2))) && gotT.size == 2)
    // write_mixed: two spec groups, IN spanning both
    val s1 = traceDf.filter(col("trace_id") < 50L)
    val s2 = traceDf.filter(col("trace_id") >= 50L)
      .withColumn("span_kind", lit("server"))
    val rw = Map(
      "test-trace-spec/sw" -> BydbQL.Resource(s1, traceDef,
        traceIdCol = Some("trace_id"), spanStruct = spanCols),
      "test-trace-spec2/sw" -> BydbQL.Resource(s2, traceDef,
        traceIdCol = Some("trace_id"), spanStruct = spanCols))
    val gotW = BydbQL.run(
      """SELECT trace_id, event_id, value FROM TRACE sw IN test-trace-spec, test-trace-spec2
        |TIME > '-30d'
        |WHERE trace_id IN ('7', '49', '50', '96')""".stripMargin, rw, Nil, now)
      .collect().map(_.toSeq).toSeq
    assert(gotW == mirrorTraceProj(col("trace_id").isin(7L, 49L, 50L, 96L),
      "ts_ns", desc = false, Seq("trace_id", "event_id", "value"))
      && gotW.size == 4)
  }

  test("trace project_non_existent_tag.ql: unknown projected tag errors (WantErr)") {
    val e = intercept[IllegalArgumentException] {
      runTrace(
        """SELECT trace_id, nonexistent_tag FROM TRACE sw IN test-trace-group
          |TIME > '-30d'""".stripMargin)
    }
    assert(e.getMessage.contains("not found"))
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
