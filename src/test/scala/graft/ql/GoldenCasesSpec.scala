package graft.ql

import java.time.Instant

import graft.SparkSpec
import graft.model._
import graft.sources.Catalog
import org.apache.spark.sql.functions._

/**
 * Ported subset of the reference's golden QL corpus — the .ql files under
 * test/cases/{measure,stream,trace,property}/data/input (580 cases; each
 * test names its source file). Statements are kept verbatim except
 * resource/tag names, which are bound to the driver testdata schema. Shape
 * assertions go through parse → transform to the typed IR; execution
 * checks run the planner where the testdata can play the role.
 */
class GoldenCasesSpec extends SparkSpec {

  private val now = Instant.parse("2024-01-20T00:00:00Z")
  private lazy val events = Catalog.load(spark, sf0001, "events")
  private def schema = QlSchema(events.schema, Set("value"))

  private def measureOf(ql: String): MeasureQuery =
    Transformer.transform(Parser.parse(ql), schema, now) match {
      case MeasureStatement(q) => q
      case other => fail(s"expected measure, got $other")
    }

  // -- measure --------------------------------------------------------------

  test("all.ql: bare projection + relative time") {
    val q = measureOf(
      "SELECT event_id, user_id, value FROM MEASURE events IN testdata TIME > '-15m'")
    assert(q.timeRange.contains(TimeRange(now.minusSeconds(900), now)))
    assert(q.tagProjection == Seq("event_id", "user_id"))
    assert(q.fieldProjection == Seq("value"))
  }

  test("all_max_limit.ql: LIMIT 4294967295 (uint32 max)") {
    val q = measureOf(
      "SELECT event_id FROM MEASURE events IN testdata TIME > '-15m' LIMIT 4294967295")
    assert(q.limit > 0)
  }

  test("all_only_fields.ql: field-only projection via ::field spec") {
    val q = measureOf(
      "SELECT value::field FROM MEASURE events IN testdata TIME > '-15m'")
    assert(q.tagProjection.isEmpty && q.fieldProjection == Seq("value"))
  }

  test("group_max.ql: GROUP BY incl a field column + MAX") {
    val q = measureOf(
      """SELECT event_type, value::field, MAX(value) FROM MEASURE events IN testdata
        |TIME > '-15m' GROUP BY event_type, value""".stripMargin)
    // a FIELD in GROUP BY becomes GroupBy.FieldName in the reference
    // (transformer.go:800-811), NOT a group tag — only tags group
    assert(q.groupByTags == Seq("event_type"))
    assert(q.agg.contains((AggFn.Max, "value")))
  }

  test("top.ql: SELECT TOP n field DESC with agg") {
    val q = measureOf(
      """SELECT TOP 2 value DESC, event_type, value::field, MEAN(value)
        |FROM MEASURE events IN testdata TIME > '-15m' GROUP BY event_type, value""".stripMargin)
    // TOP runs after the agg (T1), so the ranked field is rebound to the
    // aggregate's output column
    assert(q.top.contains(TopSpec(2, "mean_value", desc = true)))
    assert(q.groupByTags == Seq("event_type"))
    assert(q.agg.contains((AggFn.Mean, "value")))
  }

  test("order_desc.ql: bare ORDER BY DESC means timestamp descending") {
    val q = measureOf(
      "SELECT event_id, value::field FROM MEASURE events IN testdata TIME > '-15m' ORDER BY DESC")
    assert(q.orderBy.contains(OrderBy(None, desc = true)))
  }

  test("filter_hidden_tag.ql: WHERE tag absent from SELECT") {
    val q = measureOf(
      """SELECT event_id, value::field FROM MEASURE events IN testdata
        |TIME > '-15m' WHERE event_type = 'click'""".stripMargin)
    assert(q.criteria.contains(Cond("event_type", Op.Eq, Seq("click"))))
    assert(!q.tagProjection.contains("event_type"))
  }

  test("entity_match.ql: EQ + MATCH('…', '', 'AND') with empty analyzer") {
    val q = measureOf(
      """SELECT user_id, event_type FROM MEASURE events IN testdata TIME > '-15m'
        |WHERE user_id = '7' AND event_type MATCH('click', '', 'AND')""".stripMargin)
    q.criteria.get match {
      case And(Cond("user_id", Op.Eq, _), Cond("event_type", m: Op.Match, vs)) =>
        assert(m.operator == MatchOp.And && vs == Seq("click"))
      case other => fail(s"unexpected criteria: $other")
    }
  }

  test("empty_result.ql: selective EQ executes to zero rows") {
    val q = measureOf(
      """SELECT event_id FROM MEASURE events IN testdata TIME > '-1w'
        |WHERE event_type = 'no_such_type_xyz'""".stripMargin)
    val out = graft.engine.Planners.measure(events, Catalog.defs("events"), q)
    assert(out.count() == 0)
  }

  test("filter_non_existent_tag.ql: WHERE on an unknown tag is an error") {
    val e = intercept[IllegalArgumentException] {
      measureOf(
        """SELECT event_id FROM MEASURE events IN testdata TIME > '-15m'
          |WHERE nonexistent_tag = 'test_value'""".stripMargin)
    }
    assert(e.getMessage.contains("not found"))
  }

  test("ON STAGES lifecycle selection reaches the typed IR") {
    // grammar.go:127-134: the STAGES keyword TRAILS the list — `ON (…) STAGES`
    val q = measureOf(
      """SELECT event_id FROM MEASURE events IN testdata ON (hot, warm) STAGES
        |TIME > '-15m'""".stripMargin)
    assert(q.stages == Seq("hot", "warm"))
  }

  test("order_asc.ql: ORDER BY TIME ASC means timestamp ascending") {
    val q = measureOf(
      "SELECT event_id, value::field FROM MEASURE events IN testdata TIME > '-15m' ORDER BY TIME ASC")
    assert(q.orderBy.contains(OrderBy(None, desc = false)))
  }

  test("float_bottom.ql: TOP n ASC without agg executes as bottom-n") {
    val q = measureOf(
      """SELECT TOP 3 value ASC, event_id, value::field FROM MEASURE events IN testdata
        |TIME BETWEEN '2024-01-01T00:00:00Z' AND '2024-02-01T00:00:00Z'""".stripMargin)
    assert(q.top.contains(TopSpec(3, "value", desc = false)))
    val out = graft.engine.Planners.measure(events, Catalog.defs("events"), q)
      .collect().map(_.getDouble(1))
    val expect = events.orderBy("value").select("value")
      .limit(3).collect().map(_.getDouble(0))
    assert(out.sorted.sameElements(expect.sorted))
  }

  test("in.ql: IN on the entity tag executes as membership") {
    val q = measureOf(
      """SELECT event_id, user_id FROM MEASURE events IN testdata
        |TIME BETWEEN '2024-01-01T00:00:00Z' AND '2024-02-01T00:00:00Z'
        |WHERE user_id IN ('4', '5') LIMIT 100000""".stripMargin)
    val out = graft.engine.Planners.measure(events, Catalog.defs("events"), q)
    assert(out.count() ==
      events.filter(col("user_id").isin(4L, 5L)).count())
  }

  // -- stream ---------------------------------------------------------------

  test("deduplication_test_limit_10.ql: stream dedup honors LIMIT") {
    val df = events.withColumn("element_id",
      concat(col("user_id").cast("string"), lit("-"), col("event_type")))
    val stmt = Parser.parse(
      """SELECT element_id, event_id, value FROM STREAM events IN testdata
        |LIMIT 10""".stripMargin)
    val q = Transformer.transform(stmt, QlSchema(df.schema, Set.empty), now) match {
      case StreamStatement(s) => s
      case other => fail(s"expected stream, got $other")
    }
    val out = graft.engine.Planners.stream(df, Catalog.defs("events"), q, "element_id")
    assert(out.count() == 10)
  }

  test("duplicated_order_by_index.ql: stream ORDER BY tag DESC") {
    val stmt = Parser.parse(
      """SELECT event_id, value FROM STREAM events IN testdata
        |TIME > '-15m' ORDER BY value DESC""".stripMargin)
    Transformer.transform(stmt, schema, now) match {
      case StreamStatement(q) =>
        assert(q.orderBy.contains(OrderBy(Some("value"), desc = true)))
      case other => fail(s"expected stream, got $other")
    }
  }

  // -- trace ----------------------------------------------------------------

  test("trace all.ql: SELECT () empty projection + ORDER BY timestamp DESC") {
    val stmt = Parser.parse(
      """SELECT () FROM TRACE events IN testdata
        |TIME > '-15m' ORDER BY timestamp DESC LIMIT 100""".stripMargin)
    Transformer.transform(stmt, schema, now) match {
      case TraceStatement(q) =>
        assert(q.projection.isEmpty)
        assert(q.orderBy.contains(OrderBy(Some("timestamp"), desc = true)))
        assert(q.limit == 100)
      case other => fail(s"expected trace, got $other")
    }
  }

  test("gen_feat_order_duration_asc_limit2_offset1.ql: trace paging") {
    val stmt = Parser.parse(
      """SELECT trace_id, event_id FROM TRACE events IN testdata TIME > '-15m'
        |ORDER BY duration ASC LIMIT 2 OFFSET 1""".stripMargin)
    Transformer.transform(stmt, schema, now) match {
      case TraceStatement(q) =>
        assert(q.limit == 2 && q.offset == 1)
        assert(q.orderBy.contains(OrderBy(Some("duration"), desc = false)))
      case other => fail(s"expected trace, got $other")
    }
  }

  test("eq_trace_id.ql: trace point lookup executes through the QL facade") {
    val df = events.withColumn("trace_id", pmod(col("event_id"), lit(97L)))
    val out = BydbQL.run(
      """SELECT trace_id FROM TRACE traces IN testdata
        |TIME BETWEEN '2024-01-01T00:00:00Z' AND '2024-02-01T00:00:00Z'
        |WHERE trace_id = '7'""".stripMargin,
      Map("traces" -> BydbQL.Resource(df,
        graft.sources.TableDef("traces", tsCol = Some("ts_ns")),
        traceIdCol = Some("trace_id"), spanStruct = Seq("event_id"))),
      now = now)
    // one trace group, span_count = all events with event_id % 97 == 7
    assert(out.count() == 1)
    assert(out.select("span_count").head().getLong(0) ==
      events.filter(pmod(col("event_id"), lit(97L)) === 7L).count())
  }

  test("multi-group union: IN (g1, g2) schema-merges per-group frames (T6)") {
    import spark.implicits._
    val g1 = Seq((1L, "x", 5.0), (2L, "y", 7.0)).toDF("id", "label", "value")
    val g2 = Seq((3L, 9.0)).toDF("id", "value") // no `tag` column → null-fill
    val out = BydbQL.run(
      "SELECT id, label, value FROM MEASURE m IN (g1, g2) LIMIT 100",
      Map(
        "g1/m" -> BydbQL.Resource(g1, graft.sources.TableDef("m"), fields = Set("value")),
        "g2/m" -> BydbQL.Resource(g2, graft.sources.TableDef("m"), fields = Set("value"))))
    assert(out.count() == 3)
    assert(out.filter(col("label").isNull).count() == 1)
  }

  test("condition_aggr_desc.ql: SHOW TOP with EQ condition over grouped buckets") {
    import graft.engine.Planners
    val buckets = Planners.topNBuckets(events, "ts_ns", "user_id",
      floor(col("value")).cast("long"), intervalMs = 21600000L, n = 2,
      groupCols = Seq("event_type"))
      .withColumnRenamed("bucket_ms", "bucket_start").drop("rank")
    val viaQl = BydbQL.run(
      """SHOW TOP 5 FROM MEASURE events_topn IN testdata
        |WHERE event_type = 'click' AGGREGATE BY MAX ORDER BY DESC""".stripMargin,
      Map("events_topn" -> BydbQL.Resource(buckets,
        graft.sources.TableDef("events_topn"))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val direct = Planners.topNRead(buckets,
      TopNQuery(Seq("testdata"), "events_topn", topN = 5, desc = true,
        agg = Some(AggFn.Max),
        conditions = Seq(Cond("event_type", Op.Eq, Seq("click")))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaQl == direct && viaQl.nonEmpty)
  }

  test("WITH QUERY_TRACE returns the execution trace alongside the rows") {
    val (df, trace) = BydbQL.runTraced(
      "SELECT event_id FROM MEASURE events IN testdata TIME > '-15m' WITH QUERY_TRACE",
      Map("events" -> BydbQL.Resource(events, Catalog.defs("events"),
        fields = Set("value"))), now = now)
    assert(df.columns.toSeq == Seq("event_id"))
    assert(trace.exists(_.spans.nonEmpty))
    val (_, none) = BydbQL.runTraced(
      "SELECT event_id FROM MEASURE events IN testdata TIME > '-15m'",
      Map("events" -> BydbQL.Resource(events, Catalog.defs("events"),
        fields = Set("value"))), now = now)
    assert(none.isEmpty)
  }

  // -- generated families ---------------------------------------------------
  // test/cases/measure/data/input/gen_{tree,leaf,feat,err}_*.ql, registered
  // in test/cases/measure/measure.go:123-170. Statements verbatim modulo
  // schema binding: service_cpm_minute→events, sw_metric→testdata,
  // id→event_type, entity_id→user_id (the entity), value::field→value;
  // time bound widened to cover the testdata span.

  private def ns(i: Instant) = i.getEpochSecond * 1000000000L
  private val rangeLo = ns(now.minusSeconds(30L * 86400))
  private def inRange = col("ts_ns") >= rangeLo && col("ts_ns") < ns(now)

  private def execCount(ql: String): Long =
    graft.engine.Planners.measure(events, Catalog.defs("events"), measureOf(ql)).count()

  private def treeCase(where: String, mirror: org.apache.spark.sql.Column): Unit = {
    val n = execCount(
      s"""SELECT event_type, user_id, value::field FROM MEASURE events IN testdata
         |TIME > '-30d' WHERE $where LIMIT 1000000""".stripMargin)
    assert(n == events.filter(inRange && mirror).count(), where)
  }

  test("gen_tree_depth1_leaf.ql: single leaf criteria") {
    treeCase("event_type = 'click'", col("event_type") === "click")
  }

  test("gen_tree_depth2_and.ql") {
    treeCase("(event_type = 'click' AND user_id = '2')",
      col("event_type") === "click" && col("user_id") === 2L)
  }

  test("gen_tree_depth2_or.ql") {
    treeCase("(event_type = 'click' OR user_id = '2')",
      col("event_type") === "click" || col("user_id") === 2L)
  }

  test("gen_tree_depth3_and_or.ql: AND of ORs") {
    treeCase(
      "((event_type = 'click' OR user_id = '2') AND (event_type = 'error' OR user_id = '4'))",
      (col("event_type") === "click" || col("user_id") === 2L) &&
        (col("event_type") === "error" || col("user_id") === 4L))
  }

  test("gen_tree_depth3_or_and.ql: OR of ANDs") {
    treeCase(
      "((event_type = 'click' AND user_id = '2') OR (event_type = 'error' AND user_id = '4'))",
      (col("event_type") === "click" && col("user_id") === 2L) ||
        (col("event_type") === "error" && col("user_id") === 4L))
  }

  test("gen_tree_depth5_deep_and.ql: depth-5 alternating tree executes") {
    def leaf(t: String, u: Long) = s"(event_type = '$t' OR user_id = '$u')"
    def leafC(t: String, u: Long) = col("event_type") === t || col("user_id") === u
    val (a, b, c) = (leaf("click", 2), leaf("error", 4), leaf("view", 6))
    val (ac, bc, cc) = (leafC("click", 2), leafC("error", 4), leafC("view", 6))
    treeCase(
      s"((($a AND $b) OR ($c AND $a)) AND (($b AND $c) OR ($a AND $b)))",
      ((ac && bc) || (cc && ac)) && ((bc && cc) || (ac && bc)))
  }

  test("gen_tree_depth5_deep_or.ql: conflicting entity ANDs are rejected (WantErr)") {
    // measure.go:157 WantErr — ParseEntities AND-merges two different
    // concrete series keys → nil (parser.go:148-162); the measure planner
    // rejects. The STREAM registration of the same tree passes
    // (stream.go:134), which validateEntityResolvable mirrors by being
    // measure-only.
    def p(t: String, u: Long) = s"(event_type = '$t' AND user_id = '$u')"
    val (p1, p2, p3) = (p("click", 2), p("error", 4), p("view", 6))
    val e = intercept[IllegalArgumentException] {
      execCount(
        s"""SELECT event_type, user_id, value::field FROM MEASURE events IN testdata
           |TIME > '-30d' WHERE ((($p1 OR $p2) AND ($p3 OR $p1))
           |OR (($p2 OR $p3) AND ($p1 OR $p2))) LIMIT 1000000""".stripMargin)
    }
    assert(e.getMessage.contains("conflicting values"))
  }

  test("gen_leaf_eq_int.ql: unquoted int literal") {
    val n = execCount(
      "SELECT event_id, user_id FROM MEASURE events IN testdata TIME > '-30d' WHERE event_id = 5 LIMIT 1000000")
    assert(n == events.filter(inRange && col("event_id") === 5L).count() && n > 0)
  }

  test("gen_leaf_gt_str.ql / gen_leaf_le_str.ql: string range ops") {
    treeCase("event_type > 'click'", col("event_type") > "click")
    treeCase("event_type <= 'error'", col("event_type") <= "error")
  }

  test("gen_leaf_in_int_array.ql: IN over unquoted int list") {
    val n = execCount(
      "SELECT event_id FROM MEASURE events IN testdata TIME > '-30d' WHERE event_id IN (1, 2) LIMIT 1000000")
    assert(n == events.filter(inRange && col("event_id").isin(1L, 2L)).count() && n > 0)
  }

  test("gen_leaf_not_in_str_array.ql") {
    treeCase("event_type NOT IN ('view')", !col("event_type").isin("view"))
  }

  test("gen_leaf_match_str.ql: bare MATCH defaults to standard analyzer, OR") {
    treeCase("event_type MATCH ('click')", col("event_type") === "click")
  }

  test("gen_leaf op × type matrix: every comparison over int and string tags") {
    // measure.go:123-141 registers the full generated matrix; each case
    // executes against an independently-built DataFrame mirror
    val cases: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      ("event_id != 5", col("event_id") =!= 5L),
      ("event_id < 100", col("event_id") < 100L),
      ("event_id > 100", col("event_id") > 100L),
      ("event_id <= 100", col("event_id") <= 100L),
      ("event_id >= 100", col("event_id") >= 100L),
      ("event_type = 'error'", col("event_type") === "error"),
      ("event_type != 'view'", col("event_type") =!= "view"),
      ("event_type < 'error'", col("event_type") < "error"),
      ("event_type >= 'error'", col("event_type") >= "error"),
      ("event_type IN ('click', 'view')", col("event_type").isin("click", "view")),
      ("event_id NOT IN (1, 2, 3)", !col("event_id").isin(1L, 2L, 3L)))
    for ((where, mirror) <- cases) treeCase(where, mirror)
  }

  test("gen_err_match_int.ql: MATCH on an int tag is an error (WantErr)") {
    val e = intercept[IllegalArgumentException] {
      measureOf(
        "SELECT event_id FROM MEASURE events IN testdata TIME > '-30d' WHERE user_id MATCH ('1')")
    }
    assert(e.getMessage.contains("MATCH requires a string tag"))
  }

  test("gen_feat_mean_group_2.ql: MEAN + GROUP BY incl the field") {
    val q = measureOf(
      """SELECT event_type, MEAN(value), value::field FROM MEASURE events IN testdata
        |TIME > '-30d' GROUP BY event_type, value""".stripMargin)
    assert(q.groupByTags == Seq("event_type") && q.agg.contains((AggFn.Mean, "value")))
    val out = graft.engine.Planners.measure(events, Catalog.defs("events"), q)
    assert(out.count() == events.filter(inRange).select("event_type").distinct().count())
  }

  test("gen_feat_{sum,count,max,min}_group_order_desc: agg × bare ORDER BY DESC") {
    for (fn <- Seq("SUM", "COUNT", "MAX", "MIN")) {
      val q = measureOf(
        s"""SELECT event_type, $fn(value), value::field FROM MEASURE events IN testdata
           |TIME > '-30d' GROUP BY event_type, value ORDER BY DESC""".stripMargin)
      assert(q.orderBy.contains(OrderBy(None, desc = true)), fn)
      val out = graft.engine.Planners.measure(events, Catalog.defs("events"), q)
      assert(out.count() ==
        events.filter(inRange).select("event_type").distinct().count(), fn)
    }
    // MAX values against an independent computation (exact on doubles)
    val q = measureOf(
      """SELECT event_type, MAX(value), value::field FROM MEASURE events IN testdata
        |TIME > '-30d' GROUP BY event_type, value ORDER BY DESC""".stripMargin)
    val got = graft.engine.Planners.measure(events, Catalog.defs("events"), q)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = events.filter(inRange).groupBy("event_type").agg(max(col("value")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  test("gen_feat_mean_top_desc_group_order_asc_0.ql: TOP 2 after MEAN") {
    val q = measureOf(
      """SELECT TOP 2 value DESC, event_type, MEAN(value), value::field
        |FROM MEASURE events IN testdata TIME > '-30d'
        |GROUP BY event_type, value ORDER BY ASC""".stripMargin)
    assert(q.top.contains(TopSpec(2, "mean_value", desc = true)))
    assert(graft.engine.Planners.measure(events, Catalog.defs("events"), q).count() == 2)
  }

  test("gen_feat_mean_top_asc_group_order_desc_filter_1.ql: bottom-2 + NE filter") {
    val q = measureOf(
      """SELECT TOP 2 value ASC, event_type, MEAN(value), value::field
        |FROM MEASURE events IN testdata TIME > '-30d'
        |WHERE event_type != 'view' GROUP BY event_type, value ORDER BY DESC""".stripMargin)
    assert(q.top.contains(TopSpec(2, "mean_value", desc = false)))
    assert(q.criteria.contains(Cond("event_type", Op.Ne, Seq("view"))))
    val out = graft.engine.Planners.measure(events, Catalog.defs("events"), q)
    assert(out.count() == 2)
    assert(!out.select("event_type").collect().map(_.getString(0)).contains("view"))
  }

  test("err_invalid_le.yaml: operand-less logical expression rejected (WantErr)") {
    // the reference case is a criteria root that is a logical node with
    // op AND and NO operands (measure.go:76, WantErr "invalid logical
    // expression"). The typed Criteria ADT makes that shape
    // unrepresentable (And requires both children), and the QL surface
    // rejects the textual equivalent — a dangling AND — at parse time.
    val e = intercept[Exception] {
      Parser.parse(
        "SELECT event_id FROM MEASURE events IN testdata TIME > '-15m' WHERE event_type = 'click' AND")
    }
    assert(e.getMessage != null)
    // AND with only whitespace after it inside parens fails the same way
    intercept[Exception] {
      Parser.parse(
        "SELECT event_id FROM MEASURE events IN testdata TIME > '-15m' WHERE (AND)")
    }
  }

  test("stream gen_err_ge_state.ql: range op on a stream ENTITY tag is an error") {
    // `state` is part of the sw stream's entity (streams/duplicated.json:44-47);
    // stream.go:113-117 registers ge/gt/le/lt/ne on it as WantErr — the F6
    // rule: only EQ and IN select series. Binding: user_id is our entity.
    val stmt = Parser.parse(
      "SELECT event_id, user_id FROM STREAM events IN testdata TIME > '-30d' WHERE user_id >= '0'")
    val q = Transformer.transform(stmt, schema, now) match {
      case StreamStatement(s) => s
      case other => fail(s"expected stream, got $other")
    }
    val df = events.withColumn("element_id", col("event_id").cast("string"))
    val e = intercept[IllegalArgumentException] {
      graft.engine.Planners.stream(df, Catalog.defs("events"), q, "element_id")
    }
    assert(e.getMessage.contains("only EQ and IN"))
  }

  test("trace gen_err_match_sw.ql: MATCH on a trace query is an error") {
    val df = events.withColumn("trace_id", pmod(col("event_id"), lit(97L)))
    val e = intercept[IllegalArgumentException] {
      BydbQL.run(
        """SELECT trace_id, event_id FROM TRACE traces IN testdata
          |TIME > '-30d' WHERE event_type MATCH ('click')""".stripMargin,
        Map("traces" -> BydbQL.Resource(df,
          graft.sources.TableDef("traces", tsCol = Some("ts_ns")),
          traceIdCol = Some("trace_id"), spanStruct = Seq("event_id"))),
        now = now)
    }
    assert(e.getMessage.contains("MATCH is not supported on trace"))
  }

  test("trace gen_feat_order_duration_desc_filter_service_eq_limit2_7.ql: IR shape") {
    val stmt = Parser.parse(
      """SELECT () FROM TRACE events IN testdata TIME > '-15m'
        |WHERE event_type = 'click' ORDER BY duration DESC LIMIT 2""".stripMargin)
    Transformer.transform(stmt, schema, now) match {
      case TraceStatement(q) =>
        assert(q.projection.isEmpty)
        assert(q.criteria.contains(Cond("event_type", Op.Eq, Seq("click"))))
        assert(q.orderBy.contains(OrderBy(Some("duration"), desc = true)))
        assert(q.limit == 2)
      case other => fail(s"expected trace, got $other")
    }
  }

  // -- property -------------------------------------------------------------

  private lazy val propLog = {
    import spark.implicits._
    Seq(("m1", 2L, "cfg-a", 30L, false), ("m1", 1L, "old", 10L, false),
      ("m2", 1L, "cfg-b", 20L, false), ("m3", 1L, "cfg-c", 5L, true))
      .toDF("id", "rev", "configuration", "update_time", "deleted")
  }

  private def runProp(ql: String, params: Seq[Any] = Nil) =
    BydbQL.run(ql, Map("ui_menu" -> BydbQL.Resource(propLog,
      graft.sources.TableDef("ui_menu"),
      propertyIdCol = Some("id"), propertyRevCol = Some("rev"),
      propertyDeletedCol = Some("deleted"))), params, now)

  test("property all.ql + tombstone: latest revisions of live docs") {
    val out = runProp("SELECT id, configuration FROM PROPERTY ui_menu IN sw")
    assert(out.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("m1", "cfg-a"), ("m2", "cfg-b"))) // m3 tombstoned, m1 rev2 wins
  }

  test("property order_by_with_limit.ql: ORDER BY tag DESC LIMIT 1") {
    val out = runProp(
      "SELECT id, update_time FROM PROPERTY ui_menu IN sw ORDER BY update_time DESC LIMIT 1")
    assert(out.collect().map(_.getString(0)).toSeq == Seq("m1"))
  }

  test("property query_by_ids.ql: WHERE id = selects by document id") {
    val out = runProp(
      "SELECT id, configuration FROM PROPERTY ui_menu IN sw WHERE id = 'm2'")
    assert(out.collect().map(_.getString(0)).toSeq == Seq("m2"))
  }

  test("property params_bind.ql: positional parameter in criteria") {
    val out = runProp(
      "SELECT id FROM PROPERTY ui_menu IN sw WHERE configuration = ?",
      params = Seq("cfg-b"))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("m2"))
  }
}
