package graft.ql

import java.time.Instant

import graft.SparkSpec
import graft.engine.Planners
import graft.functions.BanyanSemantics
import graft.model._
import graft.sources.{Catalog, TableDef}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Golden-corpus slab: the PROPERTY family (all 10 cases, .ql inputs under
 * test/cases/property/data/input), the TOPN family (all 20 cases, under
 * test/cases/topn/data/input) and the STREAM generated families
 * (17 gen_feat_* + the gen_err_* entity-op matrix,
 * test/cases/stream/data/input). Statements are kept verbatim except
 * resource/tag names, bound to the driver testdata schema:
 *
 *   measure/stream `sw`            → events   (element_id = event_id)
 *   trace_id → event_id · state → user_id (an ENTITY tag, as `state` is in
 *   the sw stream's entity) · service_id → event_type · duration → value ·
 *   start_time → ts_ns · data_binary → props
 *   topn measures → [[Planners.topNBuckets]] frames over events (the
 *   `_top_n_result` shape); declaration-time conditions (eq_svc1 …) become
 *   the filter baked into the registered bucket frame, exactly like the
 *   reference bakes them into the TopNAggregation schema.
 *
 * The reference's 15-minute windows are widened to 30 days so the fixed
 * testdata span (Jan 2024) falls inside; `now` is pinned at 2024-01-20 so
 * the window also EXCLUDES the Jan 20-30 tail (the range still bites).
 * Each executing case is checked against an independently computed
 * DataFrame mirror; property cases assert the want-file row sets verbatim
 * (yaml files under test/cases/property/data/want, docs test1/test2).
 */
class GoldenFamiliesSpec extends SparkSpec {

  import spark.implicits._

  private val now = Instant.parse("2024-01-20T00:00:00Z")
  private def ns(i: Instant) = i.getEpochSecond * 1000000000L
  private lazy val events = Catalog.load(spark, sf0001, "events")

  // == PROPERTY family ======================================================
  // docs from test/cases/property/data/testdata/sw{1,2}.json: two ui_menu
  // documents (test1, test2) with an int update_time

  private lazy val uiMenu = Seq(
    ("1", 1L, "test1", "test1", 1760606198934L, false),
    ("2", 1L, "test2", "test2", 1760606208842L, false))
    .toDF("id", "rev", "menu_name", "configuration", "update_time", "deleted")

  private def runProp(ql: String, params: Seq[Any] = Nil): Seq[Seq[Any]] =
    BydbQL.run(ql, Map("ui_menu" -> BydbQL.Resource(uiMenu, TableDef("ui_menu"),
      propertyIdCol = Some("id"), propertyRevCol = Some("rev"),
      propertyDeletedCol = Some("deleted"))), params, now)
      .collect().map(_.toSeq).toSeq

  private val doc1 = Seq[Any]("test1", "test1", 1760606198934L)
  private val doc2 = Seq[Any]("test2", "test2", 1760606208842L)

  test("property all.ql: both documents, id order") {
    assert(runProp(
      "SELECT menu_name, configuration, update_time FROM PROPERTY ui_menu IN sw") ==
      Seq(doc1, doc2))
  }

  test("property limit.ql: LIMIT 1 returns the lowest id (store id order)") {
    assert(runProp(
      """SELECT menu_name, configuration, update_time FROM PROPERTY ui_menu IN sw
        |LIMIT 1""".stripMargin) == Seq(doc1))
  }

  test("property order_by_asc.ql") {
    assert(runProp(
      "SELECT menu_name, configuration, update_time FROM PROPERTY ui_menu IN sw ORDER BY update_time ASC") ==
      Seq(doc1, doc2))
  }

  test("property order_by_desc.ql") {
    assert(runProp(
      "SELECT menu_name, configuration, update_time FROM PROPERTY ui_menu IN sw ORDER BY update_time DESC") ==
      Seq(doc2, doc1))
  }

  test("property order_by_with_limit.ql") {
    assert(runProp(
      "SELECT menu_name, configuration, update_time FROM PROPERTY ui_menu IN sw ORDER BY update_time DESC LIMIT 1") ==
      Seq(doc2))
  }

  test("property order_without_projection.ql: hidden sort tag (P3)") {
    assert(runProp(
      "SELECT menu_name, configuration FROM PROPERTY ui_menu IN sw ORDER BY update_time ASC") ==
      Seq(Seq[Any]("test1", "test1"), Seq[Any]("test2", "test2")))
  }

  test("property params_bind.ql: positional parameter") {
    assert(runProp(
      """SELECT menu_name, configuration, update_time FROM PROPERTY ui_menu IN sw
        |WHERE menu_name = ?""".stripMargin, params = Seq("test1")) == Seq(doc1))
  }

  test("property query_by_criteria.ql") {
    assert(runProp(
      """SELECT menu_name, configuration, update_time FROM PROPERTY ui_menu IN sw
        |WHERE menu_name = 'test1'""".stripMargin) == Seq(doc1))
  }

  test("property query_by_ids.ql: WHERE id = selects by document id") {
    assert(runProp(
      """SELECT menu_name, configuration, update_time FROM PROPERTY ui_menu IN sw
        |WHERE id = '2'""".stripMargin) == Seq(doc2))
  }

  test("property query_with_order.ql: criteria + order") {
    assert(runProp(
      """SELECT menu_name, configuration, update_time FROM PROPERTY ui_menu IN sw
        |WHERE menu_name = 'test2'
        |ORDER BY update_time ASC""".stripMargin) == Seq(doc2))
  }

  // == TOPN family ==========================================================

  /** `_top_n_result`-shaped frames over events: value = per-bucket sum of
    * the ranked expression, top-100 entities kept per 6h bucket (the
    * `top_bottom_100` rules keep more than the testdata's 150 entities
    * produce per bucket in practice). */
  private def bucketsOf(src: DataFrame, value: Column,
      groupCols: Seq[String] = Nil): DataFrame =
    Planners.topNBuckets(src, "ts_ns", "user_id", value,
      intervalMs = 21600000L, n = 100, groupCols = groupCols)
      .withColumnRenamed("bucket_ms", "bucket_start").drop("rank")

  private lazy val intBuckets = bucketsOf(events, floor(col("value")).cast("long"))
  private lazy val floatBuckets = bucketsOf(events, col("value"))
  private lazy val groupedBuckets =
    bucketsOf(events, floor(col("value")).cast("long"), groupCols = Seq("event_type"))

  private val tLo = Instant.parse("2023-12-21T00:00:00Z").toEpochMilli // now - 30d
  private val tHi = now.toEpochMilli
  private def inWindow = col("bucket_start") >= tLo && col("bucket_start") < tHi

  private def fmt(v: Any): String = v match {
    case d: Double => f"${math.rint(d * 1e6) / 1e6}%.6f"
    case x => String.valueOf(x)
  }

  private def runTopN(ql: String, res: Map[String, BydbQL.Resource],
      params: Seq[Any] = Nil): Seq[(String, String)] =
    BydbQL.run(ql, res, params, now).collect()
      .map(r => (r.getString(0), fmt(r.get(1)))).toSeq

  private def resOf(name: String, df: DataFrame): Map[String, BydbQL.Resource] =
    Map(name -> BydbQL.Resource(df, TableDef(name)))

  /** Independent mirror: group the bucket frame by entity with the named
    * aggregate, rank, cut. Double sums accumulate via DECIMAL(25,6) — the
    * documented exact-accumulation semantic. */
  private def mirrorTopN(buckets: DataFrame, fn: String, desc: Boolean, n: Int,
      cond: Column = lit(true)): Seq[(String, String)] = {
    val base = buckets.filter(inWindow && cond).groupBy("entity")
    val decSum = sum(col("value").cast("decimal(25,6)")).cast("double")
    val agged = fn match {
      case "SUM_L" => base.agg(sum("value").as("v"))
      case "SUM_D" => base.agg(decSum.as("v"))
      case "COUNT_L" => base.agg(count("value").as("v"))
      case "COUNT_D" => base.agg(count("value").cast("double").as("v"))
      case "MAX" => base.agg(max("value").as("v"))
      case "MIN" => base.agg(min("value").as("v"))
      case "MEAN_L" => base.agg(sum("value").as("s"), count("value").as("c"))
        .withColumn("v", when(expr("s DIV c") < 1L, 1L).otherwise(expr("s DIV c")))
      case "MEAN_D" => base.agg(decSum.as("s"), count("value").as("c"))
        .withColumn("v", when(col("s") / col("c") < 1.0, 1.0).otherwise(col("s") / col("c")))
    }
    agged.orderBy(if (desc) col("v").desc else col("v").asc, col("entity").asc)
      .limit(n).collect().map(r => (r.getString(0), fmt(r.getAs[Any]("v")))).toSeq
  }

  test("topn aggr_desc.ql: AGGREGATE BY MAX ORDER BY DESC") {
    val got = runTopN(
      """SHOW TOP 3
        |FROM MEASURE service_instance_cpm_minute_top_bottom_100 IN sw_metric
        |TIME > '-30d'
        |AGGREGATE BY MAX
        |ORDER BY DESC""".stripMargin,
      resOf("service_instance_cpm_minute_top_bottom_100", intBuckets))
    assert(got == mirrorTopN(intBuckets, "MAX", desc = true, 3) && got.size == 3)
  }

  test("topn aggr_version_merged.ql: buckets over a version-merged source") {
    // duplicate every point with version 2 and doubled value: the merge
    // must keep ONLY the v2 rows (T8 before aggregation)
    val dup = events.withColumn("version", lit(1L)).unionByName(
      events.withColumn("value", col("value") * 2).withColumn("version", lit(2L)))
    val merged = BanyanSemantics.latestVersion(dup, Seq("user_id"), "ts_ns", "version")
    val buckets = bucketsOf(merged, floor(col("value")).cast("long"))
    val got = runTopN(
      """SHOW TOP 3
        |FROM MEASURE endpoint_resp_time_minute_top_bottom_100 IN sw_metric
        |TIME > '-30d'
        |AGGREGATE BY MAX
        |ORDER BY DESC""".stripMargin,
      resOf("endpoint_resp_time_minute_top_bottom_100", buckets))
    val doubled = bucketsOf(events.withColumn("value", col("value") * 2),
      floor(col("value")).cast("long"))
    assert(got == mirrorTopN(doubled, "MAX", desc = true, 3) && got.size == 3)
  }

  test("topn condition_aggr_desc.ql: EQ condition over grouped buckets") {
    val got = runTopN(
      """SHOW TOP 1
        |FROM MEASURE service_instance_cpm_minute_top_bottom_100 IN sw_metric
        |TIME > '-30d'
        |WHERE event_type = 'click'
        |AGGREGATE BY MAX
        |ORDER BY DESC""".stripMargin,
      resOf("service_instance_cpm_minute_top_bottom_100", groupedBuckets))
    assert(got == mirrorTopN(groupedBuckets, "MAX", desc = true, 1,
      col("event_type") === "click") && got.size == 1)
  }

  test("topn eq.ql / ne.ql / in.ql / not_in.ql: declaration-time conditions") {
    // the reference bakes these into the TopNAggregation (measures eq_svc1,
    // ne_svc1, in_svc2_svc4, not_in_svc2_svc4); here they are the filter
    // baked into the registered bucket frame
    val conds: Seq[(String, Column)] = Seq(
      ("eq_svc1", col("event_type") === "click"),
      ("ne_svc1", col("event_type") =!= "click"),
      ("in_svc2_svc4", col("event_type").isin("view", "error")),
      ("not_in_svc2_svc4", !col("event_type").isin("view", "error")))
    for ((name, c) <- conds) {
      val frame = groupedBuckets.filter(c)
      val got = runTopN(
        s"""SHOW TOP 2
           |FROM MEASURE $name IN sw_metric
           |TIME > '-30d'
           |AGGREGATE BY MAX
           |ORDER BY DESC""".stripMargin, resOf(name, frame))
      assert(got == mirrorTopN(frame, "MAX", desc = true, 2) && got.size == 2, name)
    }
  }

  test("topn null_group.ql: WHERE tag = NULL matches null group tags") {
    val src = events.withColumn("maybe_uri",
      when(pmod(col("user_id"), lit(3L)) === 0L, lit(null).cast("string"))
        .otherwise(col("event_type")))
    val buckets = bucketsOf(src, floor(col("value")).cast("long"),
      groupCols = Seq("maybe_uri"))
    val got = runTopN(
      """SHOW TOP 3
        |FROM MEASURE service_instance_endpoint_cpm_minute_top_bottom_100 IN sw_metric
        |TIME > '-30d'
        |WHERE maybe_uri = NULL
        |AGGREGATE BY MAX
        |ORDER BY DESC""".stripMargin,
      resOf("service_instance_endpoint_cpm_minute_top_bottom_100", buckets))
    assert(got == mirrorTopN(buckets, "MAX", desc = true, 3,
      col("maybe_uri").isNull) && got.size == 3)
  }

  test("topn params_bind.ql: TOP ?, TIME > ?, WHERE = ? all bind") {
    val got = runTopN(
      """SHOW TOP ?
        |FROM MEASURE service_instance_cpm_minute_top_bottom_100 IN sw_metric
        |TIME > ?
        |WHERE event_type = ?
        |AGGREGATE BY MAX
        |ORDER BY DESC""".stripMargin,
      resOf("service_instance_cpm_minute_top_bottom_100", groupedBuckets),
      params = Seq(3L, "-30d", "click"))
    assert(got == mirrorTopN(groupedBuckets, "MAX", desc = true, 3,
      col("event_type") === "click") && got.size == 3)
  }

  test("topn multi_group_aggr_desc.ql: IN sw_metric, sw_updated merges groups") {
    val even = intBuckets.filter(pmod(expr("bucket_start DIV 21600000"), lit(2L)) === 0L)
    val odd = intBuckets.filter(pmod(expr("bucket_start DIV 21600000"), lit(2L)) === 1L)
    val got = runTopN(
      """SHOW TOP 3
        |FROM MEASURE service_instance_cpm_minute_top_bottom_100 IN sw_metric, sw_updated
        |TIME > '-30d'
        |AGGREGATE BY MAX
        |ORDER BY DESC""".stripMargin,
      Map(
        "sw_metric/service_instance_cpm_minute_top_bottom_100" ->
          BydbQL.Resource(even, TableDef("service_instance_cpm_minute_top_bottom_100")),
        "sw_updated/service_instance_cpm_minute_top_bottom_100" ->
          BydbQL.Resource(odd, TableDef("service_instance_cpm_minute_top_bottom_100"))))
    assert(got == mirrorTopN(intBuckets, "MAX", desc = true, 3) && got.size == 3)
  }

  test("topn float_{count,max,mean,min,sum}_aggr: FLOAT metric aggregate matrix") {
    val cases = Seq(
      // (case file, AGGREGATE BY, ORDER BY, n, mirror fn)
      ("float_count_aggr_desc", "COUNT", "DESC", 3, "COUNT_D"),
      ("float_max_aggr_desc", "MAX", "DESC", 3, "MAX"),
      ("float_mean_aggr_desc", "MEAN", "DESC", 3, "MEAN_D"),
      ("float_min_aggr_asc", "MIN", "ASC", 3, "MIN"),
      ("float_sum_aggr_desc", "SUM", "DESC", 3, "SUM_D"))
    for ((name, agg, dir, n, mfn) <- cases) {
      val got = runTopN(
        s"""SHOW TOP $n
           |FROM MEASURE service_instance_float_metric_top_bottom_3 IN sw_metric
           |TIME > '-30d'
           |AGGREGATE BY $agg
           |ORDER BY $dir""".stripMargin,
        resOf("service_instance_float_metric_top_bottom_3", floatBuckets))
      assert(got == mirrorTopN(floatBuckets, mfn, dir == "DESC", n) &&
        got.size == n, name)
    }
  }

  test("topn topn_{count,max,mean,min,sum}.ql: INT metric aggregate matrix") {
    val cases = Seq(
      ("topn_count", "COUNT", "DESC", 3, "COUNT_L"),
      ("topn_max", "MAX", "DESC", 3, "MAX"),
      ("topn_mean", "MEAN", "DESC", 2, "MEAN_L"),
      ("topn_min", "MIN", "ASC", 3, "MIN"),
      ("topn_sum", "SUM", "DESC", 3, "SUM_L"))
    for ((name, agg, dir, n, mfn) <- cases) {
      val got = runTopN(
        s"""SHOW TOP $n
           |FROM MEASURE topn_agg_test IN sw_metric
           |TIME > '-30d'
           |AGGREGATE BY $agg
           |ORDER BY $dir""".stripMargin, resOf("topn_agg_test", intBuckets))
      assert(got == mirrorTopN(intBuckets, mfn, dir == "DESC", n) &&
        got.size == n, name)
    }
  }

  // == STREAM generated families ===========================================

  private lazy val swStream = events.withColumn("element_id",
    col("event_id").cast("string"))
  /** the `updated` group: a disjoint second slice (shifted ids, +1 value). */
  private lazy val swUpdated = events
    .withColumn("event_id", col("event_id") + 10000000L)
    .withColumn("value", col("value") + 1.0)
    .withColumn("element_id", col("event_id").cast("string"))

  private lazy val swRes = Map(
    "default/sw" -> BydbQL.Resource(swStream, Catalog.defs("events"),
      elementIdCol = Some("element_id")),
    "updated/sw" -> BydbQL.Resource(swUpdated, Catalog.defs("events"),
      elementIdCol = Some("element_id")))

  /** proj_all after binding (the reference's 18 sw tags collapse to the
    * events schema) and proj_explicit (trace_id, service_id, state,
    * duration, data_binary). */
  private val ProjAllCols = Seq("event_id", "user_id", "event_type", "value", "ts_ns", "props")
  private val ProjExplCols = Seq("event_id", "event_type", "user_id", "value", "props")
  private def sel(cols: Seq[String]) = cols.mkString(", ")

  private def runSw(ql: String): Seq[Seq[Any]] =
    BydbQL.run(ql, swRes, Nil, now).collect().map(_.toSeq).toSeq

  /** Independent mirror of the stream path: time window → filter → total
    * order (primary ± then (ts, entity) asc tiebreaks) → offset/limit →
    * project. Element dedup is a no-op here (element ids are unique). */
  private def mirrorSw(df: DataFrame, filter: Column, order: Option[(String, Boolean)],
      limit: Int, offset: Int, proj: Seq[String]): Seq[Seq[Any]] = {
    val inR = col("ts_ns") >= ns(now.minusSeconds(30L * 86400)) && col("ts_ns") < ns(now)
    val ord: Seq[Column] = order match {
      case Some(("ts_ns", desc)) =>
        Seq(if (desc) col("ts_ns").desc else col("ts_ns").asc,
          col("ts_ns").asc, col("user_id").asc)
      case Some((c, desc)) =>
        Seq(if (desc) col(c).desc else col(c).asc,
          col("ts_ns").asc, col("user_id").asc)
      case None => Seq(col("ts_ns").asc, col("user_id").asc)
    }
    var out = df.filter(inR && filter).orderBy(ord: _*)
    if (offset > 0) out = out.offset(offset)
    out.limit(limit).select(proj.map(col): _*).collect().map(_.toSeq).toSeq
  }

  test("stream gen_feat none/ts/duration × filter × paging × projection matrix") {
    // the 14 single-group gen_feat_*.ql cases, statements verbatim modulo
    // binding; each checked against the mirror
    val cases: Seq[(String, String, Column, Option[(String, Boolean)], Int, Int, Seq[String])] = Seq(
      ("gen_feat_none_filter_none_limit2_proj_explicit_group_single_0",
        s"SELECT ${sel(ProjExplCols)} FROM STREAM sw IN default TIME > '-30d' LIMIT 2",
        lit(true), None, 2, 0, ProjExplCols),
      ("gen_feat_ts_asc_filter_none_limit5_offset1_proj_all_group_single_1",
        s"SELECT ${sel(ProjAllCols)} FROM STREAM sw IN default TIME > '-30d' ORDER BY TIME ASC LIMIT 5 OFFSET 1",
        lit(true), Some(("ts_ns", false)), 5, 1, ProjAllCols),
      ("gen_feat_ts_desc_filter_none_limit2_offset3_proj_all_group_single_2",
        s"SELECT ${sel(ProjAllCols)} FROM STREAM sw IN default TIME > '-30d' ORDER BY TIME DESC LIMIT 2 OFFSET 3",
        lit(true), Some(("ts_ns", true)), 2, 3, ProjAllCols),
      ("gen_feat_duration_asc_filter_none_limit2_offset1_proj_explicit_group_single_3",
        s"SELECT ${sel(ProjExplCols)} FROM STREAM sw IN default TIME > '-30d' ORDER BY value ASC LIMIT 2 OFFSET 1",
        lit(true), Some(("value", false)), 2, 1, ProjExplCols),
      ("gen_feat_duration_desc_filter_none_limit2_proj_all_group_single_4",
        s"SELECT ${sel(ProjAllCols)} FROM STREAM sw IN default TIME > '-30d' ORDER BY value DESC LIMIT 2",
        lit(true), Some(("value", true)), 2, 0, ProjAllCols),
      ("gen_feat_ts_asc_filter_none_limit2_proj_explicit_group_single_5",
        s"SELECT ${sel(ProjExplCols)} FROM STREAM sw IN default TIME > '-30d' ORDER BY TIME ASC LIMIT 2",
        lit(true), Some(("ts_ns", false)), 2, 0, ProjExplCols),
      ("gen_feat_ts_desc_filter_none_limit2_proj_explicit_group_single_6",
        s"SELECT ${sel(ProjExplCols)} FROM STREAM sw IN default TIME > '-30d' ORDER BY TIME DESC LIMIT 2",
        lit(true), Some(("ts_ns", true)), 2, 0, ProjExplCols),
      ("gen_feat_duration_asc_filter_none_limit2_proj_all_group_single_7",
        s"SELECT ${sel(ProjAllCols)} FROM STREAM sw IN default TIME > '-30d' ORDER BY value ASC LIMIT 2",
        lit(true), Some(("value", false)), 2, 0, ProjAllCols),
      ("gen_feat_none_filter_none_limit2_proj_all_group_single_8",
        s"SELECT ${sel(ProjAllCols)} FROM STREAM sw IN default TIME > '-30d' LIMIT 2",
        lit(true), None, 2, 0, ProjAllCols),
      ("gen_feat_none_filter_none_proj_explicit_group_single_9",
        s"SELECT ${sel(ProjExplCols)} FROM STREAM sw IN default TIME > '-30d'",
        lit(true), None, 100, 0, ProjExplCols),
      ("gen_feat_ts_asc_filter_service_eq_limit2_proj_all_group_single_10",
        s"SELECT ${sel(ProjAllCols)} FROM STREAM sw IN default TIME > '-30d' WHERE event_type = 'click' ORDER BY TIME ASC LIMIT 2",
        col("event_type") === "click", Some(("ts_ns", false)), 2, 0, ProjAllCols),
      ("gen_feat_ts_desc_filter_state_eq_limit5_offset1_proj_explicit_group_single_11",
        s"SELECT ${sel(ProjExplCols)} FROM STREAM sw IN default TIME > '-30d' WHERE user_id = 1 ORDER BY TIME DESC LIMIT 5 OFFSET 1",
        col("user_id") === 1L, Some(("ts_ns", true)), 5, 1, ProjExplCols),
      ("gen_feat_duration_asc_filter_duration_range_limit5_offset3_proj_all_group_single_12",
        s"SELECT ${sel(ProjAllCols)} FROM STREAM sw IN default TIME > '-30d' WHERE (value > 30 AND value < 1000) ORDER BY value ASC LIMIT 5 OFFSET 3",
        col("value") > 30.0 && col("value") < 1000.0, Some(("value", false)), 5, 3, ProjAllCols),
      ("gen_feat_duration_desc_filter_none_limit2_proj_explicit_group_single_13",
        s"SELECT ${sel(ProjExplCols)} FROM STREAM sw IN default TIME > '-30d' ORDER BY value DESC LIMIT 2",
        lit(true), Some(("value", true)), 2, 0, ProjExplCols),
      ("gen_feat_duration_asc_filter_service_eq_proj_explicit_group_single_14",
        s"SELECT ${sel(ProjExplCols)} FROM STREAM sw IN default TIME > '-30d' WHERE event_type = 'click' ORDER BY value ASC",
        col("event_type") === "click", Some(("value", false)), 100, 0, ProjExplCols),
      ("gen_feat_ts_asc_filter_state_eq_proj_all_group_single_16",
        s"SELECT ${sel(ProjAllCols)} FROM STREAM sw IN default TIME > '-30d' WHERE user_id = 1 ORDER BY TIME ASC",
        col("user_id") === 1L, Some(("ts_ns", false)), 100, 0, ProjAllCols))
    for ((name, ql, filter, order, limit, offset, proj) <- cases) {
      val got = runSw(ql)
      val want = mirrorSw(swStream, filter, order, limit, offset, proj)
      assert(got == want && got.nonEmpty, name)
    }
  }

  test("stream gen_feat_duration_desc_filter_duration_range_proj_all_group_multi_15.ql") {
    val got = runSw(
      s"""SELECT ${sel(ProjAllCols)} FROM STREAM sw IN default, updated
         |TIME > '-30d'
         |WHERE (value > 30 AND value < 1000)
         |ORDER BY value DESC""".stripMargin)
    val want = mirrorSw(swStream.unionByName(swUpdated),
      col("value") > 30.0 && col("value") < 1000.0,
      Some(("value", true)), 100, 0, ProjAllCols)
    assert(got == want && got.nonEmpty)
  }

  test("stream gen_err_{gt,ge,lt,le,ne,not_in} on an entity tag (WantErr matrix)") {
    // stream.go:113-117 registers every non-EQ/IN op on `state` (an entity
    // tag) as WantErr — the F6 rule. Binding: user_id is our entity.
    val preds = Seq("user_id > '0'", "user_id >= '0'", "user_id < '9'",
      "user_id <= '9'", "user_id != '1'", "user_id NOT IN ('1', '2')")
    for (p <- preds) {
      val e = intercept[IllegalArgumentException] {
        runSw(s"SELECT event_id FROM STREAM sw IN default TIME > '-30d' WHERE $p")
      }
      assert(e.getMessage.contains("only EQ and IN"), p)
    }
  }
}
