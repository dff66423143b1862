package graft.ql

import java.time.Instant

import graft.SparkSpec
import graft.sources.{Catalog, TableDef}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Golden-corpus slab: the hand-written MEASURE family (test/cases/measure/
 * data/input — the named cases beyond the gen_* matrices ported earlier).
 * Statements are kept verbatim except resource/tag names, bound to the
 * driver testdata schema:
 *
 *   measure `service_cpm_minute` etc. → events ·
 *   id/entity_id (entity tags) → user_id · service_id/name → event_type ·
 *   total/value (fields) → value (the one field) · layer → user_id
 *
 * The reference's 15-minute windows widen to 30 days with `now` pinned at
 * 2024-01-20 (the GoldenFamiliesSpec convention: the testdata's Jan 2024
 * span falls inside, the Jan 20-31 tail is excluded so the range bites).
 * Every executing case is checked against an independently computed
 * DataFrame mirror using the same windows/tiebreak rules the planner
 * documents (orderCols: primary ± then (ts, entity) asc).
 */
class GoldenMeasureFamilySpec extends SparkSpec {

  private val now = Instant.parse("2024-01-20T00:00:00Z")
  private def ns(i: Instant) = i.getEpochSecond * 1000000000L
  private val tLo = ns(now.minusSeconds(30L * 86400))
  private val tHi = ns(now)

  private lazy val events = Catalog.load(spark, sf0001, "events")
  private lazy val inWin =
    events.filter(col("ts_ns") >= tLo && col("ts_ns") < tHi)

  private val tdef = Catalog.defs("events")
  private def resOf(df: DataFrame = events, td: TableDef = tdef,
      indexMode: Boolean = false): Map[String, BydbQL.Resource] =
    Map("events" -> BydbQL.Resource(df, td, fields = Set("value"),
      indexMode = indexMode))

  private def run(ql: String,
      r: Map[String, BydbQL.Resource] = resOf()): Seq[Seq[Any]] =
    BydbQL.run(ql, r, Nil, now).collect().map(_.toSeq).toSeq

  /** default total order: ts asc then entity asc (Planners.orderCols). */
  private val defaultOrd: Seq[Column] = Seq(col("ts_ns").asc, col("user_id").asc)
  private def tagOrd(tag: String, desc: Boolean): Seq[Column] =
    Seq(if (desc) col(tag).desc else col(tag).asc, col("ts_ns").asc, col("user_id").asc)

  private def mirror(filter: Column, ord: Seq[Column], proj: Seq[String],
      limit: Int = 100, offset: Int = 0, src: DataFrame = inWin): Seq[Seq[Any]] = {
    var d = src.filter(filter).orderBy(ord: _*)
    if (offset > 0) d = d.offset(offset)
    d.limit(limit).select(proj.map(col): _*).collect().map(_.toSeq).toSeq
  }

  /** MEAN over the double field: DECIMAL(25,6)-exact sum / count with the
    * <1 → 1 clamp (A2 float branch) — same expression the planner builds,
    * so equality is exact. */
  private def meanD = {
    val m = sum(col("value").cast("decimal(25,6)")).cast("double") / count(col("value"))
    when(m < 1.0, lit(1.0)).otherwise(m)
  }
  private def sumD = sum(col("value").cast("decimal(25,6)")).cast("double")

  // -- plain filters --------------------------------------------------------

  test("tag_filter.ql: EQ on a hidden-from-entity tag + field projection") {
    assert(run(
      """SELECT event_type, value::field FROM MEASURE events IN sw_metric
        |TIME > '-30d' WHERE event_type = 'click'""".stripMargin) ==
      mirror(col("event_type") === "click", defaultOrd, Seq("event_type", "value")))
  }

  test("tag_filter_ne.ql: NE filter") {
    assert(run(
      """SELECT event_id, user_id, value FROM MEASURE events IN sw_metric
        |TIME > '-30d' WHERE event_type != 'click'""".stripMargin) ==
      mirror(col("event_type") =!= "click", defaultOrd,
        Seq("event_id", "user_id", "value")))
  }

  test("tag_filter_ge.ql: string GE filter") {
    assert(run(
      """SELECT event_id, event_type, value FROM MEASURE events IN sw_metric
        |TIME > '-30d' WHERE event_type >= 'scroll'""".stripMargin) ==
      mirror(col("event_type") >= "scroll", defaultOrd,
        Seq("event_id", "event_type", "value")))
  }

  test("tag_filter_int.ql: int-literal EQ") {
    assert(run(
      """SELECT event_id, value FROM MEASURE events IN sw_metric
        |TIME > '-30d' WHERE user_id = 7""".stripMargin) ==
      mirror(col("user_id") === 7L, defaultOrd, Seq("event_id", "value")))
  }

  test("complex_and_or.ql: (EQ AND entity EQ) OR entity EQ") {
    assert(run(
      """SELECT event_id, user_id, value FROM MEASURE events IN sw_metric
        |TIME > '-30d'
        |WHERE (event_type = 'click' AND user_id = 1) OR user_id = 6""".stripMargin) ==
      mirror((col("event_type") === "click" && col("user_id") === 1L) ||
        col("user_id") === 6L, defaultOrd, Seq("event_id", "user_id", "value")))
  }

  test("linked_or.ql: chained ORs incl a no-match branch") {
    assert(run(
      """SELECT event_id, user_id, value FROM MEASURE events IN sw_metric
        |TIME > '-30d'
        |WHERE user_id = 4 OR (user_id = 5 OR user_id = 999999)""".stripMargin) ==
      mirror(col("user_id").isin(4L, 5L), defaultOrd,
        Seq("event_id", "user_id", "value")))
  }

  // -- paging / ordering ----------------------------------------------------

  test("limit.ql: LIMIT 1 OFFSET 3 in default time order") {
    assert(run(
      """SELECT user_id, value::field FROM MEASURE events IN sw_metric
        |TIME > '-30d' LIMIT 1 OFFSET 3""".stripMargin) ==
      mirror(lit(true), defaultOrd, Seq("user_id", "value"), limit = 1, offset = 3))
  }

  test("offset_empty.ql: OFFSET beyond the result set is empty") {
    assert(run(
      """SELECT event_type FROM MEASURE events IN sw_metric
        |TIME > '-30d' GROUP BY event_type LIMIT 10 OFFSET 6""".stripMargin).isEmpty)
  }

  test("order_tag_asc.ql / order_tag_desc.ql: ORDER BY tag with (ts, entity) ties") {
    assert(run(
      """SELECT event_type FROM MEASURE events IN sw_metric
        |TIME > '-30d' ORDER BY event_type ASC""".stripMargin) ==
      mirror(lit(true), tagOrd("event_type", desc = false), Seq("event_type")))
    assert(run(
      """SELECT event_type FROM MEASURE events IN sw_metric
        |TIME > '-30d' ORDER BY event_type DESC""".stripMargin) ==
      mirror(lit(true), tagOrd("event_type", desc = true), Seq("event_type")))
  }

  test("no_field.ql: tag-only projection with filter") {
    assert(run(
      """SELECT event_type FROM MEASURE events IN sw_metric
        |TIME > '-30d' WHERE event_type = 'view'""".stripMargin) ==
      mirror(col("event_type") === "view", defaultOrd, Seq("event_type")))
  }

  // -- group/agg matrix -----------------------------------------------------

  private def groupedMirror(agg: Column, filter: Column = lit(true)): Set[Seq[Any]] =
    inWin.filter(filter).groupBy("event_type").agg(agg.as("v"))
      .collect().map(_.toSeq).toSet

  test("group_count.ql: COUNT on the float field emits double (W8)") {
    assert(run(
      """SELECT event_type, value::field, COUNT(value) FROM MEASURE events IN sw_metric
        |TIME > '-30d' GROUP BY event_type, value""".stripMargin).toSet ==
      groupedMirror(count(col("value")).cast("double")))
  }

  test("group_mean.ql: MEAN with exact accumulation + clamp") {
    assert(run(
      """SELECT event_type, value::field, MEAN(value) FROM MEASURE events IN sw_metric
        |TIME > '-30d' GROUP BY event_type, value""".stripMargin).toSet ==
      groupedMirror(meanD))
  }

  test("group_min.ql / group_max.ql executing") {
    assert(run(
      """SELECT event_type, value::field, MIN(value) FROM MEASURE events IN sw_metric
        |TIME > '-30d' GROUP BY event_type, value""".stripMargin).toSet ==
      groupedMirror(min(col("value"))))
    assert(run(
      """SELECT event_type, value::field, MAX(value) FROM MEASURE events IN sw_metric
        |TIME > '-30d' GROUP BY event_type, value""".stripMargin).toSet ==
      groupedMirror(max(col("value"))))
  }

  test("group_sum.ql: SUM via DECIMAL(25,6) exact accumulation") {
    assert(run(
      """SELECT event_type, value::field, SUM(value) FROM MEASURE events IN sw_metric
        |TIME > '-30d' GROUP BY event_type, value""".stripMargin).toSet ==
      groupedMirror(sumD))
  }

  test("group_sum_with_filter.ql: NE filter feeds the aggregation") {
    assert(run(
      """SELECT event_type, value::field, SUM(value) FROM MEASURE events IN sw_metric
        |TIME > '-30d' WHERE event_type != 'error' GROUP BY event_type, value""".stripMargin).toSet ==
      groupedMirror(sumD, col("event_type") =!= "error"))
  }

  test("group_no_field.ql: GROUP BY w/o agg is first-seen rows (A5)") {
    val got = run(
      """SELECT event_type FROM MEASURE events IN sw_metric
        |TIME > '-30d' GROUP BY event_type""".stripMargin)
    val want = inWin.select("event_type").distinct()
      .collect().map(_.toSeq).toSet
    assert(got.toSet == want && got.size == want.size)
  }

  test("float_agg_min.ql: agg w/o GROUP BY is a scalar reduce (A6)") {
    assert(run(
      """SELECT value::field, MIN(value) FROM MEASURE events IN sw_metric
        |TIME > '-30d'""".stripMargin) ==
      Seq(Seq[Any](inWin.agg(min("value")).head.getDouble(0))))
  }

  // -- TOP variants ---------------------------------------------------------

  test("bottom.ql: TOP n ASC after MEAN = bottom-n groups") {
    val got = run(
      """SELECT TOP 2 value ASC, event_type, value::field, MEAN(value)
        |FROM MEASURE events IN sw_metric
        |TIME > '-30d' GROUP BY event_type, value""".stripMargin)
    val want = inWin.groupBy("event_type").agg(meanD.as("mean_value"))
      .orderBy(col("mean_value").asc, col("event_type").asc).limit(2)
      .collect().map(_.toSeq).toSeq
    assert(got == want && got.size == 2)
  }

  test("float_top.ql: raw TOP n DESC without agg") {
    val others = events.columns.filterNot(_ == "value").map(col(_).asc).toSeq
    val got = run(
      """SELECT TOP 3 value DESC, event_id, event_type, value::field
        |FROM MEASURE events IN sw_metric TIME > '-30d'""".stripMargin)
    val want = inWin.orderBy(col("value").desc +: others: _*).limit(3)
      .select("event_id", "event_type", "value").collect().map(_.toSeq).toSeq
    assert(got == want && got.size == 3)
  }

  // cases: float_top_count.ql · float_top_mean.ql · float_top_sum.ql
  test("float_top_{count,mean,sum}.ql: TOP n DESC over the agg output") {
    val cases: Seq[(String, Column)] = Seq(
      ("COUNT", count(col("value")).cast("double")),
      ("MEAN", meanD), ("SUM", sumD))
    for ((fn, agg) <- cases) {
      val got = run(
        s"""SELECT TOP 3 value DESC, event_type, value::field, $fn(value)
           |FROM MEASURE events IN sw_metric
           |TIME > '-30d' GROUP BY event_type, value""".stripMargin)
      val want = inWin.groupBy("event_type").agg(agg.as("v"))
        .orderBy(col("v").desc, col("event_type").asc).limit(3)
        .collect().map(_.toSeq).toSeq
      assert(got == want && got.size == 3, fn)
    }
  }

  // -- MATCH ----------------------------------------------------------------

  test("match_node.ql: single-token MATCH") {
    assert(run(
      """SELECT event_type FROM MEASURE events IN sw_metric
        |TIME > '-30d' WHERE event_type MATCH('click')""".stripMargin) ==
      mirror(col("event_type") === "click", defaultOrd, Seq("event_type")))
  }

  test("match_nodes.ql: multi-token OR MATCH hits several values") {
    val got = run(
      """SELECT event_type FROM MEASURE events IN sw_metric
        |TIME > '-30d' WHERE event_type MATCH('click view', '', 'OR')""".stripMargin)
    assert(got == mirror(col("event_type").isin("click", "view"), defaultOrd,
      Seq("event_type")))
    assert(got.flatten.toSet == Set("click", "view"))
  }

  // -- multi-group ----------------------------------------------------------

  /** second group's slice: ids AND timestamps shifted (+1 ns) so the union
    * has no (ts, entity) ties and the default total order is unambiguous. */
  private lazy val updatedSlice = events
    .withColumn("event_id", col("event_id") + 10000000L)
    .withColumn("ts_ns", col("ts_ns") + 1L)
    .withColumn("extra_tag", concat(lit("x-"), col("event_type")))
    .withColumn("extra_field", col("value") * 2)

  test("multi_group_unchanged.ql: identical schemas union seamlessly") {
    val r = Map(
      "sw_metric/events" -> BydbQL.Resource(events, tdef, fields = Set("value")),
      "sw_updated/events" -> BydbQL.Resource(
        events.withColumn("event_id", col("event_id") + 10000000L),
        tdef, fields = Set("value")))
    val got = run(
      """SELECT user_id, value::field FROM MEASURE events IN sw_metric, sw_updated
        |TIME > '-30d' LIMIT 300""".stripMargin, r)
    val want = mirror(lit(true), defaultOrd, Seq("user_id", "value"), limit = 300,
      src = inWin.unionByName(inWin))
    assert(got == want && got.size == 300)
  }

  test("multi_group_new_tag_field.ql: new tag AND new field null-fill (T6)") {
    val r = Map(
      "sw_metric/events" -> BydbQL.Resource(events, tdef, fields = Set("value")),
      "sw_updated/events" -> BydbQL.Resource(updatedSlice, tdef,
        fields = Set("value", "extra_field")))
    val got = run(
      """SELECT user_id, extra_tag, value::field, extra_field::field
        |FROM MEASURE events IN sw_metric, sw_updated
        |TIME > '-30d' LIMIT 300""".stripMargin, r)
    val merged = inWin.withColumn("extra_tag", lit(null).cast("string"))
      .withColumn("extra_field", lit(null).cast("double"))
      .unionByName(updatedSlice.filter(col("ts_ns") >= tLo && col("ts_ns") < tHi))
    val want = mirror(lit(true), defaultOrd,
      Seq("user_id", "extra_tag", "value", "extra_field"), limit = 300, src = merged)
    assert(got == want && got.size == 300)
    // rows from the first group carry nulls for the new tag/field
    assert(got.exists(r => r(1) == null && r(3) == null))
    assert(got.exists(r => r(1) != null && r(3) != null))
  }

  // -- version dedup vs index mode -----------------------------------------

  /** events duplicated at version 2 with doubled values — the regular
    * measure path must serve ONLY v2; index mode serves both. */
  private lazy val dupDf = events.withColumn("version", lit(1L)).unionByName(
    events.withColumn("value", col("value") * 2).withColumn("version", lit(2L)))
  private val dupDef = tdef.copy(versionCol = Some("version"))

  test("duplicated_part.ql: latest-version-wins through the QL facade (T8)") {
    val got = run(
      """SELECT user_id, value FROM MEASURE events IN exception
        |TIME > '-30d' WHERE user_id = 3""".stripMargin, resOf(dupDf, dupDef))
    val want = mirror(col("user_id") === 3L, defaultOrd, Seq("user_id", "value"),
      src = inWin.withColumn("value", col("value") * 2))
    assert(got == want && got.nonEmpty)
  }

  test("raw TOP ranking an unprojected field survives version dedup") {
    // the dedup payload prune must keep the TOP rank field even though
    // the projection doesn't mention it
    val got = run(
      """SELECT TOP 3 value DESC, event_id FROM MEASURE events IN exception
        |TIME > '-30d'""".stripMargin, resOf(dupDf, dupDef))
    val doubled = inWin.withColumn("value", col("value") * 2)
    val want = doubled
      .orderBy(col("value").desc, col("user_id").asc, col("ts_ns").asc, col("event_id").asc)
      .limit(3).select("event_id").collect().map(_.toSeq).toSeq
    assert(got == want && got.size == 3)
  }

  test("index_mode_all.ql: index mode skips the version merge (S2)") {
    val got = run(
      """SELECT user_id, value FROM MEASURE events IN index_mode
        |TIME > '-30d' WHERE user_id = 3 LIMIT 100000""".stripMargin,
      resOf(dupDf, dupDef, indexMode = true))
    val base = inWin.filter(col("user_id") === 3L).count()
    assert(got.size == 2 * base) // both versions visible
  }

  test("index_mode_by_id.ql / entity.ql: entity EQ") {
    assert(run(
      """SELECT event_id, event_type, value FROM MEASURE events IN index_mode
        |TIME > '-30d' WHERE user_id = 1""".stripMargin,
      resOf(indexMode = true)) ==
      mirror(col("user_id") === 1L, defaultOrd, Seq("event_id", "event_type", "value")))
  }

  test("entity_in.ql: entity IN") {
    assert(run(
      """SELECT event_id, user_id FROM MEASURE events IN index_mode
        |TIME > '-30d' WHERE user_id IN (1, 2)""".stripMargin,
      resOf(indexMode = true)) ==
      mirror(col("user_id").isin(1L, 2L), defaultOrd, Seq("event_id", "user_id")))
  }

  test("entity_service.ql: entity EQ AND tag EQ") {
    assert(run(
      """SELECT event_id, event_type FROM MEASURE events IN index_mode
        |TIME > '-30d' WHERE event_type = 'click' AND user_id = 1""".stripMargin,
      resOf(indexMode = true)) ==
      mirror(col("event_type") === "click" && col("user_id") === 1L,
        defaultOrd, Seq("event_id", "event_type")))
  }

  test("index_mode_le.ql / index_mode_range.ql: int range ops on a NON-entity tag") {
    // range ops stay restricted to non-entity tags even in index mode
    // (the F6 rule is about series keys, not the storage mode) — the
    // reference's `layer` is an ordinary int tag; ours is event_id
    // data-driven cut so both sides are non-empty
    val cut = inWin.agg(expr("percentile_approx(event_id, 0.5)")).head.getLong(0)
    assert(run(
      s"""SELECT event_id, user_id FROM MEASURE events IN index_mode
         |TIME > '-30d' WHERE event_id <= $cut""".stripMargin,
      resOf(indexMode = true)) ==
      mirror(col("event_id") <= cut, defaultOrd, Seq("event_id", "user_id")))
    assert(run(
      s"""SELECT event_id, user_id FROM MEASURE events IN index_mode
         |TIME > '-30d' WHERE event_id > $cut""".stripMargin,
      resOf(indexMode = true)) ==
      mirror(col("event_id") > cut, defaultOrd, Seq("event_id", "user_id")))
  }

  test("index_mode_ne.ql: NE in index mode") {
    assert(run(
      """SELECT event_id, event_type FROM MEASURE events IN index_mode
        |TIME > '-30d' WHERE event_type != 'click'""".stripMargin,
      resOf(indexMode = true)) ==
      mirror(col("event_type") =!= "click", defaultOrd, Seq("event_id", "event_type")))
  }

  test("index_mode_none.ql: unmatched filter is empty") {
    assert(run(
      """SELECT event_id FROM MEASURE events IN index_mode
        |TIME > '-30d' WHERE user_id = -1""".stripMargin,
      resOf(indexMode = true)).isEmpty)
  }

  test("index_mode_order_desc.ql: ORDER BY tag DESC in index mode") {
    assert(run(
      """SELECT event_id, user_id FROM MEASURE events IN index_mode
        |TIME > '-30d' ORDER BY user_id DESC""".stripMargin,
      resOf(indexMode = true)) ==
      mirror(lit(true), Seq(col("user_id").desc, col("ts_ns").asc), // entity IS the sort key
        Seq("event_id", "user_id")))
  }

  test("index_mode_filter_hidden_tag.ql: filter tag stripped at egress (P3)") {
    val got = run(
      """SELECT event_id FROM MEASURE events IN index_mode
        |TIME > '-30d' WHERE user_id = 1""".stripMargin, resOf(indexMode = true))
    assert(got == mirror(col("user_id") === 1L, defaultOrd, Seq("event_id")))
  }

  // -- errors ---------------------------------------------------------------

  test("project_non_existent_field.ql: unknown ::field is an error") {
    val e = intercept[IllegalArgumentException] {
      run("SELECT bogus::field FROM MEASURE events IN sw_metric TIME > '-30d'")
    }
    assert(e.getMessage.toLowerCase.contains("field") ||
      e.getMessage.contains("not found"))
  }

  test("project_non_existent_tag.ql: unknown projected tag is an error (WantErr)") {
    val e = intercept[IllegalArgumentException] {
      run(
        """SELECT event_id, nonexistent_tag, value FROM MEASURE events IN sw_metric
          |TIME > '-30d'""".stripMargin)
    }
    assert(e.getMessage.contains("not found"))
  }

  // -- round-5 remainder: named cases beyond the earlier slabs ---------------

  test("all_latency.ql: lowercase keywords (the grammar is case-insensitive)") {
    assert(run(
      "select user_id, value::field from measure events in sw_metric time > '-30d'") ==
      mirror(lit(true), defaultOrd, Seq("user_id", "value")))
  }

  test("float.ql: plain multi-column projection over the FLOAT measure") {
    assert(run(
      """SELECT event_type, user_id, value FROM MEASURE events IN sw_metric
        |TIME > '-30d'""".stripMargin) ==
      mirror(lit(true), defaultOrd, Seq("event_type", "user_id", "value")))
  }

  test("top_entity.ql / bottom_entity.ql: TOP 5 entity MEAN, GROUP BY with ::field") {
    for (desc <- Seq(true, false)) {
      val dir = if (desc) "DESC" else "ASC"
      val got = run(
        s"""SELECT TOP 5 value $dir, user_id, value::field, MEAN(value)
           |FROM MEASURE events IN sw_metric
           |TIME > '-30d' GROUP BY user_id, value::field""".stripMargin)
      val want = inWin.groupBy("user_id").agg(meanD.as("mean_value"))
        .orderBy(if (desc) col("mean_value").desc else col("mean_value").asc,
          col("user_id").asc)
        .limit(5).collect().map(_.toSeq).toSeq
      assert(got == want && got.size == 5, dir)
    }
  }

  test("top_entity_svc.ql / bottom_entity_svc.ql: projected tag OUTSIDE the group keys") {
    // `service_id` is projected but not grouped — it carries the group's
    // first-row value (A7, measure_plan_aggregation.go:242-304); under the
    // EQ filter it is constant, exactly the reference's fixture shape
    for (desc <- Seq(true, false)) {
      val dir = if (desc) "DESC" else "ASC"
      val got = run(
        s"""SELECT TOP 2 value $dir, user_id, event_type, value::field, MEAN(value)
           |FROM MEASURE events IN sw_metric
           |TIME > '-30d'
           |WHERE event_type = 'click'
           |GROUP BY user_id, value::field""".stripMargin)
      val want = inWin.filter(col("event_type") === "click")
        .groupBy("user_id").agg(meanD.as("mean_value"))
        .withColumn("event_type", lit("click"))
        .orderBy(if (desc) col("mean_value").desc else col("mean_value").asc,
          col("user_id").asc)
        .limit(2).select("user_id", "event_type", "mean_value")
        .collect().map(_.toSeq).toSeq
      assert(got == want && got.size == 2, dir)
    }
  }

  test("top_with_filter.ql: TOP 2 MEAN with NE filter") {
    val got = run(
      """SELECT TOP 2 value DESC, event_type, value::field, MEAN(value)
        |FROM MEASURE events IN sw_metric
        |TIME > '-30d'
        |WHERE event_type != 'view'
        |GROUP BY event_type, value""".stripMargin)
    val want = inWin.filter(col("event_type") =!= "view")
      .groupBy("event_type").agg(meanD.as("mean_value"))
      .orderBy(col("mean_value").desc, col("event_type").asc).limit(2)
      .collect().map(_.toSeq).toSeq
    assert(got == want && got.size == 2)
  }

  test("tag_filter_not_in.ql: NOT IN filter") {
    assert(run(
      """SELECT event_id, user_id, value FROM MEASURE events IN sw_metric
        |TIME > '-30d'
        |WHERE event_type NOT IN ('view')""".stripMargin) ==
      mirror(!col("event_type").isin("view"), defaultOrd,
        Seq("event_id", "user_id", "value")))
  }

  test("tag_filter_unknown.ql: EQ against an unmatched value is empty (WantEmpty)") {
    assert(run(
      """SELECT event_type, value::field FROM MEASURE events IN sw_metric
        |TIME > '-30d'
        |WHERE event_type = 'unknown'""".stripMargin).isEmpty)
  }

  test("entity_replicated.ql: entity EQ against a replicated group reads ONE copy") {
    // replication (replicated_group, shard replicas) is a storage concern —
    // both replicas serve the same logical rows; the query sees one copy
    assert(run(
      """SELECT event_id, event_type, value FROM MEASURE events IN replicated_group
        |TIME > '-30d' WHERE user_id = 1""".stripMargin) ==
      mirror(col("user_id") === 1L, defaultOrd, Seq("event_id", "event_type", "value")))
  }

  test("write_mixed.ql: multi-group WITHOUT parens + entity IN spanning both groups") {
    // `IN sw_spec, sw_spec2` — two schema-evolution groups holding disjoint
    // slices; the IN list picks entities from each (measure.go:110 DisOrder)
    val spec1 = events.filter(col("user_id") < 8L)
    val spec2 = events.filter(col("user_id") >= 8L)
      .withColumn("extra_tag", concat(lit("s2-"), col("event_type")))
    val r = Map(
      "sw_spec/events" -> BydbQL.Resource(spec1, tdef, fields = Set("value")),
      "sw_spec2/events" -> BydbQL.Resource(spec2, tdef, fields = Set("value")))
    val got = run(
      """SELECT event_id, user_id, value FROM MEASURE events IN sw_spec, sw_spec2
        |TIME > '-30d'
        |WHERE user_id IN (3, 7, 8, 12) LIMIT 100000""".stripMargin, r)
    assert(got == mirror(col("user_id").isin(3L, 7L, 8L, 12L), defaultOrd,
      Seq("event_id", "user_id", "value"), limit = 100000))
    assert(got.map(_(1).asInstanceOf[Long]).toSet == Set(3L, 7L, 8L, 12L))
  }

  test("gen_leaf_eq_null.ql / gen_leaf_ne_null.ql: NULL literal comparisons") {
    // `WHERE id = NULL` selects rows whose tag is unset; != NULL the rest
    val withNulls = events.withColumn("maybe_type",
      when(pmod(col("user_id"), lit(3L)) === 0L, lit(null).cast("string"))
        .otherwise(col("event_type")))
    val r = Map("events" -> BydbQL.Resource(withNulls, tdef, fields = Set("value")))
    val winNulls = withNulls.filter(col("ts_ns") >= tLo && col("ts_ns") < tHi)
    assert(run(
      """SELECT event_id, user_id, value FROM MEASURE events IN sw_metric
        |TIME > '-30d' WHERE maybe_type = NULL""".stripMargin, r) ==
      mirror(col("maybe_type").isNull, defaultOrd,
        Seq("event_id", "user_id", "value"), src = winNulls))
    assert(run(
      """SELECT event_id, user_id, value FROM MEASURE events IN sw_metric
        |TIME > '-30d' WHERE maybe_type != NULL""".stripMargin, r) ==
      mirror(col("maybe_type").isNotNull, defaultOrd,
        Seq("event_id", "user_id", "value"), src = winNulls))
  }

  test("gen_leaf named op × type matrix executes (remaining named cases)") {
    // gen_leaf_{ne,lt,gt,le,ge}_int · gen_leaf_{eq,ne,lt,ge}_str ·
    // gen_leaf_in_str_array · gen_leaf_not_in_int_array — statements
    // verbatim modulo binding; each checked against a DataFrame mirror
    val cases: Seq[(String, String, Column)] = Seq(
      ("gen_leaf_ne_int", "event_id != 5", col("event_id") =!= 5L),
      ("gen_leaf_lt_int", "event_id < 100", col("event_id") < 100L),
      ("gen_leaf_gt_int", "event_id > 100", col("event_id") > 100L),
      ("gen_leaf_le_int", "event_id <= 100", col("event_id") <= 100L),
      ("gen_leaf_ge_int", "event_id >= 100", col("event_id") >= 100L),
      ("gen_leaf_eq_str", "event_type = 'error'", col("event_type") === "error"),
      ("gen_leaf_ne_str", "event_type != 'view'", col("event_type") =!= "view"),
      ("gen_leaf_lt_str", "event_type < 'error'", col("event_type") < "error"),
      ("gen_leaf_ge_str", "event_type >= 'error'", col("event_type") >= "error"),
      ("gen_leaf_in_str_array", "event_type IN ('click', 'view')",
        col("event_type").isin("click", "view")),
      ("gen_leaf_not_in_int_array", "event_id NOT IN (1, 2, 3)",
        !col("event_id").isin(1L, 2L, 3L)))
    for ((name, where, m) <- cases) {
      assert(run(
        s"""SELECT event_id, user_id, value FROM MEASURE events IN sw_metric
           |TIME > '-30d' WHERE $where LIMIT 100000""".stripMargin) ==
        mirror(m, defaultOrd, Seq("event_id", "user_id", "value"),
          limit = 100000), name)
    }
  }

  // gen_err_in_scalar.ql (WantErr): the error is a TYPED-REQUEST shape —
  // BINARY_OP_IN carrying a scalar `str` value instead of a strArray
  // (input/gen_err_in_scalar.yaml). The QL text `IN ('svc1')` parses to a
  // legal one-element list in both engines; our typed IR (Cond values:
  // Seq[Any]) cannot express a scalar-IN, so the malformed request is
  // unconstructible by design rather than validated.

  // cases: gen_feat_mean_top_desc_group_order_desc_3.ql ·
  // gen_feat_mean_top_asc_group_order_asc_4.ql · gen_feat_mean_group_order_asc_5.ql
  test("gen_feat_mean_top_{desc,asc}_group_order_{desc,asc}_{3,4}.ql + " +
      "gen_feat_mean_group_order_asc_5.ql") {
    // TOP 2 over MEAN × both directions with a trailing bare ORDER BY
    // (ignored post-agg unless it names a surviving key)
    for ((dir, desc, ord) <- Seq(("DESC", true, "DESC"), ("ASC", false, "ASC"))) {
      val got = run(
        s"""SELECT TOP 2 value $dir, event_type, MEAN(value), value::field
           |FROM MEASURE events IN sw_metric TIME > '-30d'
           |GROUP BY event_type, value ORDER BY $ord""".stripMargin)
      val want = inWin.groupBy("event_type").agg(meanD.as("mean_value"))
        .orderBy(if (desc) col("mean_value").desc else col("mean_value").asc,
          col("event_type").asc)
        .limit(2).select("event_type", "mean_value").collect().map(_.toSeq).toSeq
      assert(got == want && got.size == 2, dir)
    }
    // _5: MEAN + GROUP BY + bare ORDER BY ASC, no TOP
    val got = run(
      """SELECT event_type, MEAN(value), value::field FROM MEASURE events IN sw_metric
        |TIME > '-30d' GROUP BY event_type, value ORDER BY ASC""".stripMargin)
    assert(got.toSet == groupedMirror(meanD))
  }

  test("gen_feat_{max,min,count,sum}_group_order_desc_{6,7,8,9}.ql") {
    val cases: Seq[(String, String, Column)] = Seq(
      ("gen_feat_max_group_order_desc_6", "MAX", max(col("value"))),
      ("gen_feat_min_group_order_desc_7", "MIN", min(col("value"))),
      ("gen_feat_count_group_order_desc_8", "COUNT", count(col("value")).cast("double")),
      ("gen_feat_sum_group_order_desc_9", "SUM", sumD))
    for ((name, fn, agg) <- cases) {
      val got = run(
        s"""SELECT event_type, $fn(value), value::field FROM MEASURE events IN sw_metric
           |TIME > '-30d' GROUP BY event_type, value ORDER BY DESC""".stripMargin)
      assert(got.toSet == groupedMirror(agg), name)
    }
  }
}
