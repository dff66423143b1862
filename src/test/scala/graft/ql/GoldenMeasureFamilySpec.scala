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
}
