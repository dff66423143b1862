package graft.engine

import java.time.Instant

import graft.SparkSpec
import graft.model._
import graft.sources.{Catalog, TableDef}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planner-path semantics per SURVEY §2: quirks the reference mandates and
  * plain SQL gets wrong, plus the validation rules. */
class PlannersSuite extends SparkSpec {

  import spark.implicits._

  private lazy val events = Catalog.load(spark, sf0001, "events")
  private val evDef = Catalog.defs("events")

  test("default limit is 100 when the request omits one (T5)") {
    val out = Planners.measure(events, evDef,
      MeasureQuery(Seq("g"), "events"))
    assert(out.count() == 100)
  }

  test("time range is left-inclusive right-exclusive (F7)") {
    // pick an existing row's exact timestamp as the boundary
    val t = events.orderBy("ts_ns").select("ts_ns").as[Long].head()
    val inst = Instant.ofEpochSecond(t / 1000000000L, t % 1000000000L)
    val incl = Planners.measure(events, evDef, MeasureQuery(Seq("g"), "events",
      timeRange = Some(TimeRange(inst, inst.plusSeconds(1))), limit = 1000000))
    val excl = Planners.measure(events, evDef, MeasureQuery(Seq("g"), "events",
      timeRange = Some(TimeRange(inst.minusSeconds(1), inst)), limit = 1000000))
    assert(incl.filter(col("ts_ns") === t).count() == 1)
    assert(excl.filter(col("ts_ns") === t).count() == 0)
  }

  test("CreatedAt clamps the time-range begin forward (clampTimeRangeBegin)") {
    val createdAt = Instant.parse("2024-01-15T00:00:00Z")
    val tdef = evDef.copy(createdAt = Some(createdAt))
    // begin far before creation: served rows start at createdAt
    val out = Planners.measure(events, tdef, MeasureQuery(Seq("g"), "events",
      timeRange = Some(TimeRange(Instant.EPOCH, Instant.parse("2024-02-01T00:00:00Z"))),
      limit = 1000000))
    def ns(i: Instant) = i.getEpochSecond * 1000000000L
    assert(out.count() ==
      events.filter(col("ts_ns") >= ns(createdAt) &&
        col("ts_ns") < ns(Instant.parse("2024-02-01T00:00:00Z"))).count())
    assert(out.count() > 0)
    // begin clamped past end → empty (schema_revision.go:45-47 rangeEmpty)
    assert(Planners.measure(events, tdef, MeasureQuery(Seq("g"), "events",
      timeRange = Some(TimeRange(Instant.EPOCH, Instant.parse("2024-01-10T00:00:00Z"))),
      limit = 1000000)).count() == 0)
    // begin after creation is untouched; no createdAt → no clamp
    assert(Planners.measure(events, tdef, MeasureQuery(Seq("g"), "events",
      timeRange = Some(TimeRange(Instant.parse("2024-01-20T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"))), limit = 1000000)).count() ==
      events.filter(col("ts_ns") >= ns(Instant.parse("2024-01-20T00:00:00Z")) &&
        col("ts_ns") < ns(Instant.parse("2024-02-01T00:00:00Z"))).count())
    assert(Planners.measure(events, evDef, MeasureQuery(Seq("g"), "events",
      timeRange = Some(TimeRange(Instant.EPOCH, Instant.parse("2024-02-01T00:00:00Z"))),
      limit = 1000000)).count() == events.count())
  }

  test("conflicting entity AND recovers when an enclosing AND re-pins (nil-as-any)") {
    // ((u=2 AND u=4) AND u=2): the inner conflict resolves to nil, the
    // enclosing AND adopts the other side (parser.go:141-146) — the query
    // plans, and the contradictory FILTER simply matches nothing
    val q = MeasureQuery(Seq("g"), "events",
      criteria = Some(And(
        And(Cond("user_id", Op.Eq, Seq(2L)), Cond("user_id", Op.Eq, Seq(4L))),
        Cond("user_id", Op.Eq, Seq(2L)))), limit = 1000000)
    assert(Planners.measure(events, evDef, q).count() == 0)
    // a bare conflicting AND at the root still fails
    val e = intercept[IllegalArgumentException] {
      Planners.measure(events, evDef, MeasureQuery(Seq("g"), "events",
        criteria = Some(Or(
          And(Cond("user_id", Op.Eq, Seq(2L)), Cond("user_id", Op.Eq, Seq(4L))),
          And(Cond("user_id", Op.Eq, Seq(5L)), Cond("user_id", Op.Eq, Seq(6L)))))))
    }
    assert(e.getMessage.contains("conflicting values"))
  }

  test("non-EQ/IN on an entity tag is rejected (F6)") {
    val q = MeasureQuery(Seq("g"), "events",
      criteria = Some(Cond("user_id", Op.Gt, Seq(5L))))
    val e = intercept[IllegalArgumentException] {
      Planners.measure(events, evDef, q)
    }
    assert(e.getMessage.contains("entity"))
    // EQ and IN on the same tag are fine
    Planners.measure(events, evDef, MeasureQuery(Seq("g"), "events",
      criteria = Some(Cond("user_id", Op.In, Seq(1L, 2L))))).count()
  }

  test("array-typed group-by tag is rejected (A3)") {
    val docs = Catalog.load(spark, sf0001, "documents")
      .withColumn("words", split(col("text"), " "))
    val tdef = TableDef("documents", arrayTags = Set("words"))
    val e = intercept[IllegalArgumentException] {
      Planners.measure(docs, tdef,
        MeasureQuery(Seq("g"), "documents", groupByTags = Seq("words")))
    }
    assert(e.getMessage.contains("array"))
  }

  test("MEAN over an INT field is integer division with <1 clamp (A2)") {
    val df = Seq(("a", 7L), ("a", 6L), ("b", 1L), ("b", 0L), ("c", -5L))
      .toDF("k", "v")
    val tdef = TableDef("t")
    val out = Planners.measure(df, tdef, MeasureQuery(Seq("g"), "t",
      groupByTags = Seq("k"), agg = Some((AggFn.Mean, "v"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a: 13/2 = 6 (trunc); b: 1/2 = 0 → clamp 1; c: -5/1 = -5 → clamp 1
    assert(out == Map("a" -> 6L, "b" -> 1L, "c" -> 1L))
  }

  test("EQ on an array tag is exact equality; NOT_HAVING negates contains-all (F1/F4)") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq("a", "b", "c")), (3L, Seq("b", "a")))
      .toDF("id", "tags")
    val tdef = TableDef("t", arrayTags = Set("tags"))
    def ids(c: Cond): Seq[Long] =
      Planners.measure(df, tdef, MeasureQuery(Seq("g"), "t",
        criteria = Some(c), tagProjection = Seq("id")))
        .collect().map(_.getLong(0)).sorted.toSeq
    // exact array equality is order-sensitive: ("b","a") does not match
    assert(ids(Cond("tags", Op.Eq, Seq("a", "b"))) == Seq(1L))
    // NOT_HAVING: rows NOT containing all of (a, c)
    assert(ids(Cond("tags", Op.NotHaving, Seq("a", "c"))) == Seq(1L, 3L))
  }

  test("MEAN over a FLOAT field uses double division with the same clamp (A2)") {
    val df = Seq(("a", 4.0), ("a", 5.0), ("b", 0.25), ("b", 0.15))
      .toDF("k", "v")
    val out = Planners.measure(df, TableDef("t"), MeasureQuery(Seq("g"), "t",
      groupByTags = Seq("k"), agg = Some((AggFn.Mean, "v"))))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a: 4.5 (real division, no truncation); b: 0.2 → clamped to 1.0
    assert(out == Map("a" -> 4.5, "b" -> 1.0))
  }

  test("COUNT over a FLOAT field emits float (A1/W8)") {
    val out = Planners.measure(events, evDef, MeasureQuery(Seq("g"), "events",
      agg = Some((AggFn.Count, "value"))))
    assert(out.schema("count_value").dataType ==
      org.apache.spark.sql.types.DoubleType)
  }

  test("GROUP BY without agg returns the first-seen row per group (A5)") {
    val df = Seq(
      ("x", 100L, 1.0), ("x", 50L, 2.0), ("y", 70L, 3.0))
      .toDF("k", "ts", "v")
    val tdef = TableDef("t", tsCol = Some("ts"))
    val out = Planners.measure(df, tdef, MeasureQuery(Seq("g"), "t",
      groupByTags = Seq("k"), tagProjection = Seq("k"), fieldProjection = Seq("v")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // first-seen = lowest ts: x → v=2.0 (ts 50), y → 3.0
    assert(out == Map("x" -> 2.0, "y" -> 3.0))
  }

  test("version dedup runs BEFORE criteria touch the rows (S1 ordering)") {
    // v2 is the latest version and fails the filter; the reference drops the
    // series entirely — filtering first would wrongly resurrect v1.
    val df = Seq(
      (1L, 10L, 1L, "keep"), (1L, 10L, 2L, "drop"),
      (2L, 10L, 1L, "keep"))
      .toDF("uid", "ts", "ver", "status")
    val tdef = TableDef("t", entity = Seq("uid"), tsCol = Some("ts"),
      versionCol = Some("ver"))
    val out = Planners.measure(df, tdef, MeasureQuery(Seq("g"), "t",
      criteria = Some(Cond("status", Op.Eq, Seq("keep"))),
      tagProjection = Seq("uid", "ver", "status")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((2L, 1L)))
  }

  test("index-mode scan skips the version-dedup pass (S2)") {
    val df = Seq((1L, 10L, 1L), (1L, 10L, 2L)).toDF("uid", "ts", "ver")
    val tdef = TableDef("t", entity = Seq("uid"), tsCol = Some("ts"),
      versionCol = Some("ver"))
    val deduped = Planners.measure(df, tdef,
      MeasureQuery(Seq("g"), "t", tagProjection = Seq("uid", "ver")))
    val indexMode = Planners.measure(df, tdef,
      MeasureQuery(Seq("g"), "t", tagProjection = Seq("uid", "ver"),
        indexMode = true))
    assert(deduped.count() == 1 && indexMode.count() == 2)
  }

  test("hidden tags: WHERE/ORDER tags need not be projected (P3)") {
    val out = Planners.measure(events, evDef, MeasureQuery(Seq("g"), "events",
      criteria = Some(Cond("event_type", Op.Eq, Seq("click"))),
      tagProjection = Seq("event_id"),
      orderBy = Some(OrderBy(Some("value"), desc = true)), limit = 10))
    assert(out.columns.toSeq == Seq("event_id"))
    assert(out.count() == 10)
  }

  test("offset is applied after sort, before limit (T5)") {
    val all = Planners.measure(events, evDef, MeasureQuery(Seq("g"), "events",
      tagProjection = Seq("event_id"),
      orderBy = Some(OrderBy(Some("value"), desc = true)), limit = 30))
      .collect().map(_.getLong(0))
    val paged = Planners.measure(events, evDef, MeasureQuery(Seq("g"), "events",
      tagProjection = Seq("event_id"),
      orderBy = Some(OrderBy(Some("value"), desc = true)), offset = 10, limit = 20))
      .collect().map(_.getLong(0))
    assert(paged.toSeq == all.drop(10).toSeq)
  }

  test("trace LIMIT counts traces, not spans (T9)") {
    val df = events.withColumn("trace_id", pmod(col("event_id"), lit(7L)))
    val tdef = TableDef("traces", tsCol = Some("ts_ns"))
    val out = Planners.traceSpanGroups(df, tdef,
      TraceQuery(Seq("g"), "traces", limit = 3),
      traceIdCol = "trace_id", spanStruct = Seq("event_id"))
    assert(out.count() == 3)
    assert(out.agg(sum("span_count")).as[Long].head() > 3)
  }

  test("topNRead honors the bucket time range [begin, end)") {
    val buckets = Seq(
      (0L, "a", 10L), (3600000L, "a", 20L), (7200000L, "a", 40L))
      .toDF("bucket_start", "entity", "value")
    val out = Planners.topNRead(buckets, TopNQuery(Seq("g"), "t",
      timeRange = Some(TimeRange(Instant.ofEpochMilli(3600000L),
        Instant.ofEpochMilli(7200000L))),
      topN = 10, agg = Some(AggFn.Sum)))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 20L))) // only the middle bucket is in range
  }

  test("topNRead rejects non-EQ conditions (§3.3)") {
    val buckets = Seq((0L, "a", 1L)).toDF("bucket_start", "entity", "value")
    val e = intercept[IllegalArgumentException] {
      Planners.topNRead(buckets, TopNQuery(Seq("g"), "t",
        conditions = Seq(Cond("entity", Op.Gt, Seq("a")))))
    }
    assert(e.getMessage.contains("EQ"))
  }

  test("union null-fills missing columns and widens type conflicts (T6)") {
    val a = Seq((1L, "x")).toDF("id", "tag")
    val b = Seq((2L, 3.5)).toDF("id", "score")
    val merged = Planners.unionGroups(Seq(a, b))
    assert(merged.columns.toSet == Set("id", "tag", "score"))
    assert(merged.count() == 2)
    assert(merged.filter(col("score").isNull).count() == 1)

    // a type-conflicted tag widens to TAG_TYPE_UNSPECIFIED — the merged
    // column is a string rendering each group's native value (logical/
    // schema.go:240-246; stream golden case multi_group_tag_type keeps int
    // rows and str rows of status_code side by side)
    val conflict = Seq(("7", "y")).toDF("id", "tag") // id string vs long
    val widened = Planners.unionGroups(Seq(a, conflict))
    assert(widened.schema("id").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(widened.select("id").collect().map(_.getString(0)).sorted
      .sameElements(Array("1", "7")))
    // non-conflicted columns keep their native types
    assert(widened.schema("tag").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(Planners.unionGroups(Seq(a, b)).schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
  }

  test("time-range + tag predicates reach the parquet scan (pushdown guard)") {
    val out = Planners.measure(events, evDef, MeasureQuery(Seq("g"), "events",
      timeRange = Some(TimeRange(Instant.parse("2024-01-05T00:00:00Z"),
        Instant.parse("2024-01-20T00:00:00Z"))),
      criteria = Some(Cond("event_type", Op.Eq, Seq("click"))),
      tagProjection = Seq("event_id"), fieldProjection = Seq("value")))
    val scan = out.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    // raw-nanos comparison pushes as int64 range; tag EQ pushes directly
    assert(pushed.contains("GreaterThanOrEqual(ts"), pushed)
    assert(pushed.contains("EqualTo(event_type,click)"), pushed)
    // column pruning: scan reads only what the query touches
    val read = scan.metadata.getOrElse("ReadSchema", "")
    assert(!read.contains("props"), read)
  }

  test("property path: tombstone hides the document; ids + criteria apply (S8)") {
    val df = Seq(
      ("p1", 1L, 10.0, false), ("p1", 2L, 20.0, true),  // latest rev deleted
      ("p2", 1L, 5.0, false), ("p2", 3L, 30.0, false),
      ("p3", 1L, 50.0, false))
      .toDF("id", "rev", "price", "deleted")
    val out = Planners.property(df,
      PropertyQuery(Seq("g"), "props", ids = Seq("p1", "p2"),
        criteria = Some(Cond("price", Op.Gt, Seq(1.0))),
        projection = Seq("id", "rev", "price")),
      idCol = "id", revCol = "rev", deletedCol = Some("deleted"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // p1 tombstoned at rev2; p3 excluded by ids; p2 latest rev 3 survives
    assert(out.toSeq == Seq(("p2", 3L)))
  }
}
