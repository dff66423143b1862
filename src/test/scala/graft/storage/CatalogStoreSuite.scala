package graft.storage

import java.nio.file.Files

import graft.SparkSpec
import graft.engine.Planners
import graft.model._
import graft.ql.BydbQL
import graft.sources.Catalog
import org.apache.spark.sql.functions._

/** Persistent catalog: a resource ingested through CatalogStore.ingest is
  * queryable from a FRESH resource map built solely by CatalogStore.open —
  * nothing registered by hand (the reference's schema-registry property,
  * pkg/schema). */
class CatalogStoreSuite extends SparkSpec {

  private def tmp(prefix: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/test-tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private lazy val events = Catalog.load(spark, sf0001, "events")

  private val entry = CatalogEntry(
    group = "testdata", name = "events",
    entity = Seq("user_id"), tsCol = "ts_ns", tsIsNanos = true,
    shardNum = 4, segmentDays = 7,
    fields = Seq("value"),
    elementIdCol = Some("event_id_str"))

  test("ingest persists the schema; open rebuilds ready resources") {
    val root = tmp("catalog")
    CatalogStore.ingest(events, root, entry, mode = "overwrite")

    // a "fresh session": nothing registered manually, only the root known
    val resources = CatalogStore.open(spark, root)
    assert(resources.contains("events") && resources.contains("testdata/events"))

    // q01-shaped time-range scan through the QL facade
    val got = BydbQL.run(
      """SELECT event_id, user_id, event_type, value FROM MEASURE events
        |IN testdata TIME BETWEEN '2024-01-05T00:00:00Z' AND '2024-01-20T00:00:00Z'""".stripMargin,
      resources)
    val want = Planners.measure(events, Catalog.defs("events"), MeasureQuery(
      groups = Seq("testdata"), name = "events",
      timeRange = Some(TimeRange(
        java.time.Instant.parse("2024-01-05T00:00:00Z"),
        java.time.Instant.parse("2024-01-20T00:00:00Z"))),
      tagProjection = Seq("event_id", "user_id", "event_type"),
      fieldProjection = Seq("value")))
    assert(got.collect().map(_.toSeq).toSeq.sortBy(_.toString) ==
      want.collect().map(_.toSeq).toSeq.sortBy(_.toString))

    // q07-shaped grouped aggregation
    val agg = BydbQL.run(
      "SELECT event_type, SUM(value) FROM MEASURE events IN testdata GROUP BY event_type, value",
      resources)
    val aggWant = Planners.measure(events, Catalog.defs("events"), MeasureQuery(
      groups = Seq("testdata"), name = "events",
      groupByTags = Seq("event_type"), agg = Some((AggFn.Sum, "value"))))
    assert(agg.collect().map(_.toSeq).toSet == aggWant.collect().map(_.toSeq).toSet)
  }

  test("stage-tiered resources reopen with routing intact") {
    val hotRoot = tmp("hot")
    val warmRoot = tmp("warm")
    val cut = java.time.Instant.parse("2024-01-15T00:00:00Z")
    def ns(i: java.time.Instant) = i.getEpochSecond * 1000000000L
    val staged = entry.copy(segmentDays = 7,
      stageRoots = Map("hot" -> hotRoot, "warm" -> warmRoot))
    Layout.append(events.filter(col("ts_ns") >= ns(cut)), hotRoot, staged.spec,
      mode = "overwrite")
    Layout.append(events.filter(col("ts_ns") < ns(cut)), warmRoot, staged.spec,
      mode = "overwrite")
    val metaRoot = tmp("catalog")
    CatalogStore.save(spark, metaRoot, staged)

    val resources = CatalogStore.open(spark, metaRoot)
    val hot = BydbQL.run(
      "SELECT event_id FROM MEASURE events IN testdata ON (hot) STAGES LIMIT 1000000",
      resources)
    assert(hot.count() == events.filter(col("ts_ns") >= ns(cut)).count())
    val all = BydbQL.run(
      "SELECT event_id FROM MEASURE events IN testdata LIMIT 1000000", resources)
    assert(all.count() == events.count())
  }

  test("entries round-trip every binding field") {
    val root = tmp("catalog")
    val full = entry.copy(versionCol = Some("event_id"),
      arrayTags = Seq("tags"), traceIdCol = Some("trace_id"),
      spanStruct = Seq("event_id", "ts_ns"),
      propertyIdCol = Some("pid"), propertyRevCol = Some("rev"),
      propertyDeletedCol = Some("deleted"),
      stageRoots = Map("hot" -> "/tiers/hot", "cold" -> "/tiers/cold"),
      analyzerColumns = Map("event_type" -> "standard", "props" -> "url"),
      matchableTags = Some(Seq("event_type")),
      matchableWindowsMs = Map("event_type" -> Seq(1704067200000L, 4102444800000L)),
      createdAtMs = Some(1704067200000L),
      entity = Seq("user_id", "event_type"), shardingKey = Seq("user_id"))
    CatalogStore.save(spark, root, full)
    val back = CatalogStore.entries(spark, root)
    assert(back == Seq(full))
    // a reopened resource keeps routing by its declared sharding key
    assert(back.head.spec.routingKey == Seq("user_id"))
    // an illegal sharding key is rejected when the spec materializes
    intercept[IllegalArgumentException] {
      full.copy(shardingKey = Seq("region")).spec
    }
    // tokenization config reaches the layout spec (ADVICE: ingest-time
    // token columns must survive save/open) and createdAt reaches the
    // planner's clamp via tdef
    assert(back.head.spec.analyzerColumns == full.analyzerColumns)
    assert(back.head.tdef.createdAt.contains(
      java.time.Instant.parse("2024-01-01T00:00:00Z")))
    // MATCH validation schema survives save/open: a reopened resource
    // still knows its analyzer-indexed tags and binding windows
    assert(back.head.tdef.matchableTags.contains(Set("event_type")))
    assert(back.head.tdef.matchableWindows == Map("event_type" ->
      (java.time.Instant.parse("2024-01-01T00:00:00Z"),
        java.time.Instant.parse("2100-01-01T00:00:00Z"))))
  }

  test("multi-root open merges namespaces; entries is ONE job per root") {
    val rootA = tmp("rootA")
    val rootB = tmp("rootB")
    CatalogStore.ingest(events, rootA, entry, mode = "overwrite")
    CatalogStore.ingest(events, rootB,
      entry.copy(group = "g2", name = "events2"), mode = "overwrite")
    // several entries under one root: catalog reads must not loop jobs
    CatalogStore.ingest(events.limit(50), rootA,
      entry.copy(name = "events_idx"), mode = "overwrite")

    spark.sparkContext.setJobGroup("catalog-entries", "catalog-entries")
    val es = try CatalogStore.entries(spark, rootA)
      finally spark.sparkContext.clearJobGroup()
    assert(es.map(_.name).sorted == Seq("events", "events_idx"))
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup("catalog-entries")
    assert(jobs.length == 1, s"expected ONE catalog job, saw ${jobs.length}")

    val res = CatalogStore.open(spark, Seq(rootA, rootB))
    assert(res.contains("testdata/events") && res.contains("g2/events2"))
    assert(BydbQL.run(
      "SELECT event_id FROM MEASURE events2 IN g2 LIMIT 1000000", res)
      .count() == events.count())
  }

  // registry lifecycle semantics: test/cases/schema/apply_rollback.go
  test("create stamps mod_revision and created_at == updated_at (apply_rollback.go:104-122)") {
    val root = tmp("catalog")
    val t0 = 1704067200000L
    val made = CatalogStore.create(spark, root, entry, nowMs = t0)
    assert(made.revision == 1L)
    assert(made.createdAtMs.contains(t0) && made.updatedAtMs.contains(t0))
    // double-create is AlreadyExists
    val e = intercept[IllegalArgumentException] {
      CatalogStore.create(spark, root, entry, nowMs = t0 + 1)
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("rejected entity change leaves the schema byte-identical (apply-rollback)") {
    val root = tmp("catalog")
    val t0 = 1704067200000L
    CatalogStore.create(spark, root, entry, nowMs = t0)
    val before = CatalogStore.get(spark, root, "testdata", "events").get

    val e = intercept[IllegalArgumentException] {
      CatalogStore.update(spark, root,
        entry.copy(entity = Seq("user_id", "event_type"),
          fields = Seq("value", "extra")), nowMs = t0 + 5000)
    }
    assert(e.getMessage.contains("immutable"))
    // full state intact: revision, updated_at, every field
    // (apply_rollback.go:196-215)
    assert(CatalogStore.get(spark, root, "testdata", "events").get == before)

    // an ACCEPTED update bumps the revision and keeps created_at
    val v2 = CatalogStore.update(spark, root,
      entry.copy(arrayTags = Seq("tags")), nowMs = t0 + 9000)
    assert(v2.revision == 2L && v2.createdAtMs.contains(t0)
      && v2.updatedAtMs.contains(t0 + 9000))
    assert(CatalogStore.get(spark, root, "testdata", "events").get == v2)
    // updating an unknown resource is NotFound
    val nf = intercept[IllegalArgumentException] {
      CatalogStore.update(spark, root, entry.copy(name = "ghost"))
    }
    assert(nf.getMessage.contains("not found"))
  }

  test("a catalog persisted before the revision fields still deserializes") {
    val root = tmp("catalog")
    // hand-write an OLD-schema entry (no modRevision/updatedAtMs): reading
    // it must not throw and must report revision 1
    val dir = new java.io.File(s"$root/_graft_catalog/testdata__events")
    dir.mkdirs()
    val json = """{"group":"testdata","name":"events","entity":["user_id"],""" +
      """"tsCol":"ts_ns","tsIsNanos":true,"shardNum":4,"segmentDays":7,""" +
      """"arrayTags":[],"fields":["value"],"spanStruct":[],""" +
      """"stageRoots":{},"analyzerColumns":{}}"""
    java.nio.file.Files.write(new java.io.File(dir, "part-0.json").toPath,
      json.getBytes("UTF-8"))
    val back = CatalogStore.get(spark, root, "testdata", "events")
    assert(back.isDefined && back.get.revision == 1L)
    // fields added after this catalog was written (matchableTags,
    // matchableWindowsMs) deserialize as absent/undeclared, and the
    // TableDef/LayoutSpec projections must not NPE on them
    assert(back.get.tdef.matchableTags.isEmpty)
    assert(back.get.tdef.matchableWindows.isEmpty)
    assert(back.get.spec.group == "testdata")
    assert(CatalogStore.entries(spark, root).map(_.name) == Seq("events"))
    // and an update on it starts the revision lineage at 2
    assert(CatalogStore.update(spark, root,
      back.get.copy(arrayTags = Seq("tags")), nowMs = 5L).revision == 2L)
  }

  test("backdated create keeps created_at == updated_at (clamp resources)") {
    val root = tmp("catalog")
    val made = CatalogStore.create(spark, root,
      entry.copy(createdAtMs = Some(42L)), nowMs = 99L)
    assert(made.createdAtMs.contains(42L) && made.updatedAtMs.contains(42L))
  }

  test("delete removes the resource; recreate starts a fresh lineage (apply_rollback.go:358-380)") {
    val root = tmp("catalog")
    CatalogStore.create(spark, root, entry, nowMs = 1L)
    assert(CatalogStore.delete(spark, root, "testdata", "events", nowMs = 1L))
    assert(CatalogStore.get(spark, root, "testdata", "events").isEmpty)
    assert(!CatalogStore.delete(spark, root, "testdata", "events", nowMs = 1L)) // already gone
    val again = CatalogStore.create(spark, root, entry, nowMs = 2L)
    // fresh lineage = fresh created_at; mod_revision CONTINUES past the
    // tombstoned lineage (revisions are globally monotone in the
    // reference — etcd — so a recreate never reuses an old revision)
    assert(again.revision == 2L)
    assert(again.createdAtMs.contains(2L))
  }

  test("a crashed create (marker without entry) is repaired by delete, then re-creatable") {
    val root = tmp("catalog")
    // simulate a create that crashed between its atomic marker and the
    // first save: the marker file exists, the entry dir was never written
    val marker = new org.apache.hadoop.fs.Path(
      s"$root/_graft_catalog/testdata__events.created")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(marker.getParent)
    assert(fs.createNewFile(marker))

    // readers surface the stuck state loudly (never as a silent None)...
    val e = intercept[IllegalStateException] {
      CatalogStore.get(spark, root, "testdata", "events")
    }
    assert(e.getMessage.contains("delete() clears the stuck marker"), e.getMessage)
    // ...and a create attempt is blocked LOUDLY too (its existence probe
    // hits the same stuck-state surface), never silently overwriting
    intercept[IllegalStateException] {
      CatalogStore.create(spark, root, entry, nowMs = 1L)
    }

    // the REPAIR PATH: delete() must not itself throw on the stuck state;
    // it clears the marker (nothing existed, so no tombstone)
    assert(!CatalogStore.delete(spark, root, "testdata", "events", nowMs = 2L))
    assert(!fs.exists(marker))
    assert(CatalogStore.deleteTime(spark, root, "testdata", "events").isEmpty)

    // and the resource is re-creatable afterwards
    val made = CatalogStore.create(spark, root, entry, nowMs = 3L)
    assert(made.revision == 1L)
    assert(CatalogStore.get(spark, root, "testdata", "events").isDefined)
  }
}
