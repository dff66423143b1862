package graft.storage

import java.nio.file.Files

import graft.SparkSpec
import graft.ql.BydbQL
import graft.sources.Catalog
import org.apache.spark.sql.functions._

/** Schema-evolution semantics from the reference's schema-consistency
  * suite (test/cases/schema/): tombstone retention + GC, per-group
  * ModRevision query/write gates, tag-family moves, and the end-to-end
  * shape-break flow (delete + recreate under the Rule-7 CreatedAt clamp).
  */
class SchemaEvolutionSuite extends SparkSpec {

  private def tmp(prefix: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/test-tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private lazy val events = Catalog.load(spark, sf0001, "events")

  private val entry = CatalogEntry(
    group = "testdata", name = "events",
    entity = Seq("user_id"), tsCol = "ts_ns", tsIsNanos = true,
    shardNum = 4, segmentDays = 7, fields = Seq("value"))

  // ---------------------------------------------------------------- tombstones

  test("delete stamps delete_time; recreate within retention succeeds with fresh CreatedAt (tombstone_gc.go:60)") {
    val root = tmp("tomb")
    val t0 = 1704067200000L
    CatalogStore.create(spark, root, entry, nowMs = t0)
    val tDel = t0 + 10000L
    assert(CatalogStore.delete(spark, root, "testdata", "events", nowMs = tDel))
    assert(CatalogStore.deleteTime(spark, root, "testdata", "events").contains(tDel))

    // recreate half-way into the retention window: the server stamps
    // created_at = now > T_del, so the tombstone invariant holds and the
    // recreate SUCCEEDS with CreatedAt2 after T_del (Step 1.3)
    val made2 = CatalogStore.create(spark, root, entry, nowMs = tDel + 1000L)
    assert(made2.createdAtMs.exists(_ > tDel),
      "CreatedAt2 must be after T_del — Step 1.3 tombstone invariant")
  }

  test("backdated recreate at or before delete_time violates the tombstone invariant") {
    val root = tmp("tomb")
    val t0 = 1704067200000L
    CatalogStore.create(spark, root, entry, nowMs = t0)
    val tDel = t0 + 10000L
    CatalogStore.delete(spark, root, "testdata", "events", nowMs = tDel)
    val e = intercept[IllegalArgumentException] {
      CatalogStore.create(spark, root,
        entry.copy(createdAtMs = Some(tDel)), nowMs = tDel + 5000L)
    }
    assert(e.getMessage.contains("tombstone invariant"))
  }

  test("GC physically removes the tombstone after retention; recreate runs clean (tombstone_gc.go:132)") {
    val root = tmp("tomb")
    val t0 = 1704067200000L
    CatalogStore.create(spark, root, entry, nowMs = t0)
    val tDel = t0 + 10000L
    CatalogStore.delete(spark, root, "testdata", "events", nowMs = tDel)

    // within retention: nothing purged
    assert(CatalogStore.gcTombstones(spark, root, retentionMs = 60000L,
      nowMs = tDel + 30000L).isEmpty)
    assert(CatalogStore.deleteTime(spark, root, "testdata", "events").isDefined)

    // past retention: purged, and even a backdated recreate is
    // unconstrained — the tombstone is gone
    assert(CatalogStore.gcTombstones(spark, root, retentionMs = 60000L,
      nowMs = tDel + 61000L) == Seq(("testdata", "events")))
    assert(CatalogStore.deleteTime(spark, root, "testdata", "events").isEmpty)
    val made = CatalogStore.create(spark, root,
      entry.copy(createdAtMs = Some(t0)), nowMs = tDel + 62000L)
    assert(made.revision == 1L, "post-GC recreate starts a fresh revision lineage")
  }

  // ------------------------------------------------------------- revision gates

  test("query gate: stale → EXPIRED_SCHEMA, ahead → SCHEMA_NOT_APPLIED, match → SUCCEED (query_gate.go:90-209)") {
    val root = tmp("gate")
    val r1 = CatalogStore.create(spark, root, entry, nowMs = 1L).revision
    val r2 = CatalogStore.update(spark, root,
      entry.copy(arrayTags = Seq("tags")), nowMs = 2L).revision
    assert(r2 > r1)

    def statuses(rev: Long) = SchemaGate.check(Seq("testdata"), "events",
      Map("testdata" -> rev),
      (n, g) => CatalogStore.get(spark, root, g, n).map(_.revision))

    assert(statuses(r1) == (Map("testdata" -> SchemaGate.ExpiredSchema), true),
      "query with group ModRevision < cache must return STATUS_EXPIRED_SCHEMA")
    assert(statuses(r2 + 50) == (Map("testdata" -> SchemaGate.SchemaNotApplied), true),
      "ModRevision far ahead of the cache that never applies must return STATUS_SCHEMA_NOT_APPLIED")
    assert(statuses(r2) == (Map("testdata" -> SchemaGate.Succeed), false))
    // zero and absent-from-map both skip the gate (write_gate.go:357;
    // query_gate.go:305 "ungated group")
    assert(statuses(0L) == (Map.empty, false))
    assert(SchemaGate.check(Seq("testdata"), "events", Map.empty,
      (_, _) => Some(99L)) == (Map.empty, false))
    // unknown resource in a gated group → NOT_FOUND
    assert(SchemaGate.check(Seq("testdata"), "ghost", Map("testdata" -> 1L),
      (n, g) => CatalogStore.get(spark, root, g, n).map(_.revision)) ==
      (Map("testdata" -> SchemaGate.NotFound), true))
  }

  test("an ahead revision that applies within maxWait passes the gate (awaitRevisionReached)") {
    val root = tmp("gate")
    CatalogStore.create(spark, root, entry, nowMs = 1L)
    // apply the pending revision from another thread mid-poll
    val applier = new Thread(() => {
      Thread.sleep(80)
      CatalogStore.update(spark, root,
        entry.copy(arrayTags = Seq("tags")), nowMs = 2L)
    })
    applier.start()
    val (st, shortCircuit) = SchemaGate.check(Seq("testdata"), "events",
      Map("testdata" -> 2L),
      (n, g) => CatalogStore.get(spark, root, g, n).map(_.revision),
      maxWaitMs = 10000L)
    applier.join()
    assert(st == Map("testdata" -> SchemaGate.Succeed) && !shortCircuit,
      "revision applied within the wait must pass the gate")
  }

  test("mixed group statuses short-circuit to empty elements (query_gate.go:211-303)") {
    val root = tmp("gate")
    CatalogStore.create(spark, root, entry, nowMs = 1L)
    val g2 = entry.copy(group = "g2")
    CatalogStore.create(spark, root, g2, nowMs = 1L)
    CatalogStore.update(spark, root, g2.copy(arrayTags = Seq("tags")), nowMs = 2L)

    // testdata matches (rev 1), g2 is stale (client 1 < cache 2)
    val (st, df) = SchemaGate.gatedQuery(spark, root, Seq("testdata", "g2"),
      "events", Map("testdata" -> 1L, "g2" -> 1L)) {
      events.limit(1).toDF()
    }
    assert(st == Map("testdata" -> SchemaGate.Succeed,
      "g2" -> SchemaGate.ExpiredSchema))
    assert(df.isEmpty, "one stale group must short-circuit to empty elements")

    // the stale group ungated (absent from the map) → query executes
    val (st2, df2) = SchemaGate.gatedQuery(spark, root, Seq("testdata", "g2"),
      "events", Map("testdata" -> 1L)) {
      events.limit(1).toDF()
    }
    assert(st2 == Map("testdata" -> SchemaGate.Succeed) && df2.isDefined)
    assert(df2.get.count() == 1L)
  }

  test("write gate: stale rejected without writing, zero skips (write_gate.go:278-365)") {
    val root = tmp("gate")
    CatalogStore.create(spark, root, entry, nowMs = 1L)
    CatalogStore.update(spark, root,
      entry.copy(arrayTags = Seq("tags")), nowMs = 2L)
    var writes = 0
    assert(SchemaGate.gatedWrite(spark, root, "testdata", "events", 1L) {
      writes += 1
    } == SchemaGate.ExpiredSchema)
    assert(writes == 0, "a gated-out write must not execute")
    assert(SchemaGate.gatedWrite(spark, root, "testdata", "events", 99L) {
      writes += 1
    } == SchemaGate.SchemaNotApplied)
    assert(writes == 0)
    assert(SchemaGate.gatedWrite(spark, root, "testdata", "events", 2L) {
      writes += 1
    } == SchemaGate.Succeed)
    assert(SchemaGate.gatedWrite(spark, root, "testdata", "events", 0L) {
      writes += 1
    } == SchemaGate.Succeed, "ModRevision zero skips the revision check")
    assert(writes == 2)
  }

  // ---------------------------------------------------------- tag-family moves

  test("a tag moves between families in an accepted update; pre-move data stays queryable (tag_family_move.go)") {
    val root = tmp("tfm")
    val regRoot = tmp("tfmreg") // registry lifecycle on its own root
    val initial = entry.copy(tagFamilies = Map(
      "searchable" -> Seq("user_id", "event_type"),
      "storage-only" -> Seq("props")))
    CatalogStore.ingest(events, root, initial, mode = "overwrite")
    val made = CatalogStore.create(spark, regRoot, initial, nowMs = 1L)

    // move event_type: searchable → storage-only (the update is NOT a
    // shape break — entity unchanged — so it is accepted and bumps the
    // revision; tag_family_move.go:283-292 asserts the updated layout)
    val moved = initial.copy(tagFamilies = Map(
      "searchable" -> Seq("user_id"),
      "storage-only" -> Seq("props", "event_type")))
    val v2 = CatalogStore.update(spark, regRoot, moved, nowMs = 2L)
    assert(v2.revision == made.revision + 1)
    assert(CatalogStore.get(spark, regRoot, "testdata", "events").get
      .families == moved.tagFamilies, "the moved layout round-trips")

    // data written BEFORE the move is still queryable by the moved tag:
    // the catalog-opened resource (flat storage) serves the same rows
    CatalogStore.save(spark, root, moved)
    val res = CatalogStore.open(spark, root)
    val got = BydbQL.run(
      "SELECT event_id FROM MEASURE events IN testdata WHERE event_type = 'click' LIMIT 1000000",
      res)
    assert(got.count() == events.filter(col("event_type") === "click").count())
  }

  // ------------------------------------------------- shape-break end-to-end

  test("delete + recreate with a new shape: clamp hides old data, stale write rejected (shape_break.go:162-295)") {
    val root = tmp("sb")
    val regRoot = tmp("sbreg") // registry lifecycle on its own root
    // T_data1 lies inside the sf0.001 events range (Jan 2024)
    val createdAt1 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val v1 = entry.copy(createdAtMs = Some(createdAt1))
    CatalogStore.ingest(events, root, v1, mode = "overwrite")
    val made1 = CatalogStore.create(spark, regRoot,
      v1.copy(name = "events_reg"), nowMs = createdAt1)
    val r1 = made1.revision

    // sanity baseline: pre-delete query over [CreatedAt1, +1y) sees data
    def queryRange(res: Map[String, BydbQL.Resource]) = BydbQL.run(
      """SELECT event_id FROM MEASURE events IN testdata
        |TIME BETWEEN '2024-01-01T00:00:00Z' AND '2025-01-01T00:00:00Z'
        |LIMIT 1000000""".stripMargin, res)
    assert(queryRange(CatalogStore.open(spark, root)).count() > 0)

    // delete → T_del, then recreate with entity [user_id, event_type]
    // (an entity CHANGE is legal across delete+recreate — only an UPDATE
    // rejects it) and CreatedAt2 after T_del
    val tDel = java.time.Instant.parse("2025-06-01T00:00:00Z").toEpochMilli
    assert(CatalogStore.delete(spark, regRoot, "testdata", "events_reg", nowMs = tDel))
    val createdAt2 = tDel + 60000L
    val made2 = CatalogStore.create(spark, regRoot,
      entry.copy(name = "events_reg", entity = Seq("user_id", "event_type"),
        createdAtMs = Some(createdAt2)), nowMs = createdAt2)
    assert(made2.entity == Seq("user_id", "event_type"))
    assert(made2.createdAtMs.exists(_ > tDel), "CreatedAt2 must be after T_del")
    assert(made2.revision > r1, "recreate must advance past the old lineage's revision")

    // Rule-7 clamp: the same [T_data1, …) query against the RECREATED
    // resource returns empty — begin clamps forward to CreatedAt2, past
    // every pre-recreate row (shape_break.go:262-266)
    CatalogStore.save(spark, root, entry.copy(name = "events",
      createdAtMs = Some(createdAt2)))
    assert(queryRange(CatalogStore.open(spark, root)).isEmpty,
      "Rule 7 clamp must hide pre-CreatedAt2 data points")

    // stale write with R1 → EXPIRED_SCHEMA; write with R2 → SUCCEED
    var writes = 0
    assert(SchemaGate.gatedWrite(spark, regRoot, "testdata", "events_reg", r1) {
      writes += 1
    } == SchemaGate.ExpiredSchema)
    assert(SchemaGate.gatedWrite(spark, regRoot, "testdata", "events_reg",
      made2.revision) { writes += 1 } == SchemaGate.Succeed)
    assert(writes == 1)
  }

  // --------------------------------------------------------------- deletion

  test("query after delete is NOT_FOUND; open drops the resource (deletion.go:59-117)") {
    val regRoot = tmp("del")
    CatalogStore.create(spark, regRoot, entry.copy(name = "events_reg"), nowMs = 1L)
    CatalogStore.delete(spark, regRoot, "testdata", "events_reg", nowMs = 2L)
    assert(SchemaGate.check(Seq("testdata"), "events_reg",
      Map("testdata" -> 1L),
      (n, g) => CatalogStore.get(spark, regRoot, g, n).map(_.revision)) ==
      (Map("testdata" -> SchemaGate.NotFound), true))
    assert(!CatalogStore.open(spark, regRoot).contains("testdata/events_reg"))
  }
}
