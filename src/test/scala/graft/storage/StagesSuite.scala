package graft.storage

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Catalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Lifecycle-stage routing: `ON (...) STAGES` must plan scans over ONLY
  * the selected tier's root (the 100 TB point: an archive tier's storage
  * is never listed, let alone read, by a hot query), and the migration
  * job must move whole segments between tiers without losing rows. */
class StagesSuite extends SparkSpec {

  private def tmp(prefix: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/test-tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private val spec = LayoutSpec(
    group = "testdata", name = "events",
    entity = Seq("user_id"), tsCol = "ts_ns", tsIsNanos = true,
    shardNum = 4, segmentDays = 7)

  private lazy val events = Catalog.load(spark, sf0001, "events")

  private val cut = java.time.Instant.parse("2024-01-15T00:00:00Z")
  private def ns(i: java.time.Instant) = i.getEpochSecond * 1000000000L

  private def buildStaged(): StageRoots = {
    val sr = StageRoots(Map("hot" -> tmp("hot"), "warm" -> tmp("warm")))
    Stages.appendTo(events.filter(col("ts_ns") >= ns(cut)), "hot", sr, spec,
      mode = "overwrite")
    Stages.appendTo(events.filter(col("ts_ns") < ns(cut)), "warm", sr, spec,
      mode = "overwrite")
    sr
  }

  private def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
    }.flatten

  test("ON (hot) STAGES scans only the hot root") {
    val sr = buildStaged()
    val hotOnly = Stages.read(spark, spec, sr, Seq("hot"))
    val paths = scannedPaths(hotOnly)
    assert(paths.nonEmpty)
    assert(paths.forall(_.contains(sr.root("hot"))), paths.mkString(","))
    assert(!paths.exists(_.contains(sr.root("warm"))), "warm tier was listed")
    // and the rows are exactly the hot slice
    assert(hotOnly.count() == events.filter(col("ts_ns") >= ns(cut)).count())
  }

  test("unspecified stages read every tier") {
    val sr = buildStaged()
    val all = Stages.read(spark, spec, sr)
    val paths = scannedPaths(all)
    assert(paths.exists(_.contains(sr.root("hot"))))
    assert(paths.exists(_.contains(sr.root("warm"))))
    assert(all.count() == events.count())
  }

  test("BydbQL ON (hot) STAGES routes to the hot frame; unknown stage rejected") {
    import graft.ql.BydbQL
    val sr = buildStaged()
    val stageDfs = sr.roots.keys.map(st =>
      st -> Stages.read(spark, spec, sr, Seq(st))).toMap
    val res = BydbQL.Resource(Stages.read(spark, spec, sr),
      graft.sources.Catalog.defs("events"), fields = Set("value"),
      stageDfs = stageDfs)

    val hot = BydbQL.run(
      "SELECT event_id FROM MEASURE events IN testdata ON (hot) STAGES LIMIT 1000000",
      Map("events" -> res))
    assert(scannedPaths(hot).forall(_.contains(sr.root("hot"))))
    assert(hot.count() == events.filter(col("ts_ns") >= ns(cut)).count())

    val e = intercept[IllegalArgumentException] {
      BydbQL.run("SELECT event_id FROM MEASURE events IN testdata ON (cold) STAGES",
        Map("events" -> res))
    }
    assert(e.getMessage.contains("unknown stage"))

    // a stage request against a non-tiered resource is an error, not a scan
    val flat = res.copy(stageDfs = Map.empty)
    intercept[IllegalArgumentException] {
      BydbQL.run("SELECT event_id FROM MEASURE events IN testdata ON (hot) STAGES",
        Map("events" -> flat))
    }
  }

  test("mid-migration reads see each row exactly once at every phase") {
    val sr = StageRoots(Map("hot" -> tmp("hot"), "warm" -> tmp("warm")))
    // segment-ALIGNED seeding — the lifecycle invariant is that a segment
    // lives in exactly one tier, so tiers must split on a segment boundary
    val segBoundary = Layout.segFor(spec, java.time.Instant.parse("2024-01-10T00:00:00Z"))
    val seg = Layout.segExprFor(spec)
    Stages.appendTo(events.filter(seg < segBoundary), "warm", sr, spec, mode = "overwrite")
    Stages.appendTo(events.filter(seg >= segBoundary), "hot", sr, spec, mode = "overwrite")
    val total = events.count()
    val horizon = java.time.Instant.parse("2024-01-22T00:00:00Z")

    var phases = List.empty[String]
    val moved = Stages.migrate(spark, spec, sr, "hot", "warm", horizon, onPhase = { ph =>
      phases ::= ph
      val hot = Stages.read(spark, spec, sr, Seq("hot")).count()
      val warm = Stages.read(spark, spec, sr, Seq("warm")).count()
      assert(hot + warm == total, s"phase $ph: $hot hot + $warm warm != $total")
      assert(Stages.read(spark, spec, sr).count() == total, s"phase $ph: union")
    })
    assert(phases.reverse == List("copying", "copied", "committed"))
    assert(moved.nonEmpty)
    assert(Stages.read(spark, spec, sr).count() == total)
    // marker cleared — no exclusions linger
    assert(Stages.readMarker(spark, sr.root("warm"), spec).isEmpty)
  }

  test("migration retried after a crash between copy and commit does not duplicate") {
    val sr = StageRoots(Map("hot" -> tmp("hot"), "warm" -> tmp("warm")))
    val segBoundary = Layout.segFor(spec, java.time.Instant.parse("2024-01-10T00:00:00Z"))
    val seg = Layout.segExprFor(spec)
    Stages.appendTo(events.filter(seg < segBoundary), "warm", sr, spec, mode = "overwrite")
    Stages.appendTo(events.filter(seg >= segBoundary), "hot", sr, spec, mode = "overwrite")
    val total = events.count()
    val horizon = java.time.Instant.parse("2024-01-22T00:00:00Z")

    // crash AFTER the copy landed in warm but BEFORE the commit flip
    val boom = intercept[RuntimeException] {
      Stages.migrate(spark, spec, sr, "hot", "warm", horizon,
        onPhase = ph => if (ph == "copied") throw new RuntimeException("boom"))
    }
    assert(boom.getMessage == "boom")
    // marker=copying fences the half-written target: still exactly once
    assert(Stages.read(spark, spec, sr).count() == total)

    // the retry must REPLACE the target copy (dynamic overwrite), not append
    val moved = Stages.migrate(spark, spec, sr, "hot", "warm", horizon)
    assert(moved.nonEmpty)
    assert(Stages.read(spark, spec, sr).count() == total)
    assert(Stages.read(spark, spec, sr, Seq("warm")).count() ==
      events.filter(seg < Layout.segFor(spec, horizon)).count())
    // and a further run is a no-op
    assert(Stages.migrate(spark, spec, sr, "hot", "warm", horizon).isEmpty)
  }

  test("migration moves whole expired segments hot → warm, preserving rows") {
    val sr = StageRoots(Map("hot" -> tmp("hot"), "warm" -> tmp("warm")))
    // everything starts hot; migrate the pre-cut segments to warm
    Stages.appendTo(events, "hot", sr, spec, mode = "overwrite")
    // seed warm with an empty layout dir so Stages.read can union schemas
    Stages.appendTo(events.limit(0), "warm", sr, spec, mode = "overwrite")
    val total = events.count()
    val reportDir = tmp("report")

    val moved = Stages.migrate(spark, spec, sr, "hot", "warm", cut,
      reportDir = Some(reportDir))
    assert(moved.nonEmpty)
    assert(moved.forall(_ < Layout.segFor(spec, cut)))

    // the run documents itself (lifecycle.go verifyMigrationReport shape):
    // report_version + summary rates at 100 + empty errors + snapshot_info,
    // rows_moved counted from the committed TARGET
    val rf = new java.io.File(reportDir).listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(rf.length == 1, rf.mkString(","))
    val report = new String(java.nio.file.Files.readAllBytes(rf.head.toPath), "UTF-8")
    assert(report.contains("\"report_version\":\"1.0\""))
    assert(report.contains(s""""total":${moved.length},"completed":${moved.length},"errors":0"""))
    assert(report.contains("\"completion_rate\":100.0"))
    val expectRows = events
      .filter(Layout.segExprFor(spec) < Layout.segFor(spec, cut)).count()
    assert(report.contains(s""""rows_moved":$expectRows"""))
    assert(report.contains("\"errors\":[]") &&
      report.contains("\"from_stage\":\"hot\"") &&
      report.contains("\"marker\":\"cleared\""))

    val hotLeft = Stages.read(spark, spec, sr, Seq("hot"))
    val warmNow = Stages.read(spark, spec, sr, Seq("warm"))
    // hot retains only post-horizon segments; nothing was lost overall
    assert(hotLeft.agg(min(col(Layout.SegCol))).head().getInt(0) >=
      Layout.segFor(spec, cut))
    assert(hotLeft.count() + warmNow.count() == total)
    // the moved rows are exactly the pre-cut segment rows
    assert(warmNow.count() ==
      events.filter(Layout.segExprFor(spec) < Layout.segFor(spec, cut)).count())
  }

  test("orphan-schema tables archive to gzipped JSONL instead of migrating (orphan.go)") {
    val root = tmp("src")
    val archive = tmp("archive")
    val keptSpec = spec
    val orphanSpec = spec.copy(name = "orphan_deleted_measure")
    Layout.append(events, root, keptSpec, mode = "overwrite")
    Layout.append(events.withColumn("value", col("value") + 1000.0), root,
      orphanSpec, mode = "overwrite")

    // only `events` is still registered; the other table's schema was deleted
    val out = Stages.archiveOrphans(spark, root, "testdata",
      registered = Set("events"), archiveDir = archive, olderThan = cut,
      segmentDays = spec.segmentDays)

    val expired = events.filter(Layout.segExprFor(spec) < Layout.segFor(spec, cut))
    assert(out == Seq("orphan_deleted_measure" -> expired.count()))

    // the archive holds exactly the expired orphan rows, gzip JSON lines,
    // in a horizon-scoped subdir (h<seg>)
    val arch = spark.read.json(s"$archive/testdata/orphan_deleted_measure/h*")
    assert(arch.count() == expired.count())
    assert(arch.agg(min(col("value"))).head().getDouble(0) >= 1000.0)
    val runDirs = new java.io.File(s"$archive/testdata/orphan_deleted_measure")
      .listFiles().filter(_.getName.startsWith("h"))
    assert(runDirs.length == 1)
    assert(runDirs.head.listFiles().map(_.getName).exists(_.endsWith(".json.gz")))

    // manifest row counts match the archive (orphan.go orphanManifest),
    // horizon-scoped like the data
    val mFile = new java.io.File(s"$archive/testdata").listFiles()
      .filter(_.getName.startsWith("manifest_h")).head
    val manifest = new String(java.nio.file.Files.readAllBytes(mFile.toPath), "UTF-8")
    assert(manifest.contains(s""""measure":"orphan_deleted_measure""""))
    assert(manifest.contains(s""""total_rows":${expired.count()}"""))

    // source: expired orphan segments removed, tail kept; sibling untouched
    val orphanLeft = spark.read.parquet(s"$root/testdata/orphan_deleted_measure")
    assert(orphanLeft.count() == events.count() - expired.count())
    assert(spark.read.parquet(s"$root/testdata/events").count() == events.count())

    // re-run: expired segments already gone → zero-row archive entry, and
    // the run-1 archive files are untouched
    assert(Stages.archiveOrphans(spark, root, "testdata", Set("events"),
      archive, cut, spec.segmentDays) == Seq("orphan_deleted_measure" -> 0L))
    assert(spark.read.json(s"$archive/testdata/orphan_deleted_measure/h*")
      .count() == expired.count())

    // a LATER horizon archives the next slice BESIDE run 1's, never over
    // it — rows deleted from the source in run 1 must survive run 2
    val later = java.time.Instant.parse("2024-01-22T00:00:00Z")
    val expired2 = events.filter(
      Layout.segExprFor(spec) >= Layout.segFor(spec, cut) &&
      Layout.segExprFor(spec) < Layout.segFor(spec, later))
    val out2 = Stages.archiveOrphans(spark, root, "testdata", Set("events"),
      archive, later, spec.segmentDays)
    assert(out2 == Seq("orphan_deleted_measure" -> expired2.count()))
    // accumulated archive = run 1 + run 2
    assert(spark.read.json(s"$archive/testdata/orphan_deleted_measure/h*")
      .count() == expired.count() + expired2.count())
    // each run carries its own manifest; run 1's is untouched
    val mDir = new java.io.File(s"$archive/testdata")
    assert(mDir.listFiles().map(_.getName).count(_.startsWith("manifest_h")) == 2)
  }

  test("archiveOrphans crash-retry never overwrites rows whose segments are gone") {
    val root = tmp("src")
    val archive = tmp("archive")
    val orphanSpec = spec.copy(name = "orphan_deleted_measure")
    Layout.append(events, root, orphanSpec, mode = "overwrite")
    val expired = events.filter(Layout.segExprFor(spec) < Layout.segFor(spec, cut))
    val expiredSegs = expired.select(Layout.segExprFor(spec).as("s"))
      .distinct().collect().map(_.getInt(0)).sorted
    assert(expiredSegs.length >= 2, "need two expired segments for the scenario")

    // run 1 completes: archive published, source expired segments deleted
    val out1 = Stages.archiveOrphans(spark, root, "testdata", Set("events"),
      archive, cut, spec.segmentDays)
    assert(out1 == Seq("orphan_deleted_measure" -> expired.count()))

    // simulate the crashed-mid-delete state the r5 ADVICE describes: the
    // archive exists, one expired segment SURVIVED the delete loop (put its
    // rows back), the other segments are gone
    val survivor = expiredSegs.head
    val survivorRows = events.filter(Layout.segExprFor(spec) === survivor)
    Layout.append(survivorRows, root, orphanSpec)

    // the rerun at the SAME horizon must (a) keep every already-archived
    // row — its source segments no longer exist anywhere — and (b) not
    // duplicate the survivor's rows, which the archive already covers
    val out2 = Stages.archiveOrphans(spark, root, "testdata", Set("events"),
      archive, cut, spec.segmentDays)
    assert(out2 == Seq("orphan_deleted_measure" -> expired.count()))
    val arch = spark.read.option("recursiveFileLookup", "true")
      .json(s"$archive/testdata/orphan_deleted_measure/h*")
    assert(arch.count() == expired.count(), "archive lost or duplicated rows")
    // survivor segment deleted from the source this time
    val left = spark.read.parquet(s"$root/testdata/orphan_deleted_measure")
    assert(left.count() == events.count() - expired.count())

    // late-arriving expired data in a segment the archive does NOT cover
    // merges in beside the published run instead of overwriting it
    // seg values are floor DAYS: day head-2 falls in segment head-7,
    // strictly before any segment run 1 archived
    val lateTs = java.time.Instant.ofEpochSecond(
      (expiredSegs.head - 2).toLong * 86400L)
    val late = events.limit(30)
      .withColumn("ts_ns", lit(ns(lateTs)))
      .withColumn("event_id", col("event_id") + 7000000L)
    Layout.append(late, root, orphanSpec)
    val out3 = Stages.archiveOrphans(spark, root, "testdata", Set("events"),
      archive, cut, spec.segmentDays)
    assert(out3 == Seq("orphan_deleted_measure" -> (expired.count() + 30L)))
    val merged = spark.read.option("recursiveFileLookup", "true")
      .json(s"$archive/testdata/orphan_deleted_measure/h*")
    assert(merged.count() == expired.count() + 30L)
  }
}
