package graft.storage

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Catalog
import org.apache.spark.sql.functions._

/** Backup / restore of a layout root (test/cases/backup/backup.go shapes):
  * incremental time-dir sync out, exact-mirror restore back, catalog rides
  * along so the restored root reopens queryable. */
class BackupSuite extends SparkSpec {

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

  test("time-dir naming and listing (timedir.go)") {
    val t = java.time.Instant.parse("2024-03-05T07:09:00Z")
    assert(Backup.timeDir("daily", t) == "2024-03-05")
    assert(Backup.timeDir("hourly", t) == "2024-03-05-07")
    intercept[IllegalArgumentException] { Backup.timeDir("weekly", t) }
  }

  test("backup is incremental; restore mirrors exactly and reopens queryable") {
    val root = tmp("data")
    val dest = tmp("backups")
    CatalogStore.ingest(events, root, entry, mode = "overwrite")
    val td = Backup.timeDir("daily", java.time.Instant.parse("2024-01-21T00:00:00Z"))

    // first backup copies everything
    val r1 = Backup.backup(spark, root, dest, td)
    assert(r1.copied.nonEmpty && r1.deleted.isEmpty)
    assert(r1.copied.exists(_.contains("_graft_catalog")),
      "schema registry must ride along")
    assert(Backup.listTimeDirs(spark, dest) == Seq(td))

    // second backup of the unchanged root copies NOTHING (backup.go
    // incremental upload: present files are skipped)
    val r2 = Backup.backup(spark, root, dest, td)
    assert(r2.copied.isEmpty && r2.deleted.isEmpty && r2.kept > 0)

    // post-backup writes stay local until the next backup
    Layout.append(events.limit(100)
      .withColumn("event_id", col("event_id") + 5000000L), root, entry.spec)
    val preRestoreCount = spark.read.parquet(s"$root/testdata/events").count()
    assert(preRestoreCount == events.count() + 100)

    // restore into a FRESH root: exact copy, catalog opens, counts match
    val fresh = tmp("restored")
    val r3 = Backup.restore(spark, dest, td, fresh)
    assert(r3.copied.nonEmpty)
    val reopened = CatalogStore.open(spark, fresh)
    assert(reopened.contains("testdata/events"))
    assert(spark.read.parquet(s"$fresh/testdata/events").count() == events.count())

    // restore over the DIVERGED original: the post-backup segment files
    // are deleted — the root mirrors the backup exactly (restore.go
    // deletes files the backup does not contain)
    val r4 = Backup.restore(spark, dest, td, root)
    assert(r4.deleted.nonEmpty)
    assert(spark.read.parquet(s"$root/testdata/events").count() == events.count())

    // a second backup after new ingest uploads ONLY the new segments
    Layout.append(events.limit(50)
      .withColumn("event_id", col("event_id") + 9000000L), root, entry.spec)
    val r5 = Backup.backup(spark, root, dest, td)
    assert(r5.copied.nonEmpty && r5.copied.size < r1.copied.size)
  }

  test("restore replaces a same-length file rewritten in place with a newer mtime") {
    // rsync quick-check: size OR mtime difference triggers the copy. A
    // strictly-newer-source rule would silently keep this corruption —
    // backup preserves source mtimes, so the backed-up copy is always
    // OLDER than a post-backup in-place rewrite of the same length.
    val root = tmp("data")
    val dest = tmp("backups")
    val f = new java.io.File(root, "group/table/data.bin")
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, "AAAA".getBytes("UTF-8"))
    val td = "2024-02-01"
    val r1 = Backup.backup(spark, root, dest, td)
    assert(r1.copied == Seq("group/table/data.bin"))

    // rewrite in place: same length, strictly newer mtime than the backup
    java.nio.file.Files.write(f.toPath, "BBBB".getBytes("UTF-8"))
    assert(f.setLastModified(System.currentTimeMillis() + 60000))

    val r2 = Backup.restore(spark, dest, td, root)
    assert(r2.copied == Seq("group/table/data.bin"),
      "diverged file must be restored, not kept as newest-wins")
    assert(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8") == "AAAA")

    // and an untouched round-trip stays a no-op (preserved mtimes equal)
    val r3 = Backup.restore(spark, dest, td, root)
    assert(r3.copied.isEmpty && r3.deleted.isEmpty)
  }
}
