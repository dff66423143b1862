package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Backup / restore of a layout root (banyand/backup/backup.go:177-377,
 * restore.go:158-279, timedir.go; exercised by `test/cases/backup/`).
 *
 * Reference model: a consistent snapshot of each catalog uploads into a
 * TIME DIRECTORY on a remote FS (`<dest>/<timeDir>/...`), incrementally —
 * files already present remotely are skipped and remote files no longer
 * in the snapshot are deleted (backup.go:259-346); restore mirrors the
 * chosen time dir back to the data root the same way, deleting local
 * files the backup does not contain and pruning emptied directories
 * (restore.go:181-279).
 *
 * Spark shape: a layout root IS a file tree on a Hadoop `FileSystem`
 * (file:/hdfs:/s3a:), and segments are immutable once written — so the
 * consistent snapshot is the file listing itself, and backup is a
 * distcp-style sync: the driver diffs the two listings (names + sizes,
 * metadata-only), and the copy set is distributed over executors as an
 * RDD of file pairs — per-partition imperative I/O, the one shape where
 * an RDD is the right tool. At 100 TB the transfer parallelizes across
 * the cluster instead of queueing on one node's NIC; each task opens its
 * own FileSystem handles from the executor-local Hadoop configuration.
 */
object Backup {

  /** Time-directory name for a backup run (backup.go:249-257 getTimeDir):
    * `daily` → yyyy-MM-dd, `hourly` → yyyy-MM-dd-HH, UTC. */
  def timeDir(style: String, now: java.time.Instant): String = {
    val utc = java.time.ZonedDateTime.ofInstant(now, java.time.ZoneOffset.UTC)
    style match {
      case "daily"  => f"${utc.getYear}%04d-${utc.getMonthValue}%02d-${utc.getDayOfMonth}%02d"
      case "hourly" => f"${utc.getYear}%04d-${utc.getMonthValue}%02d-${utc.getDayOfMonth}%02d-${utc.getHour}%02d"
      case other => throw new IllegalArgumentException(
        s"unknown time-dir style '$other' (daily|hourly)")
    }
  }

  /** Existing time dirs under a backup destination, newest last
    * (timedir.go list). */
  def listTimeDirs(spark: SparkSession, dest: String): Seq[String] = {
    val d = new Path(dest)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  /** Transient marker files excluded from backup: an in-flight migration
    * fence must not be restored into a root where no migration is running
    * (it would fence healthy segments), and build-completion markers are
    * session-local state, not data. */
  private val TransientMarkers = Set("_graft_migration", ".graft_done")

  /** (relative path → (byte size, mtime)) for every data file under
    * `root`. Underscore-prefixed top-level dirs are INCLUDED
    * (`_graft_catalog` rides along — a backup that loses the schema
    * registry restores an unqueryable tree); [[TransientMarkers]] are not. */
  private def listFiles(fs: FileSystem, root: Path): Map[String, (Long, Long)] = {
    if (!fs.exists(root)) return Map.empty
    val rootUri = root.toUri.getPath
    val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      if (st.isDirectory) walk(st.getPath)
      else if (!TransientMarkers.contains(st.getPath.getName)) {
        val rel = st.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
        out(rel) = (st.getLen, st.getModificationTime)
      }
    }
    walk(root)
    out.toMap
  }

  final case class SyncReport(copied: Seq[String], deleted: Seq[String], kept: Int)

  /**
   * Mirror `src` into `dst` incrementally: copy files that are new or
   * size-changed, delete destination files absent from the source, prune
   * directories the deletes emptied. The diff is metadata-only on the
   * driver; the copies run as one Spark job over the file list.
   */
  private def sync(spark: SparkSession, src: String, dst: String): SyncReport = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcPath = new Path(src)
    val dstPath = new Path(dst)
    val sfs = srcPath.getFileSystem(conf)
    val dfs = dstPath.getFileSystem(conf)
    val srcFiles = listFiles(sfs, srcPath)
    val dstFiles = listFiles(dfs, dstPath)
    // copy when the destination lacks the file, the size differs, or the
    // mtime differs IN EITHER DIRECTION (rsync quick-check). Size alone
    // misses same-length rewrites; "src strictly newer" would miss a
    // destination file rewritten in place with the same length and a newer
    // mtime than the (source-mtime-preserving) backup copy — restore must
    // deliver an exact mirror, not a newest-wins merge. Unchanged trees
    // still no-op because preserved mtimes compare equal.
    val toCopy = srcFiles.collect {
      case (rel, (len, mtime)) if dstFiles.get(rel)
        .forall { case (dlen, dmtime) => dlen != len || mtime != dmtime } => (rel, mtime)
    }.toSeq.sortBy(_._1)
    val toDelete = (dstFiles.keySet -- srcFiles.keySet).toSeq.sorted

    if (toCopy.nonEmpty) {
      val parts = math.min(toCopy.length,
        math.max(1, spark.sparkContext.defaultParallelism))
      // distributed copy: the session's Hadoop settings (spark.hadoop.*,
      // s3a credentials/endpoints) ship to executors as plain key-value
      // pairs and rebuild a Configuration per partition — a bare
      // `new Configuration()` on the executor would only see core-site.xml
      val confEntries: Array[(String, String)] = {
        val it = conf.iterator()
        val buf = Array.newBuilder[(String, String)]
        while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
        buf.result()
      }
      val (srcStr, dstStr) = (src, dst)
      spark.sparkContext.parallelize(toCopy, parts).foreachPartition { files =>
        val c = new Configuration(false)
        confEntries.foreach { case (k, v) => c.set(k, v) }
        val sp = new Path(srcStr); val dp = new Path(dstStr)
        val s = sp.getFileSystem(c); val d = dp.getFileSystem(c)
        files.foreach { case (rel, mtime) =>
          val from = new Path(sp, rel)
          val to = new Path(dp, rel)
          d.mkdirs(to.getParent)
          val in = s.open(from)
          try {
            val out = d.create(to, true)
            try {
              val buf = new Array[Byte](1 << 20)
              var n = in.read(buf)
              while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
            } finally out.close()
          } finally in.close()
          // preserve the SOURCE mtime (rsync semantics): an unchanged file
          // compares equal on the next sync in either direction, so
          // backup → restore → backup never ping-pongs full copies. Stores
          // that cannot set times just degrade to re-copying (correct,
          // less incremental).
          try d.setTimes(to, mtime, -1) catch { case _: Exception => () }
        }
      }
    }
    toDelete.foreach { rel =>
      dfs.delete(new Path(dstPath, rel), false)
      // prune emptied parents up to (not incl.) the mirror root
      // (restore.go:264-277 cleanEmptyDirs)
      var parent = new Path(dstPath, rel).getParent
      while (parent != null && parent.toUri.getPath != dstPath.toUri.getPath &&
          dfs.exists(parent) && dfs.listStatus(parent).isEmpty) {
        dfs.delete(parent, false)
        parent = parent.getParent
      }
    }
    SyncReport(toCopy.map(_._1), toDelete, (srcFiles.keySet -- toCopy.map(_._1)).size)
  }

  /** Back a data root up into `<dest>/<timeDir>` (backup.go backupAction):
    * incremental against whatever that time dir already holds. */
  def backup(spark: SparkSession, root: String, dest: String,
      timeDirName: String): SyncReport =
    sync(spark, root, s"$dest/$timeDirName")

  /** Restore `<dest>/<timeDir>` into a data root (restore.go): the root
    * becomes an exact mirror — stale local files (e.g. segments written
    * after the backup) are removed, so a catalog `open` on the restored
    * root sees the backed-up state and nothing else. */
  def restore(spark: SparkSession, dest: String, timeDirName: String,
      root: String): SyncReport = {
    val report = sync(spark, s"$dest/$timeDirName", root)
    // a session that scanned the pre-restore root may cache its listings
    spark.catalog.refreshByPath(root)
    report
  }
}
