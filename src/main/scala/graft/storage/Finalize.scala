package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Trace finalization sampling — the background backstop for the in-merge
 * trace retention filter (reference `CHANGES.md` §0.11.0, first feature:
 * `PIPELINE_EVENT_FINALIZE`). Spans that arrive AFTER their segment's hot
 * merge ran were never offered to the sampler chain; without a backstop
 * they are retained forever. The reference periodically sweeps cooled
 * segments (`segEnd < now − finalize_grace`) and force-merges each
 * shard's un-finalized parts through the group's registered sampler
 * chain, stamping a per-part `finalizeGen` (written to disk before the
 * part metadata, so a crash cannot double-sample on replay), with
 * re-rounds bounded by a hard `max_finalize_rounds`.
 *
 * Spark shape: one bounded driver sweep over the layout's cooled
 * (seg, shard) directories; per directory, the un-finalized data files
 * (file set difference against the generation state) are read as one
 * small DataFrame, pushed through the SAME sampler transform the hot
 * path uses (e.g. [[graft.operators.TracePipeline.latencyStatusSample]]),
 * and swapped in via a staged-commit manifest — the exact crash-safety
 * discipline of [[Layout.compactSegments]]. The reference's single
 * node-wide concurrency-1 scanner maps to the sweep being a maintenance
 * job, not a query-path operation.
 *
 * Exactly-once across crashes: the per-directory `.finalize-commit`
 * manifest (staged file moves + old file deletes + the new generation
 * state) is written atomically BEFORE any live file is touched — the
 * analogue of the reference writing `finalizeGen` before part metadata.
 * A crash before the manifest leaves the directory un-finalized (the
 * next sweep redoes the whole round from the same inputs); a crash after
 * it is completed by the next sweep's recovery replaying the manifest
 * (moves and deletes are existence-checked, the state write is a
 * rewrite) — the sampler NEVER re-runs over rows a committed round
 * already decided.
 *
 * Composition with [[Layout.compactSegments]]: compaction rewrites the
 * state file set through [[compactedStateContent]] — a directory whose
 * inputs were ALL finalized stays finalized (its compacted output holds
 * exactly the committed survivors), and a directory with any
 * un-finalized input re-enters the sweep whole, the analogue of the
 * reference min-propagating `finalizeGen` across ordinary merges. Only
 * that second, mixed case re-offers already-kept rows to the sampler,
 * and THE invariant a sampler must satisfy for it is keep-stability on
 * survivors: re-sampling a batch made of previously-kept whole traces
 * (possibly merged with new ones) must keep them again. Per-trace
 * determinism (the reference's FNV-1a trace-id hash; "a trace is never
 * half-kept") is the usual way to get that, and evidence-aggregating
 * samplers like [[graft.operators.TracePipeline.latencyStatusSample]]
 * qualify because a kept trace retains ALL its spans, so its keep
 * evidence re-derives. A batch-RATE sampler ("keep 1% of healthy
 * traces") is NOT keep-stable and may only be used if finalized rows
 * never co-mingle with un-finalized ones in a directory (e.g. compact
 * before the first finalize sweep, or never after).
 *
 * Coverage is best-effort, like the reference: a segment TTL-deleted
 * before its sweep is a miss, not an error.
 */
object Finalize {

  /** One directory's sweep outcome. */
  final case class Report(seg: Int, shard: Int, gen: Long,
      filesSampled: Int, rowsBefore: Long, rowsAfter: Long)

  private[storage] val StateName = ".finalize.state"
  private val CommitName = ".finalize-commit"
  private val StagingName = ".finalize-staging"

  /** generation state: (gen, rounds, finalized file names). */
  private final case class State(gen: Long, rounds: Int, files: Set[String])

  /**
   * Post-compaction state maintenance, called by
   * [[Layout.compactSegments]] inside ITS commit manifest (crash-safe via
   * the same replay): when every pre-compaction data file of `dir` was
   * finalized, the compacted output holds exactly the rows a committed
   * sampling round already decided, so the rewritten state names the new
   * files and the directory STAYS finalized — the sampler never re-runs
   * over committed survivors, even one that is only keep-stable on whole
   * batches (a healthy-rate sampler re-offered its own survivors would
   * silently re-drop them). When any input was un-finalized the output
   * file set re-enters the sweep (min-propagating `finalizeGen`, like the
   * reference's merges) — the state keeps its gen/rounds but drops the
   * now-deleted file names so they cannot accrete forever.
   *
   * @return the escaped state content to write, or None when the
   *         directory has no finalize state at all
   */
  private[storage] def compactedStateContent(
      fs: org.apache.hadoop.fs.FileSystem, dir: org.apache.hadoop.fs.Path,
      oldNames: Set[String], newNames: Seq[String]): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, StateName)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      s.split('\n').toList match {
        case g :: r :: rest =>
          val files = rest.filter(_.nonEmpty).toSet
          val kept =
            if (oldNames.subsetOf(files)) newNames.toList.sorted
            else Nil
          Some((g :: r :: kept).mkString("\\n"))
        case _ => None
      }
    }
  }

  /**
   * Sweep every cooled (seg, shard) directory of the layout whose data
   * files include un-finalized ones, pushing those files' rows through
   * `sampler` and committing the survivors in place.
   *
   * @param now       sweep wall clock (passed in — deterministic tests)
   * @param graceDays settling window: a segment is cooled when its LAST
   *                  covered day ended at least `graceDays` before `now`
   *                  (the reference's `finalize_grace`, default 5m there;
   *                  day-granular here because segments are day-aligned)
   * @param sampler   spans → kept spans; MUST be deterministic per trace
   * @param maxRounds hard bound on re-rounds per directory (reference
   *                  `max_finalize_rounds`, default 8)
   */
  def finalizeSegments(spark: SparkSession, root: String, spec: LayoutSpec,
      sampler: DataFrame => DataFrame, now: java.time.Instant,
      graceDays: Int = 1, maxRounds: Int = 8): Seq[Report] = {
    require(graceDays >= 0 && maxRounds >= 1, "graceDays/maxRounds must be sane")
    import org.apache.hadoop.fs.Path
    val table = new Path(Layout.path(root, spec))
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(table)) return Nil
    // cooled = the segment's last covered epoch-day ended ≥ graceDays ago
    val horizonSeg = Layout.segFor(spec,
      now.minus(java.time.Duration.ofDays(graceDays.toLong)))

    def dataFiles(dir: Path): Seq[Path] =
      fs.listStatus(dir).toSeq
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
        .map(_.getPath)

    def readState(dir: Path): State = {
      val p = new Path(dir, StateName)
      if (!fs.exists(p)) State(0L, 0, Set.empty)
      else {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        s.split('\n').toList match {
          case g :: r :: rest =>
            State(g.toLong, r.toInt, rest.filter(_.nonEmpty).toSet)
          case _ => State(0L, 0, Set.empty)
        }
      }
    }

    def writeFile(p: Path, content: String): Unit = {
      val out = fs.create(p, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }

    /** replay a commit manifest: MOVE/DEL are existence-checked, STATE is
      * a rewrite — idempotent, so a crashed apply completes exactly the
      * committed round. */
    def applyManifest(dir: Path): Unit = {
      val m = new Path(dir, CommitName)
      val in = fs.open(m)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      lines.foreach { line =>
        line.split('\t') match {
          case Array("MOVE", src, dst) =>
            val s = new Path(src)
            if (fs.exists(s)) { fs.rename(s, new Path(dst)); () }
          case Array("DEL", p) =>
            val f = new Path(p)
            if (fs.exists(f)) { fs.delete(f, false); () }
          case Array("STATE", content) =>
            writeFile(new Path(dir, StateName), content.replace("\\n", "\n"))
          case _ => ()
        }
      }
      fs.delete(m, false)
      ()
    }

    val dirs = for {
      segSt <- fs.listStatus(table).toSeq
      if segSt.isDirectory && segSt.getPath.getName.startsWith(s"${Layout.SegCol}=")
      seg = segSt.getPath.getName.stripPrefix(s"${Layout.SegCol}=").toInt
      // the segment covers [seg, seg + segmentDays) — cooled when the
      // whole window is at or before the horizon
      if seg + spec.segmentDays <= horizonSeg
      shardSt <- fs.listStatus(segSt.getPath).toSeq
      if shardSt.isDirectory && shardSt.getPath.getName.startsWith(s"${Layout.ShardCol}=")
    } yield (seg,
      shardSt.getPath.getName.stripPrefix(s"${Layout.ShardCol}=").toInt,
      shardSt.getPath)

    val reports = dirs.flatMap { case (seg, shard, dir) =>
      // finish a crashed earlier round before anything else
      if (fs.exists(new Path(dir, CommitName))) applyManifest(dir)
      val staging = new Path(dir, StagingName)
      if (fs.exists(staging)) fs.delete(staging, true)
      val st = readState(dir)
      val unfinalized = dataFiles(dir).filterNot(f => st.files(f.getName))
      if (unfinalized.isEmpty || st.rounds >= maxRounds) None
      else {
        val rows = spark.read.parquet(unfinalized.map(_.toString): _*)
        val kept = sampler(rows)
        val rowsBefore = rows.count()
        kept.write.mode("overwrite").parquet(staging.toString)
        val staged = dataFiles(staging)
        val rowsAfter = spark.read.parquet(staging.toString).count()
        val newState = State(st.gen + 1, st.rounds + 1,
          st.files ++ staged.map(_.getName))
        val stateContent =
          (s"${newState.gen}" :: s"${newState.rounds}" ::
            newState.files.toList.sorted).mkString("\n")
        val manifest =
          (staged.map(f => s"MOVE\t$f\t$dir/${f.getName}") ++
            unfinalized.map(f => s"DEL\t$f") ++
            Seq(s"STATE\t${stateContent.replace("\n", "\\n")}"))
            .mkString("", "\n", "\n")
        Failpoints.hit("finalize.staged")
        val tmp = new Path(dir, s"$CommitName.tmp")
        writeFile(tmp, manifest)
        fs.rename(tmp, new Path(dir, CommitName))
        Failpoints.hit("finalize.committed")
        // the committed round is now durable — apply it
        applyManifest(dir)
        fs.delete(staging, true)
        Some(Report(seg, shard, newState.gen, unfinalized.length,
          rowsBefore, rowsAfter))
      }
    }
    spark.catalog.refreshByPath(Layout.path(root, spec))
    reports.sortBy(r => (r.seg, r.shard))
  }
}
