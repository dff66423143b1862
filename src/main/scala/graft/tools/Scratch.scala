package graft.tools

import org.apache.spark.sql.SparkSession

/** The ONE diagnostic/ablation entry point (not part of the library
  * surface; never invoked by the driver): per-query stage-level timing
  * (default mode, `sbt "runMain graft.tools.Scratch q15_version_dedup"`),
  * plus env-gated ablation arms — SCRATCH_MEDIA (q115/q116 banding
  * geometries through the production `bandedCandidates` hook),
  * SCRATCH_IMG (q120 encode/decode/banding split), SCRATCH_ABLATE
  * (groupBy-aggregate strategy comparisons). Measurements this produced
  * live in BASELINE.md ("floor analysis", banding geometry tables). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SCRATCH_CORES", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SCRATCH_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SCRATCH_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SCRATCH_ADVISORY", "4m")) // match Bench
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SCRATCH_NO_PREPARE skips the full artifact build — the sf25
    // documents-only spot-check runs queries whose inputs either read the
    // scale dir directly or materialize on demand inside the query fn
    if (!sys.env.contains("SCRATCH_NO_PREPARE"))
      graft.SparkEntry.prepare(spark, sfDir)
    if (sys.env.contains("SCRATCH_MEDIA")) {
      // media near-dup ablation: where do q115/q116 spend their wall?
      import org.apache.spark.sql.functions._
      implicit val sp: SparkSession = spark
      import graft.operators.{Dedup, Multimodal}
      val docs = graft.sources.Catalog.load(spark, sfDir, "documents")
      def t[A](tag: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      val blobs = Multimodal.blobsWithReencodes(docs, "doc_id", "text", 5)
      (1 to 2).foreach { round =>
        println(s"--- round $round")
        val sigs = t("sig_barrier")(
          Dedup.barrier(Multimodal.perceptualSignature(blobs)))
        // production banding arithmetic via the package-private hook —
        // the ablation arms cannot drift from Multimodal's tables
        def pairsWith(blockCount: Int, keep: Int, tag: String): Unit = {
          val n = t(tag)(Multimodal
            .bandedCandidates(sigs, "media_id", blockCount, keep).count())
          println(s"  $tag candidates=$n")
        }
        val nSigs = t("distinct_kind_sig")(
          sigs.select("kind", "sig").distinct().count())
        println(s"  total=${sigs.count()} distinctSig=$nSigs")
        pairsWith(4, 1, "cand_old_4x15bit")
        pairsWith(6, 3, "cand_new_C63_30bit")
        pairsWith(5, 2, "cand_C52_24bit")
        val pairs = t("pairs_full_current")(
          Multimodal.perceptualNearDupPairs(blobs).count())
        println(s"  pairs=$pairs")
        t("q116_full")(
          Multimodal.perceptualDedupSurvivors(blobs).queryExecution
            .toRdd.foreach(_ => ()))
      }
      spark.stop(); return
    }
    if (sys.env.contains("SCRATCH_IMG")) {
      // q120 ablation: fixture encode vs decode+hash vs banding
      implicit val sp: SparkSession = spark
      import graft.operators.{Dedup, Multimodal}
      val docs = graft.sources.Catalog.load(spark, sfDir, "documents")
      def t[A](tag: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      (1 to 2).foreach { round =>
        println(s"--- round $round")
        val blobs = Multimodal.imageBlobsFromDocs(docs, "doc_id", "text")
        val nb = t("encode_only")(blobs.count())
        println(s"  blobs=$nb")
        val sigs = t("sig_barrier")(
          Dedup.barrier(Multimodal.decodedSignature(blobs)
            .select("media_id", "kind", "sig")))
        println(s"  sigs=${sigs.count()}")
        val n = t("full_query")(
          Multimodal.decodedNearDupPairs(blobs, maxDist = 2).count())
        println(s"  pairs=$n")
        // the materialized-table path q120 actually runs
        val mat = graft.SparkEntry.queries("q120_decoded_near_dup")
        val nm = t("q120_materialized")(
          mat(spark, sfDir).queryExecution.toRdd.count())
        println(s"  q120rows=$nm")
      }
      spark.stop(); return
    }
    if (sys.env.contains("SCRATCH_MERKLE")) {
      // q70/q71 floor ablation: how much of the diff's wall is the
      // artifact scan + per-job constant vs the join itself?
      import org.apache.spark.sql.functions.col
      def t[A](tag: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      graft.SparkEntry.prepare(spark, sfDir)
      (1 to 3).foreach { round =>
        println(s"--- round $round")
        t("job_launch_floor")(spark.range(1).queryExecution.toRdd.count())
        val fa = graft.SparkEntry.queries("q70_property_merkle_diff")
        // the two artifact paths the diff reads, scanned bare
        val key = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
        val la = spark.read.parquet(
          s"/root/repo/target/graft-io/propleaves_a_$key/leaves")
        val lb = spark.read.parquet(
          s"/root/repo/target/graft-io/propleaves_b_$key/leaves")
        t("scan_leaves_a")(la.queryExecution.toRdd.count())
        t("scan_leaves_b")(lb.queryExecution.toRdd.count())
        t("scan_both_union")(la.unionByName(lb).queryExecution.toRdd.count())
        t("diff_join_full")(
          graft.storage.PropertyStore.merkleDiffFromLeaves(la, lb)
            .queryExecution.toRdd.count())
        t("q70_query_fn")(fa(spark, sfDir).queryExecution.toRdd.count())
        t("q71_query_fn")(graft.SparkEntry.queries("q71_property_repair_plan")(
          spark, sfDir).queryExecution.toRdd.count())
      }
      spark.stop(); return
    }
    if (sys.env.contains("SCRATCH_MINHASH")) {
      // q24 funnel breakdown (r12 verdict #3): candidates generated vs
      // size-gate survivors vs verified-emitted, plus the full-query wall
      // before/after the gate — drives the BASELINE.md q24 analysis.
      import graft.operators.Dedup
      val docs = graft.sources.Catalog.load(spark, sfDir, "documents")
      def t[A](tag: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      (1 to 2).foreach { round =>
        println(s"--- round $round")
        val funnel = t("funnel")(Dedup.minhashLshFunnel(
          docs, "doc_id", "text", w = 3, bands = 32, rowsPerBand = 2,
          threshold = 0.5))
        println("  " + funnel.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
          .mkString(" "))
        val n = t("q24_full")(Dedup.minhashLshPairs(
          docs, "doc_id", "text", w = 3, bands = 32, rowsPerBand = 2,
          threshold = 0.5).queryExecution.toRdd.count())
        println(s"  pairs=$n")
      }
      spark.stop(); return
    }
    if (sys.env.contains("SCRATCH_ABLATE")) {
      import org.apache.spark.sql.functions._
      val df = graft.sources.Catalog.load(spark, sfDir, "events")
        .withColumn("bucket_min", expr("ts_ns DIV 60000000000"))
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val dur = for {
              s <- si.submissionTime; e <- si.completionTime
            } yield e - s
            stages.add(s"stage${si.stageId} tasks=${si.numTasks} " +
              s"dur=${dur.getOrElse(-1L)}ms " +
              s"runTime=${si.taskMetrics.executorRunTime}ms " +
              s"cpuTime=${si.taskMetrics.executorCpuTime / 1000000}ms " +
              s"deserTime=${si.taskMetrics.executorDeserializeTime}ms " +
              s"gc=${si.taskMetrics.jvmGCTime}ms " +
              s"shufWrite=${si.taskMetrics.shuffleWriteMetrics.bytesWritten} " +
              s"spill=${si.taskMetrics.diskBytesSpilled}")
          }
        })
      def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
        (1 to 4).foreach { i =>
          stages.clear()
          val t0 = System.nanoTime()
          mk.queryExecution.toRdd.foreach(_ => ())
          println(f"$tag run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
          if (i == 4) {
            Thread.sleep(300)
            stages.forEach(s => println(s"  $s"))
          }
        }
      val split8 = s"/tmp/scratch_events8"
      if (!new java.io.File(split8).exists())
        df.repartition(16).write.mode("overwrite").parquet(split8)
      val df16 = spark.read.parquet(split8)
      time("A16_count")(df16.groupBy("user_id", "bucket_min")
        .agg(count(lit(1)).as("c")))
      time("C16_minstruct")(df16.groupBy("user_id", "bucket_min")
        .agg(graft.functions.MinStructAgg.minStruct(struct(
          negate(col("event_id")).as("__negv"), col("value"))).as("__lv")))
      time("A_count")(df.groupBy("user_id", "bucket_min")
        .agg(count(lit(1)).as("c")))
      time("B_maxby")(df.groupBy("user_id", "bucket_min")
        .agg(max_by(col("value"), col("event_id")).as("value"),
          max(col("event_id")).as("version")))
      time("C_minstruct")(df.groupBy("user_id", "bucket_min")
        .agg(graft.functions.MinStructAgg.minStruct(struct(
          negate(col("event_id")).as("__negv"), col("value"))).as("__lv")))
      time("D_scan")(df.select("user_id", "bucket_min", "event_id", "value"))
      spark.stop(); return
    }
    val names = args.toSeq match {
      case Nil => Seq("q15_version_dedup", "q14_element_dedup")
      case xs  => xs
    }
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = for { s <- si.submissionTime; e <- si.completionTime } yield e - s
          stages.add(s"stage${si.stageId} tasks=${si.numTasks} " +
            s"dur=${dur.getOrElse(-1L)}ms runTime=${si.taskMetrics.executorRunTime}ms " +
            s"cpu=${si.taskMetrics.executorCpuTime / 1000000}ms " +
            s"shufW=${si.taskMetrics.shuffleWriteMetrics.bytesWritten}")
        }
      })
    val runs = sys.env.getOrElse("SCRATCH_RUNS", "5").toInt
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to runs).foreach { i =>
        stages.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        println(f"$n run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
        if (i == runs && sys.env.contains("SCRATCH_STAGES")) {
          Thread.sleep(300)
          stages.forEach(s => println(s"  $s"))
        }
      }
      if (sys.env.contains("SCRATCH_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
