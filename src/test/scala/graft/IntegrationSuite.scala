package graft

import java.nio.file.Files

import graft.engine.Planners
import graft.model._
import graft.sources.{Catalog, TableDef}
import graft.storage.{Layout, LayoutSpec, Write}
import graft.streaming.{TopNStream, TopNStreamConfig}
import org.apache.spark.sql.functions._

/**
 * Full-path integration: events are INGESTED through the streaming write
 * sink into the partitioned layout, then queried through the measure
 * planner and the streaming TopN pre-compute — and every result must
 * equal the same computation over the original source. This is the
 * end-to-end journey a reference user takes (gRPC write → storage →
 * query / TopN read) re-expressed on Spark.
 */
class IntegrationSuite extends SparkSpec {

  private def tmp(prefix: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/test-tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  test("ingest → layout → measure query → streaming TopN, all paths agree") {
    val events = Catalog.load(spark, sf0001, "events")
    val spec = LayoutSpec("it", "events", entity = Seq("user_id"),
      tsCol = "ts_ns", tsIsNanos = true, shardNum = 4, segmentDays = 7)
    val root = tmp("itlayout")

    // 1. continuous ingestion through the streaming sink (S7)
    val srcDir = tmp("itsrc")
    Files.copy(java.nio.file.Paths.get(sf0001, "events.parquet"),
      java.nio.file.Paths.get(srcDir, "events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(rawSchema).parquet(srcDir)
      .withColumn("ts_ns", graft.sources.Catalog.tsNanosExpr(rawSchema("ts").dataType))
    Write.streamSink(stream, root, spec, tmp("itckpt")).awaitTermination()

    // 2. measure query over the ingested layout vs over the source (S1)
    val ingested = Layout.read(spark, root, spec)
    val tdef = TableDef("events", entity = Seq("user_id"), tsCol = Some("ts_ns"))
    val q = MeasureQuery(Seq("it"), "events",
      groupByTags = Seq("event_type"), agg = Some((AggFn.Sum, "value")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      Planners.measure(df, tdef, q).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(rows(ingested) == rows(events))

    // 3. entity scan prunes AND returns the same rows as a source filter
    val scan = Layout.entityScan(spark, root, spec, Seq(7L))
    assert(scan.count() == events.filter(col("user_id") === 7L).count())

    // 4. streaming TopN over the ingested layout equals the batch
    //    pre-compute over the source (ST1-ST5 + §3.3)
    val pts = ingested.select(
      timestamp_micros(expr("ts_ns DIV 1000")).as("ts"),
      col("user_id").cast("string").as("entity"),
      floor(col("value")).cast("long").as("value"))
    // bounded replay: flatten the layout read and stream it back
    val flat = tmp("itflat") + "/data"
    ingested.drop(Layout.SegCol, Layout.ShardCol).write.parquet(flat)
    val layoutStream = spark.readStream
      .schema(spark.read.parquet(flat).schema).parquet(flat)
    val ptsStream = layoutStream.select(
      timestamp_micros(expr("ts_ns DIV 1000")).as("ts"),
      col("user_id").cast("string").as("entity"),
      floor(col("value")).cast("long").as("value"))
    val streamed = TopNStream.replayToBatch(ptsStream,
      TopNStreamConfig(intervalMs = 3600000L, n = 3, countersNumber = 1 << 20),
      spark, tmp("itckpt2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Planners.topNBuckets(events, "ts_ns", "user_id",
      floor(col("value")).cast("long"), intervalMs = 3600000L, n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
  }

  test("deployment lifecycle: staged ingest → persisted catalog → reopened " +
      "session queries → migration → TTL") {
    import graft.storage.{CatalogEntry, CatalogStore, Stages, StageRoots}
    val events = Catalog.load(spark, sf0001, "events")
    // a SEGMENT boundary (epoch-day 19740 = 7×2820): lifecycle tiers hold
    // whole segments — a segment lives in exactly one tier, the invariant
    // Stages.migrate's overwrite copy relies on
    val cut = java.time.Instant.parse("2024-01-18T00:00:00Z")
    def ns(i: java.time.Instant) = i.getEpochSecond * 1000000000L

    // 1. ingest into hot/warm tiers, analyzer column materialized at write
    val entry = CatalogEntry("it2", "events", entity = Seq("user_id"),
      tsCol = "ts_ns", tsIsNanos = true, shardNum = 4, segmentDays = 7,
      fields = Seq("value"),
      stageRoots = Map("hot" -> tmp("it2hot"), "warm" -> tmp("it2warm")),
      analyzerColumns = Map("event_type" -> "standard"))
    val spec = entry.spec
    val sr = StageRoots(entry.stageRoots)
    Stages.appendTo(events.filter(col("ts_ns") >= ns(cut)), "hot", sr, spec,
      mode = "overwrite")
    Stages.appendTo(events.filter(col("ts_ns") < ns(cut)), "warm", sr, spec,
      mode = "overwrite")
    val metaRoot = tmp("it2meta")
    CatalogStore.save(spark, metaRoot, entry)

    // 2. a "new session": open the catalog, query with stage routing and a
    //    MATCH that must hit the STORED token column
    val resources = CatalogStore.open(spark, metaRoot)
    val hot = ql.BydbQL.run(
      """SELECT event_id, user_id FROM MEASURE events IN it2 ON (hot) STAGES
        |WHERE event_type MATCH ('click') LIMIT 1000000""".stripMargin, resources)
    assert(!hot.queryExecution.executedPlan.toString.toLowerCase
      .contains("analyzertokens"), "MATCH re-tokenized despite ingest-time tokens")
    assert(hot.count() == events.filter(col("ts_ns") >= ns(cut) &&
      col("event_type") === "click").count())

    // 3. lifecycle migration drains expired hot segments into warm
    val total = events.count()
    Stages.migrate(spark, spec, sr, "hot", "warm",
      java.time.Instant.parse("2024-01-25T00:00:00Z"))
    val reopened = CatalogStore.open(spark, metaRoot)
    assert(ql.BydbQL.run(
      "SELECT event_id FROM MEASURE events IN it2 LIMIT 10000000", reopened)
      .count() == total)

    // 4. retention: everything is now past a far-future horizon
    val droppedWarm = graft.storage.Layout.enforceTtl(spark, sr.root("warm"), spec,
      java.time.Instant.parse("2030-01-01T00:00:00Z"))
    assert(droppedWarm.nonEmpty)
  }
}
