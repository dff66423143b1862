package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Schema registry + parquet source layer.
 *
 * The reference registers Groups/Measures/Streams with physical options
 * (shard_num, segment_interval, ttl — common/v1/common.proto:96-189) and
 * resolves series via an index (banyand/measure/query.go:314). On Spark the
 * same responsibilities collapse to: a table → parquet path mapping, a
 * declared entity (series key) used for partition/bucket pruning, and
 * Catalyst's own predicate pushdown. At 100 TB the layout contract is:
 * one parquet dataset per (group, resource), hive-partitioned by
 * `seg=<date>` (segment_interval) and bucketed/sorted by the entity hash
 * (shard_num) so entity-EQ queries prune to one shard of one segment.
 *
 * Local testdata is a single file per table, so [[Catalog.load]] only
 * normalizes schema quirks (ns timestamps). The partitioned/bucketed
 * layout itself lives in [[graft.storage.Layout]] (write routing +
 * entity/segment pruning) with its pruning proven by `LayoutSuite`.
 */
final case class TableDef(
    name: String,
    /** entity = series key (docs/concept/data-model.md:382-391). */
    entity: Seq[String] = Nil,
    /** timestamp column (ms precision in the reference). */
    tsCol: Option[String] = None,
    /** version column for latest-version-wins dedup, if the table has one. */
    versionCol: Option[String] = None,
    /** columns that are array-typed tags (HAVING-able). */
    arrayTags: Set[String] = Set.empty,
    /** tags carrying an analyzer index rule (database/v1/schema.proto:
      * 180-189): MATCH is only legal on these. None = undeclared —
      * permissive (any string tag analyzable with the default analyzer);
      * Some(set) rejects MATCH on tags outside it, the reference's
      * behavior for tags whose index rule has no analyzer (stream golden
      * case gen_err_match_trace_id, WantErr). */
    matchableTags: Option[Set[String]] = None,
    /** IndexRuleBinding effective window per analyzer-indexed tag
      * (database/v1/schema.proto:203-214 begin_at/expire_at): the
      * reference resolves index rules through bindings filtered by
      * wall-clock now — a binding with begin_at > now or expire_at < now
      * contributes no rules (banyand/metadata/client.go:438-445), so a
      * MATCH outside the window rejects exactly like an unindexed tag.
      * Window is inclusive on both ends, mirroring the client's
      * After/Before skip conditions. No entry = always in effect. */
    matchableWindows: Map[String, (java.time.Instant, java.time.Instant)] = Map.empty,
    /** resource creation time: a query's time-range begin is clamped
      * forward to this (banyand/liaison/grpc/schema_revision.go:32-49
      * clampTimeRangeBegin) so pre-creation timestamps are never served. */
    createdAt: Option[java.time.Instant] = None)

object Catalog {

  /** Raw-epoch-nanos expression for an events `ts` column, independent of
    * BOTH the physical encoding and the session timezone. The driver has
    * shipped two encodings across testdata generations: parquet
    * `timestamp[ns]` (readable only as long via nanosAsLong) and
    * `timestamp[us]` (TIMESTAMP_NTZ). NTZ wall-clock is UTC by the
    * generator's contract; wall-clock difference from the NTZ epoch is
    * timezone-free arithmetic, unlike a cast through TimestampType which
    * would shift with `spark.sql.session.timeZone`. */
  def tsNanosExpr(dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => col("ts")
      case TimestampNTZType =>
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000")
      case TimestampType => expr("unix_micros(ts) * 1000")
      case other =>
        throw new IllegalArgumentException(s"unsupported events ts type: $other")
    }
  }

  /** Parquet `timestamp[ns]` is not readable as TimestampType by Spark
    * (PARQUET_TYPE_ILLEGAL); read nanos as long and truncate to micros —
    * same truncation DuckDB applies casting ns→µs, so oracle results agree.
    * A `timestamp[us]` encoding instead KEEPS `ts` as the physical column
    * (so time filters mirrored onto it still push down to the parquet scan
    * — see Planners.applyTime) and derives the raw-nanos `ts_ns` that all
    * engine arithmetic runs on. */
  def readParquet(spark: SparkSession, dir: String, table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$table.parquet")
    table match {
      case "events" =>
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            // keep the raw nanos for exact arithmetic, expose a µs timestamp
            raw.withColumn("ts_ns", col("ts"))
              .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
          case dt =>
            raw.withColumn("ts_ns", tsNanosExpr(dt))
        }
      case _ => raw
    }
  }

  /** Registry for the driver testdata playing the reference's roles
    * (FIXTURES.md §B). */
  val defs: Map[String, TableDef] = Map(
    // events has a unique (user_id, ts) per row, so the version-dedup merge
    // is a no-op — leave versionCol unset and let the dedicated dedup
    // queries attach one (skipping a provably-empty window pass, same
    // outcome as the reference's merge when no duplicate versions exist).
    // tsCol is the raw-nanos long column so time-range filters push down to
    // the parquet scan as int64 predicates (ordering is identical to `ts`).
    "events" -> TableDef("events", entity = Seq("user_id"), tsCol = Some("ts_ns")),
    "documents" -> TableDef("documents"),
    "embeddings" -> TableDef("embeddings"),
    "lineitem" -> TableDef("lineitem", entity = Seq("l_suppkey"), tsCol = Some("l_shipdate")),
    "orders" -> TableDef("orders", entity = Seq("o_custkey"), tsCol = Some("o_orderdate")),
    "customer" -> TableDef("customer"),
    "supplier" -> TableDef("supplier"),
    "part" -> TableDef("part"),
    "nation" -> TableDef("nation"),
    "region" -> TableDef("region"))

  /** Resolved-table cache, keyed per session: the reference resolves a
    * resource from its schema registry once, not per query — re-running
    * `spark.read.parquet` per query re-infers the footer schema and
    * re-analyzes the relation (~120 ms of pure floor on a toy query).
    * DataFrames are immutable plans, so reuse is safe; testdata paths are
    * read-only (mutable layouts go through [[graft.storage.Layout]], which
    * reads directly and carries its own cache invalidation). */
  private val resolved =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, table: String): DataFrame =
    resolved.computeIfAbsent((System.identityHashCode(spark), dir, table),
      _ => readParquet(spark, dir, table))

  /** Register a pre-resolved frame for (dir, table) — the engine's OWN
    * storage layout standing in for a raw source file. Ingest happens once
    * (split into scan-parallel files); queries read the engine layout,
    * which is the reference's read shape: its stores never serve queries
    * from a user's original upload. */
  def register(spark: SparkSession, dir: String, table: String, df: DataFrame): Unit = {
    resolved.put((System.identityHashCode(spark), dir, table), df)
    ()
  }
}
