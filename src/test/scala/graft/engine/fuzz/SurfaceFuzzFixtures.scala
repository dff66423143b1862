package graft.engine.fuzz

import graft.sources.TableDef
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.util.Random

/**
 * Fixtures for the stream / trace / property differential fuzzers —
 * the three query surfaces the measure fuzzer (FuzzFixture) does not
 * cover. The reference generates cases for these models too (its 0.11
 * trace generator under `test/cases/trace/cmd/generate`, the stream
 * gen_* families); this is the same idea with the fixture shaped so
 * every compared plan has a TOTAL order:
 *
 *  - `fuzzs` (stream): duplicated element ids exercise element dedup,
 *    but `ts` is globally UNIQUE — the (sort key, ts, entity)
 *    tie-break chain is therefore total, so limit/offset cuts are
 *    deterministic and any multiset divergence is a semantics bug.
 *  - `fuzzt` (trace): ~100 traces × ~6 spans; span columns are scalar
 *    (arrays would drag list-inside-struct ordering differences between
 *    engines into the compare — covered elsewhere); trace-id tiebreak
 *    makes the trace cut total.
 *  - `fuzzp` (property): several revisions per id with a globally
 *    unique `rev`, tombstones planted (`deleted` true AND null), so
 *    last-writer-wins + tombstone hiding are always live.
 *
 * All three tables render once into ONE directory so a single
 * tools/duck_server.py process serves every surface.
 */
object SurfaceFuzzFixtures {
  import FuzzFixture.{Svcs, Insts, Regions, Codes, Ratios, LabelPool, PortPool, BaseSec, TsSlots}

  val Dir = "target/fuzz_surfaces"

  // ---------- stream ----------

  val StreamName = "fuzzs"
  val streamSchema: StructType = StructType(Seq(
    StructField("eid", StringType, nullable = false),
    StructField("svc", StringType, nullable = false),
    StructField("inst", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("region", StringType, nullable = true),
    StructField("code", LongType, nullable = true),
    StructField("ratio", DoubleType, nullable = true),
    StructField("labels", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("ports", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("dur", LongType, nullable = true)))
  val streamCols: Seq[String] = streamSchema.fields.map(_.name).toSeq
  val streamTdef: TableDef = TableDef(StreamName, entity = Seq("svc", "inst"),
    tsCol = Some("ts"), arrayTags = Set("labels", "ports"))

  /** Unique ts inside a fuzzable slot grid: second granularity carries the
    * time-range semantics, the +i*1000 ns offset makes every row distinct. */
  private def streamRows(seed: Long, n: Int): Seq[Row] = {
    val rnd = new Random(seed)
    def opt[A](p: Double)(a: => A): Any = if (rnd.nextDouble() < p) null else a
    (0 until n).map { i =>
      Row(
        s"e${rnd.nextInt(math.max(1, n * 3 / 5))}",
        Svcs(rnd.nextInt(Svcs.size)),
        Insts(rnd.nextInt(Insts.size)),
        (BaseSec + rnd.nextInt(TsSlots)) * 1000000000L + i.toLong * 1000L,
        opt(0.15)(Regions(rnd.nextInt(Regions.size))),
        opt(0.15)(Codes(rnd.nextInt(Codes.size))),
        opt(0.20)(Ratios(rnd.nextInt(Ratios.size))),
        opt(0.12)(Seq.fill(rnd.nextInt(4))(LabelPool(rnd.nextInt(LabelPool.size))).distinct),
        opt(0.12)(Seq.fill(rnd.nextInt(3))(PortPool(rnd.nextInt(PortPool.size))).distinct),
        opt(0.20)(rnd.nextInt(40).toLong - 10L))
    }
  }

  // ---------- trace ----------

  val TraceName = "fuzzt"
  val traceSchema: StructType = StructType(Seq(
    StructField("tid", StringType, nullable = false),
    StructField("sid", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("svc", StringType, nullable = false),
    StructField("region", StringType, nullable = true),
    StructField("code", LongType, nullable = true),
    StructField("ratio", DoubleType, nullable = true),
    StructField("dur", LongType, nullable = true)))
  val traceCols: Seq[String] = traceSchema.fields.map(_.name).toSeq
  /** Span tag columns each span struct carries (everything but the trace id). */
  val spanCols: Seq[String] = traceCols.filterNot(_ == "tid")
  val traceTdef: TableDef = TableDef(TraceName, tsCol = Some("ts"))

  private def traceRows(seed: Long, n: Int): Seq[Row] = {
    val rnd = new Random(seed)
    def opt[A](p: Double)(a: => A): Any = if (rnd.nextDouble() < p) null else a
    (0 until n).map { i =>
      Row(
        f"t${rnd.nextInt(math.max(1, n / 6))}%03d",
        i.toLong,
        (BaseSec + rnd.nextInt(TsSlots)) * 1000000000L + i.toLong * 1000L,
        Svcs(rnd.nextInt(Svcs.size)),
        opt(0.15)(Regions(rnd.nextInt(Regions.size))),
        opt(0.15)(Codes(rnd.nextInt(Codes.size))),
        opt(0.20)(Ratios(rnd.nextInt(Ratios.size))),
        opt(0.20)(rnd.nextInt(40).toLong - 10L))
    }
  }

  // ---------- property ----------

  val PropertyName = "fuzzp"
  val propertySchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("rev", LongType, nullable = false),
    StructField("deleted", BooleanType, nullable = true),
    StructField("region", StringType, nullable = true),
    StructField("code", LongType, nullable = true),
    StructField("ratio", DoubleType, nullable = true),
    StructField("labels", ArrayType(StringType, containsNull = false), nullable = true)))
  val propertyCols: Seq[String] = propertySchema.fields.map(_.name).toSeq
  val PropIds = 120

  private def propertyRows(seed: Long, n: Int): Seq[Row] = {
    val rnd = new Random(seed)
    def opt[A](p: Double)(a: => A): Any = if (rnd.nextDouble() < p) null else a
    (0 until n).map { i =>
      Row(
        f"p${rnd.nextInt(PropIds)}%03d",
        i.toLong, // globally unique revision → deterministic latest
        // deleted: mostly null/false, ~12% tombstones — and tombstones can
        // be OVERWRITTEN by a later live revision (the recreate path)
        opt(0.50)(rnd.nextDouble() < 0.24),
        opt(0.15)(Regions(rnd.nextInt(Regions.size))),
        opt(0.15)(Codes(rnd.nextInt(Codes.size))),
        opt(0.20)(Ratios(rnd.nextInt(Ratios.size))),
        opt(0.12)(Seq.fill(rnd.nextInt(4))(LabelPool(rnd.nextInt(LabelPool.size))).distinct))
    }
  }

  /** Writes all three fixtures once (idempotent per seed/size) and returns
    * the loaded frames keyed by table name. */
  def writeAll(spark: SparkSession, seed: Long = 11L): Map[String, DataFrame] = {
    val specs = Seq(
      (StreamName, streamSchema, streamRows(seed, 700)),
      (TraceName, traceSchema, traceRows(seed + 1, 600)),
      (PropertyName, propertySchema, propertyRows(seed + 2, 500)))
    val marker = new java.io.File(s"$Dir/.done-$seed")
    if (!marker.exists()) {
      specs.foreach { case (name, schema, rows) =>
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
          .coalesce(1).write.mode("overwrite").parquet(s"$Dir/$name.parquet")
      }
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
    specs.map { case (name, _, _) =>
      name -> spark.read.parquet(s"$Dir/$name.parquet")
    }.toMap
  }
}
