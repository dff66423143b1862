package graft.engine.fuzz

import graft.sources.TableDef
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.util.Random

/**
 * Deterministic fuzz fixture — a synthetic measure whose columns cover
 * every tag type the reference's criteria surface distinguishes
 * (string/int/float scalars, string/int arrays, entity tags) with NULLs
 * planted in each nullable column, plus duplicate (entity, ts) versions
 * so the latest-version dedup pass is always live. Modeled on the
 * reference's generated-case corpora (`test/cases/<model>/data`, the gen_leaf/
 * gen_tree/gen_feat families built by its Makefile `generate-test-cases`
 * target) — the shape those generators assume, not their code.
 *
 * Both engines read the SAME parquet bytes: [[write]] renders the rows
 * once under target/fuzz and the DuckDB oracle server views that file.
 */
object FuzzFixture {

  val Name = "fuzzm"

  /** Parquet column order — the twin renderer mirrors Planners' column
    * ordering logic, which starts from this order. */
  val schema: StructType = StructType(Seq(
    StructField("svc", StringType, nullable = false),
    StructField("inst", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("region", StringType, nullable = true),
    StructField("code", LongType, nullable = true),
    StructField("ratio", DoubleType, nullable = true),
    StructField("labels", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("ports", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("value", LongType, nullable = false),
    StructField("load", DoubleType, nullable = true),
    StructField("dur", LongType, nullable = true)))

  val cols: Seq[String] = schema.fields.map(_.name).toSeq

  val tdef: TableDef = TableDef(Name, entity = Seq("svc", "inst"),
    tsCol = Some("ts"), versionCol = Some("version"),
    arrayTags = Set("labels", "ports"))

  /** ts domain: whole seconds as raw nanos — 24 distinct stamps over
    * 12 entities forces plenty of (entity, ts) version collisions. */
  val BaseSec = 1700000000L
  val TsSlots = 24
  def tsNanos(slot: Int): Long = (BaseSec + slot) * 1000000000L

  // value domains (doubles are binary-exact so DOUBLE→DECIMAL casts agree
  // across engines trivially)
  val Svcs = Vector("svc_0", "svc_1", "svc_2", "svc_3")
  val Insts = Vector("i0", "i1", "i2")
  val Regions = Vector("east", "west", "north", "south")
  val Codes = Vector(200L, 301L, 404L, 500L, -7L)
  val Ratios = Vector(0.25, 0.75, 1.5, -3.5, 2.0)
  val LabelPool = Vector("a", "b", "c", "d")
  val PortPool = Vector(80L, 443L, 8080L, 9000L)

  def rows(seed: Long, n: Int): Seq[Row] = {
    val rnd = new Random(seed)
    def opt[A](p: Double)(a: => A): Any = if (rnd.nextDouble() < p) null else a
    (0 until n).map { i =>
      Row(
        Svcs(rnd.nextInt(Svcs.size)),
        Insts(rnd.nextInt(Insts.size)),
        tsNanos(rnd.nextInt(TsSlots)),
        i.toLong, // globally unique version → dedup ties impossible
        opt(0.15)(Regions(rnd.nextInt(Regions.size))),
        opt(0.15)(Codes(rnd.nextInt(Codes.size))),
        opt(0.20)(Ratios(rnd.nextInt(Ratios.size))),
        opt(0.12)(Seq.fill(rnd.nextInt(4))(LabelPool(rnd.nextInt(LabelPool.size))).distinct),
        opt(0.12)(Seq.fill(rnd.nextInt(3))(PortPool(rnd.nextInt(PortPool.size))).distinct),
        rnd.nextInt(201).toLong - 50L, // value: −50..150, negatives hit trunc-div
        opt(0.10)(rnd.nextInt(1280).toDouble / 64.0 - 4.0), // load: −4..16 step 1/64
        opt(0.20)(rnd.nextInt(40).toLong - 10L)) // dur: −10..29
    }
  }

  /** Writes the fixture once (idempotent per (seed, n)) and returns its
    * directory for the oracle server. */
  def write(spark: SparkSession, dir: String, seed: Long, n: Int): DataFrame = {
    val marker = new java.io.File(s"$dir/.done-$seed-$n")
    if (!marker.exists()) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows(seed, n), 2), schema)
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$Name.parquet")
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
    spark.read.parquet(s"$dir/$Name.parquet")
  }
}
