package graft.engine.fuzz

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.util.Random

/**
 * Second fixture group for the multi-group union fuzzer — the same
 * measure in another group, with the three schema-merge hazards the
 * reference's cross-group rules cover (logical/schema.go:240-246
 * MergeTagSpecs; golden case multi_group_tag_type):
 *
 *  - a TYPE-CONFLICTED tag: `code` is INT in group A, STRING here →
 *    the merged column widens to string, each group's native value
 *    rendered (A's longs arrive as "200"/"301"/…);
 *  - MISSING columns on each side: this group lacks `ratio`/`ports`/
 *    `load` (null-filled for its rows), and carries a B-only `zone`
 *    (null-filled for group A's rows);
 *  - cross-group (entity, ts) collisions with globally unique versions,
 *    so the latest-version dedup runs ACROSS groups deterministically
 *    (BydbQL.resolve unions the frames BEFORE planning).
 */
object UnionFuzzFixture {

  val Name = "fuzzm_b"

  val schema: StructType = StructType(Seq(
    StructField("svc", StringType, nullable = false),
    StructField("inst", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("region", StringType, nullable = true),
    StructField("code", StringType, nullable = true), // INT in group A
    StructField("labels", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("value", LongType, nullable = false),
    StructField("dur", LongType, nullable = true),
    StructField("zone", StringType, nullable = true))) // B-only tag

  /** B's native `code` values: some collide with group A's longs AFTER
    * the string widening ("200" = A's 200), some are B-only words — an
    * EQ on "200" must match rows from BOTH groups. */
  val CodePool = Vector("200", "301", "404", "500", "-7", "armed", "busy")
  val ZonePool = Vector("z1", "z2", "z3")

  def rows(seed: Long, n: Int): Seq[Row] = {
    import FuzzFixture.{Svcs, Insts, Regions, LabelPool, tsNanos, TsSlots}
    val rnd = new Random(seed)
    def opt[A](p: Double)(a: => A): Any = if (rnd.nextDouble() < p) null else a
    (0 until n).map { i =>
      Row(
        Svcs(rnd.nextInt(Svcs.size)),
        Insts(rnd.nextInt(Insts.size)),
        tsNanos(rnd.nextInt(TsSlots)), // same slots as A → cross-group collisions
        1000000L + i, // disjoint from A's 0..699 → dedup ties impossible
        opt(0.15)(Regions(rnd.nextInt(Regions.size))),
        opt(0.15)(CodePool(rnd.nextInt(CodePool.size))),
        opt(0.12)(Seq.fill(rnd.nextInt(4))(LabelPool(rnd.nextInt(LabelPool.size))).distinct),
        rnd.nextInt(201).toLong - 50L,
        opt(0.20)(rnd.nextInt(40).toLong - 10L),
        opt(0.25)(ZonePool(rnd.nextInt(ZonePool.size))))
    }
  }

  def write(spark: SparkSession, dir: String, seed: Long, n: Int): DataFrame = {
    val marker = new java.io.File(s"$dir/.done-b-$seed-$n")
    if (!marker.exists()) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows(seed, n), 2), schema)
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$Name.parquet")
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
    spark.read.parquet(s"$dir/$Name.parquet")
  }

  /** The merged frame's oracle rendering: the union happens IN the twin's
    * base SQL, mirroring Planners.unionGroups — conflicted `code` cast to
    * VARCHAR on both sides, missing columns null-filled with their typed
    * NULLs, B-only `zone` appended after group A's columns (unionByName
    * appends right-side-only columns). */
  val mergedSpec: FuzzTwin.TwinSpec = FuzzTwin.TwinSpec(
    baseSql =
      s"""SELECT svc, inst, ts, version, region, CAST(code AS VARCHAR) AS code,
         |  ratio, labels, ports, value, load, dur, CAST(NULL AS VARCHAR) AS zone
         |FROM ${FuzzFixture.Name}
         |UNION ALL
         |SELECT svc, inst, ts, version, region, code,
         |  CAST(NULL AS DOUBLE) AS ratio, labels, CAST(NULL AS BIGINT[]) AS ports,
         |  value, CAST(NULL AS DOUBLE) AS load, dur, zone
         |FROM $Name""".stripMargin,
    cols = FuzzFixture.cols :+ "zone",
    floatCols = Set("ratio", "load"),
    arrayTags = Set("labels", "ports"),
    groups = Set(Seq("ga", "gb")))

  /** Tag taxonomy of the MERGED frame: `code` is a STRING tag here (its
    * criteria values are strings), `zone` exists only for B rows (null on
    * every group-A row — EQ NULL and NE probes hit real mass). */
  val domain: FuzzGen.Domain = FuzzGen.Domain(
    groups = Seq("ga", "gb"), name = FuzzFixture.Name,
    scalarTags = Vector("region", "code", "ratio", "zone"),
    entityTags = Vector("svc", "inst"),
    arrTags = Vector("labels", "ports"),
    groupables = Vector("svc", "inst", "region", "code", "zone"),
    numericCols = Vector("value", "load", "dur", "ts", "version"),
    aggFields = Vector("value", "load", "dur"),
    allTags = Vector("svc", "inst", "region", "code", "ratio", "labels", "ports", "zone"),
    scalarValue = (rnd, tag) => tag match {
      case "code" =>
        if (rnd.nextDouble() < 0.12) "999x" else CodePool(rnd.nextInt(CodePool.size))
      case "zone" =>
        if (rnd.nextDouble() < 0.12) "z9" else ZonePool(rnd.nextInt(ZonePool.size))
      case other => FuzzGen.fuzzmDomain.scalarValue(rnd, other)
    },
    arrayValue = FuzzGen.fuzzmDomain.arrayValue,
    spec = mergedSpec)
}
