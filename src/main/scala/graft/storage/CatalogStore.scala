package graft.storage

import org.apache.spark.sql.SparkSession

/**
 * Persistent catalog: resource schemas survive the session.
 *
 * The reference persists Group/Measure/Stream/Trace/Property schemas with
 * revisions in its metadata store (pkg/schema;
 * database/v1/schema.proto:105-127) — a client never re-declares a
 * resource to query it. The per-session Scala maps (`Catalog.defs`,
 * hand-built `BydbQL.Resource`s) lacked that: a fresh session had to
 * re-register every table by hand.
 *
 * Spark shape: the catalog entry (LayoutSpec + TableDef + model-specific
 * bindings) is written as JSON under `<root>/_graft_catalog/<group>__<name>`
 * whenever a resource is ingested through [[ingest]], and [[open]] turns a
 * layout root back into ready-to-query [[graft.ql.BydbQL.Resource]]s —
 * stored WITH the data, the way the bucketed path already records its
 * layout in the table catalog (Layout.saveBucketed).
 */
final case class CatalogEntry(
    group: String,
    name: String,
    entity: Seq[String],
    tsCol: String,
    tsIsNanos: Boolean = true,
    shardNum: Int = 4,
    segmentDays: Int = 1,
    versionCol: Option[String] = None,
    arrayTags: Seq[String] = Nil,
    fields: Seq[String] = Nil,
    elementIdCol: Option[String] = None,
    traceIdCol: Option[String] = None,
    spanStruct: Seq[String] = Nil,
    propertyIdCol: Option[String] = None,
    propertyRevCol: Option[String] = None,
    propertyDeletedCol: Option[String] = None,
    /** lifecycle stage → layout root (hot/warm/cold tiers). When present,
      * [[CatalogStore.open]] rebuilds the per-stage frames so `ON (...)
      * STAGES` routing survives the session like the rest of the schema. */
    stageRoots: Map[String, String] = Map.empty,
    /** ingest-time tokenization (source column → analyzer name) — part of
      * the schema exactly like the reference's IndexRule `analyzer`
      * (database/v1/schema.proto:180-189): it must survive save/open, or a
      * reopened resource would stop materializing its MATCH token columns. */
    analyzerColumns: Map[String, String] = Map.empty,
    /** tags carrying an analyzer index rule (schema.proto:180-189); a
      * MATCH on any other tag rejects. None/absent = undeclared
      * (permissive) — matching TableDef.matchableTags, and like it this
      * must survive save/open or a reopened resource would silently stop
      * validating MATCH targets. */
    matchableTags: Option[Seq[String]] = None,
    /** IndexRuleBinding effective windows (schema.proto:203-214): tag →
      * [begin_at_ms, expire_at_ms], enforced at plan time like
      * TableDef.matchableWindows. Epoch millis for JSON portability. */
    matchableWindowsMs: Map[String, Seq[Long]] = Map.empty,
    /** resource creation time (epoch millis); query begin times clamp
      * forward to it (schema_revision.go:32-49 clampTimeRangeBegin). */
    createdAtMs: Option[Long] = None,
    /** schema revision, bumped by every accepted [[CatalogStore.update]]
      * (common/v1/common.proto Metadata.mod_revision; pkg/schema/cache.go
      * tracks the latest per resource). Optional so catalogs persisted
      * BEFORE this field existed still deserialize (a missing field reads
      * as null, and a non-nullable Long would throw) — absent means
      * revision 1, see [[revision]]. */
    modRevision: Option[Long] = Some(1L),
    /** last accepted schema change (epoch millis). Equals [[createdAtMs]]
      * right after create — test/cases/schema/apply_rollback.go:121-122
      * asserts exactly that. */
    updatedAtMs: Option[Long] = None) {

  /** Effective mod revision (pre-revision catalogs read as 1). */
  def revision: Long = modRevision.getOrElse(1L)

  def spec: LayoutSpec = LayoutSpec(group, name, entity, tsCol, tsIsNanos,
    shardNum, segmentDays, analyzerColumns)

  def tdef: graft.sources.TableDef = graft.sources.TableDef(name,
    entity = entity, tsCol = Some(tsCol), versionCol = versionCol,
    arrayTags = arrayTags.toSet,
    // Option(...) guards: a catalog persisted BEFORE these fields existed
    // deserializes them as null (the JSON column is absent), and must read
    // as "undeclared", not NPE
    matchableTags = Option(matchableTags).flatten.map(_.toSet),
    matchableWindows = Option(matchableWindowsMs).getOrElse(Map.empty).collect {
      case (tag, Seq(b, e)) => tag -> (java.time.Instant.ofEpochMilli(b),
        java.time.Instant.ofEpochMilli(e))
    },
    createdAt = createdAtMs.map(java.time.Instant.ofEpochMilli))
}

object CatalogStore {

  private val CatalogDir = "_graft_catalog"

  private def entryPath(root: String, group: String, name: String): String =
    s"$root/$CatalogDir/${group}__$name"

  /** Persist one resource's catalog entry under the layout root. */
  def save(spark: SparkSession, root: String, e: CatalogEntry): Unit = {
    import spark.implicits._
    Seq(e).toDS().coalesce(1).write.mode("overwrite")
      .json(entryPath(root, e.group, e.name))
  }

  /** One entry by (group, name), if registered — a direct read of that
    * entry's own directory (the path is addressable), NOT a scan of the
    * whole catalog: registry mutations stay O(1) in the resource count. */
  def get(spark: SparkSession, root: String, group: String, name: String): Option[CatalogEntry] = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val dir = new Path(entryPath(root, group, name))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) None
    else spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[CatalogEntry]].schema)
      .json(dir.toString).as[CatalogEntry].collect().headOption
  }

  /**
   * Registry create (MeasureRegistryService.Create and siblings): stamps
   * `mod_revision` and `created_at = updated_at` (apply_rollback.go:104-122
   * asserts revision > 0 and the timestamp equality on first create; a
   * caller-supplied backdated createdAtMs stamps BOTH so the invariant
   * holds). Creating an already-registered resource is an error — the
   * reference registry returns AlreadyExists via an atomic etcd txn; here
   * the atomicity guard is a `FileSystem.createNewFile` marker (atomic on
   * HDFS and local fs): two concurrent creates both pass the readback
   * check, but only one wins the marker — the loser gets AlreadyExists
   * instead of silently last-write-wins.
   */
  def create(spark: SparkSession, root: String, e: CatalogEntry,
      nowMs: Long = System.currentTimeMillis()): CatalogEntry = {
    if (get(spark, root, e.group, e.name).isDefined)
      throw new IllegalArgumentException(
        s"resource ${e.group}/${e.name} already exists")
    val marker = new org.apache.hadoop.fs.Path(
      entryPath(root, e.group, e.name) + ".created")
    val mfs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    mfs.mkdirs(marker.getParent)
    if (!mfs.createNewFile(marker))
      throw new IllegalArgumentException(
        s"resource ${e.group}/${e.name} already exists")
    val created = e.createdAtMs.getOrElse(nowMs)
    val stamped = e.copy(modRevision = Some(1L),
      createdAtMs = Some(created), updatedAtMs = Some(created))
    save(spark, root, stamped)
    stamped
  }

  /**
   * Registry update with APPLY-ROLLBACK semantics (test/cases/schema/
   * apply_rollback.go:134-223): a schema change that alters the ENTITY is
   * rejected with an error and the stored schema — revision, created_at,
   * updated_at, every field — stays byte-identical (validation runs before
   * any write, so rejection is trivially atomic). An accepted update bumps
   * `mod_revision`, preserves `created_at`, and stamps `updated_at`.
   *
   * SINGLE-WRITER ASSUMPTION: unlike the reference's etcd compare-and-swap,
   * the read-bump-write here is not atomic — two concurrent updates to the
   * SAME resource can lose a revision bump. Schema mutation in this library
   * is a driver-side admin operation (one writer per registry), matching
   * how the bench and tests use it; a multi-writer deployment would need a
   * CAS-capable store behind `save`.
   */
  def update(spark: SparkSession, root: String, e: CatalogEntry,
      nowMs: Long = System.currentTimeMillis()): CatalogEntry = {
    val prev = get(spark, root, e.group, e.name).getOrElse(
      throw new IllegalArgumentException(s"resource ${e.group}/${e.name} not found"))
    if (e.entity != prev.entity)
      throw new IllegalArgumentException(
        s"entity of ${e.group}/${e.name} is immutable " +
          s"(${prev.entity.mkString(",")} -> ${e.entity.mkString(",")}): update rejected")
    val stamped = e.copy(modRevision = Some(prev.revision + 1),
      createdAtMs = prev.createdAtMs, updatedAtMs = Some(nowMs))
    save(spark, root, stamped)
    stamped
  }

  /** Registry delete: drops the entry; returns whether anything existed
    * (DeleteMeasure returns deleted=true, apply_rollback.go:376-380). The
    * DATA under the layout root stays — schema deletion and segment TTL
    * are separate lifecycles in the reference too. */
  def delete(spark: SparkSession, root: String, group: String, name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(entryPath(root, group, name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // drop the create-lock marker too, so delete → create is re-creatable
    fs.delete(new org.apache.hadoop.fs.Path(p.toString + ".created"), false)
    fs.delete(p, true)
  }

  /** Ingest through the layout AND record the schema — the write path a
    * client actually uses (the reference's write RPC requires the schema
    * to exist; here the two land together). */
  def ingest(df: org.apache.spark.sql.DataFrame, root: String, e: CatalogEntry,
      mode: String = "append"): Unit = {
    Layout.append(df, root, e.spec, mode)
    save(df.sparkSession, root, e)
  }

  /** All catalog entries recorded under a root: ONE json read over every
    * entry directory (one Spark job total, not one per entry — at a
    * thousand registered resources a per-entry job loop is a thousand
    * driver round-trips for kilobytes of metadata). */
  def entries(spark: SparkSession, root: String): Seq[CatalogEntry] = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val dir = new Path(s"$root/$CatalogDir")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Nil
    val dirs = fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.toString)
    if (dirs.isEmpty) return Nil
    spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[CatalogEntry]].schema)
      .json(dirs: _*).as[CatalogEntry].collect().toSeq
      .sortBy(e => (e.group, e.name))
  }

  /** Open a layout root as ready-to-query resources — no manual
    * registration. Keys: both `name` and `group/name` (the resolution
    * order BydbQL.resolve expects). */
  def open(spark: SparkSession, root: String): Map[String, graft.ql.BydbQL.Resource] =
    openAll(spark, Seq(root))

  /** Multi-root open: one deployment commonly spreads groups over several
    * roots (per-tenant buckets, per-stage storage classes); the merged map
    * is queryable as one namespace. Later roots win on key collisions, the
    * same last-writer rule a re-`save` has within one root. */
  def open(spark: SparkSession, roots: Seq[String]): Map[String, graft.ql.BydbQL.Resource] =
    openAll(spark, roots)

  private def openAll(spark: SparkSession,
      roots: Seq[String]): Map[String, graft.ql.BydbQL.Resource] =
    roots.flatMap { root =>
      entries(spark, root).flatMap { e =>
        // stage reads route through Stages.read so migration fencing
        // (Stages.Migration) applies to catalog-opened resources too
        val sr = if (e.stageRoots.nonEmpty) Some(StageRoots(e.stageRoots)) else None
        val stageDfs = sr.fold(Map.empty[String, org.apache.spark.sql.DataFrame]) { s =>
          e.stageRoots.keys.map(st => st -> Stages.read(spark, e.spec, s, Seq(st))).toMap
        }
        val res = graft.ql.BydbQL.Resource(
          df = sr.fold(Layout.read(spark, root, e.spec))(s => Stages.read(spark, e.spec, s)),
          tdef = e.tdef,
          stageDfs = stageDfs,
          fields = e.fields.toSet,
          elementIdCol = e.elementIdCol,
          traceIdCol = e.traceIdCol,
          spanStruct = e.spanStruct,
          propertyIdCol = e.propertyIdCol,
          propertyRevCol = e.propertyRevCol,
          propertyDeletedCol = e.propertyDeletedCol)
        Seq(e.name -> res, s"${e.group}/${e.name}" -> res)
      }
    }.toMap
}
