package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Property write semantics (S8): `apply` (upsert) and `delete`
 * (property/v1/rpc.proto:100-112; banyand/property/). The reference is an
 * etcd-style mutable document store keyed (group, name, id) where every
 * mutation gets a monotonically increasing `mod_revision` and reads resolve
 * last-writer-wins; delete is a tombstone append, not a physical erase.
 *
 * Spark-first this is an APPEND-ONLY log: both mutations produce new rows
 * with the next revision per key, and [[graft.engine.Planners.property]] /
 * [[graft.engine.Planners.propertyLatest]] resolve the live view. Append-only
 * logs are the idiomatic object-store representation of mutability (the
 * alternative — rewriting files in place — does not exist at 100 TB), and
 * compaction is just `propertyLatest` rewritten back.
 */
object PropertyStore {

  /** assign `rev = max(existing rev for id, 0) + 1` to each update row.
    *
    * Scale shape: the revision lookup is restricted to the BATCH's keys
    * first (broadcast semi-join — a write batch is bounded, the store is
    * not), so the max-rev aggregate and the final join both operate on
    * ≤ |batch| ids instead of aggregating every id in a 100 TB store to
    * apply a thousand-row batch. */
  private def withNextRev(current: DataFrame, rows: DataFrame,
      idCol: String, revCol: String): DataFrame = {
    // callers guarantee key-unique rows (apply's in-plan validation;
    // delete dedupes its id list), so no distinct shuffle here
    val batchKeys = rows.select(col(idCol))
    val maxRev = current
      .join(broadcast(batchKeys), Seq(idCol), "leftsemi")
      .groupBy(col(idCol))
      .agg(max(col(revCol)).cast("long").as("__maxrev"))
    rows.join(broadcast(maxRev), Seq(idCol), "left")
      .withColumn(revCol, coalesce(col("__maxrev"), lit(0L)) + lit(1L))
      .drop("__maxrev")
  }

  /**
   * Upsert: each `updates` row (keyed by `idCol`, WITHOUT a revision)
   * becomes a new live revision. Multiple updates for one id in a single
   * batch are rejected — the reference serializes per-key mutations, and
   * silently picking one would drop a write.
   */
  def apply(current: DataFrame, updates: DataFrame,
      idCol: String, revCol: String, deletedCol: String): DataFrame = {
    // in-plan batch validation (assert_true raises on violation, yields
    // NULL otherwise; the filter keeps it in the plan) — a driver-side
    // `require(dup.isEmpty)` here would run one extra Spark job per apply
    // batch on a write path that may chain many batches
    val dupCount = count(lit(1)).over(Window.partitionBy(col(idCol)))
    val checked = updates
      .withColumn("__chk", assert_true(dupCount === 1,
        lit("multiple updates for one id in a single apply batch")))
      .filter(col("__chk").isNull).drop("__chk")
    val versioned = withNextRev(current, checked, idCol, revCol)
      .withColumn(deletedCol, lit(false))
    current.unionByName(versioned, allowMissingColumns = true)
  }

  /** Tombstone delete: appends a `deleted = true` revision per id; the
    * read view then hides the document. */
  def delete(current: DataFrame, ids: Seq[Any],
      idCol: String, revCol: String, deletedCol: String): DataFrame = {
    val spark = current.sparkSession
    import spark.implicits._
    val keys = ids.map(_.toString).distinct.toDF(idCol)
      .withColumn(idCol, col(idCol).cast(current.schema(idCol).dataType))
    val tombs = withNextRev(current, keys, idCol, revCol)
      .withColumn(deletedCol, lit(true))
    current.unionByName(tombs, allowMissingColumns = true)
  }

  /** Compaction: collapse the log to live latest revisions only (what the
    * reference's background repair/cleanup achieves). */
  def compact(log: DataFrame, idCol: String, revCol: String,
      deletedCol: String): DataFrame =
    graft.engine.Planners.propertyLatest(log, Seq(idCol), revCol)
      .filter(!coalesce(col(deletedCol), lit(false)))

  /**
   * Anti-entropy digest tree of a property shard (docs/concept/
   * property-repair.md "Build Merkel Tree"): leaf = digest of each
   * document's latest revision INCLUDING tombstones (two replicas that
   * deleted at different revisions must differ), slot = digest over its
   * leaves' digests in entity order (leaf count recorded), root = digest
   * over the slot digests (row `slot = -1`). Two stores agree iff their
   * root digests agree; a mismatch narrows to slots, then entities — the
   * comparison the reference's gossip repair runs between replicas.
   *
   * Engine-portable: md5 digests and an md5-derived slot assignment
   * (`hash(entity) % slot_count`, property-repair.md "Slot Node"), so an
   * external store can recompute the identical tree in SQL. `payload`
   * columns must be canonicalized to strings by the caller (render
   * money as integer cents etc. — float-to-string differs across
   * engines). One aggregation per tree level; slot fan-in is bounded by
   * the shard's document count (properties are finite, per the doc).
   */
  def merkleTree(log: DataFrame, idCol: String, revCol: String,
      deletedCol: String, payload: Seq[Column], slotCount: Int = 32): DataFrame = {
    val latest = graft.engine.Planners.propertyLatest(log, Seq(idCol), revCol)
    val entity = col(idCol).cast("string")
    val leafSha = md5(concat_ws("|",
      (Seq(entity, col(revCol).cast("string"),
        coalesce(col(deletedCol), lit(false)).cast("string")) ++
        payload.map(p => coalesce(p, lit("")))): _*))
    val slot = (conv(substring(md5(entity), 1, 15), 16, 10).cast("long")
      % slotCount).as("slot")
    val leaves = latest.select(entity.as("entity"), leafSha.as("leaf_sha"), slot)
    def rollup(df: DataFrame, keyCols: Seq[Column], ordCol: String, shaCol: String) =
      df.groupBy(keyCols: _*).agg(
        md5(array_join(transform(
          sort_array(collect_list(struct(col(ordCol), col(shaCol)))),
          x => x.getField(shaCol)), "")).as("sha"),
        count(lit(1)).as("n"))
    val slots = rollup(leaves, Seq(col("slot")), "entity", "leaf_sha")
    val root = rollup(slots.withColumnRenamed("sha", "slot_sha"),
      Nil, "slot", "slot_sha")
      .select(lit(-1L).as("slot"), col("sha"), col("n"))
    slots.unionByName(root)
  }
}
