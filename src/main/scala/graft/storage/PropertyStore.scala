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
   * Snapshot (time-travel) read: the live view AS OF `asOfRev` — mutations
   * with `rev > asOfRev` have not happened yet. The append-only log is the
   * history, so a snapshot is one predicate ahead of [[compact]]: the same
   * latest-revision resolution over the log's prefix. This is the read
   * side of the reference's snapshot facility (banyand/backup snapshots
   * capture a store at a revision; restoring one serves exactly this
   * view). A document whose only pre-`asOfRev` state is a tombstone is
   * absent, like any deleted document.
   *
   * Scale: the revision predicate pushes into the parquet scan (revs
   * correlate with write time, so row groups prune), then one partial
   * aggregate per id — no extra pass over the post-snapshot suffix.
   */
  def asOf(log: DataFrame, idCol: String, revCol: String,
      deletedCol: String, asOfRev: Long): DataFrame =
    compact(log.filter(col(revCol) <= asOfRev), idCol, revCol, deletedCol)

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
      deletedCol: String, payload: Seq[Column], slotCount: Int = 32): DataFrame =
    merkleTreeFromLeaves(
      leaves(log, idCol, revCol, deletedCol, payload, slotCount))

  /** [[merkleTree]] over an already-resolved leaf table (the output of
    * [[leafTable]], typically read back from a materialized artifact):
    * skips the latest-revision resolution over the raw mutation log — the
    * store-sized part of the tree build — leaving only the slot/root
    * digest aggregation, whose output is ≤ `slotCount + 1` rows. */
  def merkleTreeFromLeaves(leafDf: DataFrame): DataFrame = {
    val slots = slotDigests(leafDf.select("slot", "entity", "leaf_sha"))
    // root fan-in is ≤ slotCount rows — the collect-sort aggregate is fine
    val root = slots
      .groupBy().agg(
        md5(array_join(transform(
          sort_array(collect_list(struct(col("slot"), col("sha")))),
          x => x.getField("sha")), "")).as("sha"),
        count(lit(1)).as("n"))
      .select(lit(-1L).as("slot"), col("sha"), col("n"))
    slots.unionByName(root)
  }

  /**
   * The tree's leaf level WITH the metadata the repair protocol needs:
   * (entity, rev, deleted, leaf_sha, slot) of a property log's live view —
   * latest revision per entity INCLUDING tombstones, digested and
   * slot-assigned. This is the store's repair-state summary: a pure
   * function of the log, one latest-revision resolution in size, and the
   * natural MATERIALIZATION unit (the reference keeps the equivalent
   * structure hot inside each node's repair gossiper; here a per-store
   * artifact serves the same role, so tree/diff/plan queries never re-walk
   * the mutation log). `leaf_sha` layout is `md5(entity|rev|deleted|
   * payload...)` — bit-identical to [[merkleDiff]]'s incremental digest
   * and to the SQL an external oracle runs.
   */
  def leafTable(log: DataFrame, idCol: String, revCol: String,
      deletedCol: String, payload: Seq[Column], slotCount: Int = 32): DataFrame = {
    val latest = graft.engine.Planners.propertyLatest(log, Seq(idCol), revCol)
    val entity = col(idCol).cast("string")
    val leafSha = md5(concat_ws("|",
      (Seq(entity, col(revCol).cast("string"),
        coalesce(col(deletedCol), lit(false)).cast("string")) ++
        payload.map(p => coalesce(p, lit("")))): _*))
    val slot = (conv(substring(md5(entity), 1, 15), 16, 10).cast("long")
      % slotCount).as("slot")
    latest.select(entity.as("entity"),
      col(revCol).cast("long").as("rev"),
      coalesce(col(deletedCol), lit(false)).as("deleted"),
      leafSha.as("leaf_sha"), slot)
  }

  /** (entity, leaf_sha, slot) of a property log's live view — the tree's
    * leaf level, shared by [[merkleTree]] and [[merkleDiff]]. */
  private def leaves(log: DataFrame, idCol: String, revCol: String,
      deletedCol: String, payload: Seq[Column], slotCount: Int): DataFrame =
    leafTable(log, idCol, revCol, deletedCol, payload, slotCount)
      .select("entity", "leaf_sha", "slot")

  /**
   * [[merkleDiff]] over two already-resolved leaf tables ([[leafTable]]
   * artifacts): the divergence set is one full-outer join on entity over
   * leaf rows — entity-count-sized inputs with digests precomputed, no
   * latest-revision resolution, no re-digesting. Output is identical to
   * [[merkleDiff]] on the underlying logs (same leaf_sha layout, same
   * absent-side NULL semantics).
   *
   * PRECONDITION (both FromLeaves methods): the two leaf tables must have
   * been built by [[leafTable]] with the SAME `slotCount` and the SAME
   * `payload` rendering. Digests are only comparable under one payload
   * canon, and the coalesced `slot` column assumes both sides hash
   * entities into the same slot space — tables built with differing
   * slotCount would emit rows with inconsistent slot labels rather than
   * an error (slotCount is not carried in the artifact). All in-repo
   * callers share [[graft.SparkEntry.merklePayload]] and slotCount=32.
   */
  def merkleDiffFromLeaves(leavesA: DataFrame, leavesB: DataFrame): DataFrame = {
    val a = leavesA.select(col("entity"), col("slot").as("__slot_a"),
      col("leaf_sha").as("sha_a"))
    val b = leavesB.select(col("entity"), col("slot").as("__slot_b"),
      col("leaf_sha").as("sha_b"))
    a.join(b, Seq("entity"), "full")
      .filter(col("sha_a").isNull || col("sha_b").isNull ||
        col("sha_a") =!= col("sha_b"))
      // slot is a pure function of entity, so either side's value serves
      .select(col("entity"), coalesce(col("__slot_a"), col("__slot_b")).as("slot"),
        col("sha_a"), col("sha_b"))
  }

  /**
   * [[repairPlan]] over two leaf tables: the latest revisions the plan's
   * winner rule needs are already columns of the artifact, so the whole
   * plan is the [[merkleDiffFromLeaves]] join with the winner CASE on
   * top — no per-side revision lookups against the raw logs. Same
   * same-slotCount / same-payload precondition as [[merkleDiffFromLeaves]].
   */
  def repairPlanFromLeaves(leavesA: DataFrame, leavesB: DataFrame): DataFrame = {
    val a = leavesA.select(col("entity"), col("rev").as("rev_a"),
      col("leaf_sha").as("sha_a"))
    val b = leavesB.select(col("entity"), col("rev").as("rev_b"),
      col("leaf_sha").as("sha_b"))
    a.join(b, Seq("entity"), "full")
      .filter(col("sha_a").isNull || col("sha_b").isNull ||
        col("sha_a") =!= col("sha_b"))
      .withColumn("winner",
        when(col("sha_b").isNull, lit("a"))
          .when(col("sha_a").isNull, lit("b"))
          .when(col("rev_a") > col("rev_b"), lit("a"))
          .when(col("rev_b") > col("rev_a"), lit("b"))
          .otherwise(lit("a")))
      .select(col("entity"), col("winner"), col("rev_a"), col("rev_b"))
  }

  /** Slot digests with BOUNDED memory: md5 over each slot's leaf digests
    * in entity order, computed by STREAMING the sorted leaves through an
    * incremental MessageDigest instead of collecting O(docs/slot) digests
    * into one aggregation buffer (r5 verdict #6 — a million-document group
    * put ~n/32 structs in a single buffer). Shuffle on slot + in-partition
    * sort (entity), then one pass; memory per slot is one 16-byte digest
    * state however many documents the slot holds. Digest value is
    * BIT-IDENTICAL to md5(concat of sorted leaf digests) — the SQL an
    * external oracle runs — because md5 over a concatenation IS the
    * incremental update over its pieces. */
  private def slotDigests(leafDf: DataFrame): DataFrame = {
    val sess = leafDf.sparkSession
    import sess.implicits._
    // fast lowercase hex — "%02x".format costs ~3µs per BYTE through
    // java.util.Formatter; a lookup table makes the digest fold free
    val digits = "0123456789abcdef"
    def hex(b: Array[Byte]): String = {
      val out = new Array[Char](b.length * 2)
      var i = 0
      while (i < b.length) {
        out(2 * i) = digits.charAt((b(i) >> 4) & 0xf)
        out(2 * i + 1) = digits.charAt(b(i) & 0xf)
        i += 1
      }
      new String(out)
    }
    leafDf.select(col("slot").cast("long"), col("entity"), col("leaf_sha"))
      .as[(Long, String, String)]
      .repartition(col("slot"))
      .sortWithinPartitions(col("slot"), col("entity"))
      .mapPartitions { it =>
        new Iterator[(Long, String, Long)] {
          private var nextRow: Option[(Long, String, String)] =
            if (it.hasNext) Some(it.next()) else None
          def hasNext: Boolean = nextRow.isDefined
          def next(): (Long, String, Long) = {
            val slot = nextRow.get._1
            val md = java.security.MessageDigest.getInstance("MD5")
            var n = 0L
            while (nextRow.exists(_._1 == slot)) {
              md.update(nextRow.get._3.getBytes("UTF-8"))
              n += 1
              nextRow = if (it.hasNext) Some(it.next()) else None
            }
            (slot, hex(md.digest()), n)
          }
        }
      }
      .toDF("slot", "sha", "n")
  }

  /**
   * Anti-entropy repair drill-down (docs/concept/property-repair.md
   * "Repair" flow): compare two property logs' digest trees root → slot →
   * leaf and return the entities whose live state differs — present on
   * one side only, or present on both with different (rev, deleted,
   * payload). This is the read-side composition the reference's gossip
   * repair runs between two replicas before shipping differing documents;
   * the transport is cluster infra, the comparison is this.
   *
   * Scale shape — Spark-first: the reference's root → slot → leaf
   * NARROWING is a cross-replica TRANSFER optimization (each phase ships
   * only digests of suspect subtrees over the gossip link). Here both
   * logs are co-located frames of one engine, so the same OUTPUT — the
   * leaf-level divergence set — computes in ONE exchange: both sides
   * union with a side tag, hash-partition by slot, sort within
   * partitions by (slot, entity, side, rev DESC), and a streaming pass
   * resolves each side's latest revision per entity (first row of its
   * run), digests it, and emits the entity iff the digests differ or a
   * side is absent. Per-row state is two 32-char digests; nothing joins,
   * nothing is store-sized in memory. The digest TREE itself (for the
   * "do two stores agree" root handshake an external replica would run)
   * remains [[merkleTree]], bit-identical to the SQL twin.
   *
   * @return (entity, slot, sha_a, sha_b) — null sha = absent on that side
   */
  def merkleDiff(logA: DataFrame, logB: DataFrame, idCol: String,
      revCol: String, deletedCol: String, payload: Seq[Column],
      slotCount: Int = 32): DataFrame = {
    val sess = logA.sparkSession
    import sess.implicits._
    val nPay = payload.size
    def rendered(log: DataFrame, side: Int): DataFrame = {
      val entity = col(idCol).cast("string")
      val pCols = payload.zipWithIndex.map { case (p, i) =>
        coalesce(p, lit("")).cast("string").as(s"__p$i")
      }
      log.select(
        entity.as("entity") +:
          col(revCol).cast("long").as("__rev") +:
          coalesce(col(deletedCol), lit(false)).as("__del") +:
          (conv(substring(md5(entity), 1, 15), 16, 10).cast("long")
            % slotCount).as("slot") +:
          lit(side).as("__side") +:
          pCols: _*)
    }
    val digits = "0123456789abcdef"
    def hex(b: Array[Byte]): String = {
      val out = new Array[Char](b.length * 2)
      var i = 0
      while (i < b.length) {
        out(2 * i) = digits.charAt((b(i) >> 4) & 0xf)
        out(2 * i + 1) = digits.charAt(b(i) & 0xf)
        i += 1
      }
      new String(out)
    }
    rendered(logA, 0).unionByName(rendered(logB, 1))
      // explicit width: a user repartition(N) is exempt from AQE
      // post-shuffle coalescing, keeping slot parallelism
      .repartition(slotCount, col("slot"))
      .sortWithinPartitions(col("slot"), col("entity"),
        col("__side"), col("__rev").desc)
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        // row layout: entity(0) __rev(1) __del(2) slot(3) __side(4) __p*(5+)
        def leafShaOf(r: org.apache.spark.sql.Row): String = {
          val sb = new java.lang.StringBuilder(r.getString(0))
          sb.append('|').append(r.getLong(1))
          sb.append('|').append(r.getBoolean(2))
          var i = 0
          while (i < nPay) { sb.append('|').append(r.getString(5 + i)); i += 1 }
          md.reset()
          hex(md.digest(sb.toString.getBytes("UTF-8")))
        }
        new Iterator[(String, Long, String, String)] {
          private var nextRow: org.apache.spark.sql.Row =
            if (it.hasNext) it.next() else null
          private var out: (String, Long, String, String) = null
          private def scanEntity(): Unit = {
            // consume one whole entity run; emit iff the sides diverge
            val entity = nextRow.getString(0)
            val slot = nextRow.getLong(3)
            var shaA: String = null
            var shaB: String = null
            var seenSide = -1
            while (nextRow != null && nextRow.getString(0) == entity &&
              nextRow.getLong(3) == slot) {
              val side = nextRow.getInt(4)
              if (side != seenSide) { // first row per side = latest rev
                seenSide = side
                if (side == 0) shaA = leafShaOf(nextRow)
                else shaB = leafShaOf(nextRow)
              }
              nextRow = if (it.hasNext) it.next() else null
            }
            if (shaA == null || shaB == null || shaA != shaB)
              out = (entity, slot, shaA, shaB)
          }
          def hasNext: Boolean = {
            while (out == null && nextRow != null) scanEntity()
            out != null
          }
          def next(): (String, Long, String, String) = {
            if (!hasNext) throw new NoSuchElementException("diff pass")
            val r = out; out = null; r
          }
        }
      }
      .toDF("entity", "slot", "sha_a", "sha_b")
  }

  /**
   * Measured transfer cost of the digest-tree repair protocol vs a direct
   * full-leaf compare — the DESIGN CLAIM behind keeping [[merkleTree]]'s
   * root → slot → leaf narrowing (each gossip phase ships only digests of
   * suspect subtrees) made checkable with numbers instead of argument.
   *
   * Bytes model (digest payloads only; framing is identical either way;
   * both legs are counted from A's perspective — the node initiating
   * the repair round):
   *   - tree protocol: 32 B root handshake, + 40 B per POPULATED slot
   *     (a slot present in either tree; empty slots of the fixed table
   *     have nothing to ship) when the roots differ, + (entity + 32 B)
   *     leaf digests for ONLY the diverged slots — the rounds of
   *     property-repair.md's "Repair" flow before any document ships;
   *   - direct compare: (entity + 32 B) for every leaf A HOLDS, shipped
   *     unconditionally (the inventory the initiator would push without
   *     a tree; entities only B holds surface in the leaf round either
   *     way, so they are charged to neither baseline).
   *
   * Everything after the leaf aggregation is ≤ `slotCount + 1` rows, so
   * the driver-side fold here is a bounded reference-object read, like
   * the ANN codebook collects.
   *
   * @return one row: (entities, slots_diverged, leaves_in_diverged_slots,
   *         direct_bytes, tree_bytes, reduction)
   */
  def merkleTransferStats(logA: DataFrame, logB: DataFrame, idCol: String,
      revCol: String, deletedCol: String, payload: Seq[Column],
      slotCount: Int = 32): DataFrame = {
    val sess = logA.sparkSession
    import sess.implicits._
    val bytesBySlot = leaves(logA, idCol, revCol, deletedCol, payload, slotCount)
      .groupBy("slot").agg(
        count(lit(1)).as("n_leaves"),
        sum(length(col("entity")) + lit(32)).as("leaf_bytes"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def digests(log: DataFrame): Map[Long, String] =
      merkleTree(log, idCol, revCol, deletedCol, payload, slotCount)
        .select(col("slot"), col("sha"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dA = digests(logA)
    val dB = digests(logB)
    val rootDiffers = dA.get(-1L) != dB.get(-1L)
    val slotIds = (dA.keySet ++ dB.keySet) - (-1L)
    val diverged = slotIds.filter(s => dA.get(s) != dB.get(s))
    val entities = bytesBySlot.values.map(_._1).sum
    val directBytes = bytesBySlot.values.map(_._2).sum
    val leavesInDiverged = diverged.toSeq.map(s =>
      bytesBySlot.get(s).fold(0L)(_._1)).sum
    val treeBytes = 32L +
      (if (rootDiffers) 40L * slotIds.size +
        diverged.toSeq.map(s => bytesBySlot.get(s).fold(0L)(_._2)).sum
      else 0L)
    Seq((entities, diverged.size.toLong, leavesInDiverged, directBytes,
      treeBytes, directBytes.toDouble / treeBytes))
      .toDF("entities", "slots_diverged", "leaves_in_diverged_slots",
        "direct_bytes", "tree_bytes", "reduction")
  }

  /**
   * Two-replica repair plan (docs/concept/property-repair.md "Property
   * Synchronize between Two Nodes", steps 7-8): for every entity
   * [[merkleDiff]] finds diverged, decide which side's live document
   * ships to the other —
   *
   *   - present on A only → A wins (A sends the full document to B)
   *   - present on B only → B wins (A requests the document from B)
   *   - both present, digests differ → "last-write-win" by version:
   *     the higher revision wins; EQUAL versions resolve to A (the
   *     smaller index in the node list, per the doc)
   *
   * @return (entity, winner 'a'|'b', rev_a, rev_b) — the ship list the
   *         gossip transport would exchange
   */
  def repairPlan(logA: DataFrame, logB: DataFrame, idCol: String,
      revCol: String, deletedCol: String, payload: Seq[Column],
      slotCount: Int = 32): DataFrame = {
    // BARRIER the divergence-bounded diff: it feeds the output and both
    // rev lookups, and embedding the full tree-compare plan three times
    // makes Catalyst's analysis cost grow combinatorially with reuse
    // depth (measured: an applyRepair→diff round-trip spun analysis for
    // minutes before this materialization)
    val diff = graft.operators.Dedup.barrier(
      merkleDiff(logA, logB, idCol, revCol, deletedCol, payload, slotCount))
    // the diff set is bounded by actual divergence — broadcast it into
    // both rev lookups BEFORE the latest-revision window, so only
    // diverged entities' histories resolve (never the whole store)
    def latestRevs(log: DataFrame, out: String): DataFrame = {
      val restricted = log.join(
        broadcast(diff.select(col("entity").as("__de"))),
        col(idCol).cast("string") === col("__de"), "leftsemi")
      graft.engine.Planners.propertyLatest(restricted, Seq(idCol), revCol)
        .select(col(idCol).cast("string").as("entity"),
          col(revCol).cast("long").as(out))
    }
    diff.select("entity", "sha_a", "sha_b")
      .join(latestRevs(logA, "rev_a"), Seq("entity"), "left")
      .join(latestRevs(logB, "rev_b"), Seq("entity"), "left")
      .withColumn("winner",
        when(col("sha_b").isNull, lit("a"))
          .when(col("sha_a").isNull, lit("b"))
          .when(col("rev_a") > col("rev_b"), lit("a"))
          .when(col("rev_b") > col("rev_a"), lit("b"))
          .otherwise(lit("a")))
      .select(col("entity"), col("winner"), col("rev_a"), col("rev_b"))
  }

  /**
   * Apply a [[repairPlan]] to BOTH replicas: each losing entity's history
   * is replaced by the winning side's live row, so afterwards the two
   * logs' live views — and therefore their [[merkleTree]] digests — agree
   * (property-repair.md step 9 "Update Local Data", both directions of
   * one A↔B cycle).
   *
   * Scale shape: the plan is divergence-bounded and broadcasts into an
   * anti-join (drop the loser's rows) plus a semi-join (lift the winner's
   * rows); neither full log shuffles.
   *
   * @return (repaired A, repaired B)
   */
  def applyRepair(logA: DataFrame, logB: DataFrame, plan: DataFrame,
      idCol: String, revCol: String): (DataFrame, DataFrame) = {
    def latest(log: DataFrame): DataFrame =
      graft.engine.Planners.propertyLatest(log, Seq(idCol), revCol)
    def shipInto(dst: DataFrame, src: DataFrame, wins: DataFrame): DataFrame = {
      val keys = broadcast(wins.select(col("entity")))
      val dropped = dst.join(keys,
        dst(idCol).cast("string") === keys("entity"), "left_anti")
      val srcLatest = latest(src)
      val lifted = srcLatest.join(keys,
        srcLatest(idCol).cast("string") === keys("entity"), "left_semi")
      dropped.unionByName(lifted, allowMissingColumns = true)
    }
    val aWins = plan.filter(col("winner") === "a")
    val bWins = plan.filter(col("winner") === "b")
    (shipInto(logA, logB, bWins), shipInto(logB, logA, aWins))
  }
}
