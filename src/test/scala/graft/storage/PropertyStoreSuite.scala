package graft.storage

import graft.SparkSpec
import graft.engine.Planners
import graft.model.PropertyQuery
import org.apache.spark.sql.functions._

/** Property apply/delete semantics (S8): upserts bump mod_revision,
  * tombstones hide documents, compaction collapses the log. */
class PropertyStoreSuite extends SparkSpec {

  import spark.implicits._

  private def live(log: org.apache.spark.sql.DataFrame) =
    Planners.property(log, PropertyQuery(Seq("g"), "p"),
      idCol = "id", revCol = "rev", deletedCol = Some("deleted"))

  test("apply creates the next revision and wins the read view") {
    val log0 = Seq(("a", 1L, 10, false), ("b", 1L, 20, false))
      .toDF("id", "rev", "v", "deleted")
    val log1 = PropertyStore.apply(log0,
      Seq(("a", 11)).toDF("id", "v"), "id", "rev", "deleted")
    assert(log1.count() == 3) // append-only
    assert(live(log1).filter(col("id") === "a")
      .select("rev", "v").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      == Seq((2L, 11)))
    assert(live(log1).filter(col("id") === "b")
      .select("rev").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("apply rejects two updates for one id in a batch") {
    val log0 = Seq(("a", 1L, 10, false)).toDF("id", "rev", "v", "deleted")
    // validation is IN-PLAN (assert_true), so it raises when the write
    // executes — not an extra driver-side job at plan-build time
    val e = intercept[Exception] {
      PropertyStore.apply(log0,
        Seq(("a", 1), ("a", 2)).toDF("id", "v"), "id", "rev", "deleted").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("multiple updates for one id")))
  }

  test("delete appends a tombstone that hides the document; re-apply revives") {
    val log0 = Seq(("a", 1L, 10, false), ("b", 1L, 20, false))
      .toDF("id", "rev", "v", "deleted")
    val log1 = PropertyStore.delete(log0, Seq("a"), "id", "rev", "deleted")
    assert(live(log1).select("id").as[String].collect().toSeq == Seq("b"))
    // upsert after delete resurrects with a higher revision
    val log2 = PropertyStore.apply(log1,
      Seq(("a", 12)).toDF("id", "v"), "id", "rev", "deleted")
    val a = live(log2).filter(col("id") === "a")
      .select("rev", "v").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.toSeq == Seq((3L, 12)))
  }

  test("compact collapses the log to live latest revisions") {
    val log0 = Seq(("a", 1L, 10, false)).toDF("id", "rev", "v", "deleted")
    val log = PropertyStore.delete(
      PropertyStore.apply(log0, Seq(("b", 5)).toDF("id", "v"), "id", "rev", "deleted"),
      Seq("a"), "id", "rev", "deleted")
    val compacted = PropertyStore.compact(log, "id", "rev", "deleted")
    assert(compacted.select("id").as[String].collect().toSeq == Seq("b"))
    assert(compacted.count() == 1)
  }

  test("merkle digest tree localizes a replica divergence (property-repair.md)") {
    def tree(log: org.apache.spark.sql.DataFrame) =
      PropertyStore.merkleTree(log, "id", "rev", "deleted",
        payload = Seq(col("v").cast("string")), slotCount = 8)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

    val base = (1 to 40).map(i => (i.toString, 1L, i * 10, false))
      .toDF("id", "rev", "v", "deleted")
    // replica A == replica B → identical trees, root included
    assert(tree(base) == tree(base))
    // replica B missed one update → roots differ; exactly ONE slot differs
    val diverged = base.unionByName(
      Seq(("7", 2L, 999, false)).toDF("id", "rev", "v", "deleted"))
    val (ta, tb) = (tree(base), tree(diverged))
    assert(ta(-1L)._1 != tb(-1L)._1)
    val differing = (0L until 8L).filter(s => ta(s) != tb(s))
    assert(differing.size == 1)
    // leaf counts unchanged (same entity set, different leaf digest)
    assert(ta(differing.head)._2 == tb(differing.head)._2)
    // tombstones participate: deleting on one side changes its tree
    val deleted = PropertyStore.delete(base, Seq("7"), "id", "rev", "deleted")
    assert(tree(base)(-1L)._1 != tree(deleted)(-1L)._1)
  }

  test("slot digests are partition-invariant and survive a forced tiny slotCount") {
    // the streaming slot rollup (bounded memory, r5 verdict #6) must give
    // the same digest whatever the input partitioning, and must equal a
    // driver-side md5 over the concatenated sorted leaf digests — the
    // definition an external SQL oracle recomputes. slotCount=2 over many
    // docs forces thousands of leaves through each slot's single digest
    // stream (the shape that used to collect one O(n/2) buffer).
    val many = (1 to 5000).map(i => (i.toString, 1L, i * 3, false))
      .toDF("id", "rev", "v", "deleted")
    def tree(df: org.apache.spark.sql.DataFrame) =
      PropertyStore.merkleTree(df, "id", "rev", "deleted",
        payload = Seq(col("v").cast("string")), slotCount = 2)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val t1 = tree(many)
    val t8 = tree(many.repartition(8, col("v")))
    val t1p = tree(many.coalesce(1))
    assert(t1 == t8 && t1 == t1p)
    assert(t1(0L)._2 + t1(1L)._2 == 5000L)

    // driver-side recomputation of slot 0's digest from raw leaves
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val leaves = (1 to 5000).map { i =>
      val entity = i.toString
      val slot = java.lang.Long.parseLong(md5hex(entity).take(15), 16) % 2
      (slot, entity, md5hex(s"$entity|1|false|${i * 3}"))
    }
    val want0 = md5hex(leaves.filter(_._1 == 0L).sortBy(_._2)
      .map(_._3).mkString(""))
    assert(t1(0L)._1 == want0)
  }

  test("merkleDiff drills to exactly the diverged entities") {
    val base = (1 to 40).map(i => (i.toString, 1L, i * 10, false))
      .toDF("id", "rev", "v", "deleted")
    // replica B: entity 7 re-upserted, entity 13 tombstoned, entity 41 new
    val b = PropertyStore.delete(
      PropertyStore.apply(base,
        Seq(("7", 999), ("41", 410)).toDF("id", "v"), "id", "rev", "deleted"),
      Seq("13"), "id", "rev", "deleted")
    val diff = PropertyStore.merkleDiff(base, b, "id", "rev", "deleted",
      payload = Seq(col("v").cast("string")), slotCount = 8)
      .collect().map(r => r.getString(0) -> (Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(diff.keySet == Set("7", "13", "41"), diff.keySet)
    // 7 and 13 differ on both sides; 41 exists only on B
    assert(diff("7")._1.isDefined && diff("7")._2.isDefined && diff("7")._1 != diff("7")._2)
    assert(diff("13")._1.isDefined && diff("13")._2.isDefined)
    assert(diff("41")._1.isEmpty && diff("41")._2.isDefined)
    // identical replicas → empty diff (root agreement prunes everything)
    assert(PropertyStore.merkleDiff(base, base, "id", "rev", "deleted",
      payload = Seq(col("v").cast("string")), slotCount = 8).isEmpty)
  }

  test("merkleTransferStats: the digest tree ships a fraction of the direct full-leaf compare") {
    val pay = Seq(col("v").cast("string"))
    val base = (1 to 4000).map(i => (i.toString, 1L, i * 10, false))
      .toDF("id", "rev", "v", "deleted")
    val b = PropertyStore.apply(base,
      Seq(("7", 999)).toDF("id", "v"), "id", "rev", "deleted")
    val st = PropertyStore.merkleTransferStats(base, b, "id", "rev",
      "deleted", pay, slotCount = 32).head()
    assert(st.getLong(0) == 4000L, "entities")
    assert(st.getLong(1) == 1L, "exactly one diverged slot")
    // one slot's leaves (~1/32 of the store) + the fixed digest rounds vs
    // every leaf: the reduction must be substantial and exactly accounted
    val direct = st.getLong(3); val tree = st.getLong(4)
    assert(tree < direct / 5, s"tree=$tree direct=$direct")
    assert(st.getDouble(5) == direct.toDouble / tree)
    // identical replicas: the 32-byte root handshake settles it
    val same = PropertyStore.merkleTransferStats(base, base, "id", "rev",
      "deleted", pay, slotCount = 32).head()
    assert(same.getLong(4) == 32L && same.getLong(1) == 0L)
  }

  test("repairPlan decides winners per the two-node sync rules; applyRepair converges both replicas") {
    val pay = Seq(col("v").cast("string"))
    val base = (1 to 40).map(i => (i.toString, 1L, i * 10, false))
      .toDF("id", "rev", "v", "deleted")
    // A: entity 5 re-upserted (A newer), entity 50 exists only on A,
    //    entity 9 rewritten at the SAME revision with a different value
    val a = PropertyStore.apply(base,
      Seq(("5", 555), ("50", 500)).toDF("id", "v"), "id", "rev", "deleted")
      .withColumn("v", when(col("id") === "9", 999).otherwise(col("v")))
    // B: entity 7 re-upserted (B newer), entity 13 tombstoned (B newer)
    val b = PropertyStore.delete(
      PropertyStore.apply(base, Seq(("7", 777)).toDF("id", "v"),
        "id", "rev", "deleted"),
      Seq("13"), "id", "rev", "deleted")

    val plan = PropertyStore.repairPlan(a, b, "id", "rev", "deleted", pay,
      slotCount = 8)
    val winners = plan.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // missing on B → A sends (step 7); newer revision wins (step 8);
    // EQUAL revisions resolve to A, the smaller node index
    assert(winners == Map("5" -> "a", "50" -> "a", "9" -> "a",
      "7" -> "b", "13" -> "b"), winners)

    // one A↔B cycle converges the replicas: empty diff, equal roots
    val (a2, b2) = PropertyStore.applyRepair(a, b, plan, "id", "rev")
    assert(PropertyStore.merkleDiff(a2, b2, "id", "rev", "deleted", pay,
      slotCount = 8).isEmpty, "repaired replicas must agree")
    def root(log: org.apache.spark.sql.DataFrame) =
      PropertyStore.merkleTree(log, "id", "rev", "deleted", pay, slotCount = 8)
        .filter(col("slot") === -1).select("sha").as[String].collect().head
    assert(root(a2) == root(b2))
    // the converged live view carries the winners' values
    val liveB = Planners.propertyLatest(b2, Seq("id"), "rev")
    assert(liveB.filter(col("id") === "9").select("v").as[Int].collect()
      .toSeq == Seq(999), "equal-rev mismatch must take A's document")
    assert(liveB.filter(col("id") === "50").count() == 1)
  }

  test("asOf replays the live view at a past revision") {
    import spark.implicits._
    val log = Seq(
      ("a", 1L, 10, false), ("a", 3L, 30, false), ("a", 5L, 50, false),
      ("b", 2L, 20, false), ("b", 4L, 0, true), // b deleted at rev 4
      ("c", 6L, 60, false)) // c born after the snapshot
      .toDF("id", "rev", "v", "deleted")
    def view(rev: Long) =
      PropertyStore.asOf(log, "id", "rev", "deleted", rev)
        .select("id", "rev", "v").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // at rev 3: a@3 live, b@2 still live (tombstone is in the future)
    assert(view(3L) == Set(("a", 3L, 30), ("b", 2L, 20)))
    // at rev 4: b's tombstone has landed
    assert(view(4L) == Set(("a", 3L, 30)))
    // at the head the snapshot IS the compaction
    val head = PropertyStore.compact(log, "id", "rev", "deleted")
      .select("id", "rev", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(view(Long.MaxValue) == head)
    // before any history: empty, not an error
    assert(view(0L).isEmpty)
  }

  test("leaf-artifact paths ≡ log paths: tree, diff, and plan are identical") {
    val pay = Seq(col("v").cast("string"))
    val base = (1 to 200).map(i => (i.toString, 1L, i * 10, false))
      .toDF("id", "rev", "v", "deleted")
    // A: entity 5 newer, entity 50 A-only; B: entity 7 newer, 13 tombstoned
    val a = PropertyStore.apply(base,
      Seq(("5", 555), ("50", 500)).toDF("id", "v"), "id", "rev", "deleted")
    val b = PropertyStore.delete(
      PropertyStore.apply(base, Seq(("7", 777)).toDF("id", "v"),
        "id", "rev", "deleted"),
      Seq("13"), "id", "rev", "deleted")
    val la = PropertyStore.leafTable(a, "id", "rev", "deleted", pay, 8)
    val lb = PropertyStore.leafTable(b, "id", "rev", "deleted", pay, 8)

    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    assert(rows(PropertyStore.merkleTreeFromLeaves(la)) ==
      rows(PropertyStore.merkleTree(a, "id", "rev", "deleted", pay, 8)))
    assert(rows(PropertyStore.merkleDiffFromLeaves(la, lb)) ==
      rows(PropertyStore.merkleDiff(a, b, "id", "rev", "deleted", pay, 8)))
    assert(rows(PropertyStore.repairPlanFromLeaves(la, lb)) ==
      rows(PropertyStore.repairPlan(a, b, "id", "rev", "deleted", pay, 8)))
    // identical stores → empty diff through the artifact path too
    assert(PropertyStore.merkleDiffFromLeaves(la, la).isEmpty)
  }
}
