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
}
