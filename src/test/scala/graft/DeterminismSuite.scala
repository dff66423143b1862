package graft

import org.apache.spark.sql.DataFrame

/**
 * Replay-and-diff parity, after the reference's 48 h soak gate
 * (docs/soak/g5d-phase-d-summary.md §2: 576/576 replayed queries
 * byte-identical). Every driver query is executed twice and must produce
 * the same multiset of rows — this is what makes the hash-based oracle
 * gate meaningful, and it catches nondeterminism (unordered `first()`,
 * float merge-order drift, unstable LIMIT subsets) at the whole-surface
 * level rather than per-operator.
 */
class DeterminismSuite extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name is run-to-run deterministic") {
      val a = canon(fn(spark, sf0001))
      val b = canon(fn(spark, sf0001))
      assert(a == b, s"$name differed between runs")
      assert(a.nonEmpty || name == "q45_cosine_neardup_lsh",
        s"$name returned zero rows at sf0.001")
    }
  }
}
