package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ordered funnels and cohort retention on hand-built event sequences. */
class FunnelsSuite extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.map { case (u, ms, t) => (u, ms * 1000000L, t) }
      .toDF("user_id", "ts_ns", "event_type")

  test("funnel honors step order with strictly-after semantics") {
    val df = ev(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), // full depth 3
      (2L, 10L, "b"), (2L, 20L, "a"), (2L, 30L, "b"), // b after a → depth 2
      (3L, 10L, "a"), (3L, 10L, "b"),                 // same ts: NOT after → 1
      (4L, 10L, "b"), (4L, 20L, "c"))                 // never entered → absent
    val got = Funnels.funnel(df, "user_id", "ts_ns", "event_type",
      Seq("a", "b", "c"))
      .select("user_id", "t0_ms", "t1_ms", "t2_ms", "depth").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (1L, 10L, 20L, 30L, 3L),
      (2L, 20L, 30L, -1L, 2L),
      (3L, 10L, -1L, -1L, 1L)), s"got $got")
  }

  test("funnel with a non-string step column: coerced isin matches do " +
      "not crash the fold (rendering mismatch advances no step)") {
    // steps are the STRINGS "1"/"2"; a double column matches isin via
    // native coercion (1.0 == "1") but renders "1.0" — the fold must
    // treat such rows as advancing no step, never throw
    val df = Seq((1L, 10L * 1000000L, 1.0), (1L, 20L * 1000000L, 2.0))
      .toDF("user_id", "ts_ns", "step")
    val got = Funnels.funnel(df, "user_id", "ts_ns", "step", Seq("1", "2"))
      .collect()
    assert(got.isEmpty, "no row should enter the funnel under a rendering mismatch")
    // a STRING step column with the same values funnels normally
    val ok = Funnels.funnel(
      Seq((1L, 10L * 1000000L, "1"), (1L, 20L * 1000000L, "2"))
        .toDF("user_id", "ts_ns", "step"),
      "user_id", "ts_ns", "step", Seq("1", "2")).collect()
    assert(ok.length == 1 && ok.head.getLong(ok.head.length - 1) == 2L)
  }

  test("funnelCounts: monotone nonincreasing stage populations") {
    val df = ev((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "a"))
    val f = Funnels.funnel(df, "user_id", "ts_ns", "event_type", Seq("a", "b"))
    val row = Funnels.funnelCounts(f, 2).head()
    assert((row.getLong(0), row.getLong(1)) == ((2L, 1L)))
  }

  test("retention cohorts by first period; offsets count active entities") {
    val P = 100L // ms period
    val df = ev(
      (1L, 10L, "x"), (1L, 150L, "x"), (1L, 350L, "x"), // cohort 0: k=0,1,3
      (2L, 120L, "x"), (2L, 160L, "x"),                 // cohort 1: k=0 (dedup)
      (3L, 20L, "x"), (3L, 250L, "x"))                  // cohort 0: k=0,2
    val got = Funnels.retention(df, "user_id", "ts_ns", periodMs = P)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L),
      (P, 0L, 1L)), s"got $got")
  }
}
