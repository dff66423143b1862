package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalacheck.{Gen, Prop, Test => SCTest}

/**
 * Property-based fidelity guard for the count-based ST2 state machine:
 * arbitrary bursty batched point sequences run through the REAL
 * Structured Streaming job and must match an independent plain-Scala
 * simulation of the reference semantics (sliding_window.go): per batch,
 * points fold in event-time order; an element is late-dropped iff its
 * window's max timestamp ≤ the watermark AND the LRU holds `lruSize`
 * windows AND its window is absent; inserting into a full LRU evicts the
 * least-recently-USED window with a final flush; the watermark advances
 * to each element's timestamp after it is processed. The read-side
 * latest-flush dedup then yields, per bucket, the top-n of its LAST
 * emission (live content of its last touched batch, or the eviction
 * flush).
 */
class TopNLruPropertySpec extends SparkSpec {

  private val HOUR = 3600000L

  /** independent model: final (bucket → counters) per the reference rules. */
  private def simulate(batches: Seq[Seq[TopNPoint]],
      cfg: TopNStreamConfig): Map[Long, Map[String, Long]] = {
    var wm = Long.MinValue
    val order = scala.collection.mutable.ArrayBuffer.empty[Long] // 0 = LRU
    val live = scala.collection.mutable.Map.empty[Long, Map[String, Long]]
    val lastEmission = scala.collection.mutable.Map.empty[Long, Map[String, Long]]
    batches.foreach { b =>
      val touched = scala.collection.mutable.Set.empty[Long]
      val evictedThisBatch = scala.collection.mutable.Map.empty[Long, Map[String, Long]]
      b.sortBy(p => (p.ts.getTime, p.entity, p.value)).foreach { p =>
        val bucket = (p.ts.getTime / cfg.intervalMs) * cfg.intervalMs
        val present = live.contains(bucket)
        val late = (bucket + cfg.intervalMs - 1) <= wm &&
          live.size >= cfg.lruSize && !present
        if (!late) {
          if (present) { order -= bucket; order += bucket }
          else {
            if (live.size >= cfg.lruSize) {
              val lru = order.remove(0)
              evictedThisBatch(lru) = live.remove(lru).get
            }
            live(bucket) = Map.empty; order += bucket
          }
          val c = live(bucket)
          live(bucket) = c + (p.entity -> (c.getOrElse(p.entity, 0L) + p.value))
          touched += bucket
        }
        if (p.ts.getTime > wm) wm = p.ts.getTime
      }
      evictedThisBatch.foreach { case (bkt, counters) =>
        if (!live.contains(bkt)) lastEmission(bkt) = counters
      }
      touched.foreach(bkt => if (live.contains(bkt)) lastEmission(bkt) = live(bkt))
    }
    lastEmission.toMap
  }

  private def topN(counters: Map[String, Long], cfg: TopNStreamConfig) =
    counters.toSeq.sortBy { case (e, v) => (-v, e) }.take(cfg.n).toSet

  test("streamed count-based LRU == reference-rule simulation on random bursty input") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val pointGen = for {
        h <- Gen.choose(0, 5)
        e <- Gen.oneOf("a", "b", "c")
        v <- Gen.choose(1L, 9L)
        off <- Gen.choose(0L, HOUR - 1)
      } yield TopNPoint(new java.sql.Timestamp(h * HOUR + off), e, v)
      val batchesGen = Gen.choose(1, 3).flatMap(nb =>
        Gen.listOfN(nb, Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, pointGen))))
      val cfgGen = for {
        lru <- Gen.choose(1, 3)
        n <- Gen.choose(1, 3)
      } yield TopNStreamConfig(intervalMs = HOUR, n = n,
        countersNumber = 100, lruSize = lru)
      val p = Prop.forAll(Gen.zip(batchesGen, cfgGen)) { case (batches, cfg) =>
        val src = MemoryStream[TopNPoint]
        val name = "topn_prop_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/root/repo/target/test-tmp"), "propckpt").toString
        val q = TopNStream.topNAggregate(src.toDF(), cfg).writeStream
          .format("memory").queryName(name)
          .outputMode(OutputMode.Append)
          .option("checkpointLocation", ckpt)
          .start()
        batches.foreach { b => src.addData(b); q.processAllAvailable() }
        q.stop()
        val got = TopNStream.latestSnapshot(spark.table(name)).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          .groupBy(_._1).map { case (bkt, rows) =>
            bkt -> rows.map(r => (r._2, r._3)).toSet
          }
        val want = simulate(batches, cfg)
          .map { case (bkt, cs) => bkt -> topN(cs, cfg) }
          .filter(_._2.nonEmpty)
        val ok = got == want
        if (!ok) println(s"MISMATCH cfg=$cfg\nbatches=$batches\ngot=$got\nwant=$want")
        ok
      }
      val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
      assert(res.passed, res.status.toString)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
