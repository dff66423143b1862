package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic main for stage-level timing — not part of the
  * library surface; never invoked by the driver. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val e = graft.sources.Catalog.load(spark, sfDir, "embeddings")
    e.count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMED $name ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val cents: Array[(Long, Array[Double])] = time("cents-collect") {
      e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    }
    val cb = time("cb-collect") {
      Similarity.pqCodebookFromPrefix(e, dim = 64, nBlocks = 8, codesPerBlock = 16)
    }
    val queries = e.filter(col("vec_id") < 10)
    // warm run of the plain IVFADC (q96 shape)
    time("ivfadc-warm") {
      Similarity.ivfAdcTopKWith(e, queries, 5, cents, cb, 2, 8, 16)
        .queryExecution.toRdd.foreach(_ => ())
    }
    time("ivfadc-again") {
      Similarity.ivfAdcTopKWith(e, queries, 5, cents, cb, 2, 8, 16)
        .queryExecution.toRdd.foreach(_ => ())
    }
    time("shortlist20") {
      Similarity.ivfAdcTopKWith(e, queries, 20, cents, cb, 2, 8, 16)
        .queryExecution.toRdd.foreach(_ => ())
    }
    time("rerank-full") {
      Similarity.ivfAdcRerankTopK(e, queries, k = 5, kShort = 20, cents, cb,
        nprobe = 2, nBlocks = 8, codesPerBlock = 16)
        .queryExecution.toRdd.foreach(_ => ())
    }
    time("rerank-full-again") {
      Similarity.ivfAdcRerankTopK(e, queries, k = 5, kShort = 20, cents, cb,
        nprobe = 2, nBlocks = 8, codesPerBlock = 16)
        .queryExecution.toRdd.foreach(_ => ())
    }
    spark.stop()
  }
}
