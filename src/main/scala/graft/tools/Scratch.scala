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
    val docs = graft.sources.Catalog.load(spark, sfDir, "documents")
    docs.count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMED $name ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // stage 1: scoring alone
    val scored0 = graft.operators.CorpusStats.unigramLogProb(docs, "doc_id", "text")
      .withColumn("surprisal_micros", expr("(-lp_micros) div n_tokens"))
    val scored = time("score+barrier") {
      val b = scored0.localCheckpoint(); b.count(); b
    }
    // stage 2: md5 sample filter
    val h = conv(substring(md5(concat(col("doc_id").cast("string"), lit(""))), 1, 15), 16, 10).cast("long")
    val sample = scored.filter(h % 1000000L < 100000L).select(col("doc_id"), col("surprisal_micros"))
    time("sample-count")(println(sample.count()))
    // stage 3: window rank
    import org.apache.spark.sql.expressions.Window
    val ranked = sample
      .withColumn("__rn", row_number().over(Window.orderBy(col("surprisal_micros"), col("doc_id"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
    val cuts = ranked.filter(
        col("__rn") === greatest(lit(1L), expr("__n div 3")) ||
        col("__rn") === greatest(lit(1L), expr("(__n * 2) div 3")))
      .agg(min("surprisal_micros").as("__t1"), max("surprisal_micros").as("__t2"))
    time("cuts")(cuts.collect().foreach(println))
    // stage 4: final tier select
    val out = scored.crossJoin(broadcast(cuts))
      .withColumn("tier",
        when(col("surprisal_micros") <= col("__t1"), lit("head"))
          .when(col("surprisal_micros") <= col("__t2"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("n_tokens"), col("surprisal_micros"), col("tier"))
    time("final-select")(out.queryExecution.toRdd.foreach(_ => ()))
    spark.stop()
  }
}
