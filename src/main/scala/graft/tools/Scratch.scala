package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic main for stage-level timing ablations — not part
  * of the library surface; never invoked by the driver. Edit locally to
  * time a suspect plan stage-by-stage (see BASELINE.md "floor analysis"
  * for measurements this produced), run with
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Scratch"`. */
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
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMED $name ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    time("count-documents") {
      println(graft.sources.Catalog.load(spark, sfDir, "documents").count())
    }
    spark.stop()
  }
}
