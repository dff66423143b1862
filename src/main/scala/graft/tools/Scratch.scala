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
    // the q70 replica pair, as the bench materializes it
    graft.SparkEntry.prepare(spark, sfDir)
    val ioBase = sys.env.getOrElse("SPARK_GRAFT_IO", "/root/repo/target/graft-io")
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val a = spark.read.parquet(s"$ioBase/proplog_$tag/log")
    val b = spark.read.parquet(s"$ioBase/proplogb_$tag/log")
    for (slots <- Seq(32, 1024)) {
      val st = graft.storage.PropertyStore.merkleTransferStats(a, b,
        "id", "rev", "deleted",
        payload = Seq(round(col("price") * 100).cast("long").cast("string")),
        slotCount = slots).head()
      println(s"MERKLE sf=$sfDir slots=$slots entities=${st.getLong(0)} " +
        s"diverged_slots=${st.getLong(1)} leaves_in_diverged=${st.getLong(2)} " +
        s"direct_bytes=${st.getLong(3)} tree_bytes=${st.getLong(4)} " +
        f"reduction=${st.getDouble(5)}%.1f")
    }
    spark.stop()
  }
}
