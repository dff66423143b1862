package graft
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class SmokeSpec extends AnyFunSuite {
  lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("read events parquet incl ns timestamp") {
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.printSchema()
    df.show(3, false)
    assert(df.count() == 1000)
  }
}
