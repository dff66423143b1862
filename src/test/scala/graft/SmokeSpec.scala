package graft

import graft.sources.Catalog

class SmokeSpec extends SparkSpec {
  test("read events parquet incl ns timestamp") {
    val df = Catalog.load(spark, sf0001, "events")
    assert(df.count() == 1000)
    assert(df.columns.contains("ts_ns") && df.columns.contains("ts"))
  }
}
