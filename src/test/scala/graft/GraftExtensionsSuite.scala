package graft

/** SQL-surface checks: the native expressions resolve and compute through
  * plain `spark.sql`, and a fresh builder session picks them up via
  * `withExtensions`. */
class GraftExtensionsSuite extends SparkSpec {

  test("registered functions evaluate from SQL text") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_shingles('a b c d', 3) AS sh,
        |       graft_simhash('hello world') AS sim""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(r.getDouble(1) == 11.0)
    assert(r.getSeq[String](2) == Seq("a b c", "b c d"))
    // deterministic engine-portable hash — same value every run
    assert(r.getLong(3) == spark.sql("SELECT graft_simhash('hello world')")
      .head().getLong(0))
    val tc = spark.sql("SELECT graft_term_counts('A b a, B b!') AS tc").head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getString(0), x.getLong(1)))
    assert(tc == Seq(("a", 2L), ("b", 3L)), s"got $tc")
  }

  test("minhash signature over shingles matches the Column-API kernel") {
    GraftExtensions.register(spark)
    import graft.sources.Catalog
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graftbridge.Bridge
    val docs = Catalog.load(spark, sf0001, "documents").limit(5)
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_minhash_sig(graft_shingles(text, 3), 32) AS sig FROM ext_docs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaApi = docs.select(col("doc_id"), Bridge.column(
      graft.functions.MinHashSigExpr(
        graft.functions.ShinglesExpr(Bridge.expression(col("text")), 3), 32)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaApi)
  }

  test("analyzer tokens and LSH bucket evaluate from SQL, matching the Column API") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val r = spark.sql(
      """SELECT graft_tokens('Hello, World 42!', 'standard') AS st,
        |       graft_tokens('Hello, World 42!', 'simple') AS si,
        |       graft_tokens('Hello/World', 'url') AS u""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("hello", "world", "42"))
    assert(r.getSeq[String](1) == Seq("hello", "world"))
    assert(r.getSeq[String](2) == Seq("Hello", "World"))

    import graft.sources.Catalog
    val emb = Catalog.load(spark, sf0001, "embeddings").limit(5)
    emb.createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_lsh_bucket(embedding, 64, 8) AS b FROM ext_emb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = emb.select(col("vec_id"),
      graft.operators.Similarity.lshBucket(col("embedding"), 64, 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)
  }

  test("corpus-shaping functions compose into plans from SQL text") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_scrub_pii('mail a@b.co or 10.0.0.1 ref 1234567890') AS t,
        |       graft_pii_count('mail a@b.co or 10.0.0.1 ref 1234567890') AS n,
        |       graft_sample_hash(7, 100) AS always,
        |       graft_sample_hash(7, 0) AS never,
        |       graft_sample_hash(7, 10, 'v2') AS salted""".stripMargin).head()
    assert(r.getString(0) == "mail <EMAIL> or <IP> ref <ID>")
    assert(r.getInt(1) == 3)
    assert(r.getBoolean(2) && !r.getBoolean(3))
    // salted membership matches the Column-API operator exactly
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val api = graft.operators.TextAnalysis.sampleByHash(
      Seq(7L).toDF("id"), "id", 10, salt = "v2").count() == 1
    assert(r.getBoolean(4) == api)
  }

  test("winnow fingerprints from SQL match the operator on real documents") {
    GraftExtensions.register(spark)
    import graft.sources.Catalog
    val docs = Catalog.load(spark, sf0001, "documents").limit(20)
    docs.createOrReplaceTempView("ext_wdocs")
    val viaSql = spark.sql(
      """SELECT doc_id, fp FROM ext_wdocs
        |LATERAL VIEW explode(graft_winnow_fingerprints(text, 16, 8)) AS fp""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val viaApi = graft.operators.TextAnalysis
      .winnowFingerprints(docs, "doc_id", "text", k = 16, w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(viaSql.nonEmpty && viaSql.sameElements(viaApi))
  }

  test("builder wiring: a session built withExtensions resolves the functions") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // getOrCreate may return the shared session (extensions then applied at
    // registry level already by the tests above); assert resolution works
    // either way.
    assert(s2.sql("SELECT graft_dot(array(2.0D), array(3.0D))").head().getDouble(0) == 6.0)
  }
}
