package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks of the corpus-shaping operators against
  * independent plain-Scala models: chunk coverage/shape invariants, hash
  * sampling's pure-function-of-id membership, scrub/count agreement, and
  * cluster-closure correctness vs a brute-force union-find. */
class CorpusShapingPropertySpec extends SparkSpec {

  private def check(p: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ---- chunk ---------------------------------------------------------------

  private val wordGen = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val docGen = Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, wordGen))

  test("chunk: every token covered, windows sized and ordered per model") {
    import spark.implicits._
    val params = for {
      docs <- Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, docGen))
      size <- Gen.choose(1, 20)
      stride <- Gen.choose(1, size)
    } yield (docs, size, stride)
    check(Prop.forAll(params) { case (docs, size, stride) =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.chunk(df, "doc_id", "text", size, stride)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
        .groupBy(_._1)
      docs.zipWithIndex.forall { case (ws, i) =>
        val chunks = got.getOrElse(i.toLong, Array.empty).sortBy(_._2)
        if (ws.isEmpty) chunks.isEmpty
        else {
          val n = ws.length
          val wantCount = if (n <= size) 1 else math.ceil((n - size).toDouble / stride).toInt + 1
          val model = (0 until wantCount).map { c =>
            val slice = ws.slice(c * stride, c * stride + size)
            (i.toLong, c, slice.mkString(" "), slice.length)
          }
          chunks.toSeq == model &&
            chunks.flatMap(_._3.split(" ")).toSet == ws.toSet // coverage
        }
      }
    })
  }

  // ---- sampleByHash --------------------------------------------------------

  test("sampleByHash: membership matches the md5 model; rates nest monotonically") {
    import spark.implicits._
    val ids = (0L until 300L).toDF("doc_id")
    def md5mod(id: Long, salt: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest((id.toString + salt).getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(15), 16) % 100
    }
    val saltGen = Gen.oneOf("", "a", "v2", "xyz")
    check(Prop.forAll(Gen.choose(0, 100), saltGen) { (pct, salt) =>
      val got = TextAnalysis.sampleByHash(ids, "doc_id", pct, salt)
        .collect().map(_.getLong(0)).toSet
      val model = (0L until 300L).filter(md5mod(_, salt) < pct).toSet
      got == model
    }, n = 20)
  }

  // ---- scrubPii ------------------------------------------------------------

  test("scrubPii: idempotent, and clean text has zero pii count") {
    import spark.implicits._
    val piiGen = Gen.oneOf("x@y.io", "10.0.0.255", "123456789012", "plain", "a.b", "12.5")
    val textGen = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, piiGen).map(_.mkString(" ")))
    check(Prop.forAll(Gen.listOfN(4, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val once = df.select(col("id"), TextAnalysis.scrubPii(col("t")).as("t"))
      val twice = once.select(col("id"), TextAnalysis.scrubPii(col("t")).as("t"),
        TextAnalysis.piiCount(col("t")).as("n"))
      // scrubbing scrubbed text changes nothing and finds nothing
      once.collect().map(_.getString(1)).toSeq ==
        twice.collect().map(_.getString(1)).toSeq &&
        twice.collect().forall(_.getInt(2) == 0)
    }, n = 20)
  }

  // ---- dedupClusters -------------------------------------------------------

  test("dedupClusters: matches brute-force union-find on random graphs") {
    import spark.implicits._
    val edgeGen = for {
      a <- Gen.choose(0L, 24L); b <- Gen.choose(0L, 24L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    check(Prop.forAll(Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, edgeGen))) { edges =>
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonical label = min member of the component
      val members = nodes.groupBy(find)
      val model = members.values.flatMap(ms => ms.map(_ -> ms.min)).toMap
      val got = Dedup.dedupClusters(edges.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == model
    }, n = 15)
  }

  test("dedupClusters: distributed rounds match brute-force union-find too") {
    import spark.implicits._
    val edgeGen = for {
      a <- Gen.choose(0L, 24L); b <- Gen.choose(0L, 24L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    spark.conf.set("spark.graft.dedup.clusters.driverMaxEdges", "0")
    try check(Prop.forAll(Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, edgeGen))) { edges =>
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val members = nodes.groupBy(find)
      val model = members.values.flatMap(ms => ms.map(_ -> ms.min)).toMap
      val got = Dedup.dedupClusters(edges.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == model
    }, n = 6)
    finally spark.conf.unset("spark.graft.dedup.clusters.driverMaxEdges")
  }

  test("dedupClusters: adaptive mid-run collapse matches brute-force union-find") {
    import spark.implicits._
    // a 12-node clique (66 canonical edges) guarantees the initial probe
    // EXCEEDS driverMaxEdges=30, so the distributed rounds start; star
    // rounds contract the clique to ~11 star edges, so the edge list dips
    // under the gate mid-run and the collapse path (not the up-front
    // driver path, not pure-distributed convergence) produces the labels.
    // Random extra edges over 12..24 — self-loops allowed — exercise the
    // isolated-node union through the collapsed driver call.
    val clique = (for {
      a <- 0L to 11L; b <- (a + 1) to 11L
    } yield (a, b)).toList
    val extraGen = for {
      a <- Gen.choose(12L, 24L); b <- Gen.choose(12L, 24L)
    } yield (math.min(a, b), math.max(a, b))
    spark.conf.set("spark.graft.dedup.clusters.driverMaxEdges", "30")
    try check(Prop.forAll(Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, extraGen))) { extra =>
      val edges = clique ++ extra
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val members = nodes.groupBy(find)
      val model = members.values.flatMap(ms => ms.map(_ -> ms.min)).toMap
      val got = Dedup.dedupClusters(edges.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == model
    }, n = 8)
    finally spark.conf.unset("spark.graft.dedup.clusters.driverMaxEdges")
  }
}
