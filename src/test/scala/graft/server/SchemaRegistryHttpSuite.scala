package graft.server

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.storage.{CatalogStore, CatalogEntry}

/**
 * Wire conformance for [[SchemaRegistryHttp]] — the registry-service
 * behaviors the reference asserts in test/cases/schema (apply_rollback,
 * tombstone_gc) and the Phase-2 revision barrier, exercised over HTTP:
 * create stamps revision 1 with created==updated; duplicate create is
 * 409; an entity change is rejected 400 with the stored schema
 * untouched; accepted updates bump the revision; delete returns the
 * tombstone's delete_time and a backdated recreate violates its
 * invariant; `await` blocks until a concurrent writer applies the
 * revision the client holds; `watch` long-polls one update event.
 */
class SchemaRegistryHttpSuite extends SparkSpec {

  private def tmpRoot(): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/test-tmp")
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.createTempDirectory(base, "registry").toString
  }

  private def req(method: String, url: String, body: Option[String] = None): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(b.getBytes(StandardCharsets.UTF_8)) finally os.close()
    }
    val status = conn.getResponseCode
    val is = if (status < 400) conn.getInputStream else conn.getErrorStream
    val text = try new String(is.readAllBytes(), StandardCharsets.UTF_8) finally is.close()
    (status, text)
  }

  private def parse(s: String): Map[String, Any] =
    Json.parse(s).asInstanceOf[Map[String, Any]]

  private def entry(group: String, name: String, entity: Seq[String] = Seq("svc"),
      fields: Seq[String] = Seq("value")): String =
    SchemaRegistryHttp.entryToJson(spark, CatalogEntry(
      group = group, name = name, entity = entity, tsCol = "__ts",
      fields = fields))

  test("registry CRUD over the wire: revision/timestamps/409/apply-rollback/tombstone") {
    val root = tmpRoot()
    val server = SchemaRegistryHttp.start(spark, root)
    try {
      val base = server.url
      // create: revision 1, created == updated (apply_rollback.go:104-122)
      val (c1, b1) = req("POST", s"$base/g1/metrics?nowMs=1000", Some(entry("g1", "metrics")))
      assert(c1 == 200, b1)
      val e1 = parse(b1)
      assert(e1("modRevision") == 1L && e1("createdAtMs") == 1000L &&
        e1("updatedAtMs") == 1000L, b1)

      // duplicate create → 409 AlreadyExists
      val (c2, b2) = req("POST", s"$base/g1/metrics", Some(entry("g1", "metrics")))
      assert(c2 == 409 && b2.contains("already exists"), s"$c2 $b2")

      // GET returns the stored entry; unknown is 404; list has one entry
      val (g1, gb1) = req("GET", s"$base/g1/metrics")
      assert(g1 == 200 && parse(gb1)("modRevision") == 1L)
      assert(req("GET", s"$base/g1/nope")._1 == 404)
      val (_, lb) = req("GET", base)
      assert(parse(lb)("entries").asInstanceOf[List[_]].size == 1, lb)

      // entity change → 400 APPLY-ROLLBACK: stored schema byte-identical
      val (u1, ub1) = req("PUT", s"$base/g1/metrics?nowMs=2000",
        Some(entry("g1", "metrics", entity = Seq("other"))))
      assert(u1 == 400 && ub1.contains("immutable"), s"$u1 $ub1")
      assert(req("GET", s"$base/g1/metrics")._2 == gb1,
        "rejected update must leave the stored schema untouched")

      // accepted update: revision 2, created preserved, updated stamped
      val (u2, ub2) = req("PUT", s"$base/g1/metrics?nowMs=3000",
        Some(entry("g1", "metrics", fields = Seq("value", "load"))))
      assert(u2 == 200, ub2)
      val e2 = parse(ub2)
      assert(e2("modRevision") == 2L && e2("createdAtMs") == 1000L &&
        e2("updatedAtMs") == 3000L, ub2)

      // update of a missing resource → 404
      assert(req("PUT", s"$base/g1/nope", Some(entry("g1", "nope")))._1 == 404)

      // body/path mismatch → 400
      val (m1, mb1) = req("POST", s"$base/g1/other", Some(entry("g1", "metrics")))
      assert(m1 == 400 && mb1.contains("does not match path"), s"$m1 $mb1")
      // malformed body → 400 (FAILFAST decode)
      assert(req("POST", s"$base/g1/other", Some("{not json"))._1 == 400)

      // delete: tombstone delete_time returned; second delete false
      val (d1, db1) = req("DELETE", s"$base/g1/metrics?nowMs=5000")
      assert(d1 == 200, db1)
      val del = parse(db1)
      assert(del("deleted") == true && del("delete_time") == 5000L, db1)
      assert(parse(req("DELETE", s"$base/g1/metrics")._2)("deleted") == false)
      assert(req("GET", s"$base/g1/metrics")._1 == 404)

      // backdated recreate at/before delete_time violates the tombstone
      // invariant (tombstone_gc.go Step 1.3)
      val back = SchemaRegistryHttp.entryToJson(spark, CatalogEntry(
        group = "g1", name = "metrics", entity = Seq("svc"), tsCol = "__ts",
        createdAtMs = Some(4000L)))
      val (r1, rb1) = req("POST", s"$base/g1/metrics?nowMs=6000", Some(back))
      assert(r1 == 400 && rb1.contains("tombstone"), s"$r1 $rb1")

      // normal recreate: revision CONTINUES past the deleted lineage
      // (etcd-global revisions never restart within tombstone retention)
      val (r2, rb2) = req("POST", s"$base/g1/metrics?nowMs=6000",
        Some(entry("g1", "metrics")))
      assert(r2 == 200 && parse(rb2)("modRevision") == 3L, rb2)
    } finally server.stop()
  }

  test("await blocks on the revision barrier until a concurrent writer applies it") {
    val root = tmpRoot()
    val server = SchemaRegistryHttp.start(spark, root)
    try {
      val base = server.url
      req("POST", s"$base/g2/logs?nowMs=1000", Some(entry("g2", "logs")))

      // already-applied revision: immediate SUCCEED, no sleep
      val (a0, ab0) = req("GET", s"$base/g2/logs/await?revision=1")
      assert(a0 == 200 && parse(ab0)("status") == "STATUS_SUCCEED", ab0)
      // ahead with no wait → SCHEMA_NOT_APPLIED
      assert(parse(req("GET", s"$base/g2/logs/await?revision=2")._2)("status")
        == "STATUS_SCHEMA_NOT_APPLIED")
      // stale client (holds rev 1 after the schema moved on) → EXPIRED;
      // bump first via update
      // unknown resource → NOT_FOUND
      assert(parse(req("GET", s"$base/g2/nope/await?revision=1")._2)("status")
        == "STATUS_NOT_FOUND")
      // missing param → 400
      assert(req("GET", s"$base/g2/logs/await")._1 == 400)

      // concurrent apply: a writer updates after 150 ms; the barrier call
      // (timeout 3 s) must return SUCCEED with the new revision
      val writer = new Thread(() => {
        Thread.sleep(150)
        CatalogStore.update(spark, root, CatalogEntry(
          group = "g2", name = "logs", entity = Seq("svc"), tsCol = "__ts",
          fields = Seq("value", "extra")), nowMs = 2000L)
      })
      writer.start()
      val t0 = System.nanoTime()
      val (aw, awb) = req("GET", s"$base/g2/logs/await?revision=2&timeoutMs=3000")
      val waited = (System.nanoTime() - t0) / 1e6
      writer.join()
      assert(aw == 200 && parse(awb)("status") == "STATUS_SUCCEED", awb)
      assert(parse(awb)("revision") == 2L, awb)
      assert(waited >= 100, s"barrier returned before the writer applied ($waited ms)")

      // now a client still holding revision 1 is EXPIRED
      assert(parse(req("GET", s"$base/g2/logs/await?revision=1")._2)("status")
        == "STATUS_EXPIRED_SCHEMA")
    } finally server.stop()
  }

  test("watch long-polls one update event and reports deletes") {
    val root = tmpRoot()
    val server = SchemaRegistryHttp.start(spark, root)
    try {
      val base = server.url
      req("POST", s"$base/g3/spans?nowMs=1000", Some(entry("g3", "spans")))

      // timeout with no change
      val tm = parse(req("GET", s"$base/g3/spans/watch?sinceRevision=1&timeoutMs=200")._2)
      assert(tm("event") == "timeout" && tm("revision") == 1L, tm.toString)

      // concurrent update releases the watch with the new entry
      val writer = new Thread(() => {
        Thread.sleep(150)
        CatalogStore.update(spark, root, CatalogEntry(
          group = "g3", name = "spans", entity = Seq("svc"), tsCol = "__ts",
          fields = Seq("value", "w")), nowMs = 2000L)
      })
      writer.start()
      val (ust, uraw) = req("GET", s"$base/g3/spans/watch?sinceRevision=1&timeoutMs=3000")
      writer.join()
      assert(ust == 200, s"watch failed: $ust $uraw")
      val up = parse(uraw)
      assert(up("event") == "updated", uraw)
      assert(up("entry").asInstanceOf[Map[String, Any]]("modRevision") == 2L, up.toString)

      // delete is observed as a deleted event with the tombstone time
      req("DELETE", s"$base/g3/spans?nowMs=9000")
      val dl = parse(req("GET", s"$base/g3/spans/watch?sinceRevision=2&timeoutMs=1000")._2)
      assert(dl("event") == "deleted" && dl("delete_time") == 9000L, dl.toString)
    } finally server.stop()
  }

  test("watch never misreads a concurrent save's overwrite window as a delete") {
    // CatalogStore.save once overwrote delete-then-write, so a reader
    // could transiently observe the entry directory ABSENT mid-update;
    // the first version of the watch reported that window as a `deleted`
    // event (caught by this suite's flake). save is now write-new-then-
    // retire-old (no absent window) and get() rides any residual create
    // window out via the marker — churn updates against concurrent
    // watch polls and assert no false delete ever surfaces.
    val root = tmpRoot()
    val server = SchemaRegistryHttp.start(spark, root)
    try {
      val base = server.url
      req("POST", s"$base/g5/m?nowMs=1000", Some(entry("g5", "m")))
      val writer = new Thread(() => (0 until 12).foreach { i =>
        CatalogStore.update(spark, root, CatalogEntry(
          group = "g5", name = "m", entity = Seq("svc"), tsCol = "__ts",
          fields = Seq("value", s"f$i")), nowMs = 2000L + i)
      })
      writer.start()
      (0 until 10).foreach { k =>
        val (st, raw) = req("GET",
          s"$base/g5/m/watch?sinceRevision=1000&timeoutMs=120")
        val ev = parse(raw)
        assert(st == 200 && ev.get("event").contains("timeout"),
          s"poll $k observed $st during update churn: $raw")
      }
      writer.join()
      // and a never-registered resource long-polls to timeout, not deleted
      val nv = parse(req("GET", s"$base/g5/ghost/watch?sinceRevision=0&timeoutMs=120")._2)
      assert(nv("event") == "timeout", nv.toString)
    } finally server.stop()
  }

  test("missing required fields reject 400 at the boundary, never persist") {
    // FAILFAST only rejects malformed/mistyped bodies; a MISSING field
    // decodes to null — `{}` used to persist an entry with null
    // entity/tsCol that NPE'd gate/open/query paths much later
    val root = tmpRoot()
    val server = SchemaRegistryHttp.start(spark, root)
    try {
      val base = server.url
      val (s1, b1) = req("POST", s"$base/gv/m", Some("{}"))
      assert(s1 == 400 && b1.contains("entity"), s"$s1 $b1")
      val (s2, b2) = req("POST", s"$base/gv/m",
        Some("""{"entity": ["svc"]}"""))
      assert(s2 == 400 && b2.contains("tsCol"), s"$s2 $b2")
      val (s3, b3) = req("POST", s"$base/gv/m",
        Some("""{"entity": [], "tsCol": "ts"}"""))
      assert(s3 == 400 && b3.contains("entity"), s"$s3 $b3")
      // nothing persisted by any of the rejected writes
      assert(req("GET", s"$base/gv/m")._1 == 404)
      assert(CatalogStore.get(spark, root, "gv", "m").isEmpty)
      // and the minimal VALID body is accepted
      val (s4, b4) = req("POST", s"$base/gv/m",
        Some("""{"entity": ["svc"], "tsCol": "ts"}"""))
      assert(s4 == 200, s"$s4 $b4")
    } finally server.stop()
  }

  test("unknown paths are 404; known shapes with a wrong method are 405") {
    val root = tmpRoot()
    val server = SchemaRegistryHttp.start(spark, root)
    try {
      val base = server.url
      // wrong method on valid shapes → 405
      assert(req("DELETE", base)._1 == 405)
      assert(req("OPTIONS", s"$base/g/n")._1 == 405)
      assert(req("POST", s"$base/g/n/await?revision=1")._1 == 405)
      assert(req("POST", s"$base/g/n/watch")._1 == 405)
      // unknown path shapes → 404, regardless of method
      assert(req("GET", s"$base/alone")._1 == 404)
      assert(req("GET", s"$base/g/n/unknown")._1 == 404)
      assert(req("POST", s"$base/g/n/await/extra")._1 == 404)
    } finally server.stop()
  }

  test("pending long-polls do not starve the mutation that releases them") {
    // a FIXED pool of N self-deadlocks at N pending watches: the PUT that
    // would release them queues behind them until their timeouts expire.
    // With the cached pool, 4 pending watches + 1 CRUD must all complete
    // promptly — the watches via the update event, not their 8 s timeout.
    val root = tmpRoot()
    val server = SchemaRegistryHttp.start(spark, root)
    try {
      val base = server.url
      req("POST", s"$base/gs/m?nowMs=1000", Some(entry("gs", "m")))
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, Any]]()
      val watchers = (0 until 4).map { _ =>
        new Thread(() => {
          val (_, raw) = req("GET", s"$base/gs/m/watch?sinceRevision=1&timeoutMs=8000")
          results.add(parse(raw)); ()
        })
      }
      watchers.foreach(_.start())
      Thread.sleep(300) // all four long-polls parked on pool threads
      val t0 = System.nanoTime()
      val (u, ub) = req("PUT", s"$base/gs/m?nowMs=2000",
        Some(entry("gs", "m", fields = Seq("value", "x"))))
      val putMs = (System.nanoTime() - t0) / 1e6
      assert(u == 200, ub)
      assert(putMs < 4000, s"PUT starved behind pending watches: $putMs ms")
      watchers.foreach(_.join(8000))
      assert(results.size == 4, s"watchers still parked: ${results.size}/4")
      results.forEach(ev => assert(ev("event") == "updated", ev.toString))
    } finally server.stop()
  }

  test("the list endpoint renders the whole catalog in O(1) Spark jobs") {
    val root = tmpRoot()
    val server = SchemaRegistryHttp.start(spark, root)
    try {
      val base = server.url
      (0 until 10).foreach(i =>
        assert(req("POST", s"$base/gl/m$i?nowMs=${1000 + i}",
          Some(entry("gl", s"m$i")))._1 == 200))
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val (st, raw) = req("GET", base)
        Thread.sleep(500) // listener events are async — let the bus drain
        assert(st == 200)
        val names = parse(raw)("entries").asInstanceOf[List[Map[String, Any]]]
          .map(_("name"))
        assert(names == (0 until 10).map(i => s"m$i").toList, names.toString)
        // one read over all entry dirs + one batch render (+ slack): a
        // per-entry render loop would be ≥ 10 jobs here
        assert(jobs.get() <= 4, s"list ran ${jobs.get()} Spark jobs for 10 entries")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally server.stop()
  }

  test("wire entry format round-trips the persistence encoder exactly") {
    val e = CatalogEntry(group = "g4", name = "m", entity = Seq("a", "b"),
      tsCol = "ts", versionCol = Some("v"), fields = Seq("f1"),
      arrayTags = Seq("tags"), analyzerColumns = Map("msg" -> "standard"),
      tagFamilies = Map("default" -> Seq("a", "b")),
      matchableWindowsMs = Map("msg" -> Seq(1L, 2L)), shardingKey = Seq("a"))
    val json = SchemaRegistryHttp.entryToJson(spark, e)
    val back = SchemaRegistryHttp.entryFromJson(spark, json)
    assert(back == e, s"\n$json\n$back")
  }
}
