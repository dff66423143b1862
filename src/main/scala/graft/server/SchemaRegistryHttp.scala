package graft.server

import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.storage.{CatalogStore, CatalogEntry, SchemaGate}
import org.apache.spark.sql.SparkSession

/**
 * Schema registry as a SERVICE — the wire surface over [[CatalogStore]]
 * (which already implements the registry semantics: revisions,
 * create/update/delete with apply-rollback atomicity, tombstones, the
 * entity-immutability rule). The reference exposes this as the
 * per-catalog RegistryService RPCs under `banyand/metadata/` plus the
 * Phase-2 schema-status machinery (`AwaitRevisionApplied`,
 * `NodeSchemaStatusService` — reference CHANGES.md §Phase 2): clients
 * CRUD schemas, carry `mod_revision` on requests, and block on a
 * revision barrier until a node has applied the schema they hold.
 *
 * Spark shape: one registry per layout root (the reference scopes its
 * registry to an etcd namespace the same way). CRUD delegates to
 * CatalogStore; the barrier endpoint reuses [[SchemaGate.check]] — the
 * SAME gate the query/write paths enforce — so "the service says
 * SUCCEED" and "a gated query would run" are one predicate. The entry
 * wire format IS the persistence format: bodies encode/decode through
 * the same Spark JSON encoder `CatalogStore.save`/`get` use, so a
 * payload accepted here is byte-compatible with what lands on disk.
 *
 * Routes (all JSON):
 *   GET    /api/v1/registry                         → {"entries": [...]}
 *   GET    /api/v1/registry/{group}/{name}          → entry | 404
 *   POST   /api/v1/registry/{group}/{name}          → create | 409 exists
 *   PUT    /api/v1/registry/{group}/{name}          → update | 404 | 400 rejected
 *   DELETE /api/v1/registry/{group}/{name}          → {"deleted": b, "delete_time": ms?}
 *   GET    .../{group}/{name}/await?revision=N[&timeoutMs=M]
 *            → {"status": "STATUS_*", "revision": cur} — the
 *              AwaitRevisionApplied barrier (10ms ×1.5 backoff, cap 1s)
 *   GET    .../{group}/{name}/watch?sinceRevision=N[&timeoutMs=M]
 *            → long-poll: {"event": "updated", "entry": {...}} |
 *              {"event": "deleted", "delete_time": ms} |
 *              {"event": "timeout", "revision": cur} — the watch
 *              fan-out, single-process shape
 *
 * POST/PUT/DELETE accept `?nowMs=` so conformance tests pin timestamps
 * the way BydbQLHttp pins `now`.
 */
object SchemaRegistryHttp {

  final class Server(private val http: HttpServer,
      private val pool: java.util.concurrent.ExecutorService) {
    def port: Int = http.getAddress.getPort
    def url: String = s"http://127.0.0.1:$port/api/v1/registry"
    def stop(): Unit = { http.stop(0); pool.shutdownNow(); () }
  }

  /** Serve the registry of `root` on 127.0.0.1:`port` (0 = ephemeral).
    * A CACHED pool, not a fixed one: await/watch are LONG-POLL endpoints
    * that occupy a thread for their whole timeout, so any fixed bound N
    * self-deadlocks at N pending watches — the (N+1)th request is the
    * very PUT that would release them, queued behind them until timeout
    * (the registry's mutations are driver-side metadata ops, so an
    * unbounded pool can't amplify Spark work the way the query shim's
    * could; SchemaRegistryHttpSuite pins the starvation case). */
  def start(spark: SparkSession, root: String, port: Int = 0): Server = {
    val http = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)
    val pool = java.util.concurrent.Executors.newCachedThreadPool()
    http.createContext("/api/v1/registry", (ex: HttpExchange) => handle(ex, spark, root))
    http.setExecutor(pool)
    http.start()
    new Server(http, pool)
  }

  // ---------- entry JSON ⇄ CatalogEntry via the persistence encoder ----------

  private def entryEncoder(spark: SparkSession) = {
    import spark.implicits._
    implicitly[org.apache.spark.sql.Encoder[CatalogEntry]]
  }

  private[graft] def entryToJson(spark: SparkSession, e: CatalogEntry): String =
    entriesToJson(spark, Seq(e)).head

  /** Batch render: ONE Spark job for the whole list (order preserved —
    * collect concatenates partitions in order). A per-entry `toJSON` loop
    * is one driver-side Spark job per registered resource, which turns a
    * 500-entry `GET /registry` into 500 jobs for kilobytes of metadata. */
  private[graft] def entriesToJson(spark: SparkSession,
      es: Seq[CatalogEntry]): Seq[String] = {
    import spark.implicits._
    if (es.isEmpty) Nil else es.toDS().toJSON.collect().toSeq
  }

  private[graft] def entryFromJson(spark: SparkSession, body: String): CatalogEntry = {
    import spark.implicits._
    // FAILFAST: malformed JSON or type-mismatched fields must reject the
    // request, not deserialize a row of nulls. The decode failure is the
    // CLIENT's (a 400), so unwrap Spark's exception into the validation
    // type the status mapper already classifies. FAILFAST does NOT flag
    // MISSING fields (they read as null), so before the typed decode the
    // case-class defaults are restored for absent primitives (a null
    // Boolean/Int hard-fails the encoder with a message that blames the
    // whole body) and absent collections (a null Seq decodes fine but
    // NPEs tdef/spec later) — a client may legitimately send only the
    // fields it sets, exactly like the proto registry's unset fields.
    val rows = try {
      spark.read
        .schema(entryEncoder(spark).schema)
        .option("mode", "FAILFAST")
        .json(Seq(body).toDS())
        .na.fill(Map("tsIsNanos" -> true, "shardNum" -> 4, "segmentDays" -> 1))
        .as[CatalogEntry].collect()
    } catch {
      case scala.util.control.NonFatal(t) =>
        throw new IllegalArgumentException(
          s"malformed catalog entry body: ${rootMessage(t)}")
    }
    if (rows.length != 1)
      throw new IllegalArgumentException("request body must be one catalog entry object")
    val e = rows.head
    e.copy(
      arrayTags = Option(e.arrayTags).getOrElse(Nil),
      fields = Option(e.fields).getOrElse(Nil),
      spanStruct = Option(e.spanStruct).getOrElse(Nil),
      stageRoots = Option(e.stageRoots).getOrElse(Map.empty),
      analyzerColumns = Option(e.analyzerColumns).getOrElse(Map.empty),
      matchableWindowsMs = Option(e.matchableWindowsMs).getOrElse(Map.empty),
      tagFamilies = Option(e.tagFamilies).getOrElse(Map.empty),
      shardingKey = Option(e.shardingKey).getOrElse(Nil),
      modRevision = Some(Option(e.modRevision).flatten.getOrElse(1L)))
  }

  private def rootMessage(t: Throwable): String = {
    var cur = t
    while (cur.getCause != null && cur.getCause != cur) cur = cur.getCause
    Option(cur.getMessage).getOrElse(cur.getClass.getSimpleName)
  }

  // ---------- dispatch ----------

  private def handle(ex: HttpExchange, spark: SparkSession, root: String): Unit = {
    try {
      val sub = ex.getRequestURI.getPath.stripPrefix("/api/v1/registry")
        .stripPrefix("/").split("/").filter(_.nonEmpty).toSeq
      val q = queryParams(ex)
      (ex.getRequestMethod, sub) match {
        case ("GET", Seq()) =>
          val entries = entriesToJson(spark, CatalogStore.entries(spark, root))
          respond(ex, 200, "{\"entries\": [" + entries.mkString(", ") + "]}")
        case ("GET", Seq(group, name)) =>
          CatalogStore.get(spark, root, group, name) match {
            case Some(e) => respond(ex, 200, entryToJson(spark, e))
            case None => respond(ex, 404, err(s"resource $group/$name not found"))
          }
        case ("POST", Seq(group, name)) =>
          val e = boundEntry(spark, ex, group, name)
          val stamped = CatalogStore.create(spark, root, e, nowMs(q))
          respond(ex, 200, entryToJson(spark, stamped))
        case ("PUT", Seq(group, name)) =>
          val e = boundEntry(spark, ex, group, name)
          val stamped = CatalogStore.update(spark, root, e, nowMs(q))
          respond(ex, 200, entryToJson(spark, stamped))
        case ("DELETE", Seq(group, name)) =>
          val deleted = CatalogStore.delete(spark, root, group, name, nowMs(q))
          val dt = if (deleted) CatalogStore.deleteTime(spark, root, group, name)
            else None
          respond(ex, 200, "{\"deleted\": " + deleted +
            dt.fold("")(t => s", \"delete_time\": $t") + "}")
        case ("GET", Seq(group, name, "await")) =>
          val target = q.getOrElse("revision",
            throw new IllegalArgumentException("missing query param 'revision'")).toLong
          val timeout = q.get("timeoutMs").map(_.toLong).getOrElse(0L)
          // the SAME predicate a gated query/write evaluates
          val (statuses, _) = SchemaGate.check(Seq(group), name,
            Map(group -> target),
            (n, g) => CatalogStore.get(spark, root, g, n).map(_.revision),
            maxWaitMs = timeout)
          val cur = CatalogStore.get(spark, root, group, name).map(_.revision)
          respond(ex, 200, "{\"status\": " +
            Json.render(statuses.getOrElse(group, SchemaGate.Succeed).wire) +
            cur.fold("")(r => s", \"revision\": $r") + "}")
        case ("GET", Seq(group, name, "watch")) =>
          val since = q.get("sinceRevision").map(_.toLong).getOrElse(0L)
          val timeout = q.get("timeoutMs").map(_.toLong).getOrElse(1000L)
          respond(ex, 200, watch(spark, root, group, name, since, timeout))
        // 405 = known path shape, wrong method; anything else is an
        // unknown resource path → 404 (a 405 on GET /registry/a would
        // wrongly signal "valid resource, wrong verb")
        case (m, Seq()) =>
          respond(ex, 405, err(s"unsupported method $m on the registry list"))
        case (m, Seq(_, _)) =>
          respond(ex, 405, err(s"unsupported method $m on a registry entry"))
        case (m, Seq(_, _, "await" | "watch")) =>
          respond(ex, 405, err(s"unsupported method $m on a long-poll endpoint"))
        case (m, _) =>
          respond(ex, 404, err(s"unknown path: $m ${ex.getRequestURI.getPath}"))
      }
    } catch {
      case scala.util.control.NonFatal(t) =>
        respond(ex, registryStatusFor(t), err(
          s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("")}"))
    }
  }

  /** Long-poll until the entry's revision exceeds `since`, the entry is
    * deleted, or the timeout elapses — same backoff schedule as the
    * revision barrier (schema_revision.go:115-135). */
  private def watch(spark: SparkSession, root: String, group: String,
      name: String, since: Long, timeoutMs: Long): String = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var backoff = 10L
    while (true) {
      CatalogStore.get(spark, root, group, name) match {
        case Some(e) if e.revision > since =>
          return "{\"event\": \"updated\", \"entry\": " + entryToJson(spark, e) + "}"
        case None if CatalogStore.deleteTime(spark, root, group, name).isDefined =>
          // a REAL delete (tombstone stamped); get() already rides out the
          // transient missing window a concurrent save opens
          val dt = CatalogStore.deleteTime(spark, root, group, name)
          return "{\"event\": \"deleted\"" +
            dt.fold("")(t => s", \"delete_time\": $t") + "}"
        case cur => // unchanged, or never registered: keep long-polling
          if (System.currentTimeMillis() >= deadline)
            return "{\"event\": \"timeout\"" +
              cur.fold("")(e => s", \"revision\": ${e.revision}") + "}"
          Thread.sleep(math.min(backoff,
            math.max(1L, deadline - System.currentTimeMillis())))
          backoff = math.min((backoff * 3) / 2, 1000L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Parse the body entry and bind it to the path's (group, name): absent
    * body fields inherit the path; present ones must MATCH it. */
  private def boundEntry(spark: SparkSession, ex: HttpExchange,
      group: String, name: String): CatalogEntry = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val e = entryFromJson(spark, body)
    val g = Option(e.group).filter(_.nonEmpty).getOrElse(group)
    val n = Option(e.name).filter(_.nonEmpty).getOrElse(name)
    if (g != group || n != name)
      throw new IllegalArgumentException(
        s"body resource $g/$n does not match path $group/$name")
    // FAILFAST only rejects malformed/mistyped fields — a MISSING field
    // decodes to null. Required fields must reject HERE as the client's
    // 400, or `{}` persists an entry whose null entity/tsCol NPEs the
    // gate/open/query paths long after the write was accepted.
    if (e.entity == null || e.entity.isEmpty)
      throw new IllegalArgumentException(
        "missing required field 'entity' (non-empty array)")
    if (e.tsCol == null || e.tsCol.isEmpty)
      throw new IllegalArgumentException("missing required field 'tsCol'")
    e.copy(group = group, name = name)
  }

  /** CatalogStore signals registry outcomes as IllegalArgumentException
    * with stable message prefixes; the service maps them onto the HTTP
    * codes the reference registry's gRPC codes translate to. */
  private def registryStatusFor(t: Throwable): Int = t match {
    case _: IllegalArgumentException
        if Option(t.getMessage).exists(_.contains("already exists")) => 409
    case _: IllegalArgumentException
        if Option(t.getMessage).exists(_.contains("not found")) => 404
    case _: IllegalArgumentException | _: NumberFormatException => 400
    case _ => 500
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).fold(Map.empty[String, String]) { qs =>
      qs.split("&").filter(_.contains("=")).map { kv =>
        val i = kv.indexOf('=')
        java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
      }.toMap
    }

  private def nowMs(q: Map[String, String]): Long =
    q.get("nowMs").map(_.toLong).getOrElse(System.currentTimeMillis())

  private def err(msg: String): String = "{\"error\": " + Json.render(msg) + "}"

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
