package graft.server

import java.nio.charset.StandardCharsets
import java.time.Instant

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.ql.BydbQL

/**
 * Wire-shape BydbQL entry point — the Spark analogue of the reference's
 * HTTP liaison (`POST /api/v1/bydbql/query`, banyand/liaison/grpc/
 * bydbql.go:75-129 via the HTTP gateway under banyand/liaison/http):
 * one JSON POST carrying the statement text (+ optional positional bind
 * params), delegating to [[BydbQL.run]] / [[BydbQL.runTraced]] over a
 * registered resource map, rows back as JSON. The session IS the engine
 * (SURVEY scope: query capabilities, not a server port), so this stays a
 * minimal single-route shim on the JDK's built-in HttpServer — its value
 * is that the golden corpus and conformance harnesses can replay
 * statements WIRE-SHAPED (bytes in, bytes out) instead of via library
 * calls (BydbQLHttpSuite replays every reference `.ql` through it, both
 * sequentially and from 4 concurrent clients with parity asserted).
 *
 * Request:  {"query": "SELECT …", "params": [..], "now": "2024-…Z"?}
 * Response: 200 {"columns": [..], "rows": [[..]..], "trace": "…"?}
 *           400 {"error": "…"} for parse/bind/validation failures (the
 *               request is at fault),
 *           500 {"error": "…"} for engine/execution faults (the server
 *               is) — the reference gateway keeps the same user-error vs
 *               server-fault split. Fatal JVM errors rethrow.
 */
object BydbQLHttp {

  final class Server(private val http: HttpServer,
      private val pool: java.util.concurrent.ExecutorService) {
    def port: Int = http.getAddress.getPort
    def url: String = s"http://127.0.0.1:$port/api/v1/bydbql/query"
    def stop(): Unit = { http.stop(0); pool.shutdownNow(); () }
  }

  /** Start serving on 127.0.0.1:`port` (0 = ephemeral). `defaultNow`
    * anchors relative times for requests that don't pass "now" —
    * conformance replays pin it for reproducibility.
    *
    * CONCURRENT by default, like the reference liaison (a gRPC server
    * serves queries on its own goroutine per call — banyand/liaison/grpc/
    * measure.go:395): a small fixed pool of `threads`, each request a
    * Spark job submitted from its own handler thread. Spark's scheduler
    * multiplexes concurrent jobs from one session natively (FIFO
    * interleaves at task granularity; each handler also tags its thread
    * with the `graft-wire` scheduler pool so a session configured with
    * FAIR mode isolates wire queries from batch work). The pool is FIXED
    * — unlike the registry's long-polls, every request here does real
    * executor work, so a bound is back-pressure, not a deadlock. */
  def start(resources: Map[String, BydbQL.Resource], port: Int = 0,
      defaultNow: () => Instant = () => Instant.now(),
      threads: Int = 8): Server = {
    val http = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, threads))
    http.createContext("/api/v1/bydbql/query", (ex: HttpExchange) => handle(ex, resources, defaultNow))
    http.setExecutor(pool)
    http.start()
    new Server(http, pool)
  }

  private def handle(ex: HttpExchange, resources: Map[String, BydbQL.Resource],
      defaultNow: () => Instant): Unit = {
    try {
      if (ex.getRequestMethod != "POST") { respond(ex, 405, obj("error" -> "POST only")); return }
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val req = Json.parse(body) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => throw new IllegalArgumentException("request body must be a JSON object")
      }
      val ql = req.get("query") match {
        case Some(s: String) => s
        case _ => throw new IllegalArgumentException("missing string field 'query'")
      }
      val params = req.get("params") match {
        case Some(xs: List[_]) => xs.map(jsonToBind)
        case None => Nil
        case _ => throw new IllegalArgumentException("'params' must be an array")
      }
      val now = req.get("now") match {
        case Some(s: String) => Instant.parse(s)
        case _ => defaultNow()
      }
      // per-request scheduler-pool tag (thread-local): inert under the
      // default FIFO scheduler, isolates wire traffic under FAIR mode
      resources.values.headOption.foreach(
        _.df.sparkSession.sparkContext.setLocalProperty(
          "spark.scheduler.pool", "graft-wire"))
      val (df, trace) = BydbQL.runTraced(ql, resources, params, now)
      respond(ex, 200, resultJson(df, trace))
    } catch {
      // NonFatal only: OutOfMemoryError/InterruptedException and friends
      // must propagate to the JVM, not be swallowed into a JSON body
      case scala.util.control.NonFatal(t) =>
        respond(ex, statusFor(t), obj("error" ->
          s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("")}"))
    }
  }

  /** User error vs server fault. Everything the request can cause —
    * malformed JSON, lex/parse errors ([[graft.ql.QlParseException]]),
    * bind/validation rejections (the transformer throws
    * IllegalArgumentException for every semantic rule) — is 400; a
    * failure past validation (Spark execution, codegen, resource faults)
    * is the engine's, so 500. */
  private[graft] def statusFor(t: Throwable): Int = t match {
    case _: graft.ql.QlParseException => 400
    case _: IllegalArgumentException => 400 // includes NumberFormatException (bad JSON numbers)
    case _: java.time.format.DateTimeParseException => 400 // malformed "now"
    case _ => 500
  }

  private def obj(kv: (String, String)): String =
    "{" + Json.render(kv._1) + ": " + Json.render(kv._2) + "}"

  /** Canonical result payload — shared with the conformance suite so the
    * wire-parity check compares the endpoint's bytes against the library
    * result rendered through the SAME encoding. */
  private[graft] def resultJson(df: org.apache.spark.sql.DataFrame,
      trace: Option[BydbQL.QueryTrace]): String = {
    val cols = df.columns.toSeq
    val rows = df.collect().toSeq.map(r =>
      Json.render((0 until r.length).map(cell => jsonCell(r.get(cell))).toList))
    "{\"columns\": " + Json.render(cols.toList) +
      ", \"rows\": [" + rows.mkString(", ") + "]" +
      trace.fold("")(t => ", \"trace\": " + Json.render(t.render)) + "}"
  }

  /** Bind-parameter decoding: JSON numbers arrive as Long where integral
    * (Transformer.bind takes String/Long/Int/Seq). */
  private def jsonToBind(v: Any): Any = v match {
    case d: Double if d.isWhole && math.abs(d) < 9.007199254740992E15 => d.toLong
    case l: List[_] => l.map(jsonToBind)
    case other => other
  }

  /** One result cell → JSON value. Structs/binaries render as strings —
    * the conformance compare treats cells as rendered text. */
  private def jsonCell(v: Any): Any = v match {
    case null => null
    case s: String => s
    case b: Boolean => b
    case n @ (_: Long | _: Int | _: Short | _: Byte | _: Double | _: Float) => n
    case d: java.math.BigDecimal => d.toPlainString
    case seq: scala.collection.Seq[_] => seq.toList.map(jsonCell)
    case arr: Array[Byte] => java.util.Base64.getEncoder.encodeToString(arr)
    case arr: Array[_] => arr.toList.map(jsonCell)
    case other => String.valueOf(other)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}

/** Dependency-free minimal JSON: parse → (Map / List / String / Long /
  * Double / Boolean / null), render the same shapes back. Only what the
  * one-route wire shim needs — not a general-purpose codec. */
private[graft] object Json {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    if (!p.eof) throw new IllegalArgumentException(s"trailing JSON at ${p.pos}")
    v
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg at $pos")
    private def expect(c: Char): Unit =
      if (eof || s.charAt(pos) != c) fail(s"expected '$c'") else pos += 1

    def value(): Any = {
      ws()
      if (eof) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => objV()
        case '[' => arrV()
        case '"' => strV()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => numV()
      }
    }

    private def lit(word: String, v: Any): Any =
      if (s.regionMatches(pos, word, 0, word.length)) { pos += word.length; v }
      else fail(s"expected $word")

    private def objV(): Map[String, Any] = {
      expect('{'); ws()
      val b = Map.newBuilder[String, Any]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return b.result() }
      var more = true
      while (more) {
        ws()
        val k = strV()
        ws(); expect(':')
        b += k -> value()
        ws()
        if (!eof && s.charAt(pos) == ',') pos += 1 else more = false
      }
      expect('}')
      b.result()
    }

    private def arrV(): List[Any] = {
      expect('['); ws()
      val b = List.newBuilder[Any]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return b.result() }
      var more = true
      while (more) {
        b += value()
        ws()
        if (!eof && s.charAt(pos) == ',') pos += 1 else more = false
      }
      expect(']')
      b.result()
    }

    private def strV(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          if (eof) fail("bad escape")
          s.charAt(pos) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              // exactly 4 ASCII hex digits — parseInt alone would accept
              // '+'-prefixed or unicode-digit text jackson rejects
              if (pos + 4 >= s.length ||
                  !(1 to 4).forall(k => isHex(s.charAt(pos + k))))
                fail("bad \\u escape")
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case other => fail(s"bad escape '\\$other'")
          }
          pos += 1
        } else { sb += c; pos += 1 }
      }
      expect('"')
      sb.toString
    }

    // ASCII-only: Char.isDigit / Long.parseLong accept unicode digit
    // blocks JSON (and jackson) reject
    private def isDig(c: Char): Boolean = c >= '0' && c <= '9'
    private def isHex(c: Char): Boolean =
      isDig(c) || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

    /** Strict RFC 8259 number grammar: -?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?.
      * The earlier consume-then-parseDouble scan accepted "1." and "+5" —
      * shapes jackson rejects; the codec fuzzer's differential caught it. */
    private def numV(): Any = {
      val start = pos
      if (!eof && s.charAt(pos) == '-') pos += 1
      if (eof || !isDig(s.charAt(pos))) fail("expected value")
      if (s.charAt(pos) == '0') pos += 1
      else while (!eof && isDig(s.charAt(pos))) pos += 1
      var isDouble = false
      if (!eof && s.charAt(pos) == '.') {
        isDouble = true; pos += 1
        if (eof || !isDig(s.charAt(pos))) fail("digits required after '.'")
        while (!eof && isDig(s.charAt(pos))) pos += 1
      }
      if (!eof && (s.charAt(pos) == 'e' || s.charAt(pos) == 'E')) {
        isDouble = true; pos += 1
        if (!eof && (s.charAt(pos) == '+' || s.charAt(pos) == '-')) pos += 1
        if (eof || !isDig(s.charAt(pos))) fail("digits required in exponent")
        while (!eof && isDig(s.charAt(pos))) pos += 1
      }
      val text = s.substring(start, pos)
      if (isDouble) text.toDouble
      else try text.toLong catch { case _: NumberFormatException => text.toDouble }
    }
  }

  def render(v: Any): String = v match {
    case null => "null"
    case s: String =>
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb ++= "\\\""
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
        case c => sb += c
      }
      (sb += '"').toString
    case b: Boolean => b.toString
    case d: Double => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float => render(f.toDouble)
    case n @ (_: Long | _: Int | _: Short | _: Byte) => n.toString
    case xs: List[_] => xs.map(render).mkString("[", ", ", "]")
    case xs: scala.collection.Seq[_] => xs.map(render).mkString("[", ", ", "]")
    case m: Map[_, _] =>
      m.map { case (k, x) => render(String.valueOf(k)) + ": " + render(x) }
        .mkString("{", ", ", "}")
    case other => render(String.valueOf(other))
  }
}
