package graft.ql

import scala.collection.mutable.ArrayBuffer

/**
 * Hand-rolled lexer + recursive-descent parser for BydbQL, equivalent to
 * the reference's participle grammar (pkg/bydbql/parser.go:29-77 lexer
 * rules, grammar.go statement structs). Keywords are case-insensitive;
 * identifiers allow `-` and `*` as continuation characters (so TopN rule
 * names like `endpoint_avg-cluster-excludes-*` stay referenceable);
 * strings take single or double quotes with backslash escapes.
 */
object Lexer {
  val Keywords: Set[String] = Set(
    "SELECT", "SHOW", "TOP", "FROM", "STREAM", "MEASURE", "TRACE", "PROPERTY",
    "IN", "ON", "STAGES", "TIME", "BETWEEN", "AND", "OR", "WHERE", "GROUP", "BY", "ORDER",
    "ASC", "DESC", "LIMIT", "OFFSET", "WITH", "QUERY_TRACE", "SUM", "MEAN",
    "AVG", "COUNT", "MAX", "MIN", "TAG", "FIELD", "NOT", "HAVING", "MATCH",
    "AGGREGATE", "NULL")

  sealed trait Tok { def pos: Int }
  final case class TKeyword(word: String, pos: Int) extends Tok // canonical uppercase
  final case class TIdent(text: String, pos: Int) extends Tok
  final case class TInt(value: Long, pos: Int) extends Tok
  final case class TString(text: String, pos: Int) extends Tok // unquoted
  final case class TParam(index: Int, pos: Int) extends Tok
  final case class TOp(op: String, pos: Int) extends Tok
  final case class TEof(pos: Int) extends Tok

  def lex(s: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    var paramIdx = 0
    def isIdentStart(c: Char) = c.isLetter || c == '_'
    def isIdentCont(c: Char) = c.isLetterOrDigit || c == '_' || c == '*' || c == '-'
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (isIdentStart(c)) {
        val start = i
        while (i < s.length && isIdentCont(s(i))) i += 1
        val text = s.substring(start, i)
        val up = text.toUpperCase
        if (Keywords.contains(up)) out += TKeyword(up, start)
        else out += TIdent(text, start)
      } else if (c.isDigit ||
          ((c == '-' || c == '+') && i + 1 < s.length && s(i + 1).isDigit)) {
        val start = i
        if (c == '-' || c == '+') i += 1
        while (i < s.length && s(i).isDigit) i += 1
        out += TInt(s.substring(start, i).toLong, start)
      } else if (c == '\'' || c == '"') {
        val quote = c
        val start = i
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (i < s.length && !closed) {
          val ch = s(i)
          if (ch == '\\' && i + 1 < s.length) { sb.append(s(i + 1)); i += 2 }
          else if (ch == quote) { closed = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        if (!closed) throw QlParseException("unterminated string", start)
        out += TString(sb.toString, start)
      } else if (c == '?') {
        out += TParam(paramIdx, i); paramIdx += 1; i += 1
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        if (two == "!=" || two == ">=" || two == "<=" || two == "::") {
          out += TOp(two, i); i += 2
        } else if ("=><,.()*".indexOf(c) >= 0) {
          out += TOp(c.toString, i); i += 1
        } else throw QlParseException(s"unexpected character '$c'", i)
      }
    }
    out += TEof(s.length)
    out.toVector
  }
}

/** Recursive-descent parser over the token stream. */
final class Parser(toks: Vector[Lexer.Tok]) {
  import Lexer._

  private var p = 0
  private def cur: Tok = toks(p)
  private def peek(n: Int): Tok = toks(math.min(p + n, toks.length - 1))
  private def advance(): Tok = { val t = cur; p += 1; t }
  private def fail(msg: String): Nothing = throw QlParseException(msg, cur.pos)

  private def isKw(t: Tok, w: String): Boolean = t match {
    case TKeyword(k, _) => k == w
    case _ => false
  }
  private def atKw(w: String): Boolean = isKw(cur, w)
  private def expectKw(w: String): Unit =
    if (atKw(w)) p += 1 else fail(s"expected $w")
  private def atOp(o: String): Boolean = cur match {
    case TOp(op, _) => op == o
    case _ => false
  }
  private def expectOp(o: String): Unit =
    if (atOp(o)) p += 1 else fail(s"expected '$o'")

  private val AggFns = Set("SUM", "MEAN", "AVG", "COUNT", "MAX", "MIN")

  def parseStatement(): QlStatement = {
    val stmt =
      if (atKw("SELECT")) parseSelect()
      else if (atKw("SHOW")) parseShowTopN()
      else fail("expected SELECT or SHOW")
    cur match {
      case TEof(_) => stmt
      case t => throw QlParseException("trailing input", t.pos)
    }
  }

  // -- SELECT ---------------------------------------------------------------
  private def parseSelect(): QlSelect = {
    expectKw("SELECT")
    val proj = parseProjection()
    val from = parseFrom()
    val time = if (atKw("TIME")) Some(parseTime()) else None
    val where = if (atKw("WHERE")) { p += 1; Some(parseOrExpr()) } else None
    val groupBy = if (atKw("GROUP")) parseGroupBy() else Nil
    val orderBy = if (atKw("ORDER")) Some(parseOrderBy()) else None
    val withTrace = parseWithTrace()
    val limit = if (atKw("LIMIT")) { p += 1; Some(parseCountValue()) } else None
    val offset = if (atKw("OFFSET")) { p += 1; Some(parseCountValue()) } else None
    QlSelect(proj, from, time, where, groupBy, orderBy, limit, offset, withTrace)
  }

  private def parseWithTrace(): Boolean =
    if (atKw("WITH")) { p += 1; expectKw("QUERY_TRACE"); true } else false

  private def parseCountValue(): QlValue = advance() match {
    case TInt(v, _) => QlInt(v)
    case TParam(idx, _) => QlParam(idx)
    case _ => fail("expected integer or ?")
  }

  private def parseProjection(): QlProjection = {
    if (atOp("*")) { p += 1; ProjAll }
    else if (atOp("(") && (peek(1) match { case TOp(")", _) => true; case _ => false })) {
      p += 2; ProjEmpty
    } else if (atKw("TOP")) {
      p += 1
      val n = parseCountValue()
      val field = parseIdentPath(hasTypeSpec = false)
      val dir =
        if (atKw("ASC")) { p += 1; Some("ASC") }
        else if (atKw("DESC")) { p += 1; Some("DESC") }
        else None
      val others = ArrayBuffer.empty[QlColumn]
      while (atOp(",")) { p += 1; others += parseColumn() }
      ProjTop(QlTopNProj(n, field, dir, others.toSeq))
    } else {
      val cols = ArrayBuffer(parseColumn())
      while (atOp(",")) { p += 1; cols += parseColumn() }
      ProjColumns(cols.toSeq)
    }
  }

  private def parseColumn(): QlColumn = {
    val agg = cur match {
      case TKeyword(k, _) if AggFns.contains(k) && atOpAt(1, "(") =>
        p += 1; expectOp("(")
        val ident = parseIdentPath(hasTypeSpec = false)
        expectOp(")")
        Some((k, ident))
      case _ => None
    }
    val name = if (agg.isEmpty) Some(parseIdentPathPre()) else None
    val spec = parseTypeSpec()
    agg match {
      case Some(_) => QlColumn(agg, None, spec)
      case None =>
        QlColumn(None, Some(finishIdentPath(name.get, spec.isDefined)), spec)
    }
  }

  private def atOpAt(n: Int, o: String): Boolean = peek(n) match {
    case TOp(op, _) => op == o
    case _ => false
  }

  private def parseTypeSpec(): Option[String] =
    if (atOp("::")) {
      p += 1
      advance() match {
        case TKeyword("TAG", _) => Some("TAG")
        case TKeyword("FIELD", _) => Some("FIELD")
        case _ => fail("expected TAG or FIELD after ::")
      }
    } else None

  /** Raw identifier path: (Ident|Keyword|QuotedString) ('.' part)*.
    * Keyword-only paths are validated in [[finishIdentPath]] — a bare
    * keyword needs a sub-path or a ::spec (grammar.go ToString). */
  private final case class RawPath(parts: Seq[String], firstIsKeyword: Boolean, quoted: Boolean)

  private def parseIdentPathPre(): RawPath = {
    cur match {
      case TString(text, pos) =>
        if (!text.matches("^[a-zA-Z_][a-zA-Z0-9_.]*$"))
          throw QlParseException(s"quoted identifier '$text' contains invalid characters", pos)
        p += 1
        RawPath(Seq(text), firstIsKeyword = false, quoted = true)
      case TIdent(text, _) =>
        p += 1
        RawPath(collectRest(text), firstIsKeyword = false, quoted = false)
      case TKeyword(word, _) =>
        p += 1
        RawPath(collectRest(word.toLowerCase), firstIsKeyword = true, quoted = false)
      case _ => fail("expected identifier")
    }
  }

  private def collectRest(first: String): Seq[String] = {
    val parts = ArrayBuffer(first)
    while (atOp(".")) {
      p += 1
      advance() match {
        case TIdent(t, _) => parts += t
        case TKeyword(w, _) => parts += w.toLowerCase
        case _ => fail("expected identifier part after '.'")
      }
    }
    parts.toSeq
  }

  private def finishIdentPath(raw: RawPath, hasTypeSpec: Boolean): String = {
    if (raw.firstIsKeyword && raw.parts.length == 1 && !hasTypeSpec)
      fail(s"identifier '${raw.parts.head}' cannot be a keyword without a sub path")
    raw.parts.mkString(".")
  }

  private def parseIdentPath(hasTypeSpec: Boolean): String =
    finishIdentPath(parseIdentPathPre(), hasTypeSpec)

  // -- FROM -----------------------------------------------------------------
  private def parseFrom(): QlFrom = {
    expectKw("FROM")
    val rt = advance() match {
      case TKeyword(k, _) if Set("STREAM", "MEASURE", "TRACE", "PROPERTY").contains(k) => k
      case _ => fail("expected STREAM | MEASURE | TRACE | PROPERTY")
    }
    val name = advance() match {
      case TIdent(t, _) => t
      case _ => fail("expected resource name")
    }
    expectKw("IN")
    val lp = atOp("(")
    if (lp) p += 1
    val groups = ArrayBuffer.empty[String]
    groups += (advance() match {
      case TIdent(t, _) => t
      case _ => fail("expected group name")
    })
    while (atOp(",")) {
      p += 1
      groups += (advance() match {
        case TIdent(t, _) => t
        case _ => fail("expected group name")
      })
    }
    if (lp) expectOp(")")
    val stages =
      if (atKw("ON")) {
        p += 1
        val slp = atOp("(")
        if (slp) p += 1
        val ss = ArrayBuffer.empty[String]
        ss += (advance() match {
          case TIdent(t, _) => t
          case _ => fail("expected stage name")
        })
        while (atOp(",")) {
          p += 1
          ss += (advance() match {
            case TIdent(t, _) => t
            case _ => fail("expected stage name")
          })
        }
        if (slp) expectOp(")")
        expectKw("STAGES")
        ss.toSeq
      } else Nil
    QlFrom(rt, name, groups.toSeq, stages)
  }

  // -- TIME -----------------------------------------------------------------
  private def parseTime(): QlTime = {
    expectKw("TIME")
    if (atKw("BETWEEN")) {
      p += 1
      val b = parseTimeValue()
      expectKw("AND")
      val e = parseTimeValue()
      QlTimeBetween(b, e)
    } else {
      val op = advance() match {
        case TOp(o, _) if Set("=", ">", "<", ">=", "<=").contains(o) => o
        case _ => fail("expected time comparator or BETWEEN")
      }
      QlTimeCmp(op, parseTimeValue())
    }
  }

  private def parseTimeValue(): QlTimeValue = advance() match {
    case TString(t, _) => QlTimeValue(Some(t), None)
    case TInt(v, _) => QlTimeValue(Some(v.toString), None)
    case TParam(idx, _) => QlTimeValue(None, Some(idx))
    case _ => fail("expected time value")
  }

  // -- WHERE ----------------------------------------------------------------
  private def parseOrExpr(): QlExpr = {
    var left = parseAndExpr()
    while (atKw("OR")) { p += 1; left = QlOr(left, parseAndExpr()) }
    left
  }

  def parseAndExprPublic(): QlExpr = parseAndExpr()

  private def parseAndExpr(): QlExpr = {
    var left = parsePredicate()
    while (atKw("AND")) { p += 1; left = QlAndE(left, parsePredicate()) }
    left
  }

  private def parsePredicate(): QlExpr = {
    if (atOp("(")) {
      p += 1
      val e = parseOrExpr()
      expectOp(")")
      e
    } else {
      val ident = parseIdentPath(hasTypeSpec = false)
      if (atKw("MATCH")) parseMatchTail(ident)
      else if (atKw("NOT")) {
        p += 1
        if (atKw("IN")) { p += 1; QlInE(ident, not = true, parseValueList()) }
        else if (atKw("HAVING")) { p += 1; QlHavingE(ident, not = true, parseHavingValues()) }
        else fail("expected IN or HAVING after NOT")
      }
      else if (atKw("IN")) { p += 1; QlInE(ident, not = false, parseValueList()) }
      else if (atKw("HAVING")) { p += 1; QlHavingE(ident, not = false, parseHavingValues()) }
      else {
        val op = advance() match {
          case TOp(o, _) if Set("=", "!=", ">", "<", ">=", "<=").contains(o) => o
          case _ => fail("expected comparison operator, MATCH, IN, or HAVING")
        }
        QlCompare(ident, op, parseValue())
      }
    }
  }

  private def parseMatchTail(ident: String): QlExpr = {
    expectKw("MATCH")
    expectOp("(")
    val values =
      if (atOp("(")) { // array form
        p += 1
        val vs = ArrayBuffer(parseValue())
        while (atOp(",")) { p += 1; vs += parseValue() }
        expectOp(")")
        vs.toSeq
      } else Seq(parseValue())
    var analyzer: Option[String] = None
    var operator: Option[String] = None
    if (atOp(",")) {
      p += 1
      analyzer = Some(advance() match {
        case TString(t, _) => t
        case _ => fail("expected analyzer string")
      })
      if (atOp(",")) {
        p += 1
        operator = Some(advance() match {
          case TString(t, _) => t
          case _ => fail("expected operator string")
        })
      }
    }
    expectOp(")")
    QlMatchE(ident, values, analyzer, operator)
  }

  private def parseValueList(): Seq[QlValue] = {
    expectOp("(")
    val vs = ArrayBuffer.empty[QlValue]
    if (!atOp(")")) {
      vs += parseValue()
      while (atOp(",")) { p += 1; vs += parseValue() }
    }
    expectOp(")")
    vs.toSeq
  }

  private def parseHavingValues(): Seq[QlValue] =
    if (atOp("(")) parseValueList() else Seq(parseValue())

  private def parseValue(): QlValue = advance() match {
    case TString(t, _) => QlString(t)
    case TInt(v, _) => QlInt(v)
    case TKeyword("NULL", _) => QlNull
    case TParam(idx, _) => QlParam(idx)
    case _ => fail("expected value")
  }

  // -- GROUP BY / ORDER BY --------------------------------------------------
  private def parseGroupBy(): Seq[QlGroupCol] = {
    expectKw("GROUP"); expectKw("BY")
    val cols = ArrayBuffer.empty[QlGroupCol]
    def one(): QlGroupCol = {
      val raw = parseIdentPathPre()
      val spec = parseTypeSpec()
      QlGroupCol(finishIdentPath(raw, spec.isDefined), spec)
    }
    cols += one()
    while (atOp(",")) { p += 1; cols += one() }
    cols.toSeq
  }

  private def parseOrderBy(): QlOrderBy = {
    expectKw("ORDER"); expectKw("BY")
    if (atKw("ASC")) { p += 1; QlOrderBy(None, Some(false)) }
    else if (atKw("DESC")) { p += 1; QlOrderBy(None, Some(true)) }
    else if (atKw("TIME")) {
      // ORDER BY TIME [ASC|DESC] = order by the timestamp
      // (transformer.go:1603-1608 maps the TIME identifier to an empty
      // index rule, i.e. time ordering; golden case order_asc.ql)
      p += 1
      val dir =
        if (atKw("ASC")) { p += 1; Some(false) }
        else if (atKw("DESC")) { p += 1; Some(true) }
        else None
      QlOrderBy(None, dir)
    }
    else {
      val ident = parseIdentPath(hasTypeSpec = false)
      val dir =
        if (atKw("ASC")) { p += 1; Some(false) }
        else if (atKw("DESC")) { p += 1; Some(true) }
        else None
      QlOrderBy(Some(ident), dir)
    }
  }

  // -- SHOW TOP N -----------------------------------------------------------
  private def parseShowTopN(): QlShowTopN = {
    expectKw("SHOW"); expectKw("TOP")
    val n = parseCountValue()
    val from = parseFrom()
    val time = if (atKw("TIME")) Some(parseTime()) else None
    val where = if (atKw("WHERE")) { p += 1; Some(parseAndExpr()) } else None
    val aggBy =
      if (atKw("AGGREGATE")) {
        p += 1; expectKw("BY")
        Some(advance() match {
          case TKeyword(k, _) if AggFns.contains(k) => k
          case _ => fail("expected aggregate function")
        })
      } else None
    val orderDesc =
      if (atKw("ORDER")) {
        p += 1; expectKw("BY")
        if (atKw("ASC")) { p += 1; Some(false) }
        else if (atKw("DESC")) { p += 1; Some(true) }
        else None
      } else None
    val withTrace = parseWithTrace()
    QlShowTopN(n, from, time, where, aggBy, orderDesc, withTrace)
  }
}

object Parser {
  /** Parse one BydbQL statement. */
  def parse(ql: String): QlStatement =
    new Parser(Lexer.lex(ql)).parseStatement()
}
