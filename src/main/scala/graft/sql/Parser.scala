package graft.sql

import Ast._

/** Recursive-descent parser for FluentQL. Hand-written (no parser
  * combinator dependency), mirroring the flex/bison grammar
  * `src/stream_processor/parser/sql.l` + `sql.y` including its
  * restrictions: no arithmetic operators, no JOIN/ORDER BY/HAVING
  * (sql.l:167-183 tokenizes only comparison symbols).
  */
final class ParseException(msg: String) extends IllegalArgumentException(msg)

object Parser {

  // ------------------------------------------------------------ tokenizer

  sealed trait Tok
  final case class TIdent(s: String) extends Tok
  final case class TInt(v: Long) extends Tok
  final case class TFloat(v: Double) extends Tok
  final case class TStr(s: String) extends Tok
  final case class TSym(s: String) extends Tok // ( ) [ ] , ; = != <> < <= > >= * . : @
  case object TEof extends Tok

  def tokenize(input: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        while (i < n && input(i) != '\'') { sb.append(input(i)); i += 1 }
        if (i >= n) throw new ParseException("unterminated string literal")
        i += 1
        out += TStr(sb.toString)
      } else if (c.isDigit || (c == '-' && i + 1 < n && input(i + 1).isDigit)) {
        val start = i
        if (c == '-') i += 1
        while (i < n && (input(i).isDigit || input(i) == '.')) i += 1
        val s = input.substring(start, i)
        if (s.contains('.')) out += TFloat(s.toDouble) else out += TInt(s.toLong)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
        out += TIdent(input.substring(start, i))
      } else if (c == '!' && i + 1 < n && input(i + 1) == '=') { out += TSym("!="); i += 2 }
      else if (c == '<' && i + 1 < n && input(i + 1) == '>') { out += TSym("!="); i += 2 }
      else if (c == '<' && i + 1 < n && input(i + 1) == '=') { out += TSym("<="); i += 2 }
      else if (c == '>' && i + 1 < n && input(i + 1) == '=') { out += TSym(">="); i += 2 }
      else if ("()[],;=<>*.:@".indexOf(c) >= 0) { out += TSym(c.toString); i += 1 }
      else throw new ParseException(s"unexpected character '$c' at $i")
    }
    out += TEof
    out.result()
  }

  // -------------------------------------------------------------- parser

  def parse(sql: String): Stmt = new P(tokenize(sql)).statement()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def kw(peeked: Tok): String = peeked match {
      case TIdent(s) => s.toUpperCase; case _ => ""
    }
    private def expectKw(k: String): Unit =
      if (kw(next()) != k) throw new ParseException(s"expected $k")
    private def expectSym(s: String): Unit = next() match {
      case TSym(`s`) => ()
      case t => throw new ParseException(s"expected '$s', got $t")
    }
    private def acceptKw(k: String): Boolean =
      if (kw(peek) == k) { pos += 1; true } else false
    private def acceptSym(s: String): Boolean = peek match {
      case TSym(`s`) => pos += 1; true
      case _ => false
    }
    private def ident(): String = next() match {
      case TIdent(s) => s
      case t => throw new ParseException(s"expected identifier, got $t")
    }

    def statement(): Stmt = {
      val stmt = kw(peek) match {
        case "SELECT" => select()
        case "CREATE" =>
          pos += 1
          kw(next()) match {
            case "STREAM" =>
              val name = ident()
              val props = withProps()
              expectKw("AS")
              CreateStream(name, props, select())
            case "SNAPSHOT" =>
              val name = ident()
              val props = withProps()
              expectKw("AS")
              CreateSnapshot(name, props, select())
            case other => throw new ParseException(s"CREATE $other not supported")
          }
        case "FLUSH" =>
          pos += 1
          expectKw("SNAPSHOT")
          val name = ident()
          expectKw("AS")
          FlushSnapshot(name, select())
        case other => throw new ParseException(s"unexpected $other")
      }
      acceptSym(";")
      peek match {
        case TEof => stmt
        case t => throw new ParseException(s"trailing tokens: $t")
      }
    }

    private def withProps(): Map[String, String] =
      if (acceptKw("WITH")) {
        expectSym("(")
        val props = scala.collection.mutable.Map[String, String]()
        var done = false
        while (!done) {
          // property names may be dotted (storage.type)
          val sb = new StringBuilder(ident())
          while (acceptSym(".")) sb.append(".").append(ident())
          expectSym("=")
          val v = next() match {
            case TStr(s) => s
            case TInt(v) => v.toString
            case TFloat(v) => v.toString
            case TIdent(s) => s
            case t => throw new ParseException(s"bad property value $t")
          }
          props(sb.toString) = v
          if (!acceptSym(",")) done = true
        }
        expectSym(")")
        props.toMap
      } else Map.empty

    def select(): Select = {
      expectKw("SELECT")
      val items = selectItems()
      expectKw("FROM")
      val src = source()
      val win = window()
      val where = if (acceptKw("WHERE")) Some(orExpr()) else None
      val gb =
        if (acceptKw("GROUP")) { expectKw("BY"); keyList() } else Nil
      val limit = if (acceptKw("LIMIT")) Some(next() match {
        case TInt(v) => v.toInt
        case t => throw new ParseException(s"bad LIMIT $t")
      }) else None
      Select(items, src, win, where, gb, limit)
    }

    private val AggFuncs = Set("AVG", "SUM", "COUNT", "MIN", "MAX", "TIMESERIES_FORECAST")
    private val TimeFuncs = Set("NOW", "UNIX_TIMESTAMP", "RECORD_TAG", "RECORD_TIME")

    private def selectItems(): Seq[SelectItem] = {
      val items = scala.collection.mutable.ArrayBuffer[SelectItem]()
      var done = false
      while (!done) {
        items += selectItem()
        if (!acceptSym(",")) done = true
      }
      items.toSeq
    }

    private def selectItem(): SelectItem = {
      if (acceptSym("*")) Star
      else peek match {
        case TIdent(name) if AggFuncs(name.toUpperCase) && toks(pos + 1) == TSym("(") =>
          pos += 2
          val func = name.toUpperCase
          if (func == "COUNT" && acceptSym("*")) {
            expectSym(")")
            AggItem("COUNT", None, None, alias())
          } else {
            val k = key()
            val horizon = if (acceptSym(",")) Some(next() match {
              case TInt(v) => v
              case t => throw new ParseException(s"bad forecast horizon $t")
            }) else None
            expectSym(")")
            AggItem(func, Some(k), horizon, alias())
          }
        case TIdent(name) if TimeFuncs(name.toUpperCase) && toks(pos + 1) == TSym("(") =>
          pos += 2
          expectSym(")")
          ExprItem(TimeFunc(name.toUpperCase), alias())
        case _ =>
          ExprItem(key(), alias())
      }
    }

    private def alias(): Option[String] =
      if (acceptKw("AS")) Some(ident()) else None

    private def source(): Source = {
      kw(next()) match {
        case "STREAM" => expectSym(":"); StreamSource(ident())
        case "TAG" =>
          expectSym(":")
          next() match {
            case TStr(s) => TagSource(s)
            case t => throw new ParseException(s"TAG: expects quoted pattern, got $t")
          }
        case other => throw new ParseException(s"bad source $other")
      }
    }

    private def window(): Option[WindowSpec] =
      if (acceptKw("WINDOW")) {
        kw(next()) match {
          case "TUMBLING" =>
            expectSym("(")
            val secs = duration()
            expectSym(")")
            Some(Tumbling(secs))
          case "HOPPING" =>
            expectSym("(")
            val secs = duration()
            expectSym(",")
            expectKw("ADVANCE")
            expectKw("BY")
            val adv = duration()
            expectSym(")")
            Some(Hopping(secs, adv))
          case other => throw new ParseException(s"bad window $other")
        }
      } else None

    private def duration(): Long = {
      val v = next() match {
        case TInt(v) => v
        case t => throw new ParseException(s"bad duration $t")
      }
      kw(next()) match {
        case "SECOND" | "SECONDS" | "S" => v
        case "MINUTE" | "MINUTES" | "M" => v * 60
        case "HOUR" | "HOURS" | "H" => v * 3600
        case other => throw new ParseException(s"bad duration unit $other")
      }
    }

    private def keyList(): Seq[Key] = {
      val keys = scala.collection.mutable.ArrayBuffer[Key]()
      var done = false
      while (!done) {
        keys += key()
        if (!acceptSym(",")) done = true
      }
      keys.toSeq
    }

    private def key(): Key = {
      val base = ident()
      val path = scala.collection.mutable.ArrayBuffer(base)
      while (acceptSym("[")) {
        next() match {
          case TStr(s) => path += s
          case TInt(v) => path += v.toString // array index
          case t => throw new ParseException(s"bad subkey $t")
        }
        expectSym("]")
      }
      Key(path.toSeq)
    }

    // condition grammar: OR < AND < NOT < cmp (sql.y:300-345)
    private def orExpr(): Expr = {
      var l = andExpr()
      while (acceptKw("OR")) l = Or(l, andExpr())
      l
    }
    private def andExpr(): Expr = {
      var l = notExpr()
      while (acceptKw("AND")) l = And(l, notExpr())
      l
    }
    private def notExpr(): Expr =
      if (acceptKw("NOT")) Not(notExpr()) else cmpExpr()

    private def cmpExpr(): Expr = {
      if (acceptSym("(")) {
        val e = orExpr()
        expectSym(")")
        return e
      }
      if (acceptSym("@")) {
        val ns = ident()
        expectSym(".")
        val fn = ident()
        expectSym("(")
        val arg = if (peek != TSym(")")) Some(key()) else None
        expectSym(")")
        if (ns.toLowerCase != "record")
          throw new ParseException(s"unknown function namespace @$ns")
        val rf = fn.toLowerCase match {
          case "contains" | "time" => RecordFunc(fn.toLowerCase, arg)
          case other => throw new ParseException(s"unknown @record.$other()")
        }
        // @record.time() is a value — allow `@record.time() > 123`
        // (sql.y:370-373); @record.contains() is a bare predicate.
        if (rf.name == "time") {
          peek match {
            case TSym(op @ ("=" | "!=" | "<" | "<=" | ">" | ">=")) =>
              pos += 1
              val r = operand()
              return Cmp(if (op == "=") "==" else op, rf, r)
            case _ => ()
          }
        }
        return rf
      }
      val l = operand()
      peek match {
        case TSym(op @ ("=" | "!=" | "<" | "<=" | ">" | ">=")) =>
          pos += 1
          val r = operand()
          (l, r) match {
            case (_, NullLit) | (NullLit, _) =>
              // `WHERE key = NULL` is rejected by the reference
              // (sp_invalid_queries.h); IS NULL is the valid form.
              throw new ParseException("comparison with NULL: use IS [NOT] NULL")
            case _ => Cmp(if (op == "=") "==" else op, l, r)
          }
        case TIdent(s) if s.toUpperCase == "IS" =>
          pos += 1
          val negated = acceptKw("NOT")
          expectKw("NULL")
          IsNull(l, negated)
        case _ => l // bare key ⇒ truthiness/existence
      }
    }

    private def operand(): Expr = peek match {
      case TInt(v) => pos += 1; IntLit(v)
      case TFloat(v) => pos += 1; FloatLit(v)
      case TStr(s) => pos += 1; StrLit(s)
      case TIdent(s) if s.toUpperCase == "TRUE" => pos += 1; BoolLit(true)
      case TIdent(s) if s.toUpperCase == "FALSE" => pos += 1; BoolLit(false)
      case TIdent(s) if s.toUpperCase == "NULL" => pos += 1; NullLit
      case TIdent(s) if TimeFuncs(s.toUpperCase) && toks(pos + 1) == TSym("(") =>
        pos += 2; expectSym(")"); TimeFunc(s.toUpperCase)
      case _ => key()
    }
  }
}
