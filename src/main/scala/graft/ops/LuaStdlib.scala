package graft.ops

import Lua._

/** The stdlib subset fluent-bit filter scripts actually use
  * (`plugins/filter_lua` docs and shipped examples): base functions,
  * `string.*` with Lua 5.1 patterns, `table.*`, `math.*`, `os.time`.
  * Implemented from the public Lua 5.1 reference manual — notably the
  * pattern language (classes `%a %d %s %w …`, sets, `* + - ?`
  * quantifiers, anchors, captures) is NOT regex and is matched here
  * with the standard backtracking interpretation the manual specifies.
  */
object Stdlib {

  // ---------------------------------------------------------- lua patterns
  /** One match attempt of `pat` against `s` starting at `si`.
    * Returns end index (exclusive) or -1; fills `caps` with
    * (start, len) pairs, len == -1 while a capture is open,
    * len == -2 for position captures.
    */
  final class PatternMatcher(s: String, pat: String) {
    val capStart = new Array[Int](32)
    val capLen = new Array[Int](32)
    var nCaps = 0

    private def classMatch(c: Char, cl: Char): Boolean = {
      val res = Character.toLowerCase(cl) match {
        case 'a' => c.isLetter
        case 'c' => c.isControl
        case 'd' => c.isDigit
        case 'l' => c.isLower
        case 'p' => !c.isLetterOrDigit && !c.isWhitespace && c > ' ' && c < 127
        case 's' => c.isWhitespace
        case 'u' => c.isUpper
        case 'w' => c.isLetterOrDigit
        case 'x' => c.isDigit || ('a' <= Character.toLowerCase(c) && Character.toLowerCase(c) <= 'f')
        case other => return c == other // escaped literal (%., %%, …)
      }
      if (cl.isUpper) !res else res
    }

    /** Does s(si) match the single pattern item at pat(pi)? `ep` is the
      * index just past the item.
      */
    private def singleMatch(si: Int, pi: Int, ep: Int): Boolean = {
      if (si >= s.length) return false
      val c = s.charAt(si)
      pat.charAt(pi) match {
        case '.' => true
        case '%' => classMatch(c, pat.charAt(pi + 1))
        case '[' => setMatch(c, pi, ep - 1)
        case other => other == c
      }
    }

    /** [set] between pi (at '[') and ep (at ']'). */
    private def setMatch(c: Char, pi0: Int, ep: Int): Boolean = {
      var pi = pi0 + 1
      var neg = false
      if (pi < pat.length && pat.charAt(pi) == '^') { neg = true; pi += 1 }
      var found = false
      while (pi < ep) {
        if (pat.charAt(pi) == '%' && pi + 1 < ep) {
          if (classMatch(c, pat.charAt(pi + 1))) found = true
          pi += 2
        } else if (pi + 2 < ep && pat.charAt(pi + 1) == '-') {
          if (pat.charAt(pi) <= c && c <= pat.charAt(pi + 2)) found = true
          pi += 3
        } else {
          if (pat.charAt(pi) == c) found = true
          pi += 1
        }
      }
      if (neg) !found else found
    }

    /** Index just past the single item starting at pi. */
    private def itemEnd(pi: Int): Int = pat.charAt(pi) match {
      case '%' =>
        if (pi + 1 >= pat.length) throw err("malformed pattern (ends with '%')")
        pi + 2
      case '[' =>
        var j = pi + 1
        if (j < pat.length && pat.charAt(j) == '^') j += 1
        if (j < pat.length && pat.charAt(j) == ']') j += 1 // []] literal
        while (j < pat.length && pat.charAt(j) != ']') {
          if (pat.charAt(j) == '%') j += 1
          j += 1
        }
        if (j >= pat.length) throw err("malformed pattern (missing ']')")
        j + 1
      case _ => pi + 1
    }

    def doMatch(si0: Int, pi0: Int): Int = {
      var si = si0
      var pi = pi0
      while (true) {
        if (pi >= pat.length) return si
        pat.charAt(pi) match {
          case '(' =>
            if (pi + 1 < pat.length && pat.charAt(pi + 1) == ')') {
              // position capture
              capStart(nCaps) = si; capLen(nCaps) = -2; nCaps += 1
              val r = doMatch(si, pi + 2)
              if (r < 0) nCaps -= 1
              return r
            } else {
              capStart(nCaps) = si; capLen(nCaps) = -1; nCaps += 1
              val r = doMatch(si, pi + 1)
              if (r < 0) nCaps -= 1
              return r
            }
          case ')' =>
            // close the innermost open capture
            var i = nCaps - 1
            while (i >= 0 && capLen(i) != -1) i -= 1
            if (i < 0) throw err("invalid pattern capture")
            capLen(i) = si - capStart(i)
            val r = doMatch(si, pi + 1)
            if (r < 0) capLen(i) = -1
            return r
          case '$' if pi + 1 == pat.length =>
            return if (si == s.length) si else -1
          case '%' if pi + 1 < pat.length && pat.charAt(pi + 1).isDigit =>
            // back-reference
            val idx = pat.charAt(pi + 1) - '1'
            if (idx < 0 || idx >= nCaps || capLen(idx) < 0)
              throw err("invalid capture index in pattern")
            val cap = s.substring(capStart(idx), capStart(idx) + capLen(idx))
            if (s.regionMatches(si, cap, 0, cap.length)) {
              si += cap.length; pi += 2
            } else return -1
          case _ =>
            val ep = itemEnd(pi)
            val quant = if (ep < pat.length) pat.charAt(ep) else ' '
            quant match {
              case '?' =>
                if (singleMatch(si, pi, ep)) {
                  val r = doMatch(si + 1, ep + 1)
                  if (r >= 0) return r
                }
                pi = ep + 1
              case '*' =>
                return maxExpand(si, pi, ep)
              case '+' =>
                return if (singleMatch(si, pi, ep)) maxExpand(si + 1, pi, ep) else -1
              case '-' =>
                return minExpand(si, pi, ep)
              case _ =>
                if (!singleMatch(si, pi, ep)) return -1
                si += 1; pi = ep
            }
        }
      }
      -1
    }

    private def maxExpand(si: Int, pi: Int, ep: Int): Int = {
      var count = 0
      while (singleMatch(si + count, pi, ep)) count += 1
      while (count >= 0) {
        val r = doMatch(si + count, ep + 1)
        if (r >= 0) return r
        count -= 1
      }
      -1
    }

    private def minExpand(si0: Int, pi: Int, ep: Int): Int = {
      var si = si0
      while (true) {
        val r = doMatch(si, ep + 1)
        if (r >= 0) return r
        if (singleMatch(si, pi, ep)) si += 1
        else return -1
      }
      -1
    }

    /** Capture i as a value (position captures yield 1-based index). */
    def capture(i: Int, defStart: Int, defEnd: Int): LV =
      if (nCaps == 0 && i == 0) LStr(s.substring(defStart, defEnd))
      else if (i >= nCaps) LNil
      else if (capLen(i) == -2) LNum(capStart(i) + 1)
      else LStr(s.substring(capStart(i), capStart(i) + capLen(i)))

    def captures(defStart: Int, defEnd: Int): Seq[LV] =
      if (nCaps == 0) Seq(LStr(s.substring(defStart, defEnd)))
      else (0 until nCaps).map(capture(_, defStart, defEnd))
  }

  /** Find first match of pat in s from init (0-based); returns
    * (startIncl, endExcl, matcher) or None.
    */
  def patFind(s: String, pat: String, init: Int): Option[(Int, Int, PatternMatcher)] = {
    val anchored = pat.startsWith("^")
    val p = if (anchored) pat.substring(1) else pat
    var si = init max 0
    while (si <= s.length) {
      val m = new PatternMatcher(s, p)
      val e = m.doMatch(si, 0)
      if (e >= 0) return Some((si, e, m))
      if (anchored) return None
      si += 1
    }
    None
  }

  // -------------------------------------------------------------- helpers
  private def arg(args: Seq[LV], i: Int): LV =
    if (i < args.size) args(i) else LNil
  private def strArg(args: Seq[LV], i: Int, fn: String): String = arg(args, i) match {
    case LStr(s) => s
    case LNum(d) => numStr(d)
    case other => throw err(s"bad argument #${i + 1} to '$fn' (string expected, got ${typeName(other)})")
  }
  private def numArg(args: Seq[LV], i: Int, fn: String): Double =
    tonum(arg(args, i)).getOrElse(
      throw err(s"bad argument #${i + 1} to '$fn' (number expected)"))
  private def optNumArg(args: Seq[LV], i: Int, dflt: Double): Double =
    arg(args, i) match {
      case LNil => dflt
      case v => tonum(v).getOrElse(dflt)
    }
  private def tblArg(args: Seq[LV], i: Int, fn: String): LTable = arg(args, i) match {
    case t: LTable => t
    case other => throw err(s"bad argument #${i + 1} to '$fn' (table expected, got ${typeName(other)})")
  }
  private def fn(name: String)(f: Seq[LV] => Seq[LV]): LFunc = LFunc(name, f)

  /** Lua 1-based string index → 0-based, negatives count from end. */
  private def strIndex(len: Int, i: Double, dflt: Int): Int = {
    val ii = i.toInt
    if (ii > 0) ii - 1
    else if (ii == 0) dflt
    else len + ii
  }

  // -------------------------------------------------------------- install
  def install(g: Env): Unit = {
    g.define("print", fn("print")(_ => Seq.empty)) // no console inside tasks
    g.define("type", fn("type")(a => Seq(LStr(typeName(arg(a, 0))))))
    g.define("tostring", fn("tostring")(a => Seq(LStr(tostr(arg(a, 0))))))
    g.define("tonumber", fn("tonumber") { a =>
      arg(a, 1) match {
        case LNil => Seq(tonum(arg(a, 0)).map(LNum.apply).getOrElse(LNil))
        case base =>
          val b = tonum(base).getOrElse(10.0).toInt
          arg(a, 0) match {
            case LStr(s) =>
              try Seq(LNum(java.lang.Long.parseLong(s.trim, b).toDouble))
              catch { case _: NumberFormatException => Seq(LNil) }
            case _ => Seq(LNil)
          }
      }
    })
    g.define("error", fn("error")(a => throw err(tostr(arg(a, 0)))))
    g.define("assert", fn("assert") { a =>
      if (!truthy(arg(a, 0)))
        throw err(if (a.size > 1) tostr(a(1)) else "assertion failed!")
      a
    })
    g.define("select", fn("select") { a =>
      arg(a, 0) match {
        case LStr("#") => Seq(LNum(a.size - 1))
        case v =>
          val i = tonum(v).getOrElse(throw err("bad argument to 'select'")).toInt
          a.drop(i)
      }
    })
    g.define("unpack", fn("unpack") { a =>
      val t = tblArg(a, 0, "unpack")
      (1 to t.arrayLen).map(i => t.get(LNum(i)))
    })
    g.define("rawget", fn("rawget")(a => Seq(tblArg(a, 0, "rawget").get(arg(a, 1)))))
    g.define("rawset", fn("rawset") { a =>
      tblArg(a, 0, "rawset").set(arg(a, 1), arg(a, 2)); Seq(arg(a, 0))
    })
    g.define("next", nextFn)
    g.define("pairs", fn("pairs") { a =>
      Seq(nextFn, arg(a, 0), LNil)
    })
    g.define("ipairs", fn("ipairs") { a =>
      val t = tblArg(a, 0, "ipairs")
      Seq(fn("ipairs-iter") { b =>
        val i = numArg(b, 1, "ipairs-iter").toInt + 1
        val v = t.get(LNum(i))
        if (v == LNil) Seq(LNil) else Seq(LNum(i), v)
      }, t, LNum(0))
    })
    g.define("pcall", fn("pcall") { a =>
      arg(a, 0) match {
        case f: LFunc =>
          try LBool(true) +: f.fn(a.drop(1))
          catch { case e: IllegalArgumentException => Seq(LBool(false), LStr(e.getMessage)) }
        case other => Seq(LBool(false), LStr(s"attempt to call a ${typeName(other)} value"))
      }
    })

    // ------------------------------------------------------------- string
    val st = new LTable
    st.set(LStr("len"), fn("len")(a => Seq(LNum(strArg(a, 0, "len").length))))
    st.set(LStr("upper"), fn("upper")(a =>
      Seq(LStr(strArg(a, 0, "upper").toUpperCase(java.util.Locale.ROOT)))))
    st.set(LStr("lower"), fn("lower")(a =>
      Seq(LStr(strArg(a, 0, "lower").toLowerCase(java.util.Locale.ROOT)))))
    st.set(LStr("rep"), fn("rep") { a =>
      val s = strArg(a, 0, "rep")
      val k = numArg(a, 1, "rep").toInt
      Seq(LStr(if (k <= 0) "" else s * k))
    })
    st.set(LStr("reverse"), fn("reverse")(a => Seq(LStr(strArg(a, 0, "reverse").reverse))))
    st.set(LStr("sub"), fn("sub") { a =>
      val s = strArg(a, 0, "sub")
      var i = strIndex(s.length, optNumArg(a, 1, 1), 0)
      var j = strIndex(s.length, optNumArg(a, 2, -1), s.length - 1)
      if (i < 0) i = 0
      if (j > s.length - 1) j = s.length - 1
      Seq(LStr(if (i > j) "" else s.substring(i, j + 1)))
    })
    st.set(LStr("byte"), fn("byte") { a =>
      val s = strArg(a, 0, "byte")
      val i = strIndex(s.length, optNumArg(a, 1, 1), 0)
      val j = strIndex(s.length, optNumArg(a, 2, optNumArg(a, 1, 1)), i)
      (i to j).filter(k => k >= 0 && k < s.length).map(k => LNum(s.charAt(k)))
    })
    st.set(LStr("char"), fn("char") { a =>
      Seq(LStr(a.map(v => tonum(v).getOrElse(0.0).toInt.toChar).mkString))
    })
    st.set(LStr("format"), fn("format") { a =>
      Seq(LStr(format(strArg(a, 0, "format"), a.drop(1))))
    })
    st.set(LStr("find"), fn("find") { a =>
      val s = strArg(a, 0, "find")
      val p = strArg(a, 1, "find")
      val init0 = optNumArg(a, 2, 1)
      val init = (if (init0 > 0) init0.toInt - 1 else (s.length + init0.toInt) max 0)
      val plain = truthy(arg(a, 3))
      if (plain) {
        val idx = s.indexOf(p, init)
        if (idx < 0) Seq(LNil) else Seq(LNum(idx + 1), LNum(idx + p.length))
      } else patFind(s, p, init) match {
        case Some((st0, en, m)) =>
          Seq(LNum(st0 + 1), LNum(en)) ++
            (if (m.nCaps > 0) m.captures(st0, en) else Seq.empty)
        case None => Seq(LNil)
      }
    })
    st.set(LStr("match"), fn("match") { a =>
      val s = strArg(a, 0, "match")
      val p = strArg(a, 1, "match")
      val init0 = optNumArg(a, 2, 1)
      val init = if (init0 > 0) init0.toInt - 1 else (s.length + init0.toInt) max 0
      patFind(s, p, init) match {
        case Some((st0, en, m)) => m.captures(st0, en)
        case None => Seq(LNil)
      }
    })
    st.set(LStr("gmatch"), fn("gmatch") { a =>
      val s = strArg(a, 0, "gmatch")
      val p = strArg(a, 1, "gmatch")
      var pos = 0
      Seq(fn("gmatch-iter") { _ =>
        if (pos > s.length) Seq(LNil)
        else patFind(s, p, pos) match {
          case Some((st0, en, m)) =>
            pos = if (en == st0) en + 1 else en // never stall on empty match
            m.captures(st0, en)
          case None => pos = s.length + 1; Seq(LNil)
        }
      })
    })
    st.set(LStr("gsub"), fn("gsub") { a =>
      val s = strArg(a, 0, "gsub")
      val p = strArg(a, 1, "gsub")
      val repl = arg(a, 2)
      val maxN = optNumArg(a, 3, Double.MaxValue)
      val sb = new java.lang.StringBuilder
      var pos = 0
      var count = 0L
      while (pos <= s.length && count < maxN) {
        patFind(s, p, pos) match {
          case Some((st0, en, m)) =>
            sb.append(s, pos, st0)
            val whole = s.substring(st0, en)
            val replaced: LV = repl match {
              case LStr(r) =>
                val rb = new java.lang.StringBuilder
                var i = 0
                while (i < r.length) {
                  val c = r.charAt(i)
                  if (c == '%' && i + 1 < r.length) {
                    val d = r.charAt(i + 1)
                    if (d == '%') rb.append('%')
                    else if (d.isDigit) {
                      val k = d - '0'
                      if (k == 0) rb.append(whole)
                      else rb.append(tostr(m.capture(k - 1, st0, en)))
                    } else rb.append(d)
                    i += 2
                  } else { rb.append(c); i += 1 }
                }
                LStr(rb.toString)
              case f: LFunc => f.fn(m.captures(st0, en)).headOption.getOrElse(LNil)
              case t: LTable => t.get(m.captures(st0, en).head)
              case other => throw err(s"bad gsub replacement (${typeName(other)})")
            }
            replaced match {
              case LNil | LBool(false) => sb.append(whole)
              case v => sb.append(tostr(v))
            }
            count += 1
            if (en == st0) { // empty match: copy one char and move on
              if (st0 < s.length) sb.append(s.charAt(st0))
              pos = st0 + 1
            } else pos = en
          case None =>
            sb.append(s, pos, s.length)
            pos = s.length + 1
        }
      }
      if (pos <= s.length) sb.append(s, pos, s.length)
      Seq(LStr(sb.toString), LNum(count.toDouble))
    })
    g.define("string", st)

    // -------------------------------------------------------------- table
    val tt = new LTable
    tt.set(LStr("insert"), fn("insert") { a =>
      val t = tblArg(a, 0, "insert")
      if (a.size >= 3) {
        val posI = numArg(a, 1, "insert").toInt
        val n = t.arrayLen
        var i = n
        while (i >= posI) { t.set(LNum(i + 1), t.get(LNum(i))); i -= 1 }
        t.set(LNum(posI), arg(a, 2))
      } else t.set(LNum(t.arrayLen + 1), arg(a, 1))
      Seq.empty
    })
    tt.set(LStr("remove"), fn("remove") { a =>
      val t = tblArg(a, 0, "remove")
      val n = t.arrayLen
      if (n == 0) Seq(LNil)
      else {
        val posI = optNumArg(a, 1, n).toInt
        val removed = t.get(LNum(posI))
        var i = posI
        while (i < n) { t.set(LNum(i), t.get(LNum(i + 1))); i += 1 }
        t.set(LNum(n), LNil)
        Seq(removed)
      }
    })
    tt.set(LStr("concat"), fn("concat") { a =>
      val t = tblArg(a, 0, "concat")
      val sep = arg(a, 1) match { case LNil => ""; case v => tostr(v) }
      val i = optNumArg(a, 2, 1).toInt
      val j = optNumArg(a, 3, t.arrayLen).toInt
      Seq(LStr((i to j).map(k => tostr(t.get(LNum(k)))).mkString(sep)))
    })
    tt.set(LStr("getn"), fn("getn")(a => Seq(LNum(tblArg(a, 0, "getn").arrayLen))))
    tt.set(LStr("sort"), fn("sort") { a =>
      val t = tblArg(a, 0, "sort")
      val n = t.arrayLen
      val items = (1 to n).map(i => t.get(LNum(i)))
      val cmp: (LV, LV) => Boolean = arg(a, 1) match {
        case f: LFunc => (x, y) => truthy(f.fn(Seq(x, y)).headOption.getOrElse(LNil))
        case _ => {
          case (LNum(x), LNum(y)) => x < y
          case (LStr(x), LStr(y)) => x < y
          case (x, y) => throw err(s"cannot sort ${typeName(x)}/${typeName(y)}")
        }
      }
      val sorted = items.sortWith(cmp)
      sorted.zipWithIndex.foreach { case (v, i) => t.set(LNum(i + 1), v) }
      Seq.empty
    })
    g.define("table", tt)

    // --------------------------------------------------------------- math
    val mt = new LTable
    def m1(name: String)(f: Double => Double): Unit =
      mt.set(LStr(name), fn(name)(a => Seq(LNum(f(numArg(a, 0, name))))))
    m1("floor")(math.floor)
    m1("ceil")(math.ceil)
    m1("abs")(math.abs)
    m1("sqrt")(math.sqrt)
    m1("exp")(math.exp)
    m1("log")(math.log)
    mt.set(LStr("max"), fn("max")(a =>
      Seq(LNum(a.map(v => tonum(v).getOrElse(Double.NaN)).max))))
    mt.set(LStr("min"), fn("min")(a =>
      Seq(LNum(a.map(v => tonum(v).getOrElse(Double.NaN)).min))))
    mt.set(LStr("fmod"), fn("fmod")(a =>
      Seq(LNum(numArg(a, 0, "fmod") % numArg(a, 1, "fmod")))))
    mt.set(LStr("pow"), fn("pow")(a =>
      Seq(LNum(math.pow(numArg(a, 0, "pow"), numArg(a, 1, "pow"))))))
    mt.set(LStr("huge"), LNum(Double.PositiveInfinity))
    mt.set(LStr("pi"), LNum(math.Pi))
    // math.random/randomseed with Lua 5.1 range semantics over a
    // deterministic xorshift64* stream — sampling filters (the common
    // filter_lua use) replay identically across retries and executors;
    // randomseed(s) restarts the stream from s.
    val rngState = new java.util.concurrent.atomic.AtomicLong(
      0x2545F4914F6CDD1dL)
    def nextU01(): Double = {
      var x = rngState.get()
      var next = 0L
      do {
        x = rngState.get()
        next = x ^ (x << 13); next ^= next >>> 7; next ^= next << 17
      } while (!rngState.compareAndSet(x, next))
      ((next >>> 11).toDouble) / (1L << 53).toDouble
    }
    mt.set(LStr("random"), fn("random") { a =>
      val u = nextU01()
      a.size match {
        case 0 => Seq(LNum(u))
        case 1 =>
          val m = numArg(a, 0, "random").toLong
          Seq(LNum(1 + (u * m).toLong.min(m - 1).toDouble))
        case _ =>
          val lo = numArg(a, 0, "random").toLong
          val hi = numArg(a, 1, "random").toLong
          Seq(LNum(lo + (u * (hi - lo + 1)).toLong.min(hi - lo).toDouble))
      }
    })
    mt.set(LStr("randomseed"), fn("randomseed") { a =>
      val s = numArg(a, 0, "randomseed").toLong
      rngState.set(if (s == 0) 0x9E3779B97F4A7C15L else s)
      Seq.empty
    })
    g.define("math", mt)

    // ----------------------------------------------------------------- os
    // only the clock, which filter scripts use for timestamps; no fs/env
    val ot = new LTable
    ot.set(LStr("time"), fn("time")(_ =>
      Seq(LNum(System.currentTimeMillis() / 1000.0))))
    ot.set(LStr("clock"), fn("clock")(_ =>
      Seq(LNum(System.nanoTime() / 1e9))))
    // os.date: the strftime subset timestamp-shaping filters actually
    // use (lua.c scripts format record times constantly). Leading '!'
    // selects UTC per Lua; "*t"/"!*t" return the broken-down table.
    ot.set(LStr("date"), fn("date") { a =>
      val raw = arg(a, 0) match {
        case LStr(s) => s
        case LNil => "%c"
        case v => v.toString
      }
      val utc = raw.startsWith("!")
      val fmt = if (utc) raw.substring(1) else raw
      val tSec = optNumArg(a, 1, System.currentTimeMillis() / 1000.0)
      val zone: java.time.ZoneId =
        if (utc) java.time.ZoneOffset.UTC else java.time.ZoneId.systemDefault()
      val z = java.time.Instant.ofEpochSecond(tSec.toLong).atZone(zone)
      if (fmt == "*t") {
        val t = new LTable
        t.set(LStr("year"), LNum(z.getYear))
        t.set(LStr("month"), LNum(z.getMonthValue))
        t.set(LStr("day"), LNum(z.getDayOfMonth))
        t.set(LStr("hour"), LNum(z.getHour))
        t.set(LStr("min"), LNum(z.getMinute))
        t.set(LStr("sec"), LNum(z.getSecond))
        t.set(LStr("wday"), LNum(z.getDayOfWeek.getValue % 7 + 1)) // 1=Sunday
        t.set(LStr("yday"), LNum(z.getDayOfYear))
        t.set(LStr("isdst"), LBool(false))
        Seq(t)
      } else Seq(LStr(strftime(fmt, z)))
    })
    g.define("os", ot)
  }

  private val MonShort = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val MonLong = Array("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November",
    "December")
  private val DayShort = Array("Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat")
  private val DayLong = Array("Sunday", "Monday", "Tuesday", "Wednesday",
    "Thursday", "Friday", "Saturday")

  /** C-locale strftime subset (the codes fluent-bit's parsers.conf and
    * lua filters use). Unknown codes pass through verbatim, as glibc
    * does.
    */
  private def strftime(fmt: String, z: java.time.ZonedDateTime): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    val wdaySun0 = z.getDayOfWeek.getValue % 7
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c != '%' || i + 1 >= fmt.length) { sb.append(c); i += 1 }
      else {
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append(f"${z.getYear}%04d")
          case 'y' => sb.append(f"${z.getYear % 100}%02d")
          case 'm' => sb.append(f"${z.getMonthValue}%02d")
          case 'd' => sb.append(f"${z.getDayOfMonth}%02d")
          case 'e' => sb.append(f"${z.getDayOfMonth}%2d")
          case 'H' => sb.append(f"${z.getHour}%02d")
          case 'I' =>
            val h12 = z.getHour % 12; sb.append(f"${if (h12 == 0) 12 else h12}%02d")
          case 'M' => sb.append(f"${z.getMinute}%02d")
          case 'S' => sb.append(f"${z.getSecond}%02d")
          case 'j' => sb.append(f"${z.getDayOfYear}%03d")
          case 'w' => sb.append(wdaySun0)
          case 'p' => sb.append(if (z.getHour < 12) "AM" else "PM")
          case 'a' => sb.append(DayShort(wdaySun0))
          case 'A' => sb.append(DayLong(wdaySun0))
          case 'b' | 'h' => sb.append(MonShort(z.getMonthValue - 1))
          case 'B' => sb.append(MonLong(z.getMonthValue - 1))
          case 'c' => sb.append(strftime("%a %b %e %H:%M:%S %Y", z))
          case 'x' => sb.append(strftime("%m/%d/%y", z))
          case 'X' => sb.append(strftime("%H:%M:%S", z))
          case 's' => sb.append(z.toEpochSecond)
          case 'z' =>
            val off = z.getOffset.getTotalSeconds
            sb.append(f"${if (off < 0) "-" else "+"}%s${math.abs(off) / 3600}%02d${math.abs(off) % 3600 / 60}%02d")
          case 'Z' => sb.append(z.getZone.getId)
          case '%' => sb.append('%')
          case other => sb.append('%').append(other)
        }
        i += 2
      }
    }
    sb.toString
  }

  private val nextFn: LFunc = fn("next") { a =>
    val t = tblArg(a, 0, "next")
    val keys = t.entries.keys.toSeq
    arg(a, 1) match {
      case LNil =>
        keys.headOption match {
          case Some(k) => Seq(k, t.entries(k))
          case None => Seq(LNil)
        }
      case k =>
        val i = keys.indexOf(k)
        if (i < 0 || i + 1 >= keys.size) Seq(LNil)
        else Seq(keys(i + 1), t.entries(keys(i + 1)))
    }
  }

  /** string.format — translate the Lua directives to Java's formatter
    * (%d family takes longs, %s takes tostring, %q quotes).
    */
  def format(fmt: String, args: Seq[LV]): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    var ai = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c != '%') { sb.append(c); i += 1 }
      else if (i + 1 < fmt.length && fmt.charAt(i + 1) == '%') { sb.append('%'); i += 2 }
      else {
        // %[-+ #0][width][.prec]conv
        var j = i + 1
        while (j < fmt.length && "-+ #0".indexOf(fmt.charAt(j)) >= 0) j += 1
        while (j < fmt.length && fmt.charAt(j).isDigit) j += 1
        if (j < fmt.length && fmt.charAt(j) == '.') {
          j += 1
          while (j < fmt.length && fmt.charAt(j).isDigit) j += 1
        }
        if (j >= fmt.length) throw err("invalid format string")
        val conv = fmt.charAt(j)
        val spec = fmt.substring(i, j + 1)
        val a = if (ai < args.size) args(ai) else LNil
        ai += 1
        conv match {
          case 'd' | 'i' =>
            sb.append(String.format(java.util.Locale.ROOT,
              spec.dropRight(1) + "d",
              Long.box(tonum(a).getOrElse(throw err("format %d needs number")).toLong)))
          case 'u' | 'x' | 'X' | 'o' =>
            sb.append(String.format(java.util.Locale.ROOT,
              spec.dropRight(1) + (if (conv == 'u') "d" else conv.toString),
              Long.box(tonum(a).getOrElse(throw err("format needs number")).toLong)))
          case 'c' =>
            sb.append(tonum(a).getOrElse(throw err("format %c needs number")).toInt.toChar)
          case 'f' | 'F' | 'e' | 'E' | 'g' | 'G' =>
            sb.append(String.format(java.util.Locale.ROOT, spec,
              Double.box(tonum(a).getOrElse(throw err("format needs number")))))
          case 's' =>
            sb.append(String.format(java.util.Locale.ROOT, spec, tostr(a)))
          case 'q' =>
            sb.append('"')
            tostr(a).foreach {
              case '"' => sb.append("\\\"")
              case '\\' => sb.append("\\\\")
              case '\n' => sb.append("\\n")
              case '\r' => sb.append("\\r")
              case ' ' => sb.append("\\0")
              case ch => sb.append(ch)
            }
            sb.append('"')
          case other => throw err(s"invalid format conversion '%$other'")
        }
        i = j + 1
      }
    }
    sb.toString
  }
}
