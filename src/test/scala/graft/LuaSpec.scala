package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Lua, LuaContract}
import graft.ops.Lua._

/** The in-repo Lua interpreter (ops/Lua.scala) executing REAL
  * filter_lua user scripts behind the (code, ts, record) contract
  * (`plugins/filter_lua/lua.c:433-616`): language core, the stdlib
  * subset, Lua patterns, and the end-to-end DataFrame path including
  * 1→N splits and code -1 drops.
  */
class LuaSpec extends AnyFunSuite {

  private def eval(src: String): Seq[LV] = {
    val s = new Lua.Script("function __t() " + src + " end")
    s.callFunction("__t", Seq.empty)
  }
  /** Expression snippets get a `return`; snippets that open with a
    * statement keyword run as-is.
    */
  private def evalOne(src: String): LV = {
    val isStmt = Seq("local ", "for ", "while ", "repeat ", "if ")
      .exists(src.startsWith)
    eval(if (isStmt) src else "return " + src).headOption.getOrElse(LNil)
  }
  private def num(src: String): Double = evalOne(src) match {
    case LNum(d) => d
    case other => fail(s"expected number, got $other")
  }
  private def str(src: String): String = evalOne(src) match {
    case LStr(s) => s
    case other => fail(s"expected string, got $other")
  }

  test("os.date: strftime subset, UTC bang, *t table; math.random stream") {
    assert(str("os.date('!%Y-%m-%dT%H:%M:%SZ', 0)") == "1970-01-01T00:00:00Z")
    assert(str("os.date('!%a %b %e %H:%M:%S %Y', 1000000000)") ==
      "Sun Sep  9 01:46:40 2001")
    assert(str("os.date('!%I%p %j %w %y', 1000000000)") == "01AM 252 0 01")
    assert(num("os.date('!*t', 1000000000).year") == 2001)
    assert(num("os.date('!*t', 1000000000).wday") == 1) // 1 = Sunday
    assert(num("os.date('!*t', 1000000000).yday") == 252)
    assert(str("os.date('!%%s literal %q', 0)") == "%s literal %q")
    val r = eval("math.randomseed(7) return math.random(10)").head match {
      case LNum(d) => d
      case other => fail(s"expected number, got $other")
    }
    assert(r >= 1 && r <= 10 && r == math.floor(r), r.toString)
    // reseeding restarts the deterministic stream
    assert(eval("math.randomseed(7) local a = math.random() " +
      "math.randomseed(7) return a == math.random()").head == LBool(true))
    assert(evalOne("local x = math.random(3, 5) " +
      "return x >= 3 and x <= 5") == LBool(true))
  }

  // ------------------------------------------------------------- language
  test("arithmetic, precedence, concat, comparison, logic") {
    assert(num("1 + 2 * 3") == 7)
    assert(num("(1 + 2) * 3") == 9)
    assert(num("2 ^ 3 ^ 2") == 512) // right assoc
    assert(num("7 % 3") == 1)
    assert(num("-7 % 3") == 2) // floor mod
    assert(str("'a' .. 'b' .. 1") == "ab1")
    assert(evalOne("1 < 2 and 'x' or 'y'") == LStr("x"))
    assert(evalOne("'abc' < 'abd'") == LBool(true))
    assert(evalOne("1 == 1.0") == LBool(true))
    assert(evalOne("'1' == 1") == LBool(false)) // no cross-type equality
    assert(evalOne("nil == false") == LBool(false))
    assert(num("'10' + 5") == 15) // string→number coercion in arithmetic
    assert(str("tostring(14)") == "14")
    assert(str("tostring(1.5)") == "1.5")
  }

  test("control flow: if/elseif, while, repeat, numeric for, break") {
    assert(num("local x = 5 if x > 3 then return 1 elseif x > 1 then return 2 else return 3 end") == 1)
    assert(num("local s = 0 for i = 1, 10 do s = s + i end return s") == 55)
    assert(num("local s = 0 for i = 10, 1, -2 do s = s + i end return s") == 30)
    assert(num("local s = 0 local i = 0 while true do i = i + 1 if i > 4 then break end s = s + i end return s") == 10)
    assert(num("local i = 0 repeat i = i + 3 until i > 7 return i") == 9)
  }

  test("functions: multiple returns, closures, recursion, varargs") {
    assert(eval("local function two() return 1, 2 end return two()") ==
      Seq(LNum(1), LNum(2)))
    assert(num(
      """local function counter()
        |  local n = 0
        |  return function() n = n + 1 return n end
        |end
        |local c = counter() c() c() return c()""".stripMargin) == 3)
    assert(num(
      "local function fib(n) if n < 2 then return n end return fib(n-1) + fib(n-2) end return fib(10)") == 55)
    assert(num(
      "local function sum(...) local s = 0 for _, v in ipairs({...}) do s = s + v end return s end return sum(1,2,3,4)") == 10)
  }

  test("tables: constructors, nesting, pairs/ipairs, length, table lib") {
    assert(num("local t = {10, 20, 30} return #t") == 3)
    assert(num("local t = {a = 1, ['b'] = 2} return t.a + t['b']") == 3)
    assert(num("local t = {x = {y = {z = 42}}} return t.x.y.z") == 42)
    assert(num(
      "local t = {} table.insert(t, 'a') table.insert(t, 'b') table.insert(t, 1, 'c') return #t") == 3)
    assert(str(
      "local t = {'a', 'b', 'c'} table.remove(t, 2) return table.concat(t, '-')") == "a-c")
    assert(num(
      "local s = 0 for k, v in pairs({a = 1, b = 2, c = 3}) do s = s + v end return s") == 6)
    assert(str(
      "local t = {3, 1, 2} table.sort(t) return table.concat(t, ',')") == "1,2,3")
    assert(num("local t = {5, 6, 7} local s = 0 for i, v in ipairs(t) do s = s + i * v end return s") == 38)
  }

  test("stdlib: string basics, math, tonumber/tostring/type") {
    assert(str("string.upper('abc')") == "ABC")
    assert(str("('mixed'):upper()") == "MIXED") // method-call sugar on strings
    assert(str("string.sub('hello', 2, 4)") == "ell")
    assert(str("string.sub('hello', -3)") == "llo")
    assert(str("string.rep('ab', 3)") == "ababab")
    assert(str("string.format('%s=%d (%.2f)', 'x', 42, 1.5)") == "x=42 (1.50)")
    assert(num("string.len('abcd')") == 4)
    assert(num("math.floor(3.7) + math.ceil(3.2) + math.abs(-2)") == 9)
    assert(num("math.max(1, 5, 3)") == 5)
    assert(num("tonumber('0x1f')") == 31)
    assert(evalOne("tonumber('zz')") == LNil)
    assert(str("type({})") == "table")
    assert(str("type(print)") == "function")
  }

  // --------------------------------------------------------- lua patterns
  test("lua patterns: find, match, captures, gmatch, gsub") {
    assert(eval("return string.find('hello world', 'wor')") ==
      Seq(LNum(7), LNum(9)))
    assert(eval("return string.find('a.b', '.', 1, true)") ==
      Seq(LNum(2), LNum(2))) // plain find
    assert(str("string.match('key=value', '(%w+)=(%w+)')") == "key")
    assert(eval("return string.match('key=value', '(%w+)=(%w+)')") ==
      Seq(LStr("key"), LStr("value")))
    assert(str("string.match('  padded  ', '^%s*(.-)%s*$')") == "padded")
    assert(str("string.gsub('hello world', 'o', '0')") == "hell0 w0rld")
    assert(eval("return string.gsub('aaa', 'a', 'b', 2)") ==
      Seq(LStr("bba"), LNum(2)))
    assert(str("string.gsub('k1=v1;k2=v2', '(%w+)=(%w+)', '%2:%1')") ==
      "v1:k1;v2:k2")
    assert(str(
      "local o = '' for w in string.gmatch('one two three', '%a+') do o = o .. w .. '|' end return o") ==
      "one|two|three|")
    assert(str("string.gsub('x=1', '%d', function(d) return d .. d end)") == "x=11")
    assert(str("string.match('2024-01-15', '%d+%-(%d+)')") == "01")
    assert(evalOne("string.match('abc', '^%d+$')") == LNil)
  }

  // ---------------------------------------------------- filter contract
  test("contract: modify-record script (code 1) rewrites body and ts") {
    val cb = LuaContract.script(
      """function cb_filter(tag, timestamp, record)
        |  record["host"] = "node-1"
        |  record["level"] = string.upper(record["level"])
        |  return 1, timestamp + 10, record
        |end""".stripMargin)
    val (code, ts, recs) = cb("app.log", 1000L, Map("level" -> "warn", "msg" -> "x"))
    assert(code == 1 && ts == 1010L)
    assert(recs == Seq(Map("level" -> "WARN", "msg" -> "x", "host" -> "node-1")))
  }

  test("contract: code -1 drops, code 0 keeps, code 2 keeps timestamp") {
    val cb = LuaContract.script(
      """function cb_filter(tag, timestamp, record)
        |  if record["drop"] == "yes" then return -1, timestamp, record end
        |  if record["keep"] == "yes" then return 0, timestamp, record end
        |  record["seen"] = "1"
        |  return 2, timestamp + 999, record
        |end""".stripMargin)
    assert(cb("t", 5L, Map("drop" -> "yes"))._1 == -1)
    assert(cb("t", 5L, Map("keep" -> "yes"))._1 == 0)
    val (c2, _, recs) = cb("t", 5L, Map("a" -> "b"))
    assert(c2 == 2 && recs == Seq(Map("a" -> "b", "seen" -> "1")))
  }

  test("contract: array-of-tables return splits 1→N (lua.c split form)") {
    val cb = LuaContract.script(
      """function cb_filter(tag, timestamp, record)
        |  local out = {}
        |  for word in string.gmatch(record["csv"], '[^,]+') do
        |    table.insert(out, {item = word, src = tag})
        |  end
        |  return 1, timestamp, out
        |end""".stripMargin)
    val (_, _, recs) = cb("split.src", 1L, Map("csv" -> "a,b,c"))
    assert(recs == Seq(
      Map("item" -> "a", "src" -> "split.src"),
      Map("item" -> "b", "src" -> "split.src"),
      Map("item" -> "c", "src" -> "split.src")))
  }

  test("contract: end-to-end on a DataFrame via applyToFrame") {
    import TestSpark._
    import spark.implicits._
    val df = Seq(
      ("app.a", 100L, Map("level" -> "debug", "msg" -> "noisy")),
      ("app.b", 200L, Map("level" -> "error", "msg" -> "boom")),
      ("app.c", 300L, Map("level" -> "info", "msg" -> "fine"))
    ).toDF("tag", "ts", "body")
    val out = LuaContract.applyToFrame(spark, df, "tag", "ts", "body")(
      LuaContract.script(
        """function cb_filter(tag, timestamp, record)
          |  if record["level"] == "debug" then return -1, timestamp, record end
          |  record["tagged"] = tag
          |  return 1, timestamp, record
          |end""".stripMargin))
      .orderBy("ts").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Map[String, String]]("body") ==
      Map("level" -> "error", "msg" -> "boom", "tagged" -> "app.b"))
    assert(out(1).getAs[Map[String, String]]("body")("tagged") == "app.c")
  }

  test("script state persists across calls (one lua_State per filter)") {
    val cb = LuaContract.script(
      """count = 0
        |function cb_filter(tag, timestamp, record)
        |  count = count + 1
        |  record["n"] = tostring(count)
        |  return 1, timestamp, record
        |end""".stripMargin)
    assert(cb("t", 1L, Map.empty)._3 == Seq(Map("n" -> "1")))
    assert(cb("t", 1L, Map.empty)._3 == Seq(Map("n" -> "2")))
  }

  test("hostile scripts fail bounded: syntax and runtime errors throw") {
    intercept[IllegalArgumentException](new Lua.Script("function ("))
    intercept[IllegalArgumentException](eval("return nil + 1"))
    intercept[IllegalArgumentException](eval("local t = nil return t.x"))
    intercept[IllegalArgumentException](eval("return (5)()"))
    // pcall contains the failure like real Lua
    assert(eval("local ok, e = pcall(function() error('x') end) return ok") ==
      Seq(LBool(false)))
  }
}
