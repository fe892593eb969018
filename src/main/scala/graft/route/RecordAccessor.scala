package graft.route

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StringType, StructType}

/** Record accessor expression language (SURVEY §2.7; reference grammar
  * `src/record_accessor/ra.l` / `ra.y`, API
  * `include/fluent-bit/flb_record_accessor.h:38-65`): patterns mix
  * literal text with `$key['a'][0]['b']` field refs, `$TAG` / `$TAG[n]`
  * tag refs, and `${ENV}` environment references.
  *
  * `flb_ra_translate` ≙ [[translate]] — compiled ONCE at plan time into
  * a codegen'd concat; env vars expand at compile time exactly like the
  * reference (the lexer resolves `${...}` when the accessor is created,
  * not per record). Missing keys render as empty string
  * (`tests/internal/record_accessor.c` cb_translate: `k8 =>  (nothing)`).
  * Typed fetch `flb_ra_get_value_object` ≙ [[column]] (missing ⇒ NULL).
  * In-place update/append (`flb_ra_update_kv_pair` /
  * `flb_ra_append_kv_pair`, flb_record_accessor.h:63-65) ≙ [[updateKv]].
  *
  * Divergence note: the reference renders floats via C `%f` (6
  * decimals); we render the column's canonical string form.
  */
object RecordAccessor {

  sealed trait Sub
  final case class SubKey(name: String) extends Sub
  final case class SubIndex(i: Int) extends Sub

  sealed trait Part
  final case class Literal(s: String) extends Part
  final case class KeyRef(base: String, subs: Seq[Sub]) extends Part
  final case class TagRef(part: Option[Int]) extends Part
  final case class EnvRef(name: String) extends Part

  private val Name = "[A-Za-z_][A-Za-z0-9_]*"
  private val Token = java.util.regex.Pattern.compile(
    "\\$\\{(" + Name + ")\\}" +                // 1: ${ENV}
      // $TAG only when not a longer identifier ($TAGS is a key ref) —
      // regex alternation is leftmost-first, not longest-match
      "|\\$TAG(?![A-Za-z0-9_])(?:\\[(\\d+)\\])?" + // 2: $TAG[n]
      "|\\$(" + Name + ")((?:\\[[^\\]]+\\])*)" // 3,4: $key['a'][0]
  )
  private val SubPat = java.util.regex.Pattern.compile(
    "\\[(?:'([^']*)'|\"([^\"]*)\"|(\\d+))\\]")

  /** Parse a pattern into parts (grammar of ra.l/ra.y re-expressed). */
  def parse(pattern: String): Seq[Part] = {
    val out = scala.collection.mutable.ArrayBuffer[Part]()
    val m = Token.matcher(pattern)
    var last = 0
    while (m.find()) {
      if (m.start() > last) out += Literal(pattern.substring(last, m.start()))
      if (m.group(1) != null) out += EnvRef(m.group(1))
      else if (m.group(3) != null) {
        val subs = scala.collection.mutable.ArrayBuffer[Sub]()
        val sm = SubPat.matcher(m.group(4))
        while (sm.find()) {
          if (sm.group(1) != null) subs += SubKey(sm.group(1))
          else if (sm.group(2) != null) subs += SubKey(sm.group(2))
          else subs += SubIndex(sm.group(3).toInt)
        }
        out += KeyRef(m.group(3), subs.toSeq)
      }
      else out += TagRef(Option(m.group(2)).map(_.toInt))
      last = m.end()
    }
    if (last < pattern.length) out += Literal(pattern.substring(last))
    out.toSeq
  }

  /** Resolve a `$key[..]` ref against the frame's schema: struct path,
    * map lookup, array index, or JSON-string residue; missing ⇒ NULL
    * (flb_ra_get_value_object semantics).
    */
  def keyColumn(df: DataFrame, ref: KeyRef): Column = {
    if (!df.columns.contains(ref.base)) return lit(null)
    var c = col(ref.base)
    var t: Option[org.apache.spark.sql.types.DataType] = Some(df.schema(ref.base).dataType)
    ref.subs.foreach { s =>
      (t, s) match {
        case (Some(st: StructType), SubKey(k)) =>
          c = c.getField(k); t = st.fields.find(_.name == k).map(_.dataType)
        case (Some(_: MapType), SubKey(k)) =>
          c = element_at(c, k); t = t.collect { case mt: MapType => mt.valueType }
        case (Some(at: ArrayType), SubIndex(i)) =>
          c = c.getItem(i); t = Some(at.elementType)
        case (Some(StringType), SubKey(k)) =>
          c = get_json_object(c, "$." + k); t = Some(StringType)
        case (Some(StringType), SubIndex(i)) =>
          c = get_json_object(c, s"$$[$i]"); t = Some(StringType)
        case _ => c = lit(null); t = None
      }
    }
    c
  }

  /** Typed single-ref fetch (`flb_ra_get_value_object`). */
  def column(df: DataFrame, pattern: String, tagCol: String = "tag"): Column =
    parse(pattern) match {
      case Seq(k: KeyRef) => keyColumn(df, k)
      case Seq(TagRef(None)) => col(tagCol)
      case Seq(TagRef(Some(n))) => Router.tagPart(col(tagCol), n)
      case other => throw new IllegalArgumentException(
        s"'$pattern' is a template, not a single accessor ($other); use translate")
    }

  /** String interpolation (`flb_ra_translate`): literal text + resolved
    * refs concatenated; missing keys render empty; `${ENV}` expands at
    * compile time via `env` (defaults to the process environment).
    */
  def translate(df: DataFrame, pattern: String, tagCol: String = "tag",
                env: String => Option[String] = sys.env.get): Column = {
    val cols = parse(pattern).map {
      case Literal(s) => lit(s)
      case EnvRef(n) => lit(env(n).getOrElse(""))
      case TagRef(None) => col(tagCol)
      case TagRef(Some(n)) => coalesce(Router.tagPart(col(tagCol), n), lit(""))
      case k: KeyRef => coalesce(keyColumn(df, k).cast("string"), lit(""))
    }
    concat(cols: _*)
  }

  /** In-place update/append (`flb_ra_update_kv_pair` /
    * `flb_ra_append_kv_pair`): set the value at a single-ref path,
    * creating it when absent. Top-level keys become columns; struct
    * paths use withField (creates missing leaves); map keys upsert.
    */
  def updateKv(df: DataFrame, pattern: String, value: Column): DataFrame =
    parse(pattern) match {
      case Seq(KeyRef(base, Seq())) => df.withColumn(base, value)
      case Seq(KeyRef(base, subs)) if df.columns.contains(base) =>
        df.schema(base).dataType match {
          case _: StructType if subs.forall(_.isInstanceOf[SubKey]) =>
            // backtick-quote each segment: withField parses dots as
            // nesting, but a key like "fluentbit.io/tag" is ONE field
            val path = subs.collect { case SubKey(k) => s"`$k`" }.mkString(".")
            df.withColumn(base, col(base).withField(path, value))
          case _: MapType =>
            subs match {
              case Seq(SubKey(k)) => df.withColumn(base,
                map_concat(map_filter(col(base), (key, _) => key =!= k),
                  map(lit(k), value)))
              case other => throw new IllegalArgumentException(
                s"map update supports one key level, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"cannot update into $other at $pattern")
        }
      case other => throw new IllegalArgumentException(
        s"updateKv needs a single $$key path, got $other")
    }
}
