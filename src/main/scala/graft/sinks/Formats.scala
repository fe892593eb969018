package graft.sinks

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sink-side record serialization (SURVEY.md §2.10): the out_file formats
  * (reference `plugins/out_file/file.c:472-580,987-1020` — json / csv /
  * ltsv / plain / template), GELF (`src/flb_pack_gelf.c`) and the
  * Prometheus text exposition format (out_prometheus_exporter).
  *
  * All formatters are single Column expressions (codegen'd string
  * building) — a formatted sink line never leaves the projection, so
  * writing N TB of output lines is a map-only stage.
  */
object Formats {

  /** out_file `Format json` — one JSON object per line. Field order is
    * the struct order, as in msgpack→JSON (flb_pack.c:1156).
    */
  def jsonLine(fields: Seq[(String, Column)]): Column =
    to_json(struct(fields.map { case (n, c) => c.as(n) }: _*))

  /** out_file `Format csv` (file.c:472): delimiter-joined values. NULLs
    * serialize as empty fields (concat_ws would silently SKIP them,
    * shifting every later column); values containing the delimiter, a
    * quote, or a newline are double-quoted with embedded quotes doubled.
    */
  def csvLine(fields: Seq[Column], delim: String = ","): Column =
    concat_ws(delim, fields.map { f =>
      val s = coalesce(f.cast("string"), lit(""))
      val quoted = concat(lit("\""), regexp_replace(s, "\"", "\"\""), lit("\""))
      when(s.contains(delim) || s.contains("\"") || s.contains("\n"), quoted)
        .otherwise(s)
    }: _*)

  /** out_file `Format plain` (file.c): the bare value, no framing. */
  def plainLine(value: Column): Column = value.cast("string")

  /** out_file `Format ltsv` (file.c:530): `key:value` pairs joined by tabs. */
  def ltsvLine(fields: Seq[(String, Column)]): Column =
    concat_ws("\t", fields.map { case (n, c) =>
      concat(lit(n + ":"), c.cast("string"))
    }: _*)

  /** out_file `Format template` (file.c:987-1020): literal text with
    * `{key}` placeholders resolved from columns.
    */
  def templateLine(template: String, resolve: String => Column): Column = {
    val token = java.util.regex.Pattern.compile("\\{([A-Za-z0-9_.]+)\\}")
    val m = token.matcher(template)
    val parts = scala.collection.mutable.ArrayBuffer[Column]()
    var last = 0
    while (m.find()) {
      if (m.start() > last) parts += lit(template.substring(last, m.start()))
      parts += resolve(m.group(1)).cast("string")
      last = m.end()
    }
    if (last < template.length) parts += lit(template.substring(last))
    concat(parts.toSeq: _*)
  }

  /** GELF 1.1 payload (flb_pack_gelf.c): version/host/short_message/
    * timestamp/level + `_`-prefixed additional fields. Timestamp is
    * integer epoch seconds here (sub-second via `timestampSec` as a
    * decimal string if needed).
    */
  def gelf(host: Column, shortMessage: Column, timestampSec: Column,
           level: Column, additional: Seq[(String, Column)] = Nil): Column =
    to_json(struct(
      (lit("1.1").as("version") +: host.as("host") +:
        shortMessage.as("short_message") +: timestampSec.as("timestamp") +:
        level.as("level") +:
        additional.map { case (n, c) => c.as("_" + n) }): _*))

  /** Prometheus text exposition line:
    * `name{k1="v1",k2="v2"} value timestamp_ms` — labels pre-sorted by
    * key for a canonical form.
    */
  def promLine(name: String, labels: Seq[(String, Column)], value: Column,
               tsMs: Option[Column] = None): Column = {
    val labelStr =
      if (labels.isEmpty) lit("")
      else concat(lit("{"),
        concat_ws(",", labels.sortBy(_._1).map { case (k, v) =>
          concat(lit(k + "=\""), v.cast("string"), lit("\""))
        }: _*), lit("}"))
    val base = concat(lit(name), labelStr, lit(" "), value.cast("string"))
    tsMs.map(t => concat(base, lit(" "), t.cast("string"))).getOrElse(base)
  }
}
