package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.parse.Parsers

/** Parsing subsystem (SURVEY.md §2.5) exercised end-to-end: each query
  * synthesizes a raw text line from testdata columns (identically in
  * DuckDB), parses it with the graft.parse library, and emits the typed
  * fields — proving text→structure→typed-columns round trips.
  */
object ParseQueries {

  val all: Seq[GraftQuery] = Seq(
    // Regex parser with named groups (src/flb_parser_regex.c; onigmo
    // name table ≙ groupIndexes).
    GraftQuery(
      "parse_regex_named",
      (s, dir) => {
        val raw = Tables.events(s, dir).withColumn(
          "line",
          concat(col("event_type"), lit(" id="), col("event_id"),
            lit(" val="), col("value").cast("string")))
        Parsers.regex(raw, col("line"),
            "^(?<etype>\\w+) id=(?<id>\\d+) val=(?<val>[0-9.]+)$",
            types = Map("id" -> "long", "val" -> "double"))
          .select(col("event_id"), col("etype"), col("id"), col("val"))
      },
      Some("""WITH raw AS (
               SELECT event_id,
                      event_type || ' id=' || CAST(event_id AS VARCHAR)
                        || ' val=' || CAST(value AS VARCHAR) AS line
               FROM events)
             SELECT event_id,
                    regexp_extract(line, '^(\w+) id=(\d+) val=([0-9.]+)$', 1) AS etype,
                    TRY_CAST(regexp_extract(line, '^(\w+) id=(\d+) val=([0-9.]+)$', 2) AS BIGINT) AS id,
                    TRY_CAST(regexp_extract(line, '^(\w+) id=(\d+) val=([0-9.]+)$', 3) AS DOUBLE) AS val
             FROM raw""")
    ),

    // JSON parser (src/flb_parser_json.c): typed struct from the body.
    GraftQuery(
      "parse_json",
      (s, dir) =>
        Parsers.json(Tables.events(s, dir), col("props"), "k BIGINT", "body")
          .select(col("event_id"), col("body.k").as("k")),
      Some("""SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events""")
    ),

    // LTSV parser (src/flb_parser_ltsv.c): tab-separated key:value.
    GraftQuery(
      "parse_ltsv",
      (s, dir) => {
        val raw = Tables.lineitem(s, dir).withColumn(
          "line",
          concat(lit("ord:"), col("l_orderkey"), lit("\t"),
            lit("line:"), col("l_linenumber"), lit("\t"),
            lit("flag:"), col("l_returnflag")))
        Parsers.ltsv(raw, col("line"), "m")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            element_at(col("m"), "ord").try_cast("long").as("ord"),
            element_at(col("m"), "flag").as("flag"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_orderkey AS ord,
             l_returnflag AS flag FROM lineitem""")
    ),

    // logfmt parser (src/flb_parser_logfmt.c): key=value with quoted
    // values containing spaces.
    GraftQuery(
      "parse_logfmt",
      (s, dir) => {
        val raw = Tables.part(s, dir).withColumn(
          "line",
          concat(lit("pk="), col("p_partkey"), lit(" brand="), col("p_brand"),
            lit(" name=\""), col("p_name"), lit("\" size="), col("p_size")))
        Parsers.logfmt(raw, col("line"), "m")
          .select(
            col("p_partkey"),
            element_at(col("m"), "pk").try_cast("long").as("pk"),
            element_at(col("m"), "name").as("name"),
            element_at(col("m"), "size").try_cast("int").as("size"))
      },
      Some("""SELECT p_partkey, p_partkey AS pk, p_name AS name, p_size AS size
             FROM part""")
    ),

    // CSV helper (src/flb_csv.c) via from_csv.
    GraftQuery(
      "parse_csv",
      (s, dir) => {
        val raw = Tables.supplier(s, dir).withColumn(
          "line",
          concat(col("s_suppkey"), lit(","), col("s_name"), lit(","),
            col("s_acctbal").cast("string")))
        Parsers.csv(raw, col("line"), "sk BIGINT, nm STRING, bal DOUBLE", "c")
          .select(col("s_suppkey"), col("c.sk").as("sk"), col("c.nm").as("nm"),
            col("c.bal").as("bal"))
      },
      Some("""SELECT s_suppkey, s_suppkey AS sk, s_name AS nm, s_acctbal AS bal
             FROM supplier""")
    ),

    // strptime round trip (src/flb_strptime.c; %d/%b/%Y apache format
    // with month names — exercises the format translation table).
    GraftQuery(
      "parse_time_strptime",
      (s, dir) => {
        val raw = Tables.events(s, dir).withColumn(
          "tstr", date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"))
        raw.select(
          col("event_id"), col("tstr"),
          Parsers.parseTime(col("tstr"), "%d/%b/%Y:%H:%M:%S").cast("long").as("parsed_epoch"))
      },
      Some("""WITH raw AS (
               SELECT event_id, strftime(ts, '%d/%b/%Y:%H:%M:%S') AS tstr FROM events)
             SELECT event_id, tstr,
                    CAST(floor(epoch(strptime(tstr, '%d/%b/%Y:%H:%M:%S'))) AS BIGINT)
                      AS parsed_epoch
             FROM raw""")
    ),

    // syslog RFC5424 (conf/parsers.conf:68-74 `syslog-rfc5424`): the
    // named-group pattern includes a NESTED bare group inside
    // `extradata` — exercises the parser's group-index accounting.
    GraftQuery(
      "parse_syslog5424",
      (s, dir) => {
        val raw = Tables.events(s, dir).withColumn(
          "line",
          concat(lit("<"), (col("user_id") % 8 + 8).cast("string"), lit(">1 "),
            date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"), lit(" h"),
            (col("user_id") % 5).cast("string"), lit(" app "),
            col("event_id").cast("string"), lit(" - [k=1] "),
            col("event_type"), lit(" happened")))
        Parsers.regex(raw, col("line"),
            "^<(?<pri>[0-9]{1,5})>1 (?<time>[^ ]+) (?<host>[^ ]+) (?<ident>[^ ]+) " +
              "(?<pid>[-0-9]+) (?<msgid>[^ ]+) (?<extradata>(\\[.*?\\]|-)) (?<message>.+)$",
            types = Map("pri" -> "int", "pid" -> "long"))
          .select(col("event_id"), col("pri"), col("host"), col("ident"),
            col("pid"), col("msgid"), col("extradata"), col("message"))
      },
      Some("""SELECT event_id,
             CAST(user_id % 8 + 8 AS INT) AS pri,
             'h' || CAST(user_id % 5 AS VARCHAR) AS host,
             'app' AS ident,
             event_id AS pid,
             '-' AS msgid,
             '[k=1]' AS extradata,
             event_type || ' happened' AS message
             FROM events""")
    ),

    // CRI log line format (conf/parsers.conf:119-124 `cri`):
    // `time stream logtag message`.
    GraftQuery(
      "parse_cri",
      (s, dir) => {
        val raw = Tables.events(s, dir).withColumn(
          "line",
          concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            lit(" stdout F "), col("event_type"), lit(" msg")))
        Parsers.regex(raw, col("line"),
            "^(?<time>[^ ]+) (?<stream>stdout|stderr) (?<logtag>[^ ]*) (?<message>.*)$")
          .select(col("event_id"), col("stream"), col("logtag"), col("message"))
      },
      Some("""SELECT event_id, 'stdout' AS stream, 'F' AS logtag,
             event_type || ' msg' AS message FROM events""")
    ),

    // escaped decoder (src/flb_parser_decoder.c): docker-style stringified
    // logs with \n/\t/\" sequences; verify by decoded length.
    GraftQuery(
      "parse_decoder_escaped",
      (s, dir) => {
        val raw = Tables.documents(s, dir).withColumn(
          "esc", regexp_replace(substring(col("text"), 1, 40), " ", "\\\\n"))
        raw.select(col("doc_id"),
          length(Parsers.decodeEscaped(col("esc"))).as("decoded_len"),
          length(col("esc")).as("escaped_len"))
      },
      Some("""WITH raw AS (
               SELECT doc_id, replace(substr(text, 1, 40), ' ', '\n') AS esc
               FROM documents)
             SELECT doc_id, length(replace(esc, '\n', chr(10))) AS decoded_len,
                    length(esc) AS escaped_len
             FROM raw""")
    ),

    // Decoder chain (flb_parser_decoder.c:677-690 do_next/as rules):
    // mysql_quoted strips the surrounding quotes and MySQL escapes
    // (leaving the unknown \uXXXX untouched), then escaped_utf8 decodes
    // the unicode escape — two `decode_field_as ... do_next` rules
    // composing left-to-right. The oracle mirrors the FIXTURE's specific
    // escapes with chained replaces (safe here because the fixture has
    // no overlapping sequences); the Spark decoders themselves are
    // general single-pass scanners.
    GraftQuery(
      "parse_decoder_chain",
      (s, dir) => {
        // data value per row: 'id <k> said \"hi\"\tto A end'
        // (outer single quotes included; \u built by concat so the
        // Scala lexer does not pre-decode it)
        val raw = Tables.part(s, dir).select(col("p_partkey"),
          concat(lit("'id "), col("p_partkey").cast("string"),
            lit(" said \\\"hi\\\"\\tto " + "\\" + "u0041 end'")).as("q"))
        raw.select(col("p_partkey"),
          Parsers.decodeChain(col("q"),
            Seq(Parsers.decodeMysqlQuoted _, Parsers.decodeEscapedUtf8 _))
            .as("decoded"))
      },
      Some {
        val u = "\\" + "u0041"
        s"""WITH raw AS (
             SELECT p_partkey,
                    '''id ' || CAST(p_partkey AS VARCHAR) ||
                    ' said \"hi\"\tto $u end''' AS q
             FROM part)
           SELECT p_partkey,
                  replace(replace(replace(substr(q, 2, length(q) - 2),
                    '\"', '"'), '\t', chr(9)), '$u', 'A') AS decoded
           FROM raw"""
      }
    )
  )
}
