package graft.config

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.Yaml.{YMap, YSeq, YStr, Node}
import graft.streaming.Multiline

/** YAML configuration frontend — the reference's modern pipeline format
  * (`src/config_format/flb_cf_yaml.c`; section grammar at its state
  * machine lines 1686-1811): `service`, `env`, `includes`, `parsers`,
  * `multiline_parsers`, `stream_processor`, `pipeline` with
  * `inputs`/`filters`/`outputs`, per-plugin `processors` (logs channel),
  * plus pass-through sections (`customs`, `plugins`, `upstream_servers`,
  * `extensions`) that configure runtime concerns with no query meaning.
  *
  * Everything translates into the SAME section IR the classic frontend
  * parses into, then [[ClassicConfig.assembleSections]] builds the
  * routed pipeline — one assembly, two syntaxes, so a YAML pipeline and
  * its classic twin produce byte-identical plans.
  *
  * Property-value translation (flb_cf_yaml stores every scalar as text):
  *   - scalar           → one `key value` property
  *   - sequence of scalars → the key REPEATED per item (the reference's
  *     slist fixtures: grep `regex:` lists, record_modifier `record:`)
  *   - nested mapping   → dotted keys (`sampling_settings.percentage`),
  *     the flattening flb applies to variant properties
  *   - `${VAR}`         → env interpolation: the config's `env:` section
  *     first, then the process environment, then empty string — the
  *     flb_env_var_translate order.
  */
object YamlConfig {

  final case class Doc(
      sections: Seq[ClassicConfig.Section],
      inputProcessors: Seq[Seq[ClassicConfig.Section]],
      outputProcessors: Seq[Seq[ClassicConfig.Section]],
      mlParsers: Map[String, Seq[Multiline.Rule]],
      env: Map[String, String],
      service: Map[String, String],
      extras: Map[String, Node])

  /** Parse + translate. `resolveInclude` maps an `includes:` path to its
    * text (tests pass a Map; production callers a file reader). Includes
    * merge AFTER the including document's own sections, recursively,
    * with a cycle guard. Relative include paths resolve against the
    * INCLUDING file's directory (flb_cf_yaml's rule — the fixture
    * corpus's `test/nested.yaml` includes its sibling by bare name), so
    * the resolver always receives the joined path.
    */
  def load(text: String,
           resolveInclude: String => Option[String] = _ => None): Doc =
    loadRec(text, resolveInclude, Set.empty, Map.empty, "")

  private def loadRec(text: String, resolve: String => Option[String],
                      seen: Set[String], outerEnv: Map[String, String],
                      baseDir: String): Doc = {
    val root = Yaml.parse(text)
    // ONE global env table (flb_env): the including document's vars are
    // visible inside its includes, and an include's vars are visible to
    // the sections processed AFTER the include line (the reference's
    // fluent-bit.yaml fixture includes service.yaml for the
    // `observability` var its own customs section uses). Own/outer
    // definitions win over included ones.
    val envM = scala.collection.mutable.Map[String, String]()
    envM ++= outerEnv
    root.get("env").foreach {
      case YMap(es) => es.foreach { case (k, n) => n match {
        case YStr(v) => if (!envM.contains(k)) envM(k) = v
        case _       => ()
      } }
      case _ => ()
    }

    def interp(v: String): String = interpolate(v, envM.toMap)

    val sections = scala.collection.mutable.ArrayBuffer[ClassicConfig.Section]()
    val inputProcs = scala.collection.mutable.ArrayBuffer[Seq[ClassicConfig.Section]]()
    val outputProcs = scala.collection.mutable.ArrayBuffer[Seq[ClassicConfig.Section]]()
    var mlParsers = Map.empty[String, Seq[Multiline.Rule]]
    val service = scala.collection.mutable.Map[String, String]()
    val extras = scala.collection.mutable.Map[String, Node]()

    root.entries.foreach { case (key, node) =>
      key.toLowerCase match {
        case "env" => () // handled above
        case "service" => node match {
          case m: YMap => m.entries.foreach {
            case (k, YStr(v)) => service(k.toLowerCase) = interp(v)
            case _            => ()
          }
          case _ => ()
        }
        case "pipeline" => node match {
          case p: YMap =>
            p.entries.foreach { case (sub, plugins) =>
              val secName = sub.toLowerCase match {
                case "inputs"  => "INPUT"
                case "filters" => "FILTER"
                case "outputs" => "OUTPUT"
                case other => throw new IllegalArgumentException(
                  s"yaml: pipeline.$other is not inputs/filters/outputs")
              }
              asSeq(plugins).foreach { item =>
                val m = asMap(item, s"pipeline.$sub entry")
                val procs = m.get("processors")
                val props = flatten(m, interp,
                  skip = Set("processors"))
                sections += ClassicConfig.Section(secName, props)
                if (secName == "INPUT")
                  inputProcs += procs.map(processorSections(_, interp))
                    .getOrElse(Nil)
                else if (secName == "OUTPUT")
                  // output processors run on THIS output's routed frame
                  // (flb attaches them to the output instance)
                  outputProcs += procs.map(processorSections(_, interp))
                    .getOrElse(Nil)
                else if (procs.isDefined)
                  throw new IllegalArgumentException(
                    "yaml: processors on a filter are not part of the format")
              }
            }
          case _ => throw new IllegalArgumentException(
            "yaml: 'pipeline' must be a mapping")
        }
        case "parsers" =>
          asSeq(node).foreach { item =>
            sections += ClassicConfig.Section("PARSER",
              flatten(asMap(item, "parsers entry"), interp))
          }
        case "multiline_parsers" =>
          asSeq(node).foreach { item =>
            val m = asMap(item, "multiline_parsers entry")
            val name = m.str("name").getOrElse(throw new IllegalArgumentException(
              "yaml: multiline_parsers entry missing 'name'"))
            val rules = m.seq("rules").map { r =>
              val rm = asMap(r, "multiline rule")
              def req(k: String) = rm.str(k).getOrElse(
                throw new IllegalArgumentException(
                  s"yaml: multiline rule missing '$k'"))
              // the reference's canonical initial state is
              // "start_state"; our engine's is "start"
              val from = req("state") match {
                case "start_state" => "start"
                case other         => other
              }
              val to = req("next_state") match {
                case "start_state" => "start"
                case other         => other
              }
              Multiline.Rule(Set(from), stripSlashes(interp(req("regex"))), to)
            }
            mlParsers += name -> rules
          }
        case "stream_processor" =>
          asSeq(node).foreach { item =>
            val m = asMap(item, "stream_processor entry")
            sections += ClassicConfig.Section("STREAM_TASK", flatten(m, interp))
          }
        case "includes" =>
          asSeq(node).foreach {
            case YStr(path) =>
              val rel = interp(path)
              val p = if (baseDir.isEmpty || rel.startsWith("/")) rel
                      else s"$baseDir/$rel"
              if (seen.contains(p)) throw new IllegalArgumentException(
                s"yaml: include cycle at '$p'")
              val body = resolve(p).getOrElse(
                throw new IllegalArgumentException(
                  s"yaml: include '$p' not resolvable"))
              val subDir = p.lastIndexOf('/') match {
                case -1 => ""
                case i  => p.substring(0, i)
              }
              val sub = loadRec(body, resolve, seen + p, envM.toMap, subDir)
              sections ++= sub.sections
              inputProcs ++= sub.inputProcessors
              outputProcs ++= sub.outputProcessors
              mlParsers ++= sub.mlParsers
              sub.env.foreach { case (k, v) =>
                if (!envM.contains(k)) envM(k) = v
              }
              service ++= sub.service
              extras ++= sub.extras
            case other => throw new IllegalArgumentException(
              s"yaml: includes entries must be paths, got $other")
          }
        case "customs" | "plugins" | "upstream_servers" | "extensions" =>
          // parsed and retained (a caller can inspect them) but they
          // carry no query semantics in this engine
          extras(key.toLowerCase) = node
        case _ =>
          // unknown top-level sections (e.g. the fixture corpus's
          // custom_info) are retained like flb_cf's "other" sections
          extras(key.toLowerCase) = node
      }
    }

    Doc(sections.toSeq, inputProcs.toSeq, outputProcs.toSeq, mlParsers,
      envM.toMap, service.toMap, extras.toMap)
  }

  /** Parse, translate and assemble in one step — the YAML mirror of
    * [[ClassicConfig.assemble]].
    */
  def assemble(spark: SparkSession, text: String,
               streams: Map[String, DataFrame] = Map.empty,
               resolveInclude: String => Option[String] = _ => None): Map[String, DataFrame] = {
    val doc = load(text, resolveInclude)
    ClassicConfig.assembleSections(spark, doc.sections, streams,
      doc.mlParsers, doc.inputProcessors, doc.outputProcessors)
  }

  // ------------------------------------------------------------ helpers

  private def asSeq(n: Node): Vector[Node] = n match {
    case YSeq(items) => items
    case other       => Vector(other)
  }

  private def asMap(n: Node, what: String): YMap = n match {
    case m: YMap => m
    case other   => throw new IllegalArgumentException(
      s"yaml: $what must be a mapping, got $other")
  }

  /** A plugin's `processors:` value → ordered pseudo-FILTER sections.
    * Only the `logs` channel has query semantics here; `metrics` and
    * `traces` (flb_cf_yaml:2567-2575 accepts all three) are accepted
    * and DROPPED — they configure telemetry-signal paths this engine
    * models elsewhere. Any other channel name is an error, not a silent
    * drop (a typo like `log:` must not vanish).
    */
  private def processorSections(n: Node, interp: String => String): Seq[ClassicConfig.Section] =
    n match {
      case m: YMap =>
        m.entries.collectFirst {
          case (k, _) if !Set("logs", "metrics", "traces")
            .contains(k.toLowerCase) =>
            throw new IllegalArgumentException(
              s"yaml: unknown processors channel '$k' (logs/metrics/traces)")
        }
        m.seq("logs").toSeq.map(item =>
          ClassicConfig.Section("FILTER",
            flatten(asMap(item, "processor entry"), interp)))
      case _ => Nil
    }

  /** Flatten one plugin/parser mapping into classic `key value` props:
    * scalars directly, scalar-sequences as repeated keys, nested maps
    * dotted. Sequences of maps (unsupported as plugin properties) error
    * rather than silently drop.
    */
  private def flatten(m: YMap, interp: String => String,
                      skip: Set[String] = Set.empty,
                      prefix: String = ""): Seq[(String, String)] =
    m.entries.filterNot { case (k, _) => skip.contains(k.toLowerCase) }
      .flatMap {
        case (k, YStr(v))    => Seq((prefix + k) -> interp(v))
        case (k, YSeq(items)) => items.map {
          case YStr(v) => (prefix + k) -> interp(v)
          case other   => throw new IllegalArgumentException(
            s"yaml: property '$k' has a non-scalar list item: $other")
        }
        case (k, sub: YMap)  => flatten(sub, interp, Set.empty, prefix + k + ".")
      }

  /** `${VAR}` interpolation: config env → process env → empty (the
    * reference's flb_env translate order and its undefined-variable
    * behavior), plus bash-style defaults `${VAR:-word}` — if unset OR
    * empty, expand `word` (flb_env.c:315-316, 368-374: the separator is
    * the FIRST ':' and only when followed by '-'; a config-env hit that
    * is empty still falls back to the default; a process-env hit must be
    * non-empty to count at all, flb_env.c:304-306).
    */
  private[graft] def interpolate(v: String, env: Map[String, String]): String = {
    if (!v.contains("${")) return v
    val out = new StringBuilder
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == '$' && i + 1 < v.length && v.charAt(i + 1) == '{') {
        val end = v.indexOf('}', i + 2)
        if (end < 0) { out.append(v.substring(i)); i = v.length }
        else {
          val body = v.substring(i + 2, end)
          val ci = body.indexOf(':')
          val (name, defOpt) =
            if (ci >= 0 && ci + 1 < body.length && body.charAt(ci + 1) == '-')
              (body.take(ci), Some(body.substring(ci + 2)))
            else (body, None)
          val resolved =
            env.get(name).orElse(sys.env.get(name).filter(_.nonEmpty))
          out.append(resolved match {
            case Some(value) if value.isEmpty && defOpt.isDefined => defOpt.get
            case Some(value)                                      => value
            case None => defOpt.getOrElse("")
          })
          i = end + 1
        }
      } else { out.append(v.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** One node of an `upstream_servers` group — out_forward's HA target
    * (`src/flb_upstream_ha.c`; YAML shape per the reference fixture
    * `tests/internal/data/config_format/yaml/upstream.yaml`: groups
    * carry `name` + `nodes`, each node `name`/`host`/`port` plus
    * arbitrary per-node properties like `shared_key`/`tls`).
    */
  final case class UpstreamNode(name: String, host: String, port: Int,
                                props: Map[String, String])

  /** Typed view of the retained `upstream_servers` section: group name
    * → node list, every scalar env-interpolated. Feeds
    * `graft.sinks.ForwardSink.writeHa` (round-robin + failover — the
    * reference's flb_upstream_ha_node_get rotation).
    */
  def upstreams(doc: Doc): Map[String, Seq[UpstreamNode]] =
    doc.extras.get("upstream_servers") match {
      case Some(Yaml.YSeq(groups)) => groups.collect {
        case g: Yaml.YMap =>
          val gname = g.str("name")
            .map(interpolate(_, doc.env)).getOrElse("")
          val nodes = g.seq("nodes").collect {
            case n: Yaml.YMap =>
              val props = n.entries.collect {
                case (k, Yaml.YStr(v)) =>
                  k.toLowerCase -> interpolate(v, doc.env)
              }.toMap
              // name/host/port REQUIRED — create_node rejects an
              // incomplete node (flb_upstream_ha.c:141-170); a typo'd
              // node must fail at config load, not be silently skipped
              // by delivery-time failover (ADVICE r15, both frontends)
              def req(k: String): String = props.getOrElse(k,
                throw new IllegalArgumentException(
                  s"upstream_servers node missing '$k'"))
              UpstreamNode(req("name"), req("host"), req("port").trim.toInt,
                props -- Seq("name", "host", "port"))
          }
          gname -> (nodes: Seq[UpstreamNode])
      }.toMap
      case _ => Map.empty
    }

  /** The reference wraps multiline regexes in `/.../` — strip one layer. */
  private def stripSlashes(s: String): String =
    if (s.length >= 2 && s.head == '/' && s.last == '/')
      s.substring(1, s.length - 1)
    else s
}
