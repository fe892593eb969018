package graft.config

import org.apache.spark.sql.SparkSession

/** The `customs:` config section, wired (VERDICT r15 #6). In the
  * reference, customs are config-declared side-plugin instances — not
  * data-path operators but engine-lifecycle hooks (`src/flb_custom.c`:
  * `flb_custom_new` resolves the `name` property against the plugin
  * registry, `flb_custom_init` instantiates each declared instance with
  * its property map; the in-tree example is `custom_calyptia`, which
  * ships the agent's self-telemetry to a management plane).
  *
  * The Spark-native mapping: a name → factory registry. Built-ins cover
  * the reference's own use of the mechanism; callers register their own
  * factories the way flb links custom plugins. Declared instances
  * activate against a live [[SparkSession]] and return closeable
  * handles.
  *
  * Built-in customs:
  *   - `monitoring` — attaches a [[graft.obs.SelfTelemetry.Listener]]
  *     and serves it over [[graft.obs.MonitoringServer]] (`port`
  *     property, default 2020 = the reference's HTTP_SERVER default
  *     port, `include/fluent-bit/flb_config.h` HTTP_PORT). This is the
  *     custom_calyptia/self-telemetry shape: the engine's own metrics
  *     made externally consumable, declared in config.
  */
object Customs {

  /** One activated instance; `close()` detaches whatever it attached. */
  final case class Instance(kind: String, props: Map[String, String],
                            handle: AutoCloseable) extends AutoCloseable {
    override def close(): Unit = handle.close()
  }

  type Factory = (SparkSession, Map[String, String]) => AutoCloseable

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Factory]()

  /** Register a custom kind — the flb_custom plugin-registry analog.
    * Last registration wins (tests re-register).
    */
  def register(name: String, factory: Factory): Unit =
    registry.put(name.toLowerCase, factory): Unit

  /** Handle for the built-in `monitoring` custom: the bound port plus
    * teardown (server closed, listener detached).
    */
  final class MonitoringHandle private[config] (
      spark: SparkSession,
      listener: graft.obs.SelfTelemetry.Listener,
      server: graft.obs.MonitoringServer) extends AutoCloseable {
    def port: Int = server.port
    override def close(): Unit = {
      server.close()
      spark.streams.removeListener(listener)
    }
  }

  register("monitoring", (spark, props) => {
    val listener = new graft.obs.SelfTelemetry.Listener
    spark.streams.addListener(listener)
    val server = new graft.obs.MonitoringServer(spark, listener,
      props.get("port").map(_.trim.toInt).getOrElse(2020))
    new MonitoringHandle(spark, listener, server)
  })

  /** Typed view of the retained `customs:` section — list of
    * `(name, env-interpolated props)`, the YAML twin of the classic
    * `[CUSTOM]` section (reference fixture shape
    * `tests/internal/data/config_format/yaml/fluent-bit.yaml:7` and
    * `issue_7559.yaml`: a list of maps, each with `name` plus arbitrary
    * properties; even `name` may be `${env}`-valued, which is why every
    * property interpolates).
    */
  def declared(doc: YamlConfig.Doc): Seq[(String, Map[String, String])] =
    doc.extras.get("customs") match {
      case Some(Yaml.YSeq(items)) => items.collect {
        case m: Yaml.YMap =>
          val props = m.entries.collect {
            case (k, Yaml.YStr(v)) =>
              k.toLowerCase -> YamlConfig.interpolate(v, doc.env)
          }.toMap
          val name = props.getOrElse("name",
            throw new IllegalArgumentException(
              "customs entry missing 'name'"))
          name -> (props - "name")
      }
      case Some(other) => throw new IllegalArgumentException(
        s"customs: expected a list of maps, got $other")
      case None => Seq.empty
    }

  /** Instantiate every declared custom against the session — the
    * flb_custom_init loop. Unknown names fail loudly (the reference
    * errors out when the plugin registry has no match).
    */
  def activate(spark: SparkSession, doc: YamlConfig.Doc): Seq[Instance] =
    declared(doc).map { case (name, props) =>
      val f = registry.get(name.toLowerCase)
      if (f == null) {
        import scala.jdk.CollectionConverters._
        throw new IllegalArgumentException(
          s"custom '$name' is not registered (known: " +
            s"${registry.keySet().asScala.toSeq.sorted.mkString(", ")})")
      }
      Instance(name, props, f(spark, props))
    }
}
