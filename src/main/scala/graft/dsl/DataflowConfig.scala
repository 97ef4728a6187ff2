package graft.dsl

/** Config-driven dataflow construction — the analog of the reference's
  * layered tenant configuration from which per-tenant `Replace` and
  * `DefaultValue` transformations are synthesized (reference:
  * src/Shipwright.Core/Dataflows/Dataflow.cs:165-202) and of the
  * global → tenant-default → action → parent-chain settings resolution with
  * cycle detection (reference:
  * src/Shipwright.Core/Actions/Internal/ActionSettingsFactory.cs:24-76).
  *
  * A layer is a named bag of string settings with an optional parent.
  * Recognized setting keys:
  *   - `default.<field>  = <value>`             → DefaultValue(field, value)
  *   - `replace.<field>.<incoming> = <outgoing>` → Replace(field, incoming→outgoing)
  *   - `keys = f1,f2`                            → Dataflow keys (Required prefix)
  */
case class ConfigLayer(name: String, parent: Option[String],
                       settings: Map[String, String])

object DataflowConfig {

  /** Merge the parent chain: nearest layer wins; cycles are a build-time
    * error (the reference detects circular parents the same way).
    */
  def resolve(layers: Map[String, ConfigLayer], leaf: String): Map[String, String] = {
    def chain(name: String, seen: Vector[String]): Vector[ConfigLayer] = {
      require(!seen.contains(name),
        s"Circular configuration parent chain: ${(seen :+ name).mkString(" -> ")}")
      val layer = layers.getOrElse(name,
        throw new IllegalArgumentException(s"Unknown configuration layer [$name]"))
      layer.parent.map(p => chain(p, seen :+ name)).getOrElse(Vector.empty) :+ layer
    }
    chain(leaf, Vector.empty).foldLeft(Map.empty[String, String])(_ ++ _.settings)
  }

  /** Synthesize the Dataflow from resolved settings, preserving the
    * reference's prefix order (keys-Required → defaults → replacements,
    * Dataflow.cs:213-219).
    */
  def toDataflow(name: String, settings: Map[String, String]): Dataflow = {
    val keys = settings.get("keys").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val defaults = settings.collect {
      case (k, v) if k.startsWith("default.") => k.stripPrefix("default.") -> (v: Any)
    }
    val replacements = settings.toSeq.collect {
      case (k, v) if k.startsWith("replace.") =>
        k.stripPrefix("replace.").split("\\.", 2) match {
          case Array(field, incoming) => (field, incoming, v)
        }
    }.groupBy(_._1).map { case (f, rs) => f -> rs.map(r => r._2 -> r._3).toMap }
    Dataflow(name, keys = keys, defaults = defaults, replacements = replacements)
  }

  def build(layers: Map[String, ConfigLayer], leaf: String): Dataflow =
    toDataflow(leaf, resolve(layers, leaf))
}
