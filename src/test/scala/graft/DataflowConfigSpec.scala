package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dsl.{ConfigLayer, DataflowConfig}

/** Config layering semantics (reference: ActionSettingsFactory.cs:24-76 and
  * the circular-parent fixtures under src/Shipwright.Test/Configurations/).
  */
class DataflowConfigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val layers = Map(
    "global" -> ConfigLayer("global", None, Map(
      "keys" -> "conv_id, turn_idx",
      "default.tool" -> "none",
      "replace.role.user" -> "human")),
    "tenantDefault" -> ConfigLayer("tenantDefault", Some("global"), Map(
      "default.tool" -> "unknown")), // overrides global
    "tenantAction" -> ConfigLayer("tenantAction", Some("tenantDefault"), Map(
      "replace.role.assistant" -> "ai")))

  test("nearest layer wins through the parent chain") {
    val s = DataflowConfig.resolve(layers, "tenantAction")
    assert(s("default.tool") == "unknown")
    assert(s("replace.role.user") == "human")
    assert(s("replace.role.assistant") == "ai")
    assert(s("keys") == "conv_id, turn_idx")
  }

  test("circular parent chains fail at build time") {
    val circular = Map(
      "a" -> ConfigLayer("a", Some("b"), Map.empty),
      "b" -> ConfigLayer("b", Some("a"), Map.empty))
    val e = intercept[IllegalArgumentException](DataflowConfig.resolve(circular, "a"))
    assert(e.getMessage.contains("Circular"))
    intercept[IllegalArgumentException](DataflowConfig.resolve(Map.empty, "missing"))
  }

  test("synthesized dataflow applies keys-Required, defaults, replacements in order") {
    val flow = DataflowConfig.build(layers, "tenantAction")
    assert(flow.keys == Seq("conv_id", "turn_idx"))
    val df = Seq(
      ("c1", 0, "user", null.asInstanceOf[String]),
      ("c1", 1, "assistant", "search"),
      (null.asInstanceOf[String], 2, "user", "x"))
      .toDF("conv_id", "turn_idx", "role", "tool")
    val out = flow.source(df).run()
    val rows = out.select("conv_id", "role", "tool").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows.contains(("c1", "human", "unknown")))     // default + replace applied
    assert(rows.contains(("c1", "ai", "search")))
    assert(rows.contains((null, "user", "x")))            // failed keys → frozen
  }
}
