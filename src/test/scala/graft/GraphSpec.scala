package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphOps

/** Connected components (duplicate-cluster assignment): fixtures exercise
  * singletons, transitive chains, merged stars, and a diameter large enough
  * that only logarithmic (pointer-jumped) convergence fits in maxIters.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.connectedComponents(nodes.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("singletons, self-loops, duplicate and reversed edges") {
    val got = cc(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((2L, 3L), (3L, 2L), (3L, 3L), (2L, 3L), (5L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 4L, 5L -> 4L))
  }

  test("two stars joined by a bridge collapse to one component") {
    // star at 10 (leaves 11-13), star at 20 (leaves 21-23), bridge 13-21
    val nodes = Seq(10L, 11L, 12L, 13L, 20L, 21L, 22L, 23L)
    val edges = Seq((10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (20L, 22L), (20L, 23L), (13L, 21L))
    assert(cc(nodes, edges) == nodes.map(_ -> 10L).toMap)
  }

  test("long path (diameter 63) converges inside maxIters — pointer jumping works") {
    // plain min-propagation shortens a path by O(1) per round and would
    // need 63 rounds; with path doubling the loop must finish well under
    // the default maxIters=20 or the require() in connectedComponents fires
    val nodes = (0L to 63L).toSeq
    val edges = nodes.sliding(2).map(p => (p(1), p(0))).toSeq
    assert(cc(nodes, edges) == nodes.map(_ -> 0L).toMap)
  }
}
