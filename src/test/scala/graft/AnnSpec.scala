package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Scale-parameterization contract for the ANN operators: the IVF coarse
  * quantizer must stay FIXED-k however large the corpus grows (a bounded
  * broadcast side), and the LSH width must grow with corpus size so bucket
  * occupancy — and with it the bucketed self-join — stays bounded.
  */
class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("IVF coarse quantizer is bounded: k rows whatever the corpus size") {
    def corpus(n: Int) = (0 until n)
      .map(i => (i.toLong, Array.fill(4)(i.toFloat), 1.0))
      .toDF("vec_id", "embedding", "nrm")
    assert(VectorOps.centroids(corpus(100)).count() == 16)
    assert(VectorOps.centroids(corpus(5000)).count() == 16)
    assert(VectorOps.centroids(corpus(5000), k = 64).count() == 64)
    // deterministic: same corpus → same centroid ids
    val a = VectorOps.centroids(corpus(1000)).select("cid").collect().map(_.getLong(0)).toSet
    val b = VectorOps.centroids(corpus(1000)).select("cid").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("LSH width grows with corpus size (bounded expected bucket occupancy)") {
    assert(VectorOps.nbitsFor(1000) == 8)            // floor = fixture width
    assert(VectorOps.nbitsFor(1L << 20) == 10)       // 1M / 1024 per bucket
    assert(VectorOps.nbitsFor(1L << 30) == 20)
    assert(VectorOps.nbitsFor(1000L * 1000 * 1000 * 1000) >= 29) // 10^12 scale
    val widths = Seq(1L << 10, 1L << 15, 1L << 20, 1L << 30, 1L << 40)
      .map(VectorOps.nbitsFor(_))
    assert(widths == widths.sorted, "nbits must be monotone in corpus size")
    assert(VectorOps.nbitsFor(Long.MaxValue) == 30, "bucket id must stay a valid Int")
  }

  test("bucket() honors the configured width (distinct ids exceed 8-bit range)") {
    val vecs = (0 until 64)
      .map(i => Array.tabulate(64)(d => math.sin(i * 31 + d * 7).toFloat))
      .toDF("embedding")
    val wide = vecs.select(VectorOps.bucket(col("embedding"), 16).as("b"))
      .agg(max("b")).head.getInt(0)
    assert(wide > 255, "16-bit bucket ids should exceed the 8-bit range")
  }
}
