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

  test("auto width keeps mean bucket occupancy bounded as the corpus grows") {
    // pseudo-random 64-dim vectors; 16× more data must NOT mean 16× fuller
    // buckets — nbitsFor widens the hash so the per-bucket self-join cost
    // (the quadratic term of the near-dup/ANN candidate join) stays bounded
    def mix(v0: Long): Long = { // splitmix64 finalizer — iid-uniform values
      var v = v0 + 0x9e3779b97f4a7c15L
      v = (v ^ (v >>> 30)) * 0xbf58476d1ce4e5b9L
      v = (v ^ (v >>> 27)) * 0x94d049bb133111ebL
      v ^ (v >>> 31)
    }
    def corpus(n: Int) = (0 until n).map(i =>
      (i.toLong, Array.tabulate(64)(d => ((mix(i * 64L + d) % 1000L) / 10.0f))))
      .toDF("vec_id", "embedding")
    val n = 1 << 14
    val c = corpus(n).cache()
    def meanOcc(nb: Int): Double =
      n.toDouble / c.select(VectorOps.bucket(col("embedding"), nb).as("b"))
        .distinct().count()
    val nbAuto = VectorOps.nbitsFor(n, targetPerBucket = 16)
    assert(nbAuto > 8, "width must grow past the fixture floor at this n")
    val (occAuto, occFixed) = (meanOcc(nbAuto), meanOcc(8))
    c.unpersist()
    assert(occAuto * 2 <= occFixed,
      s"auto width must at least halve fixed-width occupancy: $occAuto vs $occFixed")
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
