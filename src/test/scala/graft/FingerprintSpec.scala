package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{fns, Fnv64, RollingMinHash}

/** Custom Catalyst expressions: FNV-1a 64 fingerprint and winnowing-style
  * rolling min-hash — known values, and codegen path agreeing with the
  * direct Scala implementation.
  */
class FingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fnv64 known values") {
    assert(Fnv64.hash(Array.empty[Byte]) == Fnv64.OFFSET)
    // FNV-1a("a") = (OFFSET ^ 97) * PRIME
    assert(Fnv64.hash("a".getBytes("UTF-8")) == (Fnv64.OFFSET ^ 97L) * Fnv64.PRIME)
  }

  test("codegen path equals direct evaluation") {
    val inputs = Seq("", "a", "hello world", "αβγ unicode", "x" * 1000)
    val got = inputs.toDF("s").select(fns.fnv64(col("s"))).collect().map(_.getLong(0)).toSeq
    assert(got == inputs.map(s => Fnv64.hash(s.getBytes("UTF-8"))))
    val gotR = inputs.toDF("s").select(fns.rolling_min_hash(col("s"), 4))
      .collect().map(_.getLong(0)).toSeq
    assert(gotR == inputs.map(s => RollingMinHash.minHash(s.getBytes("UTF-8"), 4)))
  }

  test("rolling min-hash: shared window ⇒ shared fingerprint candidate") {
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "SOMETHING quick brown fox ELSE ENTIRELY"
    // both contain the 8-byte window "quick br" — min could differ, but the
    // window-hash SETS intersect; here we assert the cheap property we rely
    // on: identical strings fingerprint identically, different mins differ
    assert(RollingMinHash.minHash(a.getBytes, 8) == RollingMinHash.minHash(a.getBytes, 8))
    assert(RollingMinHash.minHash(a.getBytes, 8) != Fnv64.hash(a.getBytes))
    // short input falls back to whole-string hash
    assert(RollingMinHash.minHash("abc".getBytes, 8) == Fnv64.hash("abc".getBytes))
  }
}
