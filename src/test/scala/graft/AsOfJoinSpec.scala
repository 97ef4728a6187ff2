package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.transform.AsOfJoin

object AsOfJoinSpec {
  case class L(k: String, ts: Timestamp, tag: String)
  case class R(k: String, ts: Timestamp, ord: Long, price: Double)
}

/** As-of join semantics: latest right row at-or-before each left row's
  * event time per key, deterministic tie-breaks, left-join nulls.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import AsOfJoinSpec._
  lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def run(left: Seq[L], right: Seq[R]): Set[(String, Long, Option[Long], Option[Double])] = {
    import spark.implicits._
    AsOfJoin.asof(left.toDF(), right.toDF(), key = "k",
        leftTs = "ts", rightTs = "ts", rightOrd = "ord",
        rightVals = Seq("ord", "price"))
      .collect().map { r =>
        (r.getAs[String]("k"), r.getAs[Timestamp]("ts").getTime / 1000L,
          Option(r.getAs[java.lang.Long]("asof_ord")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("asof_price")).map(_.toDouble))
      }.toSet
  }

  test("each left row gets the latest right row at-or-before its ts, per key") {
    val got = run(
      left = Seq(L("a", ts(5), "x"), L("a", ts(25), "y"), L("b", ts(10), "z")),
      right = Seq(R("a", ts(1), 1, 1.0), R("a", ts(10), 2, 2.0),
        R("a", ts(20), 3, 3.0), R("b", ts(30), 4, 4.0)))
    assert(got == Set(
      ("a", 5L, Some(1L), Some(1.0)),   // only r1 precedes
      ("a", 25L, Some(3L), Some(3.0)),  // r3 is the latest ≤ 25
      ("b", 10L, None, None)))          // b's only right row is later → nulls
  }

  test("right row at exactly the left ts is visible (<= semantics)") {
    val got = run(Seq(L("a", ts(10), "x")), Seq(R("a", ts(10), 7, 7.0)))
    assert(got == Set(("a", 10L, Some(7L), Some(7.0))))
  }

  test("equal right timestamps tie-break by greatest ord") {
    val got = run(Seq(L("a", ts(20), "x")),
      Seq(R("a", ts(10), 1, 1.0), R("a", ts(10), 9, 9.0), R("a", ts(10), 5, 5.0)))
    assert(got == Set(("a", 20L, Some(9L), Some(9.0))))
  }

  test("keys never touched by the right side keep all left rows with nulls") {
    val got = run(Seq(L("solo", ts(1), "x"), L("solo", ts(2), "y")), Seq.empty[R])
    assert(got == Set(("solo", 1L, None, None), ("solo", 2L, None, None)))
  }
}
