package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.transform.Converters

/** Converter truth tables mirroring the reference's exhaustive
  * convertible/inconvertible case classes (reference tests:
  * src/Shipwright.Test/Dataflows/Transformations/ConversionTests/
  * BooleanTests.cs:20-47, DateTimeTests.cs:48-62,
  * SocialSecurityNumberTests.cs:25-54, DecimalTests.cs, UpperCaseTests.cs).
  */
class ConvertersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                  inputs: Seq[String]): Seq[Any] =
    inputs.toDF("v").select(fn(col("v"))).collect().map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq

  test("boolean token table: true variants") {
    val in = Seq("true", "True", "TRUE", "yes", "YES", "y", "Y", "1", " true ")
    assert(run(Converters.toBoolean, in).forall(_ == true))
  }

  test("boolean token table: false variants") {
    val in = Seq("false", "False", "FALSE", "no", "NO", "n", "N", "0")
    assert(run(Converters.toBoolean, in).forall(_ == false))
  }

  test("boolean: inconvertible → null (random text, guid, whitespace, numerics beyond 0/1)") {
    val in = Seq("nope", "4c2b7e3a-1111-2222-3333-444455556666", "   ", "2", "-1", "t", "f")
    assert(run(Converters.toBoolean, in).forall(_ == null))
  }

  test("datetime: acceptance table (DateTimeTests.cs:48-62 + TryParse en-US breadth)") {
    val cases: Seq[(String, String)] = Seq(
      "2018-01-02 03:04:05"         -> "2018-01-02 03:04:05",
      "Jan  2, 2018 12:30 AM"       -> "2018-01-02 00:30:00",
      "2018-01-02T03:04:05.0000000" -> "2018-01-02 03:04:05",
      "1/2/2018"                    -> "2018-01-02 00:00:00",
      // TryParse lenient en-US shapes beyond the reference's fixture
      "2 Jan 2018"                  -> "2018-01-02 00:00:00",
      "2 January 2018"              -> "2018-01-02 00:00:00",
      "January 2, 2018"             -> "2018-01-02 00:00:00",
      "January 2, 2018 3:04 PM"     -> "2018-01-02 15:04:00",
      "Jan 2 2018"                  -> "2018-01-02 00:00:00",
      "2018/1/2"                    -> "2018-01-02 00:00:00",
      "2018-1-2"                    -> "2018-01-02 00:00:00",
      "1-2-2018"                    -> "2018-01-02 00:00:00",
      "1/2/2018 3:04:05 PM"         -> "2018-01-02 15:04:05",
      "1/2/2018 15:04:05"           -> "2018-01-02 15:04:05",
      "2 Jan 2018 12:30 AM"         -> "2018-01-02 00:30:00")
    val got = run(Converters.toDateTime, cases.map(_._1))
    cases.zip(got).foreach { case ((in, want), actual) =>
      assert(actual == Timestamp.valueOf(want), s"for input [$in]")
    }
  }

  test("datetime: rejection table (long max/min, guid, whitespace, digit-only, time-only)") {
    val in = Seq(Long.MaxValue.toString, Long.MinValue.toString, "not a date",
      "4c2b7e3a-1111-2222-3333-444455556666", "   ", "",
      "2018", "20180102", // digit-only: TryParse fails both
      "03:04:05")         // time-only: deliberate deviation ("today" is nondeterministic)
    val got = run(Converters.toDateTime, in)
    in.zip(got).foreach { case (i, v) => assert(v == null, s"for input [$i]") }
  }

  test("date truncates to midnight") {
    val got = run(Converters.toDate, Seq("2018-01-02 03:04:05"))
    assert(got == Seq(java.sql.Date.valueOf("2018-01-02")))
  }

  test("ssn: 9 digits formats, separators stripped, wrong lengths fail") {
    val got = run(Converters.toSsn,
      Seq("123456789", "123-45-6789", "98-7654321",               // SSN tests :41-47
        "12345678", "123-456-7890", "ABCDEFGHI",                  // SSN tests :28-31
        "1234567890", "abcdefghi"))
    assert(got == Seq("123-45-6789", "123-45-6789", "987-65-4321",
      null, null, null, null, null))
  }

  test("decimal: plain, negative, thousands-grouped; malformed fails") {
    val got = run(Converters.toDecimal,
      Seq("123.45", "-0.5", "1,234.56", ".5", "abc", "1,2,3"))
    assert(got.map(v => if (v == null) null else v.toString) == Seq(
      "123.450000000000000000", "-0.500000000000000000", "1234.560000000000000000",
      "0.500000000000000000", null, null))
  }

  test("decimal: reference parsing table (DecimalTests.cs:60-65) + rejection cases") {
    val cases = Seq(
      "123456789"    -> "123456789",
      "987,654,321"  -> "987654321",
      "1,234,567.89" -> "1234567.89",
      "98,765.4321"  -> "98765.4321")
    val got = run(Converters.toDecimal, cases.map(_._1))
    cases.zip(got).foreach { case ((in, want), v) =>
      assert(v != null && BigDecimal(v.toString) == BigDecimal(want), s"for input [$in]")
    }
    // inconvertible: guid, whitespace, double overflow text (>38 digits)
    val bad = run(Converters.toDecimal, Seq(
      "4c2b7e3a-1111-2222-3333-444455556666", "   ", "",
      "1" + "0" * 40))
    bad.foreach(v => assert(v == null))
  }

  test("upper") {
    assert(run(Converters.toUpperCase, Seq("abc", "aBc")) == Seq("ABC", "ABC"))
  }
}
