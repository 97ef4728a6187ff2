package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.source.CsvStrictSource

/** Golden-fixture CSV contract (reference:
  * src/Shipwright.Test/Dataflows/Sources/CsvSourceTests/ReaderTests.cs).
  */
class CsvSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "src/test/resources/csv"

  test("ValidFile: 4 records, quoted quote preserved, blank/whitespace → null, positions 2-5") {
    val r = CsvStrictSource.read(spark, s"$dir/ValidFile.csv")
    assert(r.events.isEmpty)
    val rows = r.df.orderBy("pos").collect()
    assert(rows.length == 4)
    assert(r.df.columns.toSeq == Seq("A", "B", "C", "pos"))
    assert(rows(0).toSeq == Seq("x", "y", "z", 2L))
    assert(rows(1).toSeq == Seq("1", "2", "\"3\"", 3L))
    assert(rows(2).toSeq == Seq("m", null, "n", 4L))  // whitespace → null
    assert(rows(3).toSeq == Seq("r", null, "t", 5L))  // blank → null
  }

  test("ValidFile headerless: fields Field_0..Field_2, 5 records incl. header row") {
    val r = CsvStrictSource.read(spark, s"$dir/ValidFile.csv", header = false)
    assert(r.events.isEmpty)
    assert(r.df.columns.toSeq == Seq("Field_0", "Field_1", "Field_2", "pos"))
    assert(r.df.count() == 5)
  }

  test("EmptyFile: zero records, no events") {
    val r = CsvStrictSource.read(spark, s"$dir/EmptyFile.csv")
    assert(r.events.isEmpty && r.df.count() == 0)
  }

  test("DuplicateHeader: zero records + critical stop event") {
    val r = CsvStrictSource.read(spark, s"$dir/DuplicateHeader.csv")
    assert(r.df.count() == 0)
    assert(r.events.size == 1 && r.events.head.stop)
    assert(r.events.head.description.startsWith("Duplicate header name"))
  }

  test("FieldCountChange: zero records + critical event; Skip=3 past bad row → 2 records") {
    val r = CsvStrictSource.read(spark, s"$dir/FieldCountChange.csv")
    assert(r.df.count() == 0)
    assert(r.events.head.description.startsWith("An inconsistent number of columns"))
    val skipped = CsvStrictSource.read(spark, s"$dir/FieldCountChange.csv", skip = 3)
    assert(skipped.events.isEmpty && skipped.df.count() == 2)
  }

  test("UnescapedQuote: zero records + critical stop event") {
    val r = CsvStrictSource.read(spark, s"$dir/UnescapedQuote.csv")
    assert(r.df.count() == 0)
    assert(r.events.head.description.startsWith("Unescaped quote found"))
  }

  test("missing file: zero records + could-not-find event") {
    val r = CsvStrictSource.read(spark, s"$dir/NoSuchFile.csv")
    assert(r.df.count() == 0 && r.fatal)
    assert(r.events.head.description.contains("Could not find file"))
  }
}
