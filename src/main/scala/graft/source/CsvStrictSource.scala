package graft.source

import java.io.{BufferedReader, InputStreamReader, Reader}
import java.nio.charset.StandardCharsets

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.model.LogEvent

/** Strict CSV scan reproducing the reference's CsvSource contract
  * (reference: src/Shipwright.Core/Dataflows/Sources/CsvSource.cs:19-213,
  * CsvHelper in `CsvMode.RFC4180` with `DetectColumnCountChanges`,
  * `TrimOptions.Trim`, strict `BadDataFound`):
  *
  *   - `skip` N raw lines pre-parse (CSV rules not yet active,
  *     CsvSource.cs:100-101)
  *   - header row → field names; blank header → `Field_{i}`; duplicate
  *     header names compared CASE-INSENSITIVELY (the dataflow
  *     FieldNameComparer default, CsvSource.cs:120-125) → fatal
  *   - headerless mode names fields `Field_0..`
  *   - RFC-4180 quoting: `""` escapes a quote, a quoted field may contain
  *     the delimiter and NEWLINES (multi-line records); a quote inside an
  *     unquoted field, characters after a closing quote, or EOF inside a
  *     quoted field are all fatal bad data (CsvSource.cs:69-72)
  *   - configurable delimiter / comment char / blank-line handling /
  *     quote char / escape char (CsvSource.cs:66-82; escape == quote
  *     gives the RFC `""` doubling, a distinct escape mirrors
  *     CsvConfiguration.Escape)
  *   - values trimmed; blank → null; column-count change / missing file →
  *     fatal; ALL-OR-NOTHING: any fatal error yields ZERO rows
  *
  * Spark-first realization: the driver reads only the first record (the
  * header) to fix the schema; the full file is parsed in EXECUTOR tasks
  * over `binaryFiles` (streaming reader — memory is bounded by one record,
  * never the file). The all-or-nothing contract is a distributed two-pass
  * preview, exactly the reference's preview pass (CsvSource.cs:179-187):
  * pass 1 streams the file for the first parse/shape error, pass 2 builds
  * the rows. Multi-line quoting makes byte-ranges unsplittable (the same
  * reason Spark's own `multiLine` CSV mode is one-task-per-file), so
  * parallelism is per-file; `pos` carries each record's starting line.
  */
object CsvStrictSource {

  case class Result(df: DataFrame, events: Seq[LogEvent]) {
    def fatal: Boolean = events.exists(_.stop)
  }

  /** One parsed record: starting raw line number + field values. */
  private type Rec = (Long, Vector[String])
  /** Parse error: raw line number + message. */
  private type Err = (Long, String)

  def read(spark: SparkSession, path: String, header: Boolean = true,
           skip: Int = 0, delimiter: Char = ',',
           allowComments: Boolean = false, comment: Char = '#',
           ignoreBlankLines: Boolean = true,
           quote: Char = '"', escape: Char = '\u0000',
           caseSensitiveFields: Boolean = false): Result = {
    // escape defaults to the quote char — RFC-4180 `""` doubling; pass a
    // distinct char (e.g. '\\') for CsvConfiguration.Escape-style escaping
    val esc = if (escape == '\u0000') quote else escape
    val file = new java.io.File(path)
    if (!file.exists())
      return Result(emptyDf(spark),
        Seq(LogEvent(stop = true, LogEvent.Critical, s"Could not find file", path)))
    try {
      // broken configurations surface as stop events via the NonFatal catch,
      // mirroring the reference's CsvConfiguration validation throw
      require(quote != delimiter, s"quote and delimiter are both '$quote'")
      require(comment != delimiter, s"comment and delimiter are both '$comment'")
      // ---- driver: parse ONLY the first record to fix names/width ----
      val first = {
        val r = new BufferedReader(new InputStreamReader(
          new java.io.FileInputStream(file), StandardCharsets.UTF_8))
        try {
          val p = new Rfc4180Parser(r, skip, delimiter, allowComments, comment,
            ignoreBlankLines, quote, esc)
          if (p.hasNext) Some(p.next()) else None
        } finally r.close()
      }
      first match {
        case None => return Result(emptyDf(spark), Nil) // empty / blank / all-skipped
        case Some(Left((line, msg))) =>
          return Result(emptyDf(spark),
            Seq(LogEvent(stop = true, LogEvent.Critical, s"$msg on line $line", path)))
        case Some(Right((_, firstFields))) =>
          val names =
            if (header) firstFields.zipWithIndex.map { case (h, i) =>
              if (h.trim.isEmpty) s"Field_$i" else h.trim
            }
            else firstFields.indices.map(i => s"Field_$i").toVector
          // duplicate headers are fatal, compared with the dataflow's
          // FieldNameComparer — case-INSENSITIVE by default (Dataflow.cs:38,
          // CsvSource.cs:120-125); a case-sensitive comparer (the
          // reference's Record.cs:45-46 allows one) makes `A,a` legal
          if (header) {
            val dups = names
              .groupBy(n => if (caseSensitiveFields) n else n.toUpperCase)
              .collect { case (_, g) if g.size > 1 => g.head }
            if (dups.nonEmpty)
              return Result(emptyDf(spark),
                Seq(LogEvent(stop = true, LogEvent.Critical,
                  s"Duplicate header name: ${dups.toSeq.sorted.mkString(", ")}", path)))
          }
          val width = names.size
          // RAW absolute path with an explicit scheme: Hadoop's Path(String)
          // quotes spaces/#/etc itself and does NOT decode %-escapes, so a
          // java.net.URI-encoded string would be looked up literally
          val filePath = "file:" + file.getAbsolutePath

          def parsedRecords(): org.apache.spark.rdd.RDD[Either[Err, Rec]] =
            spark.sparkContext.binaryFiles(filePath).flatMap {
              case (_, stream) =>
                val reader = new BufferedReader(new InputStreamReader(
                  stream.open(), StandardCharsets.UTF_8))
                // close on task completion, not iterator exhaustion — the
                // preview pass's collectFirst abandons the iterator at the
                // first error and would otherwise leak the open reader
                Option(org.apache.spark.TaskContext.get())
                  .foreach(_.addTaskCompletionListener[Unit](_ => reader.close()))
                val it = new Rfc4180Parser(reader, skip, delimiter,
                  allowComments, comment, ignoreBlankLines, quote, esc)
                if (header) it.drop(1) else it
            }

          // ---- pass 1 (preview): first parse/shape error, in file order ----
          val firstError = parsedRecords().mapPartitions { it =>
            it.collectFirst {
              case Left((line, msg)) => (line, msg)
              case Right((line, fs)) if fs.size != width =>
                (line, "An inconsistent number of columns was found")
            }.iterator
          }.collect().sortBy(_._1).headOption
          firstError match {
            case Some((line, msg)) =>
              return Result(emptyDf(spark),
                Seq(LogEvent(stop = true, LogEvent.Critical, s"$msg on line $line", path)))
            case None =>
          }

          // ---- pass 2: build rows (trim, blank → null, pos = start line) ----
          val rows = parsedRecords().map {
            case Right((line, fs)) =>
              Row.fromSeq(fs.map { v =>
                val t = v.trim
                if (t.isEmpty) null else t
              } :+ line)
            case Left(_) => throw new IllegalStateException(
              "parse error surfaced after clean preview pass")
          }
          val schema = StructType(
            names.map(n => StructField(n, StringType, nullable = true)) :+
              StructField("pos", LongType, nullable = false))
          Result(spark.createDataFrame(rows, schema), Nil)
      }
    } catch {
      case NonFatal(e) =>
        Result(emptyDf(spark),
          Seq(LogEvent(stop = true, LogEvent.Critical, e.getMessage, path)))
    }
  }

  private def emptyDf(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("pos", LongType, nullable = false))))
}

/** Streaming RFC-4180 record reader: pulls characters, never buffers more
  * than one record. Yields `Left((line, message))` on the first bad data
  * and stops. Quoted fields may span lines (line separators inside quotes
  * are normalized to '\n'); a doubled quote escapes a quote when
  * escape == quote (the RFC default); with a distinct escape char (the
  * reference's CsvConfiguration.Escape, CsvSource.cs:66-82) the escape
  * inside a quoted field escapes the quote char or itself. A quote in an
  * unquoted field, any character between a closing quote and the next
  * delimiter/EOL, or EOF inside quotes is fatal.
  */
private[source] final class Rfc4180Parser(
    in: Reader, skip: Int, delimiter: Char, allowComments: Boolean,
    comment: Char, ignoreBlankLines: Boolean,
    quote: Char = '"', escape: Char = '"')
    extends Iterator[Either[(Long, String), (Long, Vector[String])]] {

  private var line = 1L
  private var pushback = -2 // -2 = empty
  private var done = false
  private var nextRec: Either[(Long, String), (Long, Vector[String])] = _
  private var nextReady = false

  locally { // a UTF-8 BOM is transport framing, not data (CsvHelper strips it)
    if (peek() == 0xFEFF) readCh()
  }

  locally { // raw line skip: CSV rules not yet active (CsvSource.cs:100-101)
    var skipped = 0
    while (skipped < skip && !done) {
      readCh() match {
        case -1 => done = true
        case '\n' => skipped += 1; line += 1
        case '\r' =>
          peek() match { case '\n' => readCh(); case _ => }
          skipped += 1; line += 1
        case _ =>
      }
    }
  }

  private def readCh(): Int =
    if (pushback != -2) { val c = pushback; pushback = -2; c } else in.read()

  private def peek(): Int = {
    if (pushback == -2) pushback = in.read()
    pushback
  }

  /** Consume one EOL (\n, \r, or \r\n); caller saw the first char. */
  private def finishEol(first: Int): Unit = {
    if (first == '\r' && peek() == '\n') readCh()
    line += 1
  }

  def hasNext: Boolean = {
    if (nextReady) return true
    if (done) return false
    nextRec = readRecord()
    nextReady = nextRec != null
    if (!nextReady) done = true
    else if (nextRec.isLeft) done = true // stop at first bad data
    nextReady
  }

  def next(): Either[(Long, String), (Long, Vector[String])] = {
    if (!hasNext) throw new NoSuchElementException
    nextReady = false
    nextRec
  }

  /** null = clean EOF. */
  private def readRecord(): Either[(Long, String), (Long, Vector[String])] = {
    // skip comment lines and (if configured) blank lines before the record
    var scanning = true
    while (scanning) {
      peek() match {
        case -1 => return null
        case c if allowComments && c == comment =>
          var ch = readCh()
          while (ch != -1 && ch != '\n' && ch != '\r') ch = readCh()
          if (ch != -1) finishEol(ch)
        case '\n' | '\r' if ignoreBlankLines =>
          finishEol(readCh())
        case _ => scanning = false
      }
    }

    val startLine = line
    val fields = Vector.newBuilder[String]
    val cur = new StringBuilder
    // 0 = field start, 1 = unquoted, 2 = inside quotes, 3 = after closing quote
    var state = 0
    while (true) {
      val c = readCh()
      c match {
        case -1 =>
          if (state == 2)
            return Left((line, "Unescaped quote found"))
          fields += cur.result()
          return Right((startLine, fields.result()))
        case '\n' | '\r' =>
          if (state == 2) { cur.append('\n'); finishEol(c) } // quoted newline
          else {
            finishEol(c)
            fields += cur.result()
            return Right((startLine, fields.result()))
          }
        case d if d == delimiter && state != 2 =>
          fields += cur.result(); cur.clear(); state = 0
        case e if state == 2 && e == escape && escape != quote =>
          // distinct escape char: inside quotes it escapes the quote (and
          // itself); anything else keeps it literal
          if (peek() == quote || peek() == escape) cur.append(readCh().toChar)
          else cur.append(e.toChar)
        case q if q == quote =>
          state match {
            case 0 => state = 2
            case 2 =>
              if (escape == quote && peek() == quote) { readCh(); cur.append(quote) }
              else state = 3
            case _ => // quote in unquoted field, or after a closing quote
              return Left((line, "Unescaped quote found"))
          }
        case ch =>
          if (state == 3) // data after the closing quote is bad data
            return Left((line, "Unescaped quote found"))
          if (state == 2) cur.append(ch.toChar)
          else { cur.append(ch.toChar); state = 1 }
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
