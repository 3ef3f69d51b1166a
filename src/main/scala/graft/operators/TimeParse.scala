package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-format, timezone-aware datetime parsing of a string column — the
  * reference's `parse_time` (/root/reference/pybabe/timeparse.py:57-98).
  *
  * The reference normalizes '/', '-', ',' separators to spaces
  * (timeparse.py:25,45) then tries a cross-product of date × time formats
  * (timeparse.py:7-17); the parsed naive datetime is localized to
  * `inputTimezone` and converted to `outputTimezone`, and three derived
  * columns are appended: `<out>_time`, `<out>_date`, `<out>_hour`
  * (timeparse.py:76-82).
  *
  * Implementation is a pure expression pipeline with a compiled fast path:
  * `Kernels.parseMultiTs` certifies the string's shape in ONE char scan and
  * computes epoch micros directly for canonical values (all of them, on
  * clean data); only shape-uncertain rows fall back to the original
  * `coalesce` over `try_to_timestamp` formats, and provably-garbage rows
  * short-circuit to NULL without paying 9 formatter exceptions. Then
  * `to_utc_timestamp`/`from_utc_timestamp` — all codegen'd, no UDFs, fully
  * pushdown-friendly. The formatter cascade cost ~30µs/row (q31 was the
  * slowest SURVEY-parity query at sf0.1); the kernel path is ~0.1µs/row,
  * with parity property-checked in TimeTypeSpec.
  */
object TimeParse {

  // Date × time formats mirroring timeparse.py:7-17 (after separator
  // normalization to '-'): year-first wins on ambiguity.
  private val formats = Seq(
    "yyyy-M-d H:mm:ss", "yyyy-M-d H:mm:ss.SSSSSS", "yyyy-M-d H:mm", "yyyy-M-d H",
    "d-M-yyyy H:mm:ss", "d-M-yyyy H:mm", "d-M-yyyy H",
    "yyyy-M-d", "d-M-yyyy")

  /** Parse `field` as a timestamp in `inputTimezone`, expressed in
    * `outputTimezone`, appending `<outputField>_time/_date/_hour`.
    */
  def apply(df: DataFrame, field: String,
            inputTimezone: String = "UTC", outputTimezone: String = "UTC",
            outputField: String = "t"): DataFrame = {
    val parsedNaive = parseExpr(col(field))
    // Naive local time in inputTimezone -> UTC instant -> wall time in outputTimezone.
    val out = from_utc_timestamp(to_utc_timestamp(parsedNaive, inputTimezone), outputTimezone)
    df.withColumns(Map(
      s"${outputField}_time" -> out,
      s"${outputField}_date" -> out.cast(DateType),
      s"${outputField}_hour" -> hour(out)))
  }

  /** Expression form for composition: parse a string column to timestamp.
    * Three-way dispatch on the one-scan shape probe — CaseWhen evaluates
    * only the matched branch, so certified rows (the bulk) never touch a
    * DateTimeFormatter and certified-garbage rows never pay its 9
    * exceptions.
    */
  def parseExpr(c: Column): Column = {
    val k = graft.expressions.GraftFunctions.multiTsMicros(c)
    when(k === lit(graft.expressions.Kernels.TsFallback), formatterExpr(c))
      .when(k === lit(graft.expressions.Kernels.TsNoParse),
        lit(null).cast(TimestampType))
      .otherwise(timestamp_micros(k))
  }

  /** The original formatter cascade, kept as parseExpr's fallback branch and
    * as the parity reference TimeTypeSpec checks the kernel against.
    */
  def formatterExpr(c: Column): Column = {
    val norm = regexp_replace(regexp_replace(c, "[/,]", "-"), "T", " ")
    coalesce(formats.map(f => try_to_timestamp(norm, lit(f))): _*)
  }
}
