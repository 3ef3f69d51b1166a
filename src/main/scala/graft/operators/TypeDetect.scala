package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-type inference over string columns, the Spark-native re-expression
  * of the reference's per-cell `typedetect` (/root/reference/pybabe/types.py:8-49).
  *
  * The reference retypes each CELL independently (a column can end up
  * heterogeneous); Spark columns are homogeneous, so we decide per COLUMN:
  * one distributed aggregation pass counts, for every string column, how many
  * non-null cells match each of the reference's patterns (int, float, date,
  * datetime — types.py:8-14); a column is narrowed only when ALL its non-null
  * cells agree (least-upper-bound rules: all-int -> long; all-int-or-float ->
  * double; all-date -> date; all-date-or-datetime -> timestamp). This is the
  * documented semantic delta of SURVEY.md §7.3.
  *
  * Scale note: the detection pass is a single `agg` over only the string
  * columns (column pruning reaches the parquet scan), and the cast pass is
  * pure codegen'd expressions — no UDFs, no driver loops.
  */
object TypeDetect {

  // Reference patterns, types.py:8-14 (anchored full-match like `pattern.match(v)$`),
  // extended with the ISO forms the reference reaches via parse_date/parse_datetime
  // (timeparse.py:20-54: '/', '-', ',' all normalized to ' ').
  private val IntRe = "^-?[0-9]+$"
  private val FloatRe = "^-?[0-9]+\\.[0-9]+$"
  private val DateRe = "^\\d{2,4}[-/ ]\\d{1,2}[-/ ]\\d{1,2}$"
  private val DateTimeRe = "^\\d{2,4}[-/ ]\\d{1,2}[-/ ]\\d{1,2}[ T]\\d{1,2}:\\d{2}(:\\d{2})?(\\.\\d+)?$"

  /** Dates arrive as either year-first or day-first (reference
    * date_formats = ['%Y %m %d', '%d %m %Y'], timeparse.py:10); year-first
    * wins on ambiguity ("by order of precedence").
    */
  private def parseDateCol(c: Column): Column = {
    // translate == regexp_replace("[/,]","-") for single chars, minus the
    // per-row java.util.regex cost
    val norm = translate(c, "/,", "--")
    coalesce(
      try_to_timestamp(norm, lit("yyyy-M-d")).cast(DateType),
      try_to_timestamp(norm, lit("d-M-yyyy")).cast(DateType))
  }

  private def parseDateTimeCol(c: Column): Column = {
    val norm = translate(c, "/,T", "-- ")
    coalesce(
      try_to_timestamp(norm, lit("yyyy-M-d H:mm:ss")),
      try_to_timestamp(norm, lit("yyyy-M-d H:mm")),
      try_to_timestamp(norm, lit("d-M-yyyy H:mm:ss")),
      try_to_timestamp(norm, lit("d-M-yyyy H:mm")))
  }

  /** Cast-pass variants with a native-cast fast arm. Only used AFTER a
    * column passed the stats gate (every value known formatter-parseable):
    * under that invariant, whenever the native string cast succeeds on a
    * gate-shaped dash-normalized value it yields the same y-M-d/timestamp
    * value as the formatter, and layouts it cannot read (d-M-yyyy) fall
    * through to the formatter arms. Not safe as the GATE itself — the native
    * cast accepts shapes the formatter rejects.
    */
  private def castDateCol(c: Column): Column =
    coalesce(translate(c, "/,", "--").try_cast(DateType), parseDateCol(c))

  private def castDateTimeCol(c: Column): Column =
    coalesce(translate(c, "/,T", "-- ").try_cast(TimestampType), parseDateTimeCol(c))

  /** Returns `df` with every string column (or just `fields` if given)
    * narrowed to long/double/date/timestamp when all non-null values parse.
    */
  def apply(df: DataFrame, fields: Seq[String] = Nil): DataFrame = {
    val stringCols = df.schema.fields
      .filter(_.dataType == StringType).map(_.name)
      .filter(n => fields.isEmpty || fields.contains(n))
    if (stringCols.isEmpty) return df

    // Probe each value ONCE via the native shape kernel (one char-scan
    // replaces four java.util.regex matches — graft_type_probe, bit parity
    // with IntRe/FloatRe/DateRe/DateTimeRe asserted in ExpressionsSpec),
    // then aggregate the flags. Parse success (not just the shape) gates the
    // date/ts counts: a value like `99-99-99` passes the date SHAPE but
    // fails the cast, which would silently null out cells. The kernel's
    // KNOWN-VALID bits (16/32: full calendar check in the compiled scan)
    // prove the parse redundant for strict-ISO values — the common case —
    // so try_to_timestamp runs only on shape-matching values the kernel
    // could not certify (Or/And short-circuit).
    // The lazy parse arms are wrapped in CaseWhen OTHERWISE branches, not
    // Or/And right-hand sides: isDate's tree is referenced twice (its own
    // flag and inside isTs), and codegen subexpression elimination hoists
    // subtrees that occur under Or/And to EAGER per-row evaluation —
    // try_to_timestamp ran on every row of every column and cost q29 ~0.9 s
    // at sf0.1. CaseWhen branches are conditional positions: CSE leaves
    // them lazy, so the formatter runs only on shape-matching values the
    // compiled probe could not certify, as intended.
    val flagCols = stringCols.flatMap { n =>
      val c = col(n)
      val probe = graft.expressions.GraftFunctions.typeProbe(c)
      val isInt = probe.bitwiseAND(1) =!= 0
      val isDate = when(probe.bitwiseAND(4) === 0, lit(false))
        .when(probe.bitwiseAND(16) =!= 0, lit(true))
        .otherwise(parseDateCol(c).isNotNull)
      val isTs = isDate || when(probe.bitwiseAND(8) === 0, lit(false))
        .when(probe.bitwiseAND(32) =!= 0, lit(true))
        .otherwise(parseDateTimeCol(c).isNotNull)
      Seq(
        c.isNotNull.as(s"__nn_$n"),
        isInt.as(s"__int_$n"),
        (isInt || (probe.bitwiseAND(2) =!= 0)).as(s"__num_$n"),
        isDate.as(s"__date_$n"),
        isTs.as(s"__ts_$n"))
    }
    val flags = df.select(flagCols.toIndexedSeq: _*)
    val aggs = flags.columns.map(n => count(when(col(n), lit(1))).as(n)).toSeq
    val stats = flags.agg(aggs.head, aggs.tail: _*).collect()(0)
    def stat(kind: String, n: String): Long = stats.getAs[Long](s"__${kind}_$n")

    val casts: Seq[(String, Column)] = stringCols.toSeq.flatMap { n =>
      val nn = stat("nn", n)
      if (nn == 0) None
      else if (stat("int", n) == nn) Some(n -> col(n).cast(LongType))
      else if (stat("num", n) == nn) Some(n -> col(n).cast(DoubleType))
      else if (stat("date", n) == nn) Some(n -> castDateCol(col(n)))
      else if (stat("ts", n) == nn) Some(n -> castDateTimeCol(col(n)))
      else None
    }
    if (casts.isEmpty) df else df.withColumns(casts.toMap)
  }

  /** Primary-key inference (reference types.py:52-87): the first column whose
    * values are all distinct. Distributed: one agg of count + countDistinct
    * per candidate column; returns the leftmost all-distinct column.
    */
  /** Record the detected primary key in the column's StructField metadata
    * (SURVEY §1.2 mapping: header.primary_key → Metadata) so downstream
    * tools can read it off the schema.
    */
  def withPrimaryKeyMetadata(df: DataFrame): DataFrame =
    primaryKeyDetect(df) match {
      case None => df
      case Some(pk) =>
        val meta = new MetadataBuilder().putBoolean("graft.primaryKey", true).build()
        df.withColumn(pk, col(pk).as(pk, meta))
    }

  def primaryKeyDetect(df: DataFrame): Option[String] = {
    val cols = df.columns
    if (cols.isEmpty) return None
    // Two-phase: approx_count_distinct (one cheap HLL pass over all columns)
    // prunes columns that cannot be all-distinct; the exact count_distinct —
    // the expensive shuffle-heavy aggregate — runs only on the survivors
    // (typically one or two columns). HLL standard error is 5% at the
    // default precision, so the 0.8 cutoff never prunes a true key.
    val approxAggs = count(lit(1)).as("__n") +:
      cols.map(c => approx_count_distinct(col(c)).as(s"__a_$c")).toSeq
    val a = df.agg(approxAggs.head, approxAggs.tail: _*).collect()(0)
    val n = a.getAs[Long]("__n")
    val candidates = cols.filter(c => a.getAs[Long](s"__a_$c") >= (n * 0.8).toLong)
    if (candidates.isEmpty) return None
    val exactAggs = candidates.map(c => count_distinct(col(c)).as(s"__d_$c")).toSeq
    val r = df.agg(exactAggs.head, exactAggs.tail: _*).collect()(0)
    candidates.find(c => r.getAs[Long](s"__d_$c") == n)
  }
}
