package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's `group` / `group_all` surface
  * (/root/reference/pybabe/group.py:35-112) re-expressed Spark-first.
  *
  * The reference sorts the whole stream on the key and pushes sorted runs
  * through a `Reducer` protocol (begin_group / row / end_group,
  * group.py:5-25). Spark needs no sort: expressible reducers compile to
  * `groupBy().agg()` (partial + final hash aggregation, map-side combine —
  * the 100 TB shape), and the fully-general "reducer returns zero or more
  * rows per group" form compiles to `groupByKey().flatMapGroups`. Reusable
  * typed reducers are `Aggregator[IN,BUF,OUT]` — a near-1:1 of the Reducer
  * protocol (`zero` ≈ begin_group, `reduce` ≈ row, `finish` ≈ end_group).
  */
object Grouping {

  /** Fast path: group on key columns with named Catalyst aggregates —
    * `group(key=k, reducer=sum)` (reference group.py:35-86) and every
    * aggregate the reference's tests use. Map-side partial aggregation for
    * free; shuffle width = key cardinality, not input size.
    */
  def group(df: DataFrame, keys: Seq[String], aggs: (String, Column)*): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      aggs.head._2.as(aggs.head._1),
      aggs.tail.map { case (n, c) => c.as(n) }: _*)

  /** `group_all` (reference group.py:89-112): one global group. */
  def groupAll(df: DataFrame, aggs: (String, Column)*): DataFrame =
    df.agg(
      aggs.head._2.as(aggs.head._1),
      aggs.tail.map { case (n, c) => c.as(n) }: _*)

  /** General path: an arbitrary reducer emitting zero or more output rows per
    * group — the exact semantic of the reference's list-returning Reducer
    * (group.py:68-81). `outSchema` declares the reducer's output row shape.
    *
    * Scale note: rows of one group are streamed to one task (same contract as
    * the reference's sorted-run streaming); the shuffle is on the key alone.
    */
  def groupReduce(df: DataFrame, keys: Seq[String], outSchema: StructType)
                 (reducer: (Row, Iterator[Row]) => IterableOnce[Row]): DataFrame = {
    val keyEnc: Encoder[Row] = Encoders.row(StructType(keys.map(k => df.schema(k))))
    val outEnc: Encoder[Row] = Encoders.row(outSchema)
    df.groupByKey(row => Row.fromSeq(keys.map(k => row.get(row.fieldIndex(k)))))(keyEnc)
      .flatMapGroups((k: Row, it: Iterator[Row]) => reducer(k, it).iterator)(outEnc)
  }

  /** A reusable typed reducer mirroring the Reducer protocol as an
    * `Aggregator`: `zero` = begin_group, `step` = row, `finish` = end_group.
    * Register with `udaf(...)` or use via `.agg(r.toColumn)`.
    */
  def reducer[IN, BUF: Encoder, OUT: Encoder](zeroV: BUF, step: (BUF, IN) => BUF,
                                              mergeV: (BUF, BUF) => BUF,
                                              finishV: BUF => OUT): Aggregator[IN, BUF, OUT] =
    new Aggregator[IN, BUF, OUT] {
      def zero: BUF = zeroV
      def reduce(b: BUF, a: IN): BUF = step(b, a)
      def merge(a: BUF, b: BUF): BUF = mergeV(a, b)
      def finish(b: BUF): OUT = finishV(b)
      def bufferEncoder: Encoder[BUF] = implicitly[Encoder[BUF]]
      def outputEncoder: Encoder[OUT] = implicitly[Encoder[OUT]]
    }

  /** Top-k rows within every group under an explicit ordering (best
    * documents per source, hottest items per shard, latest events per
    * user): one exchange on the group key, a rank inside each group, the
    * filter drops everything past k before any downstream stage. Pass a
    * fully deterministic ordering (include a tie-break column) or ties make
    * the kept SET nondeterministic — same contract as `Sampling
    * .capPerGroup`, which is this with a hash ordering.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], k: Int,
                   order: Seq[Column]): DataFrame = {
    require(k > 0 && groupCols.nonEmpty && order.nonEmpty,
      "topKPerGroup needs a group, an ordering, and k > 0")
    require(!df.columns.contains("rk"),
      "topKPerGroup emits a 'rk' column; rename the existing one first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols: _*).orderBy(order: _*)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
