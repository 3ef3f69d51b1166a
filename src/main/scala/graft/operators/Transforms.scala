package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.types.StructType

/** The row-level extensibility surface of the reference — `flatMap` (UDTF,
  * /root/reference/pybabe/transform.py:112-155), `bulkMapTo` (batched UDF,
  * transform.py:66-95), and the bare row-lambda mode of `mapTo`
  * (transform.py:6-63) / `iterate` (iterate.py:9-30).
  *
  * These are the ops that genuinely need imperative per-row logic, so they
  * drop to typed Dataset operations (`flatMap` / `mapPartitions`) — the
  * sanctioned last resort. Everything expressible as Column expressions
  * should instead use BabeOps.mapToInsert/mapToFields, which stay inside
  * whole-stage codegen.
  *
  * All three of the reference's schema modes are covered:
  *  - insert mode (append columns): pass outSchema = input ++ new fields and
  *    emit input ++ computed values;
  *  - fields mode (replace row shape): pass the new schema;
  *  - bare mode (same-shape map): outSchema = df.schema.
  */
object Transforms {

  /** UDTF: one input row → zero or more output rows of `outSchema`
    * (reference flatMap, transform.py:112-155; golden
    * tests/test_transform.py:71-75).
    */
  def flatMapRows(df: DataFrame, outSchema: StructType)
                 (f: Row => IterableOnce[Row]): DataFrame = {
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.flatMap(row => f(row).iterator)
  }

  /** Same-shape or reshaping row map (reference mapTo bare mode / iterate). */
  def mapRows(df: DataFrame, outSchema: StructType)(f: Row => Row): DataFrame = {
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.map(f)
  }

  /** Batched row processing: `f` sees `bulkSize`-row batches — the reference's
    * `bulkMapTo` for bulk external lookups (transform.py:66-95; batch size 2
    * in tests/test_transform.py:49-53). Compiles to `mapPartitions` with a
    * grouped iterator: one task never materializes more than one batch.
    */
  def bulkMap(df: DataFrame, outSchema: StructType, bulkSize: Int)
             (f: Seq[Row] => IterableOnce[Row]): DataFrame = {
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.mapPartitions(it => it.grouped(bulkSize).flatMap(batch => f(batch).iterator))
  }
}
