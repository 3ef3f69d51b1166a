package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-record flattening — the capability behind the reference's Twitter
  * connector (`author.*` → `author_*` columns, hashtags list;
  * /root/reference/pybabe/twitter.py:14-22) and any schema-on-read source
  * (JSON/Mongo-style documents).
  */
object Nested {

  /** Flatten every struct column into `parent_child` columns, recursively.
    * Arrays are left intact (explode is a row-multiplying choice the caller
    * makes via `explodeArray`). Pure projection — no shuffle, fully pruned.
    */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    def cols(schema: StructType, prefix: Seq[String]): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        val path = prefix :+ f.name
        f.dataType match {
          case s: StructType => cols(s, path)
          case _ => Seq(col(path.map(p => s"`$p`").mkString(".")).as(path.mkString(sep)))
        }
      }
    df.select(cols(df.schema, Nil): _*)
  }

  /** One row per element of an array column (keeps empty/null arrays as a
    * null row via explode_outer, matching outer-join-style flattening).
    */
  def explodeArray(df: DataFrame, field: String, keepEmpty: Boolean = false): DataFrame =
    df.withColumn(field, if (keepEmpty) explode_outer(col(field)) else explode(col(field)))
}
