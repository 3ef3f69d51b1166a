package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.util.Properties

/** JDBC pull/push — the Spark-native replacement for the reference's five
  * CLI database clients (`pull_sql` /root/reference/pybabe/sql.py:121-208,
  * `push_sql` sql.py:253-342, client matrix sql.py:15-118). One JDBC path
  * replaces the mysql/sqlite/InfiniDB/Vectorwise subprocess+FIFO machinery;
  * executors open their own connections, so reads parallelize by
  * `partitionColumn` ranges and writes stream per-task batches.
  */
object Jdbc {

  /** `pull_sql(table|query)` (sql.py:121-208). Pass `partitionColumn` +
    * bounds to shard the read across `numPartitions` executor connections —
    * without it a JDBC read is a single connection regardless of cluster
    * size, the classic JDBC-at-scale mistake.
    */
  def pullSql(spark: SparkSession, url: String, tableOrQuery: String,
              user: String = "", password: String = "",
              partitionColumn: Option[String] = None,
              lowerBound: Long = 0L, upperBound: Long = 0L,
              numPartitions: Int = 8): DataFrame = {
    val props = new Properties()
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    val table =
      // alias must not start with '_' (Derby and friends reject it)
      if (tableOrQuery.trim.toLowerCase.startsWith("select")) s"($tableOrQuery) AS graft_subq"
      else tableOrQuery
    partitionColumn match {
      case Some(c) => spark.read.jdbc(url, table, c, lowerBound, upperBound, numPartitions, props)
      case None    => spark.read.jdbc(url, table, props)
    }
  }

  /** All-varchar DDL like the reference emits (sql.py:284-290: every column
    * `varchar(255)`). Column names are ANSI-quoted (case-preserved) so a
    * pre-created table lines up with Spark's quoted JDBC inserts.
    */
  def createTableDdl(table: String, fields: Seq[String]): String =
    s"CREATE TABLE $table (" + fields.map(f => s""""$f" VARCHAR(255)""").mkString(", ") + ")"

  /** Partition-delete statement for idempotent reload
    * (sql.py:292-305: `DELETE FROM t WHERE part='v'` per substream).
    * Column names are ANSI-quoted: Spark's JDBC writer creates quoted
    * (case-preserved) identifiers, so an unquoted WHERE column would be
    * case-folded by the engine and miss the table's actual column.
    */
  def deletePartitionSql(table: String, partition: Map[String, String]): String =
    s"DELETE FROM $table WHERE " +
      partition.map { case (k, v) => s""""$k" = '${v.replace("'", "''")}'""" }.mkString(" AND ")

  /** `push_sql` (sql.py:253-342): drop/create via SaveMode, append via
    * per-executor JDBC batches. `deletePartition` reproduces the reference's
    * idempotent partition reload: delete the rows of this load's partition
    * values, then append — at-least-once reruns stay exact.
    */
  def pushSql(df: DataFrame, url: String, table: String,
              user: String = "", password: String = "",
              overwrite: Boolean = false,
              deletePartition: Option[Map[String, String]] = None): Unit = {
    val props = new Properties()
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    deletePartition.foreach { part =>
      val conn = java.sql.DriverManager.getConnection(url, props)
      try { val st = conn.createStatement(); st.execute(deletePartitionSql(table, part)); st.close() }
      finally conn.close()
    }
    df.write.mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
      .jdbc(url, table, props)
  }
}
