package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mongo document pull/push over mongoexport EXTENDED-JSON dumps — the
  * portable half of the reference's mongo connector
  * (`pull_mongo` /root/reference/pybabe/mongo.py:30-53, `push_mongo`
  * mongo.py:7-28). No wire protocol exists in this offline environment (and
  * no connector jar may be added), so the dump format IS the exchange
  * surface: `mongoexport` writes one document per line, `mongoimport` reads
  * the same back — this module speaks that format with Spark's distributed
  * JSON scan.
  *
  * Reference semantics kept: field names are keynormalized and SORTED for
  * determinism (mongo.py:46 "Mandatory for determisn."), an explicit `fields`
  * list overrides, and `push` auto-creates `_id` from the primary key when
  * the documents lack one (mongo.py:24-26).
  */
object Mongo {

  /** Unwrap extended-JSON type wrappers recursively: `{"$oid": s}` → string,
    * `{"$date": iso}` / `{"$date": {"$numberLong": ms}}` → timestamp,
    * `{"$numberLong"/"$numberInt"/"$numberDouble": v}` → numeric.
    */
  private def unwrap(c: Column, dt: DataType): Column = dt match {
    case s: StructType if s.fields.length == 1 =>
      val f = s.fields(0)
      f.name match {
        case "$oid" => c.getField("$oid")
        case "$date" => f.dataType match {
          case inner: StructType if inner.fieldNames.contains("$numberLong") =>
            timestamp_millis(c.getField("$date").getField("$numberLong").cast(LongType))
          case _ => to_timestamp(c.getField("$date"))
        }
        case "$numberLong"    => c.getField("$numberLong").cast(LongType)
        case "$numberInt"     => c.getField("$numberInt").cast(IntegerType)
        case "$numberDouble"  => c.getField("$numberDouble").cast(DoubleType)
        case "$numberDecimal" => c.getField("$numberDecimal").cast(DecimalType(38, 18))
        case _ => struct(s.fields.toSeq.map(g =>
          unwrap(c.getField(g.name), g.dataType).as(g.name)): _*)
      }
    case s: StructType =>
      struct(s.fields.toSeq.map(g => unwrap(c.getField(g.name), g.dataType).as(g.name)): _*)
    case _ => c
  }

  /** Read a mongoexport dump (JSON lines) into a flat DataFrame: wrappers
    * unwrapped, nested documents flattened to `parent_child` columns, names
    * keynormalized, columns sorted (or `fields` selected verbatim).
    */
  def pullMongoDump(spark: SparkSession, path: String,
                    fields: Seq[String] = Nil): DataFrame =
    fromRaw(spark.read.json(path), fields)

  /** Same, over an in-memory dataset of dump lines. */
  def pullMongoDumpLines(lines: org.apache.spark.sql.Dataset[String],
                         fields: Seq[String] = Nil): DataFrame =
    fromRaw(lines.sparkSession.read.json(lines), fields)

  private def fromRaw(raw: DataFrame, fields: Seq[String]): DataFrame = {
    val unwrapped = raw.select(raw.schema.fields.toSeq.map(f =>
      unwrap(col(s"`${f.name}`"), f.dataType).as(f.name)): _*)
    val flat = graft.operators.Nested.flatten(unwrapped)
    val renames = flat.columns.map(c => c -> graft.operators.KeyNormalize(c))
      .filter(p => p._1 != p._2).toMap
    val named = flat.withColumnsRenamed(renames)
    if (fields.nonEmpty) named.select(fields.map(col): _*)
    else named.select(named.columns.sorted.toSeq.map(col): _*)
  }

  /** Write a DataFrame as a mongoimport-compatible dump: one JSON document
    * per line, `_id` auto-created from `primaryKey` (or a generated id) when
    * the frame has none — the reference's push contract.
    */
  def pushMongoDump(df: DataFrame, path: String,
                    primaryKey: Option[String] = None): Unit = {
    val withId =
      if (df.columns.contains("_id")) df
      else primaryKey match {
        case Some(pk) => df.withColumn("_id", col(pk).cast(StringType))
        case None     => df.withColumn("_id", monotonically_increasing_id().cast(StringType))
      }
    withId.write.mode("overwrite").json(path)
  }

  // ------------------------------------------------------- live wire pulls --

  /** Live `pull_mongo` over a `mongodb://host[:port]/db.collection` URI:
    * drain the collection through [[MongoWire.Client.findAll]] (OP_MSG
    * find/getMore), render each document as an extended-JSON line, and
    * normalize through the SAME dump path as `pullMongoDump` — wire and
    * dump pulls share one unwrap/flatten/keynormalize surface. Driver-side
    * protocol client, dimension-sized collections (the reference iterates
    * a pymongo cursor the same way, mongo.py:44-53).
    */
  def pullMongoWire(spark: SparkSession, uri: String,
                    fields: Seq[String] = Nil): DataFrame = {
    val (host, port, db, coll) = MongoWire.parseUri(uri)
    val client = new MongoWire.Client(host, port)
    val lines =
      try client.findAll(db, coll).map(MongoWire.toExtJson)
      finally client.close()
    import spark.implicits._
    pullMongoDumpLines(spark.createDataset(lines), fields)
  }

  /** Live `push_mongo`: rows become BSON documents (driver-side iterator —
    * the reference's row loop, mongo.py:17-27), `_id` auto-created from the
    * primary key when absent, inserted in batches of 1000. Returns the
    * server-acknowledged count.
    */
  def pushMongoWire(df: DataFrame, uri: String,
                    primaryKey: Option[String] = None): Long = {
    val (host, port, db, coll) = MongoWire.parseUri(uri)
    val withId =
      if (df.columns.contains("_id")) df
      else primaryKey match {
        case Some(pk) => df.withColumn("_id", col(pk).cast(StringType))
        case None     => df.withColumn("_id", monotonically_increasing_id().cast(StringType))
      }
    val names = withId.columns
    val client = new MongoWire.Client(host, port)
    try {
      var n = 0L
      val it = withId.toLocalIterator()
      val batch = scala.collection.mutable.ArrayBuffer[MongoWire.Doc]()
      def flush(): Unit = if (batch.nonEmpty) {
        n += client.insert(db, coll, batch.toSeq); batch.clear()
      }
      while (it.hasNext) {
        val row = it.next()
        batch += names.indices.map(i => names(i) -> toBson(row.get(i))).toVector
        if (batch.size >= 1000) flush()
      }
      flush()
      n
    } finally client.close()
  }

  private def toBson(v: Any): Any = v match {
    case null => null
    case t: java.sql.Timestamp => MongoWire.UtcDate(t.getTime)
    case i: java.time.Instant => MongoWire.UtcDate(i.toEpochMilli)
    case d: java.sql.Date => MongoWire.UtcDate(d.getTime)
    case d: java.time.LocalDate =>
      MongoWire.UtcDate(d.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
    case b: java.math.BigDecimal => b.doubleValue
    case b: BigDecimal => b.doubleValue
    case f: Float => f.toDouble
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case r: org.apache.spark.sql.Row =>
      r.schema.fieldNames.toVector.zip(r.toSeq.map(toBson))
    case xs: Seq[_] => xs.map(toBson).toList
    case m: Map[_, _] => m.toVector.map { case (k, x) => k.toString -> toBson(x) }
    case x @ (_: Int | _: Long | _: Double | _: String | _: Boolean) => x
    case other => other.toString
  }
}
