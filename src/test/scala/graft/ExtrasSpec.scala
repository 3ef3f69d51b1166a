package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Nested
import graft.sources.{EventLogs, Protocols}
import graft.functions.TextFunctions

/** Nested flattening, protocol dispatch, event-log parsing, mojibake. */
class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("flatten structs to parent_child columns (twitter.py:14-22 capability)") {
    val df = spark.read.json(Seq(
      """{"id":1,"author":{"name":"flo","geo":{"lat":48.8}},"tags":["a","b"]}""").toDS())
    val out = Nested.flatten(df)
    assert(out.columns.sorted.toSeq == Seq("author_geo_lat", "author_name", "id", "tags"))
    assert(out.select("author_name").as[String].head() == "flo")
    val exploded = Nested.explodeArray(out, "tags")
    assert(exploded.count() == 2)
  }

  test("protocol dispatch: distributed URLs vs spooled") {
    assert(Protocols.isDistributedUrl("s3a://bucket/key*.csv"))
    assert(Protocols.isDistributedUrl("/local/path.csv"))
    assert(!Protocols.isDistributedUrl("http://host/x.csv"))
  }

  test("http pull spools and parses via a loopback server (test_http.py:11-39 shape)") {
    // in-JVM HttpServer on 127.0.0.1 — exercises the real spool path with
    // zero egress, mirroring the reference's stub-server http test
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val body = "a,b\n1,x\n2,y\n".getBytes("UTF-8")
    server.createContext("/data.csv", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.getResponseHeaders.set("Content-Type", "text/csv")
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = Protocols.pull(spark, s"http://127.0.0.1:$port/data.csv")
      assert(df.columns.toSeq == Seq("a", "b"))
      assert(df.orderBy("a").collect().map(_.toSeq).toSeq ==
        Seq(Seq("1", "x"), Seq("2", "y")))
    } finally server.stop(0)
  }

  test("ftp pull spools via a loopback stub FTP server") {
    // minimal PASV-mode FTP server on 127.0.0.1; the JDK URL handler is the
    // client (Protocols.spool uses url.openStream) — zero egress
    val body = "a,b\n5,q\n".getBytes("UTF-8")
    val ctrl = new java.net.ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      val s = ctrl.accept()
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
      val out = new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8")
      def reply(r: String): Unit = { out.write(r + "\r\n"); out.flush() }
      var data: java.net.ServerSocket = null
      reply("220 stub")
      var line = in.readLine()
      while (line != null) {
        val cmd = line.takeWhile(_ != ' ').toUpperCase
        cmd match {
          case "USER" => reply("331 pw")
          case "PASS" => reply("230 ok")
          case "TYPE" => reply("200 ok")
          case "CWD"  => reply("250 ok")
          case "EPSV" => reply("502 no")
          case "PASV" =>
            data = new java.net.ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
            val p = data.getLocalPort
            reply(s"227 Entering Passive Mode (127,0,0,1,${p / 256},${p % 256})")
          case "RETR" =>
            reply("150 sending")
            val d = data.accept()
            d.getOutputStream.write(body); d.close()
            reply("226 done")
          case "QUIT" => reply("221 bye"); line = null
          case _      => reply("200 ok")
        }
        if (line != null) line = in.readLine()
      }
      s.close()
    })
    t.start()
    try {
      val df = Protocols.pull(spark, s"ftp://127.0.0.1:${ctrl.getLocalPort}/data.csv")
      assert(df.columns.toSeq == Seq("a", "b"))
      assert(df.collect().map(_.toSeq).toSeq == Seq(Seq("5", "q")))
    } finally { ctrl.close(); t.join(2000) }
  }

  test("JDBC push/pull round-trip with idempotent partition reload (test_sql.py:13-25 shape)") {
    // embedded Derby (on the Spark jars classpath) — a real JDBC engine,
    // no network: insert -> re-push same partition (delete+append) -> read
    val dbDir = tmp("derby") + "/db"
    val url = s"jdbc:derby:$dbDir;create=true"
    // pre-create with the reference's all-varchar DDL (Derby maps Spark
    // strings to CLOB otherwise, which its WHERE cannot compare)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(graft.sources.Jdbc.createTableDdl("events", Seq("day", "k", "v")))
      st.close()
    } finally conn.close()
    val day1 = Seq(("2024-01-01", "a", "1"), ("2024-01-01", "b", "2")).toDF("day", "k", "v")
    val day2 = Seq(("2024-01-02", "c", "3")).toDF("day", "k", "v")
    graft.sources.Jdbc.pushSql(day1, url, "events")
    graft.sources.Jdbc.pushSql(day2, url, "events")
    // rerun day1's load: the partition delete keeps the append idempotent
    graft.sources.Jdbc.pushSql(day1, url, "events",
      deletePartition = Some(Map("day" -> "2024-01-01")))
    val back = graft.sources.Jdbc.pullSql(spark, url, "events")
    assert(back.count() == 3)
    assert(back.orderBy("k").select("day", "k", "v").as[(String, String, String)]
      .collect().toSeq == Seq(
        ("2024-01-01", "a", "1"), ("2024-01-01", "b", "2"), ("2024-01-02", "c", "3")))
    // and a query-shaped pull
    val q = graft.sources.Jdbc.pullSql(spark, url,
      """SELECT "k", "v" FROM events WHERE "day" = '2024-01-02'""")
    assert(q.as[(String, String)].collect().toSeq == Seq(("c", "3")))
  }

  test("mongo dump pull: extended-JSON wrappers, nesting, sorted fields (mongo.py:30-53)") {
    val dir = tmp("mongo_pull")
    val lines = Seq(
      """{"_id":{"$oid":"507f1f77bcf86cd799439011"},"rown":{"$numberLong":"1"},"f":4.3,"s":"coucou","meta":{"ts":{"$date":"2024-01-02T03:04:05Z"}}}""",
      """{"_id":{"$oid":"507f1f77bcf86cd799439012"},"rown":{"$numberLong":"2"},"f":4.2,"s":"salut","meta":{"ts":{"$date":"2024-01-02T03:04:06Z"}}}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/dump.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val df = graft.sources.Mongo.pullMongoDump(spark, s"$dir/dump.json")
    // fields keynormalized and sorted, like the reference's determinism rule
    assert(df.columns.toSeq == Seq("_id", "f", "meta_ts", "rown", "s"))
    assert(df.schema("rown").dataType == LongType)
    assert(df.schema("meta_ts").dataType == TimestampType)
    val r = df.orderBy("rown").collect()
    assert(r(0).getAs[String]("_id") == "507f1f77bcf86cd799439011")
    assert(r(0).getAs[Long]("rown") == 1L && r(1).getAs[String]("s") == "salut")
  }

  test("mongo dump push -> pull round-trip with auto _id (test_mongo.py shape)") {
    val dir = tmp("mongo_rt")
    val df = Seq((1L, 4.3, "coucou2"), (2L, 4.2, "salut2")).toDF("rown", "f", "s")
    graft.sources.Mongo.pushMongoDump(df, s"$dir/coll", primaryKey = Some("rown"))
    val back = graft.sources.Mongo.pullMongoDump(spark, s"$dir/coll")
    assert(back.columns.toSeq == Seq("_id", "f", "rown", "s"))
    assert(back.orderBy("rown").select("rown", "f", "s").as[(Long, Double, String)]
      .collect().toSeq == Seq((1L, 4.3, "coucou2"), (2L, 4.2, "salut2")))
    assert(back.select("_id").as[String].collect().sorted.toSeq == Seq("1", "2"))
  }

  test("mongo wire pull/push round-trip via a loopback OP_MSG stub (mongo.py:7-53 live path)") {
    import graft.sources.{Mongo, MongoWire}
    import java.nio.{ByteBuffer, ByteOrder}
    // BSON codec pinned against the spec's canonical example bytes first
    // (bsonspec.org §Example: {"hello": "world"}), independent of the stub
    val golden = Array[Int](0x16, 0, 0, 0, 0x02, 'h', 'e', 'l', 'l', 'o', 0,
      6, 0, 0, 0, 'w', 'o', 'r', 'l', 'd', 0, 0).map(_.toByte)
    assert(MongoWire.encodeDoc(Vector("hello" -> "world")).toSeq == golden.toSeq)
    assert(MongoWire.decodeDoc(
      ByteBuffer.wrap(golden).order(ByteOrder.LITTLE_ENDIAN)) ==
      Vector("hello" -> "world"))

    val server = new java.net.ServerSocket(0, 2, java.net.InetAddress.getLoopbackAddress)
    val store = scala.collection.mutable.ArrayBuffer[MongoWire.Doc]()
    var pending = Vector.empty[MongoWire.Doc]
    val t = new Thread(() => {
      try while (true) {
        val s = server.accept()
        try {
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(s.getInputStream))
          val out = new java.io.BufferedOutputStream(s.getOutputStream)
          var open = true
          while (open) {
            val lenB = new Array[Byte](4)
            try in.readFully(lenB)
            catch { case _: java.io.IOException => open = false }
            if (open) {
              val len = ByteBuffer.wrap(lenB).order(ByteOrder.LITTLE_ENDIAN).getInt
              val rest = new Array[Byte](len - 4)
              in.readFully(rest)
              val buf = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
              val reqId = buf.getInt; buf.getInt
              assert(buf.getInt == 2013, "stub: client must speak OP_MSG")
              buf.getInt; buf.get() // flagBits, kind-0
              val cmd = MongoWire.decodeDoc(buf)
              def reply(doc: MongoWire.Doc): Unit = {
                val body = MongoWire.encodeDoc(doc)
                val m = ByteBuffer.allocate(16 + 4 + 1 + body.length)
                  .order(ByteOrder.LITTLE_ENDIAN)
                m.putInt(16 + 4 + 1 + body.length).putInt(99).putInt(reqId)
                  .putInt(2013).putInt(0).put(0.toByte).put(body)
                out.write(m.array()); out.flush()
              }
              cmd.head._1 match {
                case "hello" => reply(Vector("ok" -> 1.0))
                case "insert" =>
                  val docs = MongoWire.get(cmd, "documents").get
                    .asInstanceOf[Seq[Any]].map(_.asInstanceOf[MongoWire.Doc])
                  store ++= docs
                  reply(Vector("n" -> docs.size, "ok" -> 1.0))
                case "find" =>
                  // page size 2 regardless of batchSize: forces the client
                  // through the getMore leg of the cursor protocol
                  val (first, rest2) = store.toVector.splitAt(2)
                  pending = rest2
                  reply(Vector("cursor" -> Vector(
                    "firstBatch" -> first.toList,
                    "id" -> (if (rest2.nonEmpty) 77L else 0L),
                    "ns" -> "db.coll"), "ok" -> 1.0))
                case "getMore" =>
                  assert(MongoWire.get(cmd, "getMore").contains(77L))
                  reply(Vector("cursor" -> Vector(
                    "nextBatch" -> pending.toList, "id" -> 0L,
                    "ns" -> "db.coll"), "ok" -> 1.0))
                case other => reply(Vector("ok" -> 0.0, "errmsg" -> s"stub: $other?"))
              }
            }
          }
        } finally s.close()
      } catch { case _: Throwable => () } // server.close() ends the loop
    })
    t.start()
    try {
      val uri = s"mongodb://127.0.0.1:${server.getLocalPort}/graftdb.coll"
      val ts = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
      val df = Seq((1L, 4.5, "coucou", ts), (2L, 2.5, "salut", ts),
        (3L, 9.5, "Hé hé", ts)).toDF("rown", "f", "Some Name", "at")
      assert(Mongo.pushMongoWire(df, uri, primaryKey = Some("rown")) == 3L)
      val back = Mongo.pullMongoWire(spark, uri)
      // dump-path semantics ride through: keynormalized + sorted columns
      assert(back.columns.toSeq == Seq("Some_Name", "_id", "at", "f", "rown"))
      val got = back.orderBy("rown")
        .select("rown", "f", "Some_Name", "at", "_id")
        .as[(Long, Double, String, java.sql.Timestamp, String)].collect().toSeq
      assert(got == Seq((1L, 4.5, "coucou", ts, "1"),
        (2L, 2.5, "salut", ts, "2"), (3L, 9.5, "Hé hé", ts, "3")))
      // the universal pull covers the wire client end-to-end: a mongodb://
      // URL dispatches to pullMongoWire from Protocols.pull itself
      val viaPull = Protocols.pull(spark, uri)
      assert(viaPull.columns.toSeq == back.columns.toSeq)
      assert(viaPull.orderBy("rown").select("rown", "_id")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "1"), (2L, "2"), (3L, "3")))
    } finally { server.close(); t.join(2000) }
  }

  test("query-string event parse with Catalyst built-ins (kontagent.py:99-204)") {
    val df = Seq("s=123&st=1346806200&n=hello%20world").toDF("line")
    val parsed = df.select(EventLogs.parseQueryStringDecoded(col("line")).as("m"))
    val out = EventLogs.extractEventColumns(parsed, "m",
      Seq("s" -> LongType, "st" -> LongType, "n" -> StringType))
    val r = out.select("s", "st", "n").as[(Long, Long, String)].head()
    assert(r == ((123L, 1346806200L, "hello world")))
  }

  test("base64 JSON payload decode (kontagent.py:139-147)") {
    val payload = java.util.Base64.getEncoder.encodeToString("""{"k":"v"}""".getBytes)
    val out = Seq(payload).toDF("data")
      .select(element_at(EventLogs.decodeJsonPayload(col("data")), "k").as("k"))
    assert(out.as[String].head() == "v")
  }

  test("hour-partitioned read prunes partitions (kontagent.py:245-293 shape)") {
    val root = tmp("logs")
    Seq("e1").toDF("line").write.text(s"$root/date=2012-04-04/hour=01")
    Seq("e2").toDF("line").write.text(s"$root/date=2012-04-05/hour=02")
    val df = EventLogs.readPartitioned(spark, root)
    assert(df.columns.toSet == Set("value", "date", "hour")) // text source names the line col "value"
    val pruned = df.filter(col("date") === "2012-04-04")
    assert(pruned.select("value").as[String].collect().toSeq == Seq("e1"))
    // partition filter must reach the scan (pruning, not post-filter)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("date=2012-04-05"))
  }

  test("mojibake cleanup (charset.py:10-37)") {
    val moji = new String("é".getBytes("UTF-8"), "ISO-8859-1") // "Ã©"
    val df = Seq(moji + " caf" + moji.takeRight(0), "clean text").toDF("s")
    val out = df.select(TextFunctions.fixMojibake(col("s")).as("f")).as[String].collect()
    assert(out.contains("clean text"))
    assert(out.exists(_.startsWith("é")))
  }
}
