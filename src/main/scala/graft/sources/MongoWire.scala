package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal MongoDB wire-protocol client — the live half of the reference's
  * mongo connector (`pull_mongo` /root/reference/pybabe/mongo.py:30-53 and
  * `push_mongo` mongo.py:7-28 talk to a running server through pymongo).
  * Speaks OP_MSG (opcode 2013, MongoDB 3.6+; the only non-deprecated wire
  * format) with a hand-rolled BSON codec for the scalar/document/array
  * types the reference's rows use — no driver jar exists in this
  * environment, and the dialogue is three commands: `hello`,
  * `find`/`getMore`, `insert`.
  *
  * Scale note: like the reference, this is a DRIVER-SIDE protocol client
  * for dimension-sized collections (the reference iterates a pymongo
  * cursor row by row). Bulk data belongs on a shared filesystem; the
  * mongoexport dump path in [[Mongo]] is the distributed-scan surface.
  */
object MongoWire {

  /** BSON ObjectId (type 0x07) as its 24-char hex form. */
  final case class Oid(hex: String)
  /** BSON UTC datetime (type 0x09), milliseconds since epoch. */
  final case class UtcDate(ms: Long)

  type Doc = Vector[(String, Any)]

  def get(doc: Doc, key: String): Option[Any] = doc.find(_._1 == key).map(_._2)

  // ---------------------------------------------------------------- BSON --

  private def writeCString(b: java.io.ByteArrayOutputStream, s: String): Unit = {
    val bytes = s.getBytes(UTF_8)
    require(!bytes.contains(0.toByte), s"BSON cstring may not contain NUL: $s")
    b.write(bytes); b.write(0)
  }

  private def writeLe32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }

  private def writeLe64(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeLe32(b, v.toInt); writeLe32(b, (v >> 32).toInt)
  }

  def encodeDoc(doc: Doc): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    doc.foreach { case (k, v) => encodeElement(body, k, v) }
    val out = new java.io.ByteArrayOutputStream()
    writeLe32(out, body.size() + 5)
    body.writeTo(out); out.write(0)
    out.toByteArray
  }

  private def encodeElement(b: java.io.ByteArrayOutputStream, k: String, v: Any): Unit =
    v match {
      case null => b.write(0x0A); writeCString(b, k)
      case d: Double =>
        b.write(0x01); writeCString(b, k)
        writeLe64(b, java.lang.Double.doubleToLongBits(d))
      case f: Float => encodeElement(b, k, f.toDouble)
      case s: String =>
        b.write(0x02); writeCString(b, k)
        val bytes = s.getBytes(UTF_8)
        writeLe32(b, bytes.length + 1); b.write(bytes); b.write(0)
      case d: Doc @unchecked if v.isInstanceOf[Vector[_]] &&
          d.forall(_.isInstanceOf[(_, _)]) =>
        b.write(0x03); writeCString(b, k); b.write(encodeDoc(d))
      case xs: Seq[_] =>
        b.write(0x04); writeCString(b, k)
        b.write(encodeDoc(xs.zipWithIndex.map { case (x, i) => i.toString -> x }.toVector))
      case o: Oid =>
        b.write(0x07); writeCString(b, k)
        require(o.hex.length == 24, s"ObjectId must be 24 hex chars: ${o.hex}")
        o.hex.grouped(2).foreach(h => b.write(Integer.parseInt(h, 16)))
      case x: Boolean => b.write(0x08); writeCString(b, k); b.write(if (x) 1 else 0)
      case d: UtcDate => b.write(0x09); writeCString(b, k); writeLe64(b, d.ms)
      case i: Int => b.write(0x10); writeCString(b, k); writeLe32(b, i)
      case l: Long => b.write(0x12); writeCString(b, k); writeLe64(b, l)
      case other => sys.error(s"BSON encode: unsupported ${other.getClass.getName} at '$k'")
    }

  def decodeDoc(buf: ByteBuffer): Doc = {
    val len = buf.getInt
    val end = buf.position() + len - 4
    val out = Vector.newBuilder[(String, Any)]
    while (buf.position() < end - 1) {
      val tpe = buf.get()
      val name = readCString(buf)
      out += name -> decodeValue(buf, tpe)
    }
    require(buf.get() == 0, "BSON document missing terminator")
    out.result()
  }

  private def readCString(buf: ByteBuffer): String = {
    val b = new java.io.ByteArrayOutputStream()
    var c = buf.get()
    while (c != 0) { b.write(c); c = buf.get() }
    new String(b.toByteArray, UTF_8)
  }

  private def decodeValue(buf: ByteBuffer, tpe: Byte): Any = tpe match {
    case 0x01 => java.lang.Double.longBitsToDouble(buf.getLong)
    case 0x02 =>
      val len = buf.getInt
      val bytes = new Array[Byte](len - 1)
      buf.get(bytes); require(buf.get() == 0, "BSON string missing NUL")
      new String(bytes, UTF_8)
    case 0x03 => decodeDoc(buf)
    case 0x04 => decodeDoc(buf).map(_._2).toList
    case 0x05 => // binary: surface as base64 string (round-trip not needed)
      val len = buf.getInt; buf.get() // subtype
      val bytes = new Array[Byte](len); buf.get(bytes)
      java.util.Base64.getEncoder.encodeToString(bytes)
    case 0x07 =>
      val bytes = new Array[Byte](12); buf.get(bytes)
      Oid(bytes.map(b => f"${b & 0xff}%02x").mkString)
    case 0x08 => buf.get() != 0
    case 0x09 => UtcDate(buf.getLong)
    case 0x0A => null
    case 0x10 => buf.getInt
    case 0x11 => buf.getLong // timestamp (internal): surface as long
    case 0x12 => buf.getLong
    case other => sys.error(f"BSON decode: unsupported type 0x$other%02x")
  }

  // ------------------------------------------------- extended-JSON bridge --

  private def jsonEscape(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** One decoded document as a mongoexport canonical-ish extended-JSON line
    * — exactly the wrapper forms [[Mongo.pullMongoDump]]'s unwrapper reads
    * ($oid, $date.$numberLong, $numberLong), so the wire pull and the dump
    * pull share one normalization path.
    */
  def toExtJson(v: Any): String = v match {
    case null => "null"
    case d: Double => if (d == d.floor && !d.isInfinite && d.abs < 1e15) f"$d%.1f" else d.toString
    case s: String => jsonEscape(s)
    case o: Oid => s"""{"$$oid":${jsonEscape(o.hex)}}"""
    case d: UtcDate => s"""{"$$date":{"$$numberLong":"${d.ms}"}}"""
    case x: Boolean => x.toString
    case i: Int => i.toString
    case l: Long => s"""{"$$numberLong":"$l"}"""
    case doc: Doc @unchecked if v.isInstanceOf[Vector[_]] &&
        doc.forall(_.isInstanceOf[(_, _)]) =>
      doc.map { case (k, x) => s"${jsonEscape(k)}:${toExtJson(x)}" }
        .mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(toExtJson).mkString("[", ",", "]")
    case other => sys.error(s"extJSON: unsupported ${other.getClass.getName}")
  }

  // ----------------------------------------------------------- wire client --

  /** One OP_MSG connection. Sends `hello` on construction (the MongoDB
    * handshake; servers answer any auth-free deployment with ok:1).
    */
  final class Client(host: String, port: Int) extends AutoCloseable {
    private val sock = new java.net.Socket(host, port)
    sock.setSoTimeout(30000)
    private val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    private val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    private var reqId = 0

    val helloReply: Doc = command("admin", Vector("hello" -> 1))

    def command(db: String, cmd: Doc): Doc = {
      reqId += 1
      val body = encodeDoc(cmd :+ ("$db" -> db))
      val msgLen = 16 + 4 + 1 + body.length // header + flagBits + kind byte
      val msg = ByteBuffer.allocate(msgLen).order(ByteOrder.LITTLE_ENDIAN)
      msg.putInt(msgLen).putInt(reqId).putInt(0).putInt(2013)
      msg.putInt(0) // flagBits
      msg.put(0.toByte) // section kind 0: body
      msg.put(body)
      out.write(msg.array()); out.flush()

      val lenBytes = new Array[Byte](4)
      in.readFully(lenBytes)
      val respLen = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getInt
      val rest = new Array[Byte](respLen - 4)
      in.readFully(rest)
      val buf = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
      buf.getInt; buf.getInt; // requestId, responseTo
      val opCode = buf.getInt
      require(opCode == 2013, s"mongo: expected OP_MSG reply, got opcode $opCode")
      buf.getInt // flagBits (stub/server replies have no checksum here)
      val kind = buf.get()
      require(kind == 0, s"mongo: expected kind-0 section, got $kind")
      val reply = decodeDoc(buf)
      get(reply, "ok") match {
        case Some(ok: Double) if ok == 1.0 => reply
        case Some(ok: Int) if ok == 1 => reply
        case _ => sys.error(s"mongo: command failed: " +
          get(reply, "errmsg").getOrElse(reply.toString))
      }
    }

    /** Drain `find` + `getMore` cursors; returns every document decoded. */
    def findAll(db: String, coll: String, batchSize: Int = 1000): Seq[Doc] = {
      val docs = Seq.newBuilder[Doc]
      def cursorOf(reply: Doc, batchKey: String): (Long, Seq[Doc]) = {
        val cursor = get(reply, "cursor")
          .getOrElse(sys.error("mongo: reply has no cursor")).asInstanceOf[Doc]
        val id = get(cursor, "id") match {
          case Some(l: Long) => l
          case Some(i: Int)  => i.toLong
          case other => sys.error(s"mongo: bad cursor id $other")
        }
        val batch = get(cursor, batchKey).getOrElse(List.empty)
          .asInstanceOf[Seq[Any]].map(_.asInstanceOf[Doc])
        (id, batch)
      }
      var (cid, batch) = cursorOf(
        command(db, Vector("find" -> coll, "batchSize" -> batchSize)), "firstBatch")
      docs ++= batch
      while (cid != 0L) {
        val (nid, nb) = cursorOf(
          command(db, Vector("getMore" -> cid, "collection" -> coll,
            "batchSize" -> batchSize)), "nextBatch")
        cid = nid; docs ++= nb
      }
      docs.result()
    }

    /** `insert` command; returns the server-acknowledged document count. */
    def insert(db: String, coll: String, docs: Seq[Doc]): Long = {
      require(docs.nonEmpty, "mongo: insert of zero documents")
      val reply = command(db, Vector("insert" -> coll, "documents" -> docs.toList))
      get(reply, "n") match {
        case Some(n: Int)  => n.toLong
        case Some(n: Long) => n
        case _ => docs.size.toLong
      }
    }

    def close(): Unit = sock.close()
  }

  /** Parse `mongodb://host[:port]/db.collection` (auth/options out of scope
    * — the environment has no authed server to test against).
    */
  def parseUri(uri: String): (String, Int, String, String) = {
    val u = new java.net.URI(uri)
    require(u.getScheme == "mongodb", s"not a mongodb:// URI: $uri")
    val path = Option(u.getPath).getOrElse("").stripPrefix("/")
    val (db, coll) = path.split("\\.", 2) match {
      case Array(d, c) if d.nonEmpty && c.nonEmpty => (d, c)
      case _ => sys.error(s"mongodb URI needs /db.collection: $uri")
    }
    (u.getHost, if (u.getPort > 0) u.getPort else 27017, db, coll)
  }
}
