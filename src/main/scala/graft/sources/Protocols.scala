package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Protocol layer — the reference's http/ftp/s3 pull protocols
  * (/root/reference/pybabe/protocol_http.py:25-33, protocol_ftp.py:25-31,
  * protocol_s3.py:89-112).
  *
  * s3/hdfs/file URLs go straight to the distributed scan: Spark's file
  * sources natively glob and parallelize `s3a://bucket/prefix/part-*.csv`
  * (the reference's fnmatch loop collapses into the FileIndex). http/ftp
  * have no Hadoop FS: fetch once driver-side to a local spool file — exactly
  * the reference's temp-file spool (base.py:410-418) — then scan that.
  * Fine for dimension-sized feeds; bulk data belongs on a shared FS.
  */
object Protocols {

  /** True if Spark can scan the URL directly (globbing included). */
  def isDistributedUrl(url: String): Boolean =
    Seq("s3a://", "s3://", "hdfs://", "file:/", "/").exists(url.startsWith)

  /** Spool an http/ftp URL to a local temp file (driver-side, once). */
  def spool(url: String, suffixHint: String = ""): String = {
    val suffix = if (suffixHint.nonEmpty) suffixHint
      else url.split('/').last.dropWhile(_ != '.') match {
        case "" => ".tmp"
        case s  => s
      }
    val target = Files.createTempFile("graft_pull_", suffix)
    if (url.startsWith("ftp://")) ftpFetch(url, target)
    else {
      val in = new java.net.URI(url).toURL.openStream()
      try Files.copy(in, target, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
    }
    target.toString
  }

  /** Minimal RFC 959 passive-mode GET — the same dialogue the reference
    * drives through ftplib (protocol_ftp.py:25-31). Hand-rolled because
    * Hadoop's URL factory shadows the JDK ftp handler with FTPFileSystem,
    * which wants cluster configuration rather than a URL.
    */
  private def ftpFetch(url: String, target: java.nio.file.Path): Unit = {
    val u = new java.net.URI(url)
    val port = if (u.getPort > 0) u.getPort else 21
    val (user, pass) = Option(u.getUserInfo) match {
      case Some(ui) => ui.split(":", 2) match {
        case Array(a, b) => (a, b)
        case Array(a)    => (a, "")
      }
      case None => ("anonymous", "graft@")
    }
    val s = new java.net.Socket(u.getHost, port)
    try {
      s.setSoTimeout(30000)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
      val out = new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8")
      def reply(ok: Int*): String = {
        var line = in.readLine()
        if (line == null) sys.error("ftp: connection closed")
        while (line.length >= 4 && line.charAt(3) == '-') line = in.readLine()
        val code = line.take(3).toIntOption.getOrElse(-1)
        require(ok.contains(code), s"ftp: expected ${ok.mkString("/")}, got '$line'")
        line
      }
      def cmd(c: String, ok: Int*): String = {
        out.write(c + "\r\n"); out.flush(); reply(ok: _*)
      }
      reply(220)
      if (cmd(s"USER $user", 331, 230).startsWith("331")) cmd(s"PASS $pass", 230)
      cmd("TYPE I", 200)
      val pasv = cmd("PASV", 227)
      val nums = "\\d+".r.findAllIn(pasv.dropWhile(_ != '(')).map(_.toInt).toSeq
      require(nums.length >= 6, s"ftp: bad PASV reply '$pasv'")
      val dataHost = nums.slice(nums.length - 6, nums.length - 2).mkString(".")
      val dataPort = nums(nums.length - 2) * 256 + nums(nums.length - 1)
      out.write(s"RETR ${u.getPath.stripPrefix("/")}\r\n"); out.flush()
      val data = new java.net.Socket(dataHost, dataPort)
      try {
        reply(150, 125)
        Files.copy(data.getInputStream, target, StandardCopyOption.REPLACE_EXISTING)
      } finally data.close()
      reply(226, 250)
      cmd("QUIT", 221)
    } finally s.close()
  }

  /** Universal protocol-aware pull: distributed URLs scan in place; http/ftp
    * spool then scan; `mongodb://host[:port]/db.collection` drains the
    * collection through the live OP_MSG wire client (same normalization
    * surface as the dump pull). Format dispatch is `Pull`'s.
    */
  def pull(spark: SparkSession, url: String,
           format: Option[String] = None,
           fields: Seq[String] = Nil): DataFrame = {
    if (url.startsWith("mongodb://"))
      return Mongo.pullMongoWire(spark, url, fields)
    val path =
      if (url.startsWith("http://") || url.startsWith("https://") || url.startsWith("ftp://"))
        spool(url)
      else url
    Pull(spark, path, format = format, fields = fields)
  }
}
