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
    val in = new java.net.URI(url).toURL.openStream()
    try Files.copy(in, target, StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    target.toString
  }

  /** Universal protocol-aware pull: distributed URLs scan in place; http/ftp
    * spool then scan. Format dispatch is `Pull`'s.
    */
  def pull(spark: SparkSession, url: String,
           format: Option[String] = None,
           fields: Seq[String] = Nil): DataFrame = {
    val path =
      if (url.startsWith("http://") || url.startsWith("https://") || url.startsWith("ftp://"))
        spool(url)
      else url
    Pull(spark, path, format = format, fields = fields)
  }
}
