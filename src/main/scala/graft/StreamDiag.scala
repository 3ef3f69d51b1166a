package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming counterpart of [[Probe]]: run ONE registered streaming
  * batch-parity query under the bench session config and print each
  * micro-batch's `durationMs` breakdown (queryPlanning / getBatch /
  * addBatch / walCommit / commitOffsets) via a StreamingQueryListener —
  * the attribution evidence when a stream-shaped query's wall time needs
  * to be split between planning, state-store work, and sink writes.
  * `StreamDiag <query> [sfDir]`. Round-14 provenance: q134 showed
  * transient 40–70 s wall times in three consecutive fresh-JVM sessions
  * while this breakdown showed every micro-batch at ~2 s (triggerExecution
  * ≈ addBatch) minutes later — attributing the episodes to host IO/CPU
  * hiccups, not to the dedupWithinWatermark operator or its state store.
  */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val q = if (args.length > 0) args(0) else "q134_dedup_stream"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[diag] started ${e.name} at ${System.nanoTime() / 1000000}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"[diag] batch ${e.progress.batchId} durations ${e.progress.durationMs} rows ${e.progress.numInputRows}")
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[diag] terminated at ${System.nanoTime() / 1000000}")
    })
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      println(s"[diag] run $i total ${(System.nanoTime() - t0) / 1e9} s")
    }
    spark.stop()
  }
}
