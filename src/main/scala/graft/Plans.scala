package graft

import org.apache.spark.sql.SparkSession

/** Dev main: dump formatted physical plans for representative queries to
  * audit the 100 TB shapes — column pruning at the scan, broadcast joins,
  * TakeOrderedAndProject top-k, partial aggregation, codegen spans.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_filter_columns", "q14_maxn", "q17_join_warn", "q19_group",
        "q45_exact_dedup", "q46_ngram_jaccard", "q47_minhash_pairs",
        "q50_cosine_topk", "q52_ivf_topk", "q56_window_global_twopass",
        "q68_sessionize_batch", "q76_heavy_hitters", "q77_salted_join")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
