package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-vector similarity for `array<float>` columns: cosine/dot/L2 as
  * pure `zip_with`/`aggregate` expression trees, plus approximate-nearest-
  * neighbor search — brute-force top-k as the correctness baseline and a
  * random-hyperplane LSH variant as the scale path.
  *
  * Scale shape: brute force is a broadcast of the (small) query set against a
  * partitioned corpus scan — linear in corpus size, no shuffle until the
  * final per-query top-k (TakeOrdered-style, tiny). The LSH variant buckets
  * both sides by sign-pattern so each query only scans its bucket.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0d, lit(0.0d)).otherwise(d / n)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v))

  /** Brute-force cosine top-k: for every row of `queries` (small — it is
    * broadcast), the k nearest rows of `corpus` by cosine. Returns
    * (query_id, neighbor_id, cosine, rank). Excludes self-matches.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Random-hyperplane signature: `bits` sign bits of projections onto fixed
    * pseudo-random hyperplanes (deterministic per seed). Cosine-similar
    * vectors agree on most bits (Charikar 2002 — sign-LSH), so bucketing on
    * the signature prefix confines each query to a tiny corpus slice.
    */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int, seed: Long = 7L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
    val bitCols = planes.zipWithIndex.map { case (plane, i) =>
      val proj = aggregate(zip_with(vec, array(plane.map(lit): _*), (x, p) => x * p),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0.0d, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: both sides keyed by hyperplane signature; candidates
    * are bucket-mates in any of `tables` independent hash tables, verified by
    * exact cosine and reduced to per-query top-k. Multi-table union trades
    * recall vs cost — the standard sign-LSH arrangement.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, dim: Int, k: Int,
              bits: Int = 12, tables: Int = 4): DataFrame = {
    val sigExprs = (side: DataFrame, idAs: String, vecAs: String) =>
      side.select(col(idCol).as(idAs), col(vecCol).as(vecAs))
        .withColumn("__t", explode(array(Seq.tabulate(tables) { t =>
          struct(lit(t).as("ti"),
            hyperplaneSignature(col(vecAs), dim, bits, seed = 7L + t).as("sig"))
        }: _*)))
    val c = sigExprs(corpus, "neighbor_id", "__cv")
    val q = sigExprs(queries, "query_id", "__qv")
    val cand = c.join(q, Seq("__t"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: pairs whose
    * cosine >= threshold, discovered through shared buckets (no O(n²) scan).
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                         threshold: Double, bits: Int = 10, tables: Int = 4): DataFrame = {
    val sides = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("__t", explode(array(Seq.tabulate(tables) { t =>
        struct(lit(t).as("ti"),
          hyperplaneSignature(col("v"), dim, bits, seed = 7L + t).as("sig"))
      }: _*)))
    val a = sides.select(col("__t"), col("id").as("id_a"), col("v").as("va"))
    val b = sides.select(col("__t"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("__t")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
