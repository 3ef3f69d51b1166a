package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-side half of scan performance. A
  * lakehouse table clustered on a Z-order (Morton) key serves range
  * predicates on EITHER dimension from a small fraction of its files,
  * because interleaving the bits of two columns makes file min/max ranges
  * tight on both (the technique behind Delta/Iceberg OPTIMIZE ZORDER).
  */
object Layout {

  /** The Morton key of two non-negative integer columns: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Pure shift/mask terms
    * with plan-time bit positions, so the key stays inside whole-stage
    * codegen and replays in ANSI SQL verbatim ((x >> i) & 1 in both
    * dialects). `bits` <= 31 per column (2·bits <= 62 key bits); inputs
    * are taken MODULO 2^bits (pmod), so negative sentinels wrap into the
    * domain deterministically instead of sign-extending into a
    * near-maximal key that would funnel every negative row into one range
    * partition — hash or clamp wider domains first.
    */
  def zorderKey(a: Column, b: Column, bits: Int = 20): Column = {
    require(bits > 0 && bits <= 31, s"bits in [1,31], got $bits")
    val am = pmod(a.cast("long"), lit(1L << bits))
    val bm = pmod(b.cast("long"), lit(1L << bits))
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Rewrite `df` into range-partitioned, Z-ordered layout: rows land in
    * `numPartitions` contiguous Morton-key ranges and are sorted by the
    * key within each — written out, every file's (a, b) min/max envelope
    * is tight, which is what lets the scan skip files on either
    * dimension's predicate. One range exchange (sampled boundaries), one
    * in-partition sort, no global sort.
    */
  def zorderSort(df: DataFrame, a: Column, b: Column,
                 numPartitions: Int, bits: Int = 20): DataFrame = {
    val keyed = df.withColumn("__z", zorderKey(a, b, bits))
    keyed.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
