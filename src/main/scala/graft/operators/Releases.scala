package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Release-management operators for a corpus that ships as versioned
  * snapshots — the lakehouse workflow around the dedup/curation pipeline:
  * "what changed between release N-1 and N" ([[snapshotDiff]]) and "apply a
  * CDC change feed onto the released base" ([[applyCdc]]). The reference's
  * pipeline model treats every dataset as a replaceable stream (push
  * re-writes the table, pybabe/db.py partition reload is the closest
  * analog); at warehouse scale the missing piece is the keyed delta between
  * two such materializations, which is what these two provide.
  */
object Releases {

  /** Portable row fingerprint over `cols`: md5 of the U+0001-joined,
    * null-sentineled string forms. Nulls map to U+0002 so ("a", null) and
    * ("a", "") cannot collide for any real text, and the same expression is
    * one line of ANSI SQL (md5 + concat_ws + coalesce) for oracle replay.
    */
  private def rowFingerprint(df: DataFrame, cols: Seq[String]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast(StringType), lit("\u0002"))): _*))

  /** Keyed diff of two snapshots: one row per key whose content changed
    * between `oldDf` and `newDf` — `status` is `added` (key only in new),
    * `removed` (key only in old), or `changed` (present in both, any
    * `compareCols` value differs). Unchanged keys are dropped.
    *
    * Scale shape: each side reduces to (key, 16-byte md5) BELOW its
    * exchange, so the one sort-merge join shuffles key + fingerprint — not
    * the row payload — regardless of how wide the rows are. That keyed
    * co-location is the irreducible cost of a diff; there is no broadcast
    * shortcut because both sides are corpus-sized. Keys are assumed unique
    * per snapshot (the released-corpus contract).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    // __old_fp/__new_fp/status are this operator's working columns — a
    // snapshot already carrying one would either fail ambiguously or be
    // silently shadowed in the output, so reject it loudly (the applyCdc
    // reserved-name contract).
    Seq("__old_fp", "__new_fp", "status").foreach { r =>
      require(!oldDf.columns.contains(r) && !newDf.columns.contains(r),
        s"snapshotDiff: input must not carry the reserved column '$r' — " +
          "rename it first")
    }
    val o = oldDf.select(keyCols.map(col) :+
      rowFingerprint(oldDf, compareCols).as("__old_fp"): _*)
    val n = newDf.select(keyCols.map(col) :+
      rowFingerprint(newDf, compareCols).as("__new_fp"): _*)
    o.join(n, keyCols, "full_outer")
      .withColumn("status",
        when(col("__new_fp").isNull, lit("removed"))
          .when(col("__old_fp").isNull, lit("added"))
          .when(col("__old_fp") =!= col("__new_fp"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(keyCols.map(col) :+ col("status"): _*)
  }

  /** Apply a CDC change feed onto a base snapshot: `changes` carries the
    * base's columns plus a version and an op ('I'nsert / 'U'psert / 'D'elete);
    * the result is the base with, per key, the highest-version change
    * applied — upserts replace the row, deletes drop it, untouched keys pass
    * through. (key, version) pairs must be unique within the feed; base rows
    * rank below every change (version −∞).
    *
    * This is the Delta/Iceberg MERGE INTO shape expressed as one window:
    * union base+changes, ONE hash exchange on the key, row_number picks the
    * winner. No join at all — the union means base and feed co-partition in
    * the same exchange, which beats the two-shuffle join+coalesce MERGE plan
    * whenever the feed is a meaningful fraction of the base.
    */
  def applyCdc(base: DataFrame, changes: DataFrame,
               keyCols: Seq[String], versionCol: String, opCol: String): DataFrame = {
    val dataCols = base.columns.toSeq
    // versionCol/opCol are the feed's ranking metadata — a base snapshot
    // carrying a data column of the same name would be silently clobbered
    // with ranking internals, so reject it loudly (rename before calling).
    require(!dataCols.contains(versionCol) && !dataCols.contains(opCol),
      s"applyCdc: base must not carry the feed metadata columns " +
        s"('$versionCol', '$opCol') — rename the base column first")
    val b = base
      .withColumn(versionCol, lit(Long.MinValue).cast(LongType))
      .withColumn(opCol, lit("I"))
    // Fail fast on ops outside the I/U/D contract: anything else (a
    // lowercase 'd', a typo) would otherwise be applied as an upsert — and
    // would outrank legitimate same-version ops in the tie-break below.
    val feed = changes.select(b.columns.map(col).toIndexedSeq: _*)
      .withColumn(opCol,
        when(col(opCol).isin("I", "U", "D"), col(opCol))
          .otherwise(raise_error(concat(
            lit("applyCdc: op must be I|U|D, got '"), col(opCol), lit("'")))))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col(opCol).desc)
    b.unionByName(feed)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .select(dataCols.map(col): _*)
  }

  /** Per-source release manifest — the integrity record shipped next to a
    * corpus release (datasheet/data-card accounting plus a verifiable
    * checksum): row count, total chars, distinct canonical fingerprints
    * (the dedup audit), and a 60-bit corpus checksum = XOR of the portable
    * row hash over (id, text).
    *
    * XOR is the point: it is order-independent and overflow-free, so the
    * checksum is identical no matter how partitions aggregated, and any
    * engine reading the same parquet reproduces it (the md5-fold basis of
    * the split/LSH twins) — two releases match iff their manifests match,
    * with no row-order caveats. A flipped byte in any document flips the
    * source checksum; a dropped-and-compensating pair of identical rows is
    * the known XOR blind spot, which `n_rows` + `n_distinct` cover.
    *
    * Scale shape: one hash aggregation keyed on the source column; the
    * distinct-fingerprint count is the only expansion (exact here for the
    * oracle contract — swap `approx_count_distinct` at corpus scale, same
    * contract as Profile's approx path).
    */
  def manifest(df: DataFrame, groupCol: String, idCol: String,
               textCol: String): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    // U+0001 join + U+0002 null sentinel — the rowFingerprint framing — so
    // a ':' inside a string id cannot alias (id="a:b",text="c" vs
    // id="a",text="b:c") and a null id hashes as the sentinel instead of
    // being silently dropped by concat_ws.
    df.withColumn("__h",
        Sampling.portableHash60(concat_ws("\u0001",
          coalesce(col(idCol).cast(StringType), lit("\u0002")), txt)))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(length(txt)).as("n_chars"),
        countDistinct(graft.functions.TextFunctions.fingerprint(txt)).as("n_distinct"),
        expr("bit_xor(__h)").as("checksum"))
  }
}
