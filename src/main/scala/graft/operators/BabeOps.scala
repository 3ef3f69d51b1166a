package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-operator error policy, mirroring the reference's 4-valued
  * ON_ERROR_FAIL | SKIP | WARN | NONE (/root/reference/pybabe/base.py:132-135).
  */
sealed trait OnError
object OnError {
  /** Unmatched probe rows raise (reference join.py:40-41). */
  case object Fail extends OnError
  /** Drop silently -> inner join (reference join.py:42-43). */
  case object Skip extends OnError
  /** Log + drop -> inner join with a warning count (reference join.py:44-45, default). */
  case object Warn extends OnError
  /** Null-pad -> left outer join (reference join.py:46-47; ON_ERROR_NONE). */
  case object NullPad extends OnError
}

/** Column-name normalization, mirroring the reference's `keynormalize`
  * (/root/reference/pybabe/base.py:74-82): non-word chars -> '_',
  * digit-leading names get a 'd_' prefix.
  */
object KeyNormalize {
  def apply(name: String): String = {
    val cleaned = name.trim.replaceAll("[^A-Za-z0-9_]", "_")
    val prefixed = if (cleaned.nonEmpty && cleaned.head.isDigit) "d_" + cleaned else cleaned
    if (prefixed.isEmpty) "_" else prefixed
  }
}

/** The fluent PyBabe-verb surface over DataFrame. Each method compiles to a
  * declarative Catalyst plan (predicate pushdown / column pruning / join
  * selection stay free); nothing here collects to the driver except
  * `transposeBabe` (driver-side by design, with a row guard — the reference's
  * transpose is equally non-streaming, /root/reference/pybabe/transform.py:400-448).
  *
  * Order-dependent reference semantics (head/skip counting, windowMap frame,
  * join/dedup first-wins) take an EXPLICIT ordering column here — Spark has no
  * stable input order (SURVEY.md §7.1).
  */
object BabeOps {

  /** Observed-metric names must be unique within one query plan (Spark's
    * CheckAnalysis rejects two CollectMetrics nodes with the same name over
    * different children), so every Warn-mode join gets a fresh suffix.
    */
  private val warnSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  implicit class RichBabe(val df: DataFrame) extends AnyVal {

    // ------------------------------------------------------------------
    // Projections / column ops
    // ------------------------------------------------------------------

    /** keep/remove projection (reference transform.py:244-259). */
    def filterColumns(keep: Seq[String] = Nil, remove: Seq[String] = Nil): DataFrame =
      if (keep.nonEmpty) df.select(keep.map(col): _*)
      else df.drop(remove: _*)

    /** kwargs-style old->new rename (reference transform.py:318-331). */
    def renameColumns(renames: (String, String)*): DataFrame =
      df.withColumnsRenamed(renames.toMap)

    /** Normalize every column name like the reference does at ingest. */
    def normalizeColumnNames: DataFrame = {
      val renames = df.columns.map(c => c -> KeyNormalize(c)).filter(p => p._1 != p._2)
      df.withColumnsRenamed(renames.toMap)
    }

    /** mapTo(insert_fields=...) — append computed columns
      * (reference transform.py:6-63, insert mode).
      */
    def mapToInsert(cols: (String, Column)*): DataFrame =
      df.withColumns(cols.toMap)

    /** mapTo(fields=...) — replace the whole row shape
      * (reference transform.py:6-63, fields mode).
      */
    def mapToFields(cols: (String, Column)*): DataFrame =
      df.select(cols.map { case (n, c) => c.as(n) }: _*)

    /** Replace cell values equal to `oldValue` in the given columns (all
      * columns if empty) — reference `replace` (transform.py:222-241).
      */
    def replaceValue(oldValue: String, newValue: String, fields: Seq[String] = Nil): DataFrame = {
      val target = if (fields.nonEmpty) fields else df.schema.collect {
        case f if f.dataType == StringType => f.name
      }.toSeq
      df.na.replace(target, Map(oldValue -> newValue))
    }

    /** Literal substring replace within one string column, null-safe
      * (reference transform.py:98-109).
      */
    def replaceInString(oldStr: String, newStr: String, field: String): DataFrame =
      df.withColumn(field, when(col(field).isNull, lit(null).cast(StringType))
        .otherwise(regexp_replace(col(field), java.util.regex.Pattern.quote(oldStr), newStr)))

    /** Append literal rows (reference insert_rows, transform.py:455-470).
      * Ordering note per SURVEY §7.1: callers needing the reference's
      * prepend/append position must carry an explicit order column.
      */
    def insertRows(rows: Seq[org.apache.spark.sql.Row]): DataFrame = {
      val extra = df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.parallelize(rows, 1), df.schema)
      df.unionByName(extra)
    }

    // ------------------------------------------------------------------
    // Filters
    // ------------------------------------------------------------------

    /** Conjunction of equality constraints (reference transform.py:262-275). */
    def filterValues(constraints: (String, Any)*): DataFrame =
      df.filter(constraints.map { case (c, v) => col(c) === lit(v) }.reduce(_ && _))

    /** Drop rows with NULL in any listed field (reference transform.py:278-291). */
    def filterOutNullValues(fields: Seq[String]): DataFrame =
      df.na.drop("any", fields)

    /** Keep rows where the pattern matches AT THE START of the string field —
      * the reference uses `re.match`, which is anchored (transform.py:305-315).
      * Null cells are rejected like the reference's TypeError path.
      */
    def filterByRegexp(field: String, pattern: String): DataFrame =
      df.filter(col(field).isNotNull && col(field).rlike("^(?:" + pattern + ")"))

    /** Stream-global distinct on all columns (reference dedup.py:5-35). */
    def dedup(): DataFrame = df.dropDuplicates()

    /** Distinct on a subset of columns keeping ONE deterministic representative
      * row per key: the one minimal under `orderCol` (the reference keeps the
      * first-arrival row, dedup.py:17-31 — arrival order doesn't exist on a
      * distributed engine, so the order column makes "first" explicit).
      */
    def dedupByFields(fields: Seq[String], orderCol: Column): DataFrame = {
      val w = Window.partitionBy(fields.map(col): _*).orderBy(orderCol)
      df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    }

    // ------------------------------------------------------------------
    // Sorts / limits / top-k
    // ------------------------------------------------------------------

    /** Global sort (reference sort.py:9-22 + sort_diskbased 25-60 — Spark's
      * SortExec already spills, so one op covers both).
      */
    def sortBabe(field: String, reverse: Boolean = false): DataFrame =
      df.orderBy(if (reverse) col(field).desc else col(field).asc)

    /** First n rows under an explicit order (reference head, transform.py:174-205).
      * Catalyst plans orderBy+limit as TakeOrderedAndProject (true top-k).
      */
    def headBabe(n: Int, order: Seq[Column]): DataFrame =
      df.orderBy(order: _*).limit(n)

    /** Drop the first n rows under an explicit order (reference skip,
      * transform.py:158-171).
      */
    def skipBabe(n: Int, order: Seq[Column]): DataFrame =
      df.orderBy(order: _*).offset(n)

    /** Top-k by column (reference maxN, minmax.py:19-45). Ties broken by the
      * extra order columns for determinism.
      */
    def maxN(field: String, n: Int, tieBreak: Seq[Column] = Nil): DataFrame =
      df.orderBy(col(field).desc +: tieBreak: _*).limit(n)

    /** Bottom-k by column (reference minN, minmax.py:33-45). */
    def minN(field: String, n: Int, tieBreak: Seq[Column] = Nil): DataFrame =
      df.orderBy(col(field).asc +: tieBreak: _*).limit(n)

    /** Per-partition head: first n rows of each partition-key group — the
      * reference's head(all_streams=True) over substreams (transform.py:192-198).
      */
    def headPerPartition(n: Int, partitionCols: Seq[String], order: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
      df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n).drop("__rn")
    }

    // ------------------------------------------------------------------
    // Scalar / enrichment ops
    // ------------------------------------------------------------------

    /** Split a string field on a separator, one row per token
      * (reference split, transform.py:208-219).
      */
    def splitField(field: String, separator: String): DataFrame =
      df.withColumn(field, explode(split(col(field), java.util.regex.Pattern.quote(separator))))

    // ------------------------------------------------------------------
    // Join (reference join.py:5-50 — build-side hash join)
    // ------------------------------------------------------------------

    /** Equi-join against a dimension-sized build side, reproducing the
      * reference's hash join: build side deduped to one row per key
      * ("first row per key wins", join.py:14-16 — made deterministic here by
      * `buildOrder`), output = probe columns + build columns minus the join
      * key (join.py:22-24), unmatched-probe behavior by `onError`
      * (join.py:37-47). The build side is broadcast — it is dimension-sized
      * by construction, so at 100 TB this stays a map-side join with no
      * shuffle of the probe side.
      */
    def joinBabe(build: DataFrame, key: String, joinKey: String,
                 onError: OnError = OnError.Warn,
                 buildOrder: Option[Column] = None,
                 maxBroadcastRows: Long = 10000000L): DataFrame = {
      val dedupedBuild = buildOrder match {
        case Some(ord) =>
          val w = Window.partitionBy(col(joinKey)).orderBy(ord)
          build.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
        case None => build.dropDuplicates(joinKey)
      }
      // Broadcast-size guard: the build side is dimension-sized by contract,
      // but a misuse (fact table as build side) must not OOM the driver.
      // Above the row cap we fall back to a shuffle join with a warning;
      // maxBroadcastRows <= 0 skips the guard (and the count) entirely.
      // Tuning.noBroadcast forces the shuffle regime outright (no hint, no
      // probe count) so the fallback path is exercisable on demand.
      val hinted =
        if (Tuning.noBroadcast) dedupedBuild
        else if (maxBroadcastRows <= 0) broadcast(dedupedBuild)
        else {
          val n = dedupedBuild.limit((maxBroadcastRows + 1).toInt.max(1)).count()
          if (n > maxBroadcastRows) {
            System.err.println(s"[joinBabe] build side has >$maxBroadcastRows rows; " +
              "falling back to a shuffle join (pass maxBroadcastRows<=0 to force broadcast)")
            dedupedBuild
          } else broadcast(dedupedBuild)
        }
      onError match {
        case OnError.NullPad =>
          df.join(hinted, df(key) === dedupedBuild(joinKey), "left")
            .drop(dedupedBuild(joinKey))
        case OnError.Skip =>
          df.join(hinted, df(key) === dedupedBuild(joinKey), "inner")
            .drop(dedupedBuild(joinKey))
        case OnError.Warn =>
          // Reference default logs each dropped probe row (join.py:44-45).
          // Distributed equivalent: a left join with an observed metric of
          // unmatched rows (surfaces via QueryExecutionListener after the
          // next action — no extra pass), then the inner filter.
          val marked = df.join(hinted, df(key) === dedupedBuild(joinKey), "left")
          val matchedFlag = dedupedBuild(joinKey).isNotNull
          marked
            .observe(s"joinBabe_warn_${KeyNormalize(key)}_${BabeOps.warnSeq.incrementAndGet()}",
              sum(when(matchedFlag, 0L).otherwise(1L)).as("unmatched_rows"))
            .filter(matchedFlag)
            .drop(dedupedBuild(joinKey))
        case OnError.Fail =>
          // Single pass: a left join whose projection raises on the first
          // unmatched probe row (the reference raises while streaming,
          // join.py:40-41). assert_true evaluates inside the scan — no
          // second probe pass, and the query dies at action time exactly
          // when a row has no build match.
          val marked = df.join(hinted, df(key) === dedupedBuild(joinKey), "left")
          val matchedFlag = dedupedBuild(joinKey).isNotNull
          // The raise lives in the Filter condition so it cannot be pruned:
          // matched rows short-circuit to true, unmatched rows evaluate
          // raise_error and kill the query in place.
          marked
            .filter(when(matchedFlag, lit(true)).otherwise(
              raise_error(concat(lit(s"joinBabe: unmatched row for key '$key': value "),
                df(key).cast(StringType))).cast("boolean")))
            .drop(dedupedBuild(joinKey))
      }
    }

    // ------------------------------------------------------------------
    // Reshaping
    // ------------------------------------------------------------------

    /** Melt (reference unpivot, unpivot.py:5-23): keep `ids`, emit one row per
      * value column as (name, value).
      */
    def unpivotBabe(ids: Seq[String], values: Seq[String],
                    nameField: String = "field", valueField: String = "value"): DataFrame =
      df.unpivot(ids.map(col).toArray, values.map(col).toArray, nameField, valueField)

    /** Pivot (reference pivot.py:49-85): group by `group`, pivot on
      * `pivotCol`'s observed values, output one `"$f-$v"` column per value
      * column f × pivot value v. The reference keeps the LAST row per
      * (group, pivot-value) (pivot.py:70-77) and orders output columns by
      * first-seen pivot value — both need an explicit order column here.
      * The distinct-pivot-value pre-pass collects a (small) value list to the
      * driver, which any pivot requires (column count must be plan-time).
      */
    def pivotBabe(group: Seq[String], pivotCol: String, orderCol: Column,
                  valueCols: Seq[String] = Nil, maxValues: Int = 10000): DataFrame = {
      // Fail fast on a high-cardinality pivot column: the value list must fit
      // on the driver (column count is plan-time), so fetch at most one row
      // past the cap instead of collecting an unbounded distinct set.
      val vals = df.groupBy(col(pivotCol)).agg(min(orderCol).as("__o"))
        .orderBy(col("__o")).select(pivotCol).limit(maxValues + 1).collect().map(_.get(0))
      require(vals.length <= maxValues,
        s"pivotBabe: pivot column '$pivotCol' has more than maxValues=$maxValues distinct values")
      val valueFields =
        if (valueCols.nonEmpty) valueCols
        else df.columns.filterNot(group.contains).filterNot(_ == pivotCol).toSeq
      val aggs = for (v <- vals.toSeq; f <- valueFields) yield
        max_by(when(col(pivotCol) === lit(v), col(f)),
               when(col(pivotCol) === lit(v), orderCol)).as(s"$f-$v")
      df.groupBy(group.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }

    /** Full transpose (reference transform.py:400-448): column names become a
      * `field` column; each row becomes a column named by its primary-key
      * value. Inherently driver-side (row count becomes column count) — the
      * guard keeps it honest at scale.
      */
    def transposeBabe(primaryKey: String, maxRows: Int = 10000): DataFrame = {
      val spark = df.sparkSession
      val cols = df.columns.filterNot(_ == primaryKey)
      val rows = df.select(col(primaryKey).cast(StringType) +:
        cols.toIndexedSeq.map(c => col(c).cast(StringType)): _*).collect()
      require(rows.length <= maxRows,
        s"transposeBabe: ${rows.length} rows > maxRows=$maxRows — transpose is driver-side by nature")
      val outNames = "field" +: rows.map(_.getString(0)).toSeq
      val outRows = cols.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.Row.fromSeq(c +: rows.map(_.getString(i + 1)).toSeq)
      }
      val schema = StructType(outNames.map(n => StructField(n, StringType)))
      spark.createDataFrame(spark.sparkContext.parallelize(outRows.toSeq, 1), schema)
    }

    // ------------------------------------------------------------------
    // Window (reference windowMap, transform.py:345-397)
    // ------------------------------------------------------------------

    /** Trailing `n`-row frame (incl. current row; shorter at stream start,
      * like the reference's FIFO Window, transform.py:334-342) under an
      * explicit order. Appends one column per (name, aggregate-builder) pair,
      * where the builder receives the frame spec.
      */
    def windowMap(n: Int, order: Seq[Column],
                  aggsOver: (String, org.apache.spark.sql.expressions.WindowSpec => Column)*): DataFrame = {
      val frame = Window.orderBy(order: _*).rowsBetween(-(n - 1).toLong, Window.currentRow)
      df.withColumns(aggsOver.map { case (name, f) => name -> f(frame) }.toMap)
    }

    /** Partitioned variant — per-substream windowMap. */
    def windowMapBy(n: Int, partitionCols: Seq[String], order: Seq[Column],
                    aggsOver: (String, org.apache.spark.sql.expressions.WindowSpec => Column)*): DataFrame = {
      val frame = Window.partitionBy(partitionCols.map(col): _*)
        .orderBy(order: _*).rowsBetween(-(n - 1).toLong, Window.currentRow)
      df.withColumns(aggsOver.map { case (name, f) => name -> f(frame) }.toMap)
    }

    /** Scale-safe GLOBAL trailing window: the unpartitioned `windowMap` is a
      * single-partition funnel (Spark warns, and at 100 TB it is a
      * non-starter). This two-pass form keeps the computation distributed:
      *
      *  1. range-partition + sort by the order column (Spark's global-sort
      *     machinery — each task holds one contiguous key range);
      *  2. every partition lends its LAST n-1 rows to the next partition
      *     (borrowed rows are tiny: (n-1) × partitions);
      *  3. the trailing frame runs per-partition including the borrowed
      *     prefix, which makes it exactly the global frame;
      *  4. borrowed rows are dropped from the output.
      *
      * Requires a duplicate-free order key (ties across a range boundary
      * would be frame-ambiguous — same caveat as any global order).
      */
    def windowMapGlobal(n: Int, orderCol: Column,
                        aggsOver: (String, org.apache.spark.sql.expressions.WindowSpec => Column)*): DataFrame = {
      val spark = df.sparkSession
      val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
      // Eager localCheckpoint instead of persist: the ranged input is read
      // three times (counts, tails, main pass); RDD-level caching is reclaimed
      // by the ContextCleaner once the plan is unreferenced, so repeated calls
      // never accumulate entries in the session CacheManager. (Tradeoff:
      // localCheckpoint blocks recovery from executor loss mid-query — the
      // standard caveat; acceptable for a materialize-once scratch stage.)
      val ranged = df.repartitionByRange(parts, orderCol)
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint()
      // Borrowing the predecessor's tail is only exact when every lending
      // partition holds >= n-1 rows. Range partitions can be short or empty
      // (skewed keys, small inputs), so coalesce contiguous partitions into
      // GROUPS of >= n-1 rows first — the per-partition count is a tiny
      // driver-side list (<= `parts` rows).
      val counts = ranged.groupBy(col("__pid")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      if (counts.isEmpty) {
        // Empty input: the plain window is free and shape-correct.
        val frame = Window.orderBy(orderCol).rowsBetween(-(n - 1).toLong, Window.currentRow)
        return df.withColumns(aggsOver.map { case (name, f) => name -> f(frame) }.toMap)
      }
      val maxPid = counts.keys.max
      val gidOfPid = new Array[Int](maxPid + 1)
      var gid = 0
      var acc = 0L
      for (pid <- 0 to maxPid) {
        gidOfPid(pid) = gid
        acc += counts.getOrElse(pid, 0L)
        // Close the group once it can lend a full n-1 tail; a short TRAILING
        // group is fine (it only borrows, never lends).
        if (acc >= (n - 1).toLong) { gid += 1; acc = 0L }
      }
      val numGroups = gidOfPid(maxPid) + 1
      val grouped = ranged.withColumn("__gid",
        element_at(array(gidOfPid.toSeq.map(g => lit(g)): _*), col("__pid") + 1))
      val wDesc = Window.partitionBy(col("__gid")).orderBy(orderCol.desc)
      val tails = grouped
        .withColumn("__rn", row_number().over(wDesc))
        .filter(col("__rn") <= n - 1 && col("__gid") < numGroups - 1).drop("__rn")
        .withColumn("__gid", col("__gid") + 1)
        .withColumn("__borrowed", lit(true))
      val all = grouped.withColumn("__borrowed", lit(false)).unionByName(tails)
      val frame = Window.partitionBy(col("__gid")).orderBy(orderCol)
        .rowsBetween(-(n - 1).toLong, Window.currentRow)
      all.withColumns(aggsOver.map { case (name, f) => name -> f(frame) }.toMap)
        .filter(!col("__borrowed")).drop("__pid", "__gid", "__borrowed")
    }
  }
}
