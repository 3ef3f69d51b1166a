package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming re-expression of the reference's incremental
  * pattern: hour-partitioned ingestion with idempotent per-partition reload
  * (/root/reference/pybabe/kontagent.py:245-293 + sql.py:292-305) becomes a
  * file-source stream with event-time windows and watermarked state — the
  * engine-native version of "fetch each hour, reload its partition".
  */
object Streams {

  /** Streaming file source over a directory of files with a known schema —
    * the reference's hour-directory poll loop (kontagent.py:272-293), minus
    * the hand-rolled cache/pool: checkpointing gives exactly-once file
    * accounting.
    */
  def fileStream(spark: SparkSession, path: String, schema: StructType,
                 format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format).load(path)

  /** Watermarked tumbling-window aggregation — the hour-bucketed rollup the
    * reference materializes per partition (kontagent header.partition
    * {date, hour}): one output row per (window, keys...) with late data
    * bounded by the watermark.
    */
  def windowedAgg(events: DataFrame, timeCol: String, watermark: String,
                  window_ : String, keys: Seq[String],
                  aggs: (String, org.apache.spark.sql.Column)*): DataFrame = {
    require(aggs.nonEmpty, "windowedAgg needs at least one (name, aggregate) pair")
    events.withWatermark(timeCol, watermark)
      .groupBy((window(col(timeCol), window_) +: keys.map(col)): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Streaming exact dedup bounded by a watermark: the streaming analogue of
    * the batch `dedup` — state holds only keys younger than the watermark,
    * so memory is bounded by the dedup horizon instead of the stream's
    * lifetime (the only viable shape for an unbounded 100 TB/day feed).
    */
  def dedupWithinWatermark(events: DataFrame, timeCol: String, watermark: String,
                           keyCols: Seq[String]): DataFrame =
    events.withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Declarative gap sessionization via the built-in `session_window`
    * (preferred over custom state when plain windowed aggregates suffice —
    * the engine's declarative-first rule): one output row per (key,
    * session), where a session closes after `gap` of event-time silence
    * past the watermark. Use `sessionize` (flatMapGroupsWithState) only
    * when per-event custom logic inside the session is needed.
    */
  def sessionWindowAgg(events: DataFrame, timeCol: String, watermark: String,
                       gap: String, keys: Seq[String],
                       aggs: (String, org.apache.spark.sql.Column)*): DataFrame = {
    require(aggs.nonEmpty, "sessionWindowAgg needs at least one (name, aggregate) pair")
    events.withWatermark(timeCol, watermark)
      .groupBy((session_window(col(timeCol), gap) +: keys.map(col)): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Watermarked stream-stream interval join — the attribution shape (e.g.
    * clicks joined to the impression they followed within `within`). Both
    * sides carry watermarks and the join predicate bounds right-time to
    * [left-time, left-time + within], so Spark can prove state expiry on
    * BOTH sides: buffered rows older than watermark + interval are evicted,
    * keeping state bounded by the attribution horizon instead of the
    * stream's lifetime — the only viable shape for an unbounded feed.
    * Column names must be disjoint between the two sides (the usual
    * stream-stream join requirement); `leftKey`/`rightKey` name the equi-join
    * columns on each side.
    */
  def intervalJoin(left: DataFrame, leftTime: String, leftWatermark: String,
                   right: DataFrame, rightTime: String, rightWatermark: String,
                   leftKey: String, rightKey: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTime, leftWatermark)
    val r = right.withWatermark(rightTime, rightWatermark)
    l.join(r, expr(
      s"`$leftKey` = `$rightKey` AND `$rightTime` >= `$leftTime` " +
        s"AND `$rightTime` <= `$leftTime` + interval $within"))
  }

  /** Session output record for `sessionize`. */
  case class SessionOut(key: Long, start: java.sql.Timestamp, end: java.sql.Timestamp,
                        events: Long)

  /** Custom-state sessionization via flatMapGroupsWithState: groups events by
    * key; a session closes when consecutive events (sorted by event time) are
    * more than `gapMs` apart — closed sessions are emitted in the same batch —
    * and the trailing OPEN session is closed by the processing-time timeout
    * once the stream goes silent. The `KeyValueGroupedDataset` state path —
    * the engine's general stateful surface (SURVEY §2.11 extension).
    */
  def sessionize(events: Dataset[(Long, java.sql.Timestamp)], gapMs: Long): Dataset[SessionOut] = {
    implicit val outEnc: Encoder[SessionOut] = Encoders.product[SessionOut]
    implicit val stEnc: Encoder[(Long, Long, Long)] = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    events.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(
        (key: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long)]) => {
          if (state.hasTimedOut) {
            val (s, e, n) = state.get
            state.remove()
            Iterator(SessionOut(key, new java.sql.Timestamp(s), new java.sql.Timestamp(e), n))
          } else {
            // Walk the batch's timestamps in event-time order, extending the
            // open session or closing it when the gap is exceeded; only the
            // trailing session stays in state.
            val ts = rows.map(_._2.getTime).toArray.sorted
            val closed = Seq.newBuilder[SessionOut]
            var open = state.getOption
            ts.foreach { t =>
              open = open match {
                case Some((s, e, n)) if t - e > gapMs =>
                  closed += SessionOut(key, new java.sql.Timestamp(s), new java.sql.Timestamp(e), n)
                  Some((t, t, 1L))
                case Some((s, e, n)) =>
                  Some((s, math.max(e, t), n + 1))
                case None =>
                  Some((t, t, 1L))
              }
            }
            open.foreach(state.update)
            state.setTimeoutDuration(gapMs)
            closed.result().iterator
          }
        })
  }

  /** One heavy-hitter candidate as of the latest trigger: `est` is the
    * Misra-Gries counter (an UNDERcount), and est + err bounds the true
    * count from above, where err = floor(processed/(capacity+1)) for the
    * item's shard. Any item whose shard-local true count exceeds err is
    * guaranteed present.
    */
  case class HeavyHitter(shard: Int, item: String, est: Long, err: Long)

  /** Streaming heavy hitters — the unbounded-feed counterpart of
    * `Sketches.topKExact`: each shard keeps a Misra-Gries summary of at most
    * `capacity` counters in group state and re-emits its current candidates
    * every trigger (Update mode), so the "what's trending in the ingest
    * feed" question is answerable continuously without ever shuffling the
    * full token cardinality or growing state with the stream.
    *
    * Input rows are (shard, item). Shard by a HASH of the item
    * (`pmod(xxhash64(item), nShards)`) so every occurrence of an item
    * routes to the SAME shard: per-shard sketches then never split an
    * item's count, the union of shard candidates is the global candidate
    * set, and adding shards scales throughput linearly. State per shard is
    * O(capacity) forever — no watermark needed because MG state never
    * grows.
    */
  def streamingHeavyHitters(items: Dataset[(Int, String)],
                            capacity: Int): Dataset[HeavyHitter] = {
    require(capacity > 0, "streamingHeavyHitters needs a positive capacity")
    implicit val outEnc: Encoder[HeavyHitter] = Encoders.product[HeavyHitter]
    implicit val stEnc: Encoder[(Map[String, Long], Long)] =
      Encoders.tuple(Encoders.kryo[Map[String, Long]], Encoders.scalaLong)
    items.groupByKey(_._1)(Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (shard: Int, rows: Iterator[(Int, String)],
         state: GroupState[(Map[String, Long], Long)]) => {
          val (saved, seen) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
          val mg = scala.collection.mutable.HashMap[String, Long](saved.toSeq: _*)
          var processed = seen
          rows.foreach { case (_, x) =>
            processed += 1L
            mg.get(x) match {
              case Some(c) => mg.update(x, c + 1L)
              case None =>
                if (mg.size < capacity) mg.update(x, 1L)
                else {
                  mg.mapValuesInPlace((_, v) => v - 1L)
                  mg.filterInPlace((_, v) => v > 0L)
                }
            }
          }
          state.update((mg.toMap, processed))
          val err = processed / (capacity + 1)
          mg.toSeq.sortBy { case (i, e) => (-e, i) }
            .map { case (i, e) => HeavyHitter(shard, i, e, err) }.iterator
        })
  }

  /** Continuous release integrity — `Releases.manifest`'s checksum core
    * applied to an ingest stream: per-source row count, char mass, and the
    * 60-bit XOR-of-row-hash checksum, re-emitted every trigger (Update
    * mode). XOR's order independence is what makes this streamable at all:
    * the running checksum after any prefix of the feed equals the batch
    * checksum of the rows seen, so an ingest's manifest can be compared
    * against the releasing side's the moment the feed drains — no
    * end-of-day batch recount. (The exact distinct-fingerprint audit stays
    * batch-side: distinct aggregation is not incremental; swap in
    * `approx_count_distinct` here if a streaming dedup signal is needed.)
    * State per source is three scalars — O(groups) forever.
    */
  def streamingManifest(rows: DataFrame, groupCol: String, idCol: String,
                        textCol: String): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    // U+0001 join + U+0002 null sentinel, matching Releases.manifest — see
    // the aliasing note there (':' in a string id, null ids).
    rows.withColumn("__h",
        graft.operators.Sampling.portableHash60(concat_ws("\u0001",
          coalesce(col(idCol).cast("string"), lit("\u0002")), txt)))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), sum(length(txt)).as("n_chars"),
        expr("bit_xor(__h)").as("checksum"))
  }

  /** One CDC change event: op ∈ I/U/D, higher `version` wins, and a D/U tie
    * at the same version resolves U-first — the exact precedence of the
    * batch `Releases.applyCdc` (op desc: 'U' > 'I' > 'D').
    */
  case class CdcChange(key: Long, version: Long, op: String,
                       source: String, nChars: Long)

  /** The current row a key resolves to after the changes seen so far. */
  case class CdcCurrent(key: Long, version: Long, source: String, nChars: Long)

  /** Continuously-maintained MERGE INTO: the streaming twin of
    * `Releases.applyCdc`. Each key's group state holds only the WINNING
    * change (version, op, payload) — one fixed-size record per KEY EVER
    * SEEN, independent of feed length. Deleted keys keep their D record
    * (required: it is what suppresses a late lower-version update from
    * resurrecting the row), so state tracks the key universe, not the
    * live table — bound it in production with a version floor (drop state
    * below the batch-compaction watermark) when the key churn is high.
    * Every trigger re-emits the keys it touched with their post-merge
    * current row (Update mode upsert stream). Deleted keys emit nothing;
    * sinks that need tombstones forward the D from the feed itself.
    * Ops outside I/U/D fail the trigger — the same fail-fast contract as
    * the batch operator (a lowercase 'u' would silently outrank 'U' in
    * the lexicographic tie-break).
    *
    * Batch parity is structural: folding the batch's rows with the saved
    * state by max (version, op) is associative and commutative with the
    * batch operator's `row_number over (order by version desc, op desc)`
    * pick, so replaying any prefix of the feed through this function and
    * the rest through batch applyCdc lands on the same table — the
    * property that makes a lambda architecture (nightly batch + intraday
    * stream) safe to mix.
    */
  def applyCdcStream(changes: Dataset[CdcChange]): Dataset[CdcCurrent] = {
    implicit val outEnc: Encoder[CdcCurrent] = Encoders.product[CdcCurrent]
    implicit val stEnc: Encoder[CdcChange] = Encoders.product[CdcChange]
    changes.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (key: Long, rows: Iterator[CdcChange], state: GroupState[CdcChange]) => {
          val all = rows.map { c =>
            require(c.op == "I" || c.op == "U" || c.op == "D",
              s"applyCdcStream: op must be I|U|D, got '${c.op}' for key ${c.key}")
            c
          } ++ state.getOption.iterator
          val best = all.maxBy(c => (c.version, c.op))
          state.update(best)
          if (best.op == "D") Iterator.empty
          else Iterator.single(CdcCurrent(key, best.version, best.source, best.nChars))
        })
  }
}
