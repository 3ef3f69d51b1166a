package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Chat-format training-example assembly — the step between raw interaction
  * logs and an SFT/RLHF dataset: keyed, ordered turns render into one
  * transcript per key ("role: text" lines), together with the character
  * ranges of the trainable role's lines. The ranges ARE the loss mask: an
  * SFT trainer masks every token outside them so gradients flow only
  * through assistant spans (the standard multi-turn fine-tuning contract),
  * and emitting them as offsets next to the text keeps the example a plain
  * (string, string) pair any tokenizer-side masking can consume.
  *
  * The reference's closest surface is the Kontagent event pipeline
  * (pybabe/kontagent.py:99-204 — parse, per-user grouping) composed with
  * group/reduce; this is that composition productized for the training-data
  * case.
  */
object Transcripts {

  /** One training example per key: (keyCols…, transcript, n_turns, mask).
    *
    *  - `transcript` = "role: text" lines joined by '\n' in `orderCols`
    *    order (make the ordering unique — e.g. (ts, event_id) — or tied
    *    turns have no defined line order);
    *  - `mask` = ';'-joined "start-end" ranges (0-based, end exclusive)
    *    of the `maskRole` lines' characters inside `transcript`, "" when
    *    the key has none. Offsets count the joining newlines, so
    *    `transcript.substring(start, end)` is exactly the masked line.
    *
    * All arithmetic is integer (lengths + one running sum over the same
    * window that orders the lines), so the output replays bit-for-bit in
    * ANSI SQL. Scale shape: ONE hash exchange on the key serves both the
    * running-offset window and the final aggregation; per-key memory is
    * the key's turn list (the grouped-transcript contract — bound turn
    * counts upstream with `head`/sessionization when keys are unbounded).
    */
  def assemble(turns: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
               roleCol: String, textCol: String,
               maskRole: String = "assistant"): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "assemble needs at least one key column and one order column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    val withLine = turns
      .withColumn("__line",
        concat(col(roleCol), lit(": "), coalesce(col(textCol), lit(""))))
      .withColumn("__len", length(col("__line")).cast(LongType))
      .withColumn("__start",
        coalesce(sum(col("__len") + lit(1L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__ord", row_number().over(w))
    withLine.groupBy(keyCols.map(col): _*)
      .agg(
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("__ord").as("o"),
            col("__line").as("l")))), p => p.getField("l"))).as("transcript"),
        count(lit(1)).as("n_turns"),
        concat_ws(";",
          transform(array_sort(collect_list(
            when(col(roleCol) === maskRole,
              struct(col("__ord").as("o"),
                concat_ws("-", col("__start"),
                  col("__start") + col("__len")).as("r"))))),
            p => p.getField("r"))).as("mask"))
  }
}
