package graft.streaming

import graft.queries.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** x57's kappa twin (the 16th): benchmark decontamination as an
  * INGEST GATE. The eval-gram probe set is the only state, and it
  * GROWS across micro-batches — a benchmark registered today must
  * contaminate training documents that arrive tomorrow:
  *   1. each arriving batch tokenizes ONCE and splits on the same
  *      deterministic holdout rule as the batch census
  *      ([[TextOps.evalHoldout]] — one definition, so the stream can
  *      never disagree with x57 about who is eval);
  *   2. the batch's EVAL docs add their distinct 8-grams
  *      ([[TextOps.grams8]]) to the probe set FIRST;
  *   3. the batch's TRAIN docs are then checked gram-keyed against
  *      the accumulated probe set (history + every batch ≤ this one)
  *      and every train doc gets a verdict row (doc_id, hits,
  *      contaminated) — hits 0 means clean, not absent.
  * Replaying the same days through the batch formula (probe = eval
  * grams of history + days ≤ i) gives bit-identical verdicts —
  * asserted in StreamingSpec.
  *
  * State is probe-set scale (distinct eval grams — benchmark bytes,
  * not corpus bytes) held as per-batch `localCheckpoint`s at test
  * scale; the production posture is a gram-bucketed table the loop
  * appends to, probed with the same hash join. The corpus never
  * re-tokenizes: each doc pays one tokenize pass in the batch it
  * arrives in, exactly the d14/DedupStream invariant.
  */
object DecontamStream {

  /** (doc_id, is_eval, g) distinct 8-grams of a (doc_id, text) frame
    * — the stream-side spelling of x57's gram pipeline, built from
    * the SAME shared expressions.
    */
  private def gramsOf(df: DataFrame): DataFrame =
    df.select(col("doc_id"), TextOps.words(col("text")).as("toks"))
      .withColumn("is_eval", TextOps.evalHoldout(col("doc_id")))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), col("is_eval"),
        explode(TextOps.grams8(col("toks"))).as("g"))

  /** Start the contamination gate over a STREAMING (doc_id, text)
    * frame. `history` is the day-0 corpus (its eval docs seed the
    * probe set; its train docs are NOT re-checked — they were gated
    * when they arrived). `onVerdicts` receives each micro-batch's
    * verdict frame (doc_id, hits, contaminated) for the batch's
    * train docs, keyed by batch id.
    */
  def contaminationGate(
      history: DataFrame,
      incoming: DataFrame,
      onVerdicts: (Long, DataFrame) => Unit): StreamingQuery = {
    var probe = gramsOf(history).filter(col("is_eval"))
      .select(col("g")).distinct().localCheckpoint()
    incoming.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val b = batch.select(col("doc_id"), col("text"))
          .localCheckpoint()
        if (!b.isEmpty) {
          val g = gramsOf(b).localCheckpoint()
          // eval docs of THIS batch register before its train docs
          // are checked — a benchmark and its leak in the same batch
          // must still collide
          val newEval = g.filter(col("is_eval")).select(col("g"))
          probe = probe.union(newEval).distinct().localCheckpoint()
          val train = b.withColumn("is_eval",
              TextOps.evalHoldout(col("doc_id")))
            .filter(!col("is_eval")).select(col("doc_id"))
          val hits = g.filter(!col("is_eval"))
            .join(probe, "g")
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("hits"))
          val verdicts = train.join(hits, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("hits"), lit(0L)).as("hits"),
              (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
          onVerdicts(id, verdicts)
        }
      }
      .start()
  }
}
