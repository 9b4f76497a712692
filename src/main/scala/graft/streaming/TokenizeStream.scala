package graft.streaming

import graft.queries.TextCurationOps
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** The kappa version of x48's frozen-tokenizer incremental encode: a
  * `foreachBatch` loop tokenizing documents AS THEY ARRIVE against the
  * day-0 stored artifacts (merge table + vocab). Tokenization with a
  * frozen tokenizer is STATELESS — each micro-batch is one projection
  * + one vocabulary-map broadcast, no cross-batch state, which is
  * exactly why production corpus ingestion tokenizes on the stream:
  * the expensive, stateful part (training) happened once at day 0.
  * The only running state is the corpus token/OOV mass the caller
  * accumulates from the per-batch censuses (an associative integer
  * sum — order-insensitive, restart-safe).
  *
  * Stream ≡ batch is asserted in StreamingSpec: per-doc census rows
  * emitted across micro-batches equal x48's batch output on the same
  * slice bit-for-bit, and the accumulated token mass equals the batch
  * aggregate.
  */
object TokenizeStream {

  /** Start the encode loop over a STREAMING (doc_id, text) frame.
    * `merges` is the stored rank-ordered merge table; `vocab` the
    * stored (tok, id) frame. `onBatch` receives each micro-batch's
    * per-doc census (x48's schema) keyed by batch id.
    */
  def encode(
      incoming: DataFrame,
      merges: Seq[(String, String)],
      vocab: DataFrame,
      onBatch: (Long, DataFrame) => Unit): StreamingQuery =
    incoming.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batch.isEmpty)
          onBatch(id, TextCurationOps.encodeWithStoredTokenizer(
            batch, merges, vocab))
      }
      .start()
}
