package graft.streaming

import graft.queries.TextCurationOps
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The kappa version of the URL-admission stage (x51's first two
  * funnel cuts, p01/p02 stage 0): a Structured Streaming
  * `foreachBatch` loop that admits crawl documents per micro-batch —
  *   1. canonicalizes the batch's raw URLs ROW-LOCALLY (the same
  *      regex parse the batch face runs,
  *      [[TextCurationOps.canonicalizeUrls]]),
  *   2. gates the registered domain against the broadcast blocklist,
  *   3. admits ONE doc per canonical URL within the batch (min
  *      doc_id — a key-partitioned row_number window, no global
  *      ordering), and
  *   4. drops any URL already admitted by history or an earlier batch
  *      (anti-join against the seen-URL state), then adds its own
  *      admitted URLs to that state.
  * A batch is therefore deduped against everything that arrived
  * before it but never re-admits across batches — replaying the
  * batches through the batch-mode admission gives identical rows when
  * arrival order respects doc_id order (asserted in StreamingSpec,
  * the d14 stream≡batch convention).
  *
  * State is per-batch `localCheckpoint`s at test scale; the
  * production posture is the d16 pattern — the seen-URL set lives as
  * a hash-partitioned parquet table of canonical URLs the loop
  * appends to, O(admitted URLs) storage, probed with the same
  * broadcast-or-shuffle anti-join per batch.
  */
object UrlAdmitStream {

  /** Batch-mode admission over an already-canonicalized frame: the
    * blocklist gate + one-doc-per-canonical-URL cut (shared by the
    * stream loop and the StreamingSpec equivalence check).
    */
  def admit(canon: DataFrame, blocklist: DataFrame): DataFrame =
    canon.join(broadcast(blocklist), Seq("domain"), "left_anti")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("canon_url")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn")

  /** Start the incremental admission loop. `history` is the day-0
    * already-canonicalized corpus (batch frame); `incoming` is a
    * STREAMING frame of raw rows (doc_id, …, raw_url); `onAdmitted`
    * receives each micro-batch's admitted frame keyed by batch id.
    */
  def urlAdmission(
      history: DataFrame,
      incoming: DataFrame,
      blocklist: Seq[String],
      onAdmitted: (Long, DataFrame) => Unit): StreamingQuery = {
    val spark = history.sparkSession
    import spark.implicits._
    val bl = blocklist.toDF("domain")
    var seen = admit(history, bl)
      .select(col("canon_url")).distinct().localCheckpoint()
    incoming.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val b = batch.toDF().localCheckpoint()
        if (!b.isEmpty) {
          val canon = TextCurationOps.canonicalizeUrls(b)
          val admitted = admit(canon, bl)
            .join(seen, Seq("canon_url"), "left_anti")
            .localCheckpoint()
          onAdmitted(id, admitted)
          seen = seen
            .union(admitted.select(col("canon_url")))
            .localCheckpoint()
        }
      }
      .start()
  }
}
