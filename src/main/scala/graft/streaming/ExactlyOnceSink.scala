package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** Exactly-once micro-batch parquet sink.
  *
  * Structured Streaming's `foreachBatch` delivers each micro-batch
  * AT LEAST once: a crash between the sink write and the checkpoint
  * commit (`commits/<id>` in the WAL) replays the same batch id — with
  * the same data, pinned by the offset log — on restart. Exactly-once
  * therefore requires the WRITE to be idempotent in the batch id, the
  * transaction id the engine supplies. Here each batch lands in its
  * own `batch_id=<id>` partition under DYNAMIC partition overwrite: a
  * replayed batch atomically replaces its own partition instead of
  * appending a duplicate, and distinct batch ids never touch each
  * other's partitions — so any prefix of replays converges to the same
  * store. (The transactional-target form with the same contract is a
  * JDBC MERGE keyed on (batch_id, key); this is the file-store form,
  * and the partition column doubles as write provenance.)
  *
  * StreamingEtlSpec proves the contract by deleting `commits/0` after
  * a run — the crash-before-commit simulation — restarting, and
  * asserting the replayed store has no duplicates while a plain
  * `append` control sink written from the same batches does.
  */
object ExactlyOnceSink {

  /** Idempotent foreachBatch body: write `batch` under
    * `out/batch_id=<batchId>/`, replacing any previous (partial or
    * complete) attempt of the SAME batch id only. The overwrite mode
    * is a per-WRITE option, not a session conf mutation — a
    * set/restore dance on the shared session would race with any
    * concurrent writer (its restore to `static` mid-plan would turn
    * another query's overwrite into a full-store truncation).
    */
  def writeBatch(batch: DataFrame, batchId: Long, out: String): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(out)
}
