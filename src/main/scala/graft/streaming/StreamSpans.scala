package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact-substring dedup — [[graft.operators.Dedupe.cutDuplicateSpans]]
  * as a continuous ingestion filter. Keep-earliest is CAUSAL in
  * (doc_id, pos) order: whether an occurrence survives depends only on
  * occurrences at smaller (doc_id, pos), so a stream processing documents
  * in id order decides exactly like the batch rewrite — the property that
  * makes ExactSubstr dedup deployable at ingest time ("cut the paragraphs
  * we already have") rather than as a corpus-wide afterpass.
  *
  * Shape: a state store keyed by WINDOW HASH records the earliest
  * (doc_id, pos) that carried it; each micro-batch emits one first-
  * occurrence event per never-before-seen window (within a batch the
  * group sees every occurrence at once, so the lexicographic minimum wins
  * regardless of row order; across batches the contract is id-ordered
  * arrival — the same finite-backfill contract as [[StreamNovelty]] /
  * [[StreamNearDup]]). The post-stream finish joins the first-occurrence
  * relation back to the documents and replays the batch cut kernel, so
  * the stream lands on [[graft.operators.Dedupe.cutDuplicateSpans]]'s
  * relation EXACTLY — one shared DuckDB oracle for both.
  *
  * State: one (long, long) per DISTINCT WINDOW — bounded by distinct
  * corpus windows (the exact-mode contract, like stream_cdc's per-hash
  * store; StreamRestartRun is the restart-survival proof for this state
  * class). Sharded by window hash, the same key the batch path
  * aggregates on.
  */
object StreamSpans {

  /** (win, f_id, f_pos) append stream: one event per distinct window,
    * from the micro-batch that introduced it, carrying the earliest
    * occurrence.
    */
  def firstWindows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = windowTokens
    docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        graft.operators.Dedupe.windowHashes(text, w).iterator.zipWithIndex
          .map { case (h, i) => (h, id, (i + 1).toLong) }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (win: Long, rows: Iterator[(Long, Long, Long)],
            state: GroupState[(Long, Long)]) => {
          if (state.exists) Iterator.empty
          else {
            val first = rows.map(r => (r._2, r._3)).min
            state.update(first)
            Iterator.single((win, first._1, first._2))
          }
        })
      .toDF("win", "f_id", "f_pos")
  }

  /** Run the first-window stream over a finite parquet input, then
    * finish batch-side into the exact [[graft.operators.Dedupe.cutDuplicateSpans]]
    * relation: (doc_id, n_tokens, cut_tokens, text_cut).
    */
  def runCutOnce(
      spark: SparkSession,
      docsPath: String,
      queryName: String,
      idCol: String,
      textCol: String = "text",
      windowTokens: Int = 20): DataFrame = {
    val firsts = EventStream.runToMemory(spark, docsPath, queryName,
      firstWindows(_, idCol, textCol, windowTokens), OutputMode.Append())
    graft.operators.Dedupe.cutFromFirstOccurrences(
      spark.read.parquet(docsPath), idCol, textCol, windowTokens, firsts)
  }
}
