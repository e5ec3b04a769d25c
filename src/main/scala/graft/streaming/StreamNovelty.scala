package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming term-novelty: the first-introduction tracker of
  * [[graft.operators.TextAnalysis.termNovelty]] run as a stateful
  * stream — the ingestion-time form of "is this document adding
  * vocabulary?". A state store keyed by WORD records the smallest id
  * seen carrying it; each micro-batch emits one (word, first_id) event
  * per word whose batch-minimum id IMPROVES on (or first populates) the
  * stored one, and the post-stream finish min-folds the events and
  * joins them back to the docs to produce the batch relation exactly.
  *
  * Arrival-order independence (same argument as
  * [[StreamSpans]]): every stored id was itself emitted in the batch
  * that stored it, so for every word the globally smallest id is
  * emitted at least once — a late-arriving smaller id re-emits instead
  * of being swallowed — and the finish's MIN per word recovers the
  * exact batch `MIN(id)` under ANY batch split or order. No id-ordered
  * ingest contract.
  *
  * State: one long per DISTINCT WORD — vocabulary-bounded (sublinear in
  * corpus size for natural text, the Heaps regime), not corpus-bounded;
  * the store shards by word across executors, the same key the batch
  * path shuffles on.
  */
object StreamNovelty {

  /** (word, first_id) stream: one event per (word, batch) whose batch
    * minimum improves the stored first. Consumers MUST fold MIN per
    * word ([[foldFirsts]]); out-of-order ingest legitimately emits more
    * than one event per word.
    */
  def firstIntroductions(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.TextAnalysis.docWordsRelation(docs, idCol, textCol)
      .select(col("word"), col(idCol).cast("long").as("id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (word: String, rows: Iterator[(String, Long)],
            state: GroupState[Long]) => {
          val batchMin = rows.map(_._2).min
          if (state.getOption.exists(_ <= batchMin)) Iterator.empty
          else {
            state.update(batchMin)
            Iterator.single((word, batchMin))
          }
        })
      .toDF("word", "first_id")
  }

  /** Exact first introduction per word from the raw event stream — the
    * fold that makes out-of-order re-emissions invisible.
    */
  def foldFirsts(events: DataFrame): DataFrame =
    events.groupBy(col("word")).agg(min(col("first_id")).as("first_id"))

  /** Run the first-introduction stream over a finite parquet input,
    * then finish batch-side into termNovelty's exact relation:
    * (idCol, n_terms, n_new, novelty).
    */
  def runNoveltyOnce(
      spark: SparkSession,
      docsPath: String,
      queryName: String,
      idCol: String,
      textCol: String = "text"): DataFrame = {
    import graft.operators.TextAnalysis
    val firsts = EventStream.runToMemory(spark, docsPath, queryName,
      firstIntroductions(_, idCol, textCol), OutputMode.Append())
    TextAnalysis.noveltyFromFirstSeen(
      TextAnalysis.docWordsRelation(spark.read.parquet(docsPath), idCol,
        textCol),
      foldFirsts(firsts), idCol)
  }
}
