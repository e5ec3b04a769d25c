package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming term-novelty: the first-introduction tracker of
  * [[graft.operators.TextAnalysis.termNovelty]] run as a stateful
  * stream — the ingestion-time form of "is this document adding
  * vocabulary?". A state store keyed by WORD records the id that first
  * introduced it; each micro-batch emits one (word, first_id) event per
  * never-before-seen word, and the post-stream finish joins those
  * events back to the docs to produce the batch relation exactly.
  *
  * Determinism: within a micro-batch the group sees every (word, id)
  * pair of the batch at once, so the smallest id wins regardless of
  * row order; across micro-batches the contract is id-ordered arrival
  * (one file, or files in id order) — same finite-backfill shape as
  * [[StreamNearDup]]. Under that contract the stream's first_id equals
  * the batch MIN(id) per word, which is what the shared doc_novelty
  * oracle checks.
  *
  * State: one long per DISTINCT WORD — vocabulary-bounded (sublinear in
  * corpus size for natural text, the Heaps regime), not corpus-bounded;
  * the store shards by word across executors, the same key the batch
  * path shuffles on.
  */
object StreamNovelty {

  /** (word, first_id) stream: one event per word, from the micro-batch
    * that introduced it. Append-mode stateful flatMap.
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
          if (state.exists) Iterator.empty
          else {
            val firstId = rows.map(_._2).min
            state.update(firstId)
            Iterator.single((word, firstId))
          }
        })
      .toDF("word", "first_id")
  }

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
      firsts, idCol)
  }
}
