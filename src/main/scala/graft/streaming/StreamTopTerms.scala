package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming heavy-hitters monitor — the stream_profile discipline
  * (a mergeable sketch as the aggregation function of a streaming
  * group-by) applied to the Misra-Gries top-terms sketch
  * ([[graft.functions.HeavyHitters]]): the sketch buffer rides the
  * complete-mode state store across micro-batches and merges exactly
  * like batch partial aggregation, so the live vocabulary view costs
  * capacity-bounded state on an unbounded document stream — never a
  * per-word state row set that grows with the vocabulary.
  *
  * Below capacity the sketch is exact with max_undercount 0 (the
  * property the batch `text_heavy_hitters` oracle pins), so the
  * streaming twin lands on the batch relation exactly and SHARES its
  * DuckDB oracle.
  */
object StreamTopTerms {

  /** Word-exploded heavy-hitters aggregation over a document stream —
    * the streaming transform (separated so specs can drive it with
    * their own multi-batch sources).
    */
  def topTermsAgg(stream: DataFrame, capacity: Int): DataFrame =
    stream
      .select(explode(filter(split(lower(col("text")), " "), w => w =!= ""))
        .as("word"))
      .agg(graft.functions.HeavyHitters.heavy_hitters(col("word"), capacity)
        .as("hh"))

  /** Unpack + rank the sketch row into the batch query's output shape. */
  def finish(sketchRow: DataFrame, k: Int): DataFrame =
    sketchRow
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("word"), col("e._2").as("est_count"),
        col("e._3").as("max_undercount"))
      .orderBy(col("est_count").desc, col("word").asc)
      .limit(k)

  /** Run the monitor over a finite parquet input as a real streaming
    * query (file source → sketch aggregation through the state store →
    * memory sink), then the batch finish.
    */
  def runTopTermsOnce(
      spark: SparkSession,
      docsPath: String,
      queryName: String,
      capacity: Int = 1024,
      k: Int = 20): DataFrame =
    finish(
      EventStream.runToMemory(spark, docsPath, queryName,
        topTermsAgg(_, capacity), OutputMode.Complete()),
      k)
}
