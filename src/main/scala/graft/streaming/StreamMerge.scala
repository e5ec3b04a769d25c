package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MERGE — [[graft.operators.MergeApply]]'s changelog fold as
  * a stateful stream: changes arrive continuously (the CDC-ingest
  * shape), a state store keyed by the MERGE KEY tracks the highest seq
  * applied so far, and a change is emitted downstream only when it
  * BEATS that seq — the monotone upsert-event stream a live-maintained
  * table consumes. The post-stream finish folds the emitted events into
  * the snapshot with the batch operator itself, so the stream must land
  * on the batch merge exactly (shared oracle).
  *
  * State: one long (the winning seq) per TOUCHED key — delta-bounded,
  * not corpus-bounded, and sharded on the merge key, the same key the
  * batch path's delta aggregation shuffles on. Out-of-order arrivals
  * across micro-batches resolve correctly because a stale seq never
  * beats the stored one; within a micro-batch the group sees all of the
  * batch's changes for its key at once, so the max-seq row wins
  * regardless of row order.
  */
object StreamMerge {

  /** Public (not private) because the codegen'd encoder projection
    * lives outside this object and can't touch a private class. */
  case class Change(key: Long, seq: Long, op: String, payload: String)

  /** Monotone upsert-event stream: one (key, seq, op, payload…) row per
    * micro-batch-and-key whose best change improves on the state's seq.
    * Works for ANY payload column set: the payload rides through the
    * typed stateful operator as a JSON-packed struct (the encoder needs
    * a fixed shape; a hard-coded column list would silently break on
    * other changelogs) and is unpacked to its original schema after.
    */
  def latestChanges(
      changes: DataFrame, keyCol: String, payloadCols: Seq[String]): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._
    require(payloadCols.nonEmpty, "payloadCols must not be empty")
    val payloadSchema = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => changes.schema(c)))
    changes
      .select(col(keyCol).cast("long").as("key"), col("seq").cast("long"),
        col("op"),
        to_json(struct(payloadCols.map(col): _*)).as("payload"))
      .as[Change]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[Change], state: GroupState[Long]) => {
          val best = rows.maxBy(_.seq)
          if (state.getOption.forall(best.seq > _)) {
            state.update(best.seq)
            Iterator.single(best)
          } else Iterator.empty
        })
      .toDF("key", "seq", "op", "payload")
      .withColumn("_p", from_json(col("payload"), payloadSchema))
      .select(col("key") +: col("seq") +: col("op") +:
        payloadCols.map(c => col(s"_p.$c").as(c)): _*)
  }

  /** Run the changelog stream over a finite parquet input (transformed
    * in-stream by `changelogOf` — filters/projections/unions, the
    * [[StreamDrift]] revise contract), then finish by folding the
    * emitted upsert events into `snapshot` with the batch
    * [[graft.operators.MergeApply.merge]]. Emitted events are
    * themselves a changelog (each key's rows strictly seq-increasing
    * across micro-batches), so the batch fold's max_by collapse picks
    * the stream's final state per key.
    */
  def runMergeOnce(
      spark: SparkSession,
      inputPath: String,
      queryName: String,
      changelogOf: DataFrame => DataFrame,
      snapshot: DataFrame,
      keyCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val events = EventStream.runToMemory(spark, inputPath, queryName,
      s => latestChanges(changelogOf(s), keyCol, payloadCols),
      OutputMode.Append())
      .withColumnRenamed("key", keyCol)
    graft.operators.MergeApply.merge(
      snapshot, events, keyCol, payloadCols)
  }
}
