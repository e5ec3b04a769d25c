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

  /** Monotone upsert-event stream: one (key, seq, op, payload…) row per
    * micro-batch-and-key whose best change improves on the state's seq.
    * Works for ANY payload column set AND type: the payload rides
    * through the typed stateful operator as a generic Row under an
    * `Encoders.row` encoder built from the changelog's own schema — a
    * lossless binary-safe packing (double bit patterns, binary blobs,
    * and nulls survive exactly; the earlier JSON packing rested on
    * Jackson's round-trip for doubles and base64 for binary).
    *
    * @param opCol / seqCol changelog column names, same defaults as the
    *   batch [[graft.operators.MergeApply.merge]] — a changelog that
    *   works in the batch path must work in the streaming twin.
    */
  def latestChanges(
      changes: DataFrame, keyCol: String, payloadCols: Seq[String],
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._
    require(payloadCols.nonEmpty, "payloadCols must not be empty")
    val packed = changes
      .select(col(keyCol).cast("long").as("key"),
        col(seqCol).cast("long").as("seq"), col(opCol).as("op"),
        struct(payloadCols.map(col): _*).as("payload"))
    implicit val rowEnc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(packed.schema)
    packed
      .groupByKey(_.getLong(0))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[org.apache.spark.sql.Row],
            state: GroupState[Long]) => {
          val best = rows.maxBy(_.getLong(1))
          if (state.getOption.forall(best.getLong(1) > _)) {
            state.update(best.getLong(1))
            Iterator.single(best)
          } else Iterator.empty
        })
      .select(col("key") +: col("seq") +: col("op") +:
        payloadCols.map(c => col(s"payload.$c").as(c)): _*)
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
      payloadCols: Seq[String],
      opCol: String = "op",
      seqCol: String = "seq"): DataFrame = {
    val events = EventStream.runToMemory(spark, inputPath, queryName,
      s => latestChanges(changelogOf(s), keyCol, payloadCols, opCol, seqCol),
      OutputMode.Append())
      .withColumnRenamed("key", keyCol)
      .withColumnRenamed("seq", seqCol)
      .withColumnRenamed("op", opCol)
    graft.operators.MergeApply.merge(
      snapshot, events, keyCol, payloadCols, opCol, seqCol)
  }
}
