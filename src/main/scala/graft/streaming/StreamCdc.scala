package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The reference's flagship dedup ESTIMATE as a continuous monitor: chunk
  * every arriving document at content-defined boundaries and maintain the
  * running unique-bytes/total-bytes ratio — the "is my ingest stream
  * bringing new content or re-uploads?" gauge a 100 TB ingestion pipeline
  * watches (the batch twin is `cdc_estimate`/`doc_cdc`).
  *
  * Shape: the stateless [[graft.plans.CdcChunks]] codegen Generator runs
  * inside each micro-batch (chunking is per-payload, so a stream chunks
  * exactly like the batch scan), and the only stateful operator is the
  * per-hash merge `groupBy(hash).agg(min(size), sum(size))` — the A1
  * estimator shuffle as a complete-mode streaming aggregation, whose state
  * is exactly the merged chunk relation a batch run would shuffle.
  * Unbounded-corpus deployments swap the exact per-hash state for
  * [[runApproxEstimateOnce]]'s KMV sketch (fixed-size state) or emit
  * windowed deltas; the exact mode here is the finite-backfill /
  * bounded-chunk-space contract, same as [[EventStream.dedupKeys]].
  */
object StreamCdc {

  /** Run the estimate over a finite parquet documents input as a real
    * streaming query (file source → chunk → stateful merge → memory sink),
    * then reduce the sunk per-hash relation to the one-row report
    * (total_bytes, unique_bytes, unique_chunks, dedup_ratio).
    */
  def runEstimateOnce(
      spark: SparkSession,
      dir: String,
      queryName: String,
      textCol: String = "text",
      minLen: Int = 16,
      maxLen: Int = 256,
      maskBits: Int = 5): DataFrame = {
    val merged = EventStream.runToMemory(spark, dir, queryName,
      df => df
        .select(graft.plans.CdcChunks.cdc_chunks(
          encode(col(textCol), "UTF-8"), minLen, maxLen, maskBits))
        .select(col("hash"), col("size"))
        .groupBy(col("hash"))
        // MIN(size): sizes agree per hash; min pins a deterministic pick,
        // mirroring the cdc_estimate oracle shape
        .agg(min(col("size")).as("size"), sum(col("size")).as("occ_bytes")),
      OutputMode.Complete())
    merged.agg(
        sum(col("occ_bytes")).as("total_bytes"),
        sum(col("size")).as("unique_bytes"),
        count(lit(1)).as("unique_chunks"))
      .withColumn("dedup_ratio",
        col("unique_bytes").cast("double") / col("total_bytes").cast("double"))
  }

  /** BOUNDED-STATE variant for genuinely unbounded streams — the shape
    * [[runEstimateOnce]]'s scaladoc promises: no per-hash state at all.
    * The whole streaming state is one mergeable KMV sketch (k sorted
    * longs, [[graft.functions.KmvSketch]]) plus two counters, so the
    * monitor runs forever at fixed memory; unique bytes are estimated as
    * kmv_distinct × mean chunk size (the `statsApprox` formula).
    *
    * KMV over HLL here on purpose: Spark's HLL++ register estimate is not
    * reproducible outside Spark, while the KMV estimator is deterministic
    * order-statistics arithmetic a SQL oracle mirrors operation-for-
    * operation — so even the approximate monitor stays cell-exact
    * verifiable (`stream_cdc_approx`).
    */
  def runApproxEstimateOnce(
      spark: SparkSession,
      dir: String,
      queryName: String,
      textCol: String = "text",
      minLen: Int = 16,
      maxLen: Int = 256,
      maskBits: Int = 5,
      k: Int = 1024): DataFrame = {
    val agg = EventStream.runToMemory(spark, dir, queryName,
      df => df
        .select(graft.plans.CdcChunks.cdc_chunks(
          encode(col(textCol), "UTF-8"), minLen, maxLen, maskBits))
        .select(col("hash"), col("size"))
        .agg(
          coalesce(sum(col("size")), lit(0L)).as("total_bytes"),
          count(lit(1)).as("occurrences"),
          graft.functions.KmvSketch.kmv_distinct(col("hash"), k)
            .as("kmv_unique_chunks")),
      OutputMode.Complete())
    // mirror the oracle's double arithmetic operation-for-operation
    val approxBytes = col("kmv_unique_chunks").cast("double") *
      (col("total_bytes").cast("double") / col("occurrences").cast("double"))
    agg.select(
      col("total_bytes"), col("occurrences"), col("kmv_unique_chunks"),
      approxBytes.as("approx_unique_bytes"),
      (approxBytes / col("total_bytes").cast("double")).as("approx_dedup_ratio"))
  }
}
