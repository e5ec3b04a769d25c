package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamCdcSpec extends SparkSpec {

  test("streamed CDC estimate equals the batch chunk-merge exactly") {
    val src = sf() + "/documents.parquet"
    val streamed = StreamCdc
      .runEstimateOnce(spark, src, "cdc_est_stream_spec")
      .collect()
    assert(streamed.length == 1)
    val row = streamed.head

    // batch twin: same chunker expression, same params, relational merge
    val batch = spark.read.parquet(src)
      .select(graft.plans.CdcChunks.cdc_chunks(
        encode(col("text"), "UTF-8"), minLen = 16, maxLen = 256, maskBits = 5))
      .groupBy(col("hash"))
      .agg(min(col("size")).as("size"), sum(col("size")).as("occ"))
      .agg(sum(col("occ")), sum(col("size")), count(lit(1)))
      .head()

    assert(row.getLong(0) == batch.getLong(0), "total_bytes")
    assert(row.getLong(1) == batch.getLong(1), "unique_bytes")
    assert(row.getLong(2) == batch.getLong(2), "unique_chunks")
    val ratio = row.getDouble(3)
    assert(ratio == batch.getLong(1).toDouble / batch.getLong(0).toDouble)
    // real dedup exists in the documents corpus (planted duplicates), so
    // the monitor must read below 1.0 — a ratio of exactly 1.0 would mean
    // the merge state deduplicated nothing and the query is vacuous
    assert(ratio > 0.0 && ratio < 1.0, s"ratio $ratio")
  }
}
