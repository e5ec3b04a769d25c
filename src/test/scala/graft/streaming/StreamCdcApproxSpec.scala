package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bounded-state estimate must (a) equal the batch KMV aggregate
  * exactly — the sketch is a deterministic set function, so streaming
  * micro-batch splits cannot move it — and (b) estimate within the
  * k-minimum-values error envelope of the true distinct count.
  */
class StreamCdcApproxSpec extends SparkSpec {

  test("streamed KMV estimate equals batch sketch and bounds the truth") {
    val src = sf() + "/documents.parquet"
    val row = StreamCdc
      .runApproxEstimateOnce(spark, src, "cdc_kmv_stream_spec")
      .collect().head

    val chunks = spark.read.parquet(src)
      .select(graft.plans.CdcChunks.cdc_chunks(
        encode(col("text"), "UTF-8"), minLen = 16, maxLen = 256, maskBits = 5))
      .select(col("hash"), col("size"))
    val batch = chunks.agg(
      sum(col("size")), count(lit(1)),
      graft.functions.KmvSketch.kmv_distinct(col("hash"), 1024)).head()

    assert(row.getLong(0) == batch.getLong(0), "total_bytes")
    assert(row.getLong(1) == batch.getLong(1), "occurrences")
    assert(row.getLong(2) == batch.getLong(2),
      "streamed sketch diverged from batch — KMV must be split-invariant")

    val exact = chunks.select(col("hash")).distinct().count()
    val est = row.getLong(2).toDouble
    // k = 1024 ⇒ rsd ≈ 1/√(k−2) ≈ 3.1%; 6σ envelope on deterministic data
    assert(math.abs(est - exact) / exact < 0.19,
      s"kmv $est vs exact $exact out of envelope")
    val ratio = row.getDouble(4)
    assert(ratio > 0.0 && ratio <= 1.5, s"ratio $ratio") // estimate may exceed 1 slightly
  }
}
