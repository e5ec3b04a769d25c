package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The production property the memory-sink harness can't show: stream_cdc's
  * per-hash merge state lives in the checkpointed state store, so a stopped
  * query RESUMES over new files and lands on exactly the batch answer for
  * the full corpus — no re-chunking of already-seen documents, no lost
  * uniques. This is what makes the monitor deployable on a real ingest
  * directory: restarts (deploys, crashes) are invisible in the ratio.
  */
class StreamCdcRestartSpec extends SparkSpec {

  test("checkpointed estimate resumes across restart and matches batch") {
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "4")
    import session.implicits._

    val srcDir = Files.createTempDirectory("cdc-restart-src")
    val ckpt = Files.createTempDirectory("cdc-restart-ckpt")
    val sink = Files.createTempDirectory("cdc-restart-sink")

    // two batches with REAL overlap: batch 2 re-uploads half of batch 1's
    // docs (same text → same chunks), so the resumed state must recognize
    // them as duplicates for the final ratio to match batch
    def doc(i: Long): (Long, String) =
      (i, s"shared prefix tokens for everyone " * 4 + s"unique tail $i " * 3)
    val batch1 = (0L until 40L).map(doc)
    val batch2 = (40L until 60L).map(doc) ++ (0L until 20L).map {
      i => (i + 100L, doc(i)._2) // re-upload: new id, identical payload
    }
    writeFlatParquet(batch1.toDF("doc_id", "text"), srcDir, "b1.parquet")

    val chunkAgg: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df
        .select(graft.plans.CdcChunks.cdc_chunks(
          encode(col("text"), "UTF-8"), minLen = 16, maxLen = 256, maskBits = 5))
        .select(col("hash"), col("size"))
        .groupBy(col("hash"))
        .agg(min(col("size")).as("size"), sum(col("size")).as("occ_bytes"))

    // complete-mode parquet sinks are unsupported; update-mode file sinks
    // too — so the restart check drives the stateful agg through
    // foreachBatch overwriting a parquet snapshot, the standard pattern
    // for "latest full state" materialization
    def runOnce(): Unit = {
      val schema = session.read.parquet(srcDir.toString).schema
      val stream = session.readStream.schema(schema).parquet(srcDir.toString)
      val q = chunkAgg(stream).writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(sink.toString)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    runOnce() // sees b1 only
    writeFlatParquet(batch2.toDF("doc_id", "text"), srcDir, "b2.parquet")
    runOnce() // RESTART from checkpoint; must fold b2 into surviving state

    val got = session.read.parquet(sink.toString)
      .agg(sum(col("occ_bytes")), sum(col("size")), count(lit(1)))
      .head()
    val want = chunkAgg(session.read.parquet(srcDir.toString))
      .agg(sum(col("occ_bytes")), sum(col("size")), count(lit(1)))
      .head()
    assert(got.getLong(0) == want.getLong(0), "total bytes after restart")
    assert(got.getLong(1) == want.getLong(1), "unique bytes after restart")
    assert(got.getLong(2) == want.getLong(2), "unique chunks after restart")
    // the re-uploads must actually dedup: unique < total
    assert(got.getLong(1) < got.getLong(0), "re-uploaded docs not merged")
  }
}
