package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamTopTermsSpec extends SparkSpec {

  private def writeFlat(dir: java.nio.file.Path,
      rows: Seq[(Long, String)], name: String): Unit = {
    import spark.implicits._
    writeFlatParquet(rows.toDF("doc_id", "text"), dir, name)
  }

  test("sketch buffers merge across micro-batches (maxFilesPerTrigger=1, 3 files)") {
    // every file contributes to the SAME words, so the final counts can
    // only be right if the sketch state merged all three batches
    val dir = java.nio.file.Files.createTempDirectory("stt")
    writeFlat(dir, Seq((0L, "alpha beta alpha"), (1L, "gamma Alpha")), "f0.parquet")
    writeFlat(dir, Seq((2L, "beta beta delta")), "f1.parquet")
    writeFlat(dir, Seq((3L, "alpha delta")), "f2.parquet")

    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "8")
    val schema = session.read.parquet(s"$dir/f0.parquet").schema
    val stream = session.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .option("pathGlobFilter", "f*.parquet")
      .parquet(dir.toString)
    val q = StreamTopTerms.topTermsAgg(stream, capacity = 64)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stt_mb").start()
    try q.processAllAvailable() finally q.stop()
    val got = StreamTopTerms.finish(session.table("stt_mb"), k = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // lowercased exact counts: alpha 4 (incl. "Alpha"), beta 3, delta 2,
    // gamma 1 — and exactness means zero undercount everywhere
    assert(got.toSeq == Seq(("alpha", 4L, 0L), ("beta", 3L, 0L),
      ("delta", 2L, 0L), ("gamma", 1L, 0L)), got.toSeq.toString)
  }

  test("sketch state survives a checkpointed RESTART and matches batch") {
    // the risk under test: the Misra-Gries Aggregator's custom buffer must
    // round-trip through the state-store CHECKPOINT (not just the
    // in-memory store the merge test covers) — a buffer-encoding defect
    // would surface only on resume
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "4")
    import session.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("stt-restart-src")
    val ckpt = java.nio.file.Files.createTempDirectory("stt-restart-ckpt")
    val sink = java.nio.file.Files.createTempDirectory("stt-restart-sink")
    // batch 2 re-mentions batch 1's words, so resumed counts are only
    // right if the checkpointed sketch carried batch 1's tallies
    writeFlatParquet(Seq((0L, "alpha beta alpha gamma"), (1L, "beta delta"))
      .toDF("doc_id", "text"), srcDir, "b1.parquet")
    def runOnce(): Unit = {
      val schema = session.read.parquet(srcDir.toString).schema
      val stream = session.readStream.schema(schema).parquet(srcDir.toString)
      val q = StreamTopTerms.topTermsAgg(stream, capacity = 64).writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(sink.toString)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    writeFlatParquet(Seq((2L, "alpha alpha epsilon"), (3L, "gamma beta"))
      .toDF("doc_id", "text"), srcDir, "b2.parquet")
    runOnce() // RESTART from checkpoint; must fold b2 into restored sketch
    val got = StreamTopTerms.finish(session.read.parquet(sink.toString), 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("alpha", 4L, 0L), ("beta", 3L, 0L), ("gamma", 2L, 0L),
      ("delta", 1L, 0L), ("epsilon", 1L, 0L)), got.toString)
  }

  test("streaming twin lands on the batch relation at sf0.001") {
    val batch = {
      import graft.functions.HeavyHitters
      val words = spark.read.parquet(s"${sf()}/documents.parquet")
        .select(explode(filter(split(lower(col("text")), " "), w => w =!= ""))
          .as("word"))
      words.agg(HeavyHitters.heavy_hitters(col("word"), 1024).as("hh"))
    }
    val want = StreamTopTerms.finish(batch, k = 20).collect().toSeq
    val got = StreamTopTerms.runTopTermsOnce(spark,
      s"${sf()}/documents.parquet", "stt_catalog", capacity = 1024, k = 20)
      .collect().toSeq
    assert(got == want)
  }
}
