package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** StreamMerge's monotone-seq contract must extend across RESTARTS: the
  * per-key winning seq lives in checkpointed state, so a stale change
  * arriving AFTER a stop/resume must still lose to a seq emitted before
  * the stop, and fresh changes must still win — the property that makes
  * the CDC-ingest fold deployable. Also pins that the round-9 Row-encoder
  * packing (replacing the JSON round-trip) checkpoints and restores
  * cleanly.
  */
class StreamMergeRestartSpec extends SparkSpec {

  test("winning seq survives a checkpointed restart; stale changes stay dead") {
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "4")
    import session.implicits._

    val srcDir = Files.createTempDirectory("smrg-restart-src")
    val ckpt = Files.createTempDirectory("smrg-restart-ckpt")
    val sink = Files.createTempDirectory("smrg-restart-sink")

    def w(rows: Seq[(Long, Long, String, String)], name: String): Unit =
      writeFlatParquet(rows.toDF("k", "seq", "op", "payload"), srcDir, name)

    // batch 1: key 1 reaches seq 5, key 2 gets its first upsert
    w(Seq((1L, 5L, "U", "v5"), (2L, 1L, "U", "two")), "b1.parquet")

    def runOnce(): Unit = {
      val schema = session.read.parquet(srcDir.toString).schema
      val stream = session.readStream.schema(schema).parquet(srcDir.toString)
      val q = StreamMerge.latestChanges(stream, "k", Seq("payload"))
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    runOnce()
    // batch 2 AFTER the stop contains ONLY a stale seq-3 for key 1: the
    // in-batch maxBy cannot save it — suppression must come from the
    // RESTORED state (seq 5). A lost checkpoint would emit v3-stale.
    w(Seq((1L, 3L, "U", "v3-stale")), "b2.parquet")
    runOnce()
    // batch 3 after a second stop: a fresh seq-9 must still win against
    // the twice-restored state, and key 2's delete flows through
    w(Seq((1L, 9L, "U", "v9"), (2L, 2L, "D", null)), "b3.parquet")
    runOnce()

    val events = session.read.parquet(sink.toString)
      .select(col("key"), col("seq"), col("op"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getString(3))).toSeq.sorted
    assert(events == Seq(
      (1L, 5L, "U", "v5"), (1L, 9L, "U", "v9"),
      (2L, 1L, "U", "two"), (2L, 2L, "D", null)),
      s"restart broke the monotone-seq fold: $events")
  }
}
