package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** dedupKeys' "globally exact for any batch split" contract must extend
  * across RESTARTS: keys emitted before a stop must not re-emit when the
  * resumed query sees them again in later files, and unseen keys must
  * still come through — first-occurrence semantics backed by checkpointed
  * state, the property that makes the dedup monitor deployable.
  */
class StreamDedupRestartSpec extends SparkSpec {

  test("exact dedup emits each key once across a checkpointed restart") {
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "4")
    import session.implicits._

    val srcDir = Files.createTempDirectory("dedup-restart-src")
    val ckpt = Files.createTempDirectory("dedup-restart-ckpt")
    val sink = Files.createTempDirectory("dedup-restart-sink")

    def rows(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
      ids.map(i => (i, i % 5, if (i % 2 == 0) "click" else "view"))
        .toDF("event_id", "user_id", "event_type")
    // batch 2 repeats every batch-1 key and adds one new (user 5)
    writeFlatParquet(rows(0L until 20L), srcDir, "b1.parquet")

    def runOnce(): Unit = {
      val schema = session.read.parquet(srcDir.toString).schema
      val stream = session.readStream.schema(schema).parquet(srcDir.toString)
      val q = EventStream.dedupKeys(stream).writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    runOnce()
    writeFlatParquet(
      rows(0L until 20L).unionByName(Seq((100L, 5L, "click"))
        .toDF("event_id", "user_id", "event_type")),
      srcDir, "b2.parquet")
    runOnce() // resume: old keys suppressed by restored state, new key emits

    val emitted = session.read.parquet(sink.toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = session.read.parquet(srcDir.toString)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(emitted.length == emitted.distinct.length,
      "a key re-emitted after restart — state store lost first-occurrence marks")
    assert(emitted.toSet == expected.toSet)
    assert(emitted.toSet.contains((5L, "click")), "post-restart new key missing")
  }
}
