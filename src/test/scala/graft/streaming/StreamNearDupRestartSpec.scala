package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Third state flavor under restart (after the streaming-agg and
  * dropDuplicates specs): bandMatches' flatMapGroupsWithState bucket
  * min-id state. A document arriving AFTER a checkpointed restart that
  * near-duplicates a pre-restart document must still match it — the
  * bucket state, not a re-scan, carries the pre-restart corpus.
  */
class StreamNearDupRestartSpec extends SparkSpec {

  test("bucket min-id state matches post-restart docs against pre-restart corpus") {
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "4")
    import session.implicits._

    val srcDir = Files.createTempDirectory("neardup-restart-src")
    val ckpt = Files.createTempDirectory("neardup-restart-ckpt")
    val sink = Files.createTempDirectory("neardup-restart-sink")
    val (k, hashes, bands) = (3, 64, 16)

    def text(i: Long) = s"document number $i with its own distinctive words " +
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"
    val b1 = (0L until 10L).map(i => (i, text(i)))
    // 100 duplicates doc 3 verbatim (matches in every band); 101 is new
    val b2 = Seq((100L, text(3)), (101L, text(9999)))
    writeFlatParquet(b1.toDF("doc_id", "text"), srcDir, "b1.parquet")

    def runOnce(): Unit = {
      val schema = session.read.parquet(srcDir.toString).schema
      val stream = session.readStream.schema(schema).parquet(srcDir.toString)
      val q = StreamNearDup
        .bandMatches(stream, "doc_id", "text", k, hashes, bands)
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    runOnce()
    writeFlatParquet(b2.toDF("doc_id", "text"), srcDir, "b2.parquet")
    runOnce() // restart: bucket minima restored from the checkpoint

    val got = session.read.parquet(sink.toString)
      .groupBy(col("id")).agg(min(col("match_id")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // relational truth over the FULL corpus: min lower id per shared bucket
    val all = (b1 ++ b2).toDF("doc_id", "text")
    val rel = StreamNearDup.bandRelation(all, "doc_id", "text", k, hashes, bands)
    val want = rel.as("l")
      .join(rel.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("r.id") < col("l.id"))
      .groupBy(col("l.id").as("id")).agg(min(col("r.id")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    assert(got == want, s"streamed $got vs relational $want")
    assert(got.get(100L).contains(3L),
      "post-restart duplicate failed to match its pre-restart original")
    assert(!got.contains(101L), "genuinely new doc must not match")
  }
}
