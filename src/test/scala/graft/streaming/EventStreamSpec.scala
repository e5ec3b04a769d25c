package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkSpec {

  test("windowed streaming aggregation over events parquet matches batch totals") {
    val result = EventStream.runWindowedOnce(spark, sf() + "/events.parquet", "evt_win")
    val streamedTotal = result.agg(sum("n")).head().getLong(0)
    val batchTotal = spark.read.parquet(sf() + "/events.parquet").count()
    assert(streamedTotal == batchTotal, s"$streamedTotal != $batchTotal")
    assert(result.select("event_type").distinct().count() > 0)
  }

  test("streamed per-window quantiles equal batch discrete quantiles exactly") {
    // the sketch buffer lives in the streaming state store and merges
    // across micro-batches; within its exact window (every hour-window
    // here is far under capacity) the result must equal the rank
    // max(1, ceil(q*n)) order statistic computed by brute force
    val src = sf() + "/events.parquet"
    val result = EventStream.runQuantilesOnce(spark, src, "evt_quant")
      .collect()
      .map(r => (r.getTimestamp(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))))
      .toMap
    val probes = Seq(0.25, 0.5, 0.9)
    val expected = EventStream.withEventTime(spark.read.parquet(src))
      .groupBy(window(col("event_time"), "1 hour"))
      .agg(collect_list(col("value")).as("vs"))
      .select(col("window.start"), col("vs"))
      .collect()
      .map { r =>
        val vs = r.getSeq[Double](1).sorted
        val q = probes.map(p =>
          vs((math.max(1L, math.ceil(p * vs.length).toLong) - 1).toInt))
        (r.getTimestamp(0), (vs.length.toLong, q(0), q(1), q(2)))
      }
      .toMap
    assert(result.keySet == expected.keySet)
    assert(result == expected)
  }

  test("windowed aggregation streams to a REAL parquet sink with checkpointing") {
    // the production path the memory-sink harness deliberately skips:
    // append-mode file sink + checkpoint dir. Append emits a window only
    // once the watermark passes its end — on a finite input that happens
    // in the trailing no-data micro-batch (noDataMicroBatches is on by
    // default), so only windows older than final-watermark emit; the
    // assertion checks exactly that subset, cell-exact vs batch.
    val session = spark.newSession()
    val src = sf() + "/events.parquet"
    val p = java.nio.file.Paths.get(src)
    val out = java.nio.file.Files.createTempDirectory("sink-out")
    val ckpt = java.nio.file.Files.createTempDirectory("sink-ckpt")
    val schema = session.read.parquet(src).schema
    val stream = session.readStream.schema(schema)
      .option("pathGlobFilter", p.getFileName.toString)
      .parquet(p.getParent.toString)
    val q = EventStream.windowedCounts(stream)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val sunk = session.read.parquet(out.toString)
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    // expected: the complete windowed aggregate, restricted to windows the
    // final watermark (max event_time - 2h) closed
    val batch = EventStream.withEventTime(session.read.parquet(src))
    val maxTs = batch.agg(max("event_time")).head().getTimestamp(0)
    val expected = batch
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        col("window.end").as("we"))
      .collect()
      .filter(_.getTimestamp(3).getTime <= maxTs.getTime - 2L * 3600 * 1000)
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(expected.nonEmpty, "test corpus must close at least one window")
    assert(sunk.toSet == expected.toSet,
      s"sink rows ${sunk.length} vs expected ${expected.length}")
  }

  test("streaming dedup emits exactly the distinct key set") {
    val result = EventStream.runDedupOnce(spark, sf() + "/events.parquet", "evt_dedup")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val batch = spark.read.parquet(sf() + "/events.parquet")
      .select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(result.length == result.distinct.length, "duplicate emission")
    assert(result.toSet == batch.toSet)
  }

  test("stream-stream attribution join matches the batch self-join") {
    val result = EventStream
      .runAttributionOnce(spark, sf() + "/events.parquet", "evt_attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val evRaw = spark.read.parquet(sf() + "/events.parquet")
    val ev = evRaw.withColumn("t_us", graft.Events.microsExpr(evRaw))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("t_us").as("ct"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("t_us").as("pt"))
    val batch = clicks.join(purchases,
        col("user_id") === col("pu") && col("pt") >= col("ct") &&
          col("pt") <= col("ct") + lit(3600000000L))
      .select("user_id", "click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(result.nonEmpty, "attribution join found no pairs in test data")
    assert(result == batch)
  }

  test("watermark-bounded dedup drops close duplicates (state-evicting mode)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[(Long, Long, String)](spark)
    val hourNs = 3600L * 1000000000L
    // base well above epoch 0: the initial watermark is 0 and the late-row
    // filter drops event times <= watermark, so epoch-0 rows are boundary
    // casualties by construction
    val base = 1000L * hourNs
    ms.addData((base, 1L, "a"), (base + hourNs, 1L, "a"), (base, 2L, "b"))
    val out = EventStream.dedupKeysWithinWatermark(
      ms.toDF().toDF("ts", "user_id", "event_type"), watermark = "4 hours")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("evt_dedup_wm").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("evt_dedup_wm")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.sorted.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("sessionize groups events by gap") {
    import spark.implicits._
    val sec = 1000000L // µs (EventRow.ts contract)
    val events = Seq(
      EventStream.EventRow(1, 0 * sec, 1L, "a", 1.0),
      EventStream.EventRow(2, 1 * sec, 1L, "a", 2.0),
      EventStream.EventRow(3, 100 * sec, 1L, "a", 3.0), // new session
      EventStream.EventRow(4, 0 * sec, 2L, "b", 5.0)).toDS()
    val closed = EventStream.sessionize(events, gapMicros = 10 * sec).collect()
    // batch semantics: only sessions closed by a later event appear
    assert(closed.length == 1)
    assert(closed.head.user_id == 1L)
    assert(closed.head.n_events == 2L)
    assert(closed.head.sum_value == 3.0)
  }
}
