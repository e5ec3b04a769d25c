package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode

/** Sink-mode parity for the streaming snapshot runner
  * ([[EventStream.runToMemory]]'s `diskSink` switch,
  * `SPARK_GRAFT_STREAM_SINK`): the foreachBatch → parquet sink must
  * return exactly the memory sink's result in BOTH output modes —
  * complete (per-trigger overwrite; final read = last complete
  * snapshot) and append (accumulating) — because the scale tiers run
  * the disk sink where a complete-mode snapshot no longer fits the
  * driver (stream_cdc's 46.6M-row merged relation at the 1000× tier),
  * and a sink that changed answers would silently invalidate every
  * tier figure riding it.
  */
class StreamSinkModeSpec extends SparkSpec {

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString).sorted

  test("disk sink equals memory sink in append mode (stateful dedup)") {
    val src = sf() + "/events.parquet"
    val mem = EventStream.runToMemory(spark, src, "sinkmode_append_mem",
      EventStream.dedupKeys(_), OutputMode.Append(), diskSink = false)
    val disk = EventStream.runToMemory(spark, src, "sinkmode_append_disk",
      EventStream.dedupKeys(_), OutputMode.Append(), diskSink = true)
    assert(sorted(disk) === sorted(mem))
  }

  test("disk sink equals memory sink in complete mode (windowed agg)") {
    val src = sf() + "/events.parquet"
    val mem = EventStream.runToMemory(spark, src, "sinkmode_complete_mem",
      EventStream.windowedCounts(_), OutputMode.Complete(), diskSink = false)
    val disk = EventStream.runToMemory(spark, src, "sinkmode_complete_disk",
      EventStream.windowedCounts(_), OutputMode.Complete(), diskSink = true)
    assert(sorted(disk) === sorted(mem))
    // state metrics flow identically — the tier tables read them off
    // the same attribution path regardless of sink
    assert(EventStream.stateMetrics.get("sinkmode_complete_disk")
      .map(_.rows) ===
      EventStream.stateMetrics.get("sinkmode_complete_mem").map(_.rows))
  }

  test("finished disk-sink dirs are reclaimed by the next run's purge") {
    // at the 1000× tier one complete-mode result is GiB-scale parquet —
    // a min-of-3 sweep must not leak one dir per attempt to /tmp
    val src = sf() + "/events.parquet"
    EventStream.runToMemory(spark, src, "sinkmode_purge_a",
      EventStream.dedupKeys(_), OutputMode.Append(), diskSink = true).count()
    val firstDir = EventStream.finishedDiskSinks.peek()
    assert(firstDir != null && java.nio.file.Files.exists(firstDir),
      "finished run's sink dir missing from the reclamation queue")
    // the NEXT disk-sink run purges every finished predecessor
    EventStream.runToMemory(spark, src, "sinkmode_purge_b",
      EventStream.dedupKeys(_), OutputMode.Append(), diskSink = true).count()
    assert(!java.nio.file.Files.exists(firstDir),
      "previous run's sink dir survived the successor's startup purge")
    EventStream.purgeDiskSinks()
  }

  test("a FAILED disk-sink run still queues its dir for reclamation") {
    // a min-of-3 sweep with failing attempts must not leak one
    // partial-parquet dir per attempt past the purge's reach
    import org.apache.spark.sql.functions.{lit, raise_error}
    EventStream.purgeDiskSinks()
    val src = sf() + "/events.parquet"
    intercept[Exception] {
      EventStream.runToMemory(spark, src, "sinkmode_fail_disk",
        _.select(raise_error(lit("boom")).cast("string").as("x")),
        OutputMode.Append(), diskSink = true)
    }
    val p = EventStream.finishedDiskSinks.peek()
    assert(p != null, "failed run's sink dir not queued for reclamation")
    EventStream.purgeDiskSinks()
    assert(!java.nio.file.Files.exists(p),
      "failed run's sink dir survived the purge")
  }
}
