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

  test("sessionize groups events by gap") {
    import spark.implicits._
    val sec = 1000000000L // ns
    val events = Seq(
      EventStream.EventRow(1, 0 * sec, 1L, "a", 1.0),
      EventStream.EventRow(2, 1 * sec, 1L, "a", 2.0),
      EventStream.EventRow(3, 100 * sec, 1L, "a", 3.0), // new session
      EventStream.EventRow(4, 0 * sec, 2L, "b", 5.0)).toDS()
    val closed = EventStream.sessionize(events, gapNanos = 10 * sec).collect()
    // batch semantics: only sessions closed by a later event appear
    assert(closed.length == 1)
    assert(closed.head.user_id == 1L)
    assert(closed.head.n_events == 2L)
    assert(closed.head.sum_value == 3.0)
  }
}
