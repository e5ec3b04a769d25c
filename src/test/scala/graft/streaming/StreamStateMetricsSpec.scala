package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode

/** State-metrics attribution ([[EventStream.stateMetrics]] /
  * [[EventStream.lastStateMetricsHere]]): the footprint of a streaming
  * run is keyed by its memory-sink name and the reader resolves its OWN
  * run through its thread, so two harness runs interleaving in one JVM
  * (ScaleRun timing a query while a test or a second harness streams
  * elsewhere) can never cross-attribute state sizes — the single
  * `@volatile` global this replaced did exactly that.
  */
class StreamStateMetricsSpec extends SparkSpec {

  test("interleaved runs on two threads don't cross-attribute metrics") {
    val src = sf() + "/events.parquet"
    // this thread runs the dedup shape (state rows = distinct keys) …
    EventStream.clearThreadStateAttribution()
    EventStream.runToMemory(spark, src, "metrics_spec_a",
      EventStream.dedupKeys(_), OutputMode.Append()).count()
    val mineBefore = EventStream.lastStateMetricsHere
    assert(mineBefore.isDefined, "own run's metrics missing")

    // … while another thread runs the windowed-agg shape (state rows =
    // open windows × types, a different count) and reads its own
    @volatile var otherSaw: Option[(Long, Long)] = None
    val t = new Thread(() => {
      EventStream.runToMemory(spark, src, "metrics_spec_b",
        EventStream.windowedCounts(_), OutputMode.Complete()).count()
      otherSaw = EventStream.lastStateMetricsHere
    })
    t.start()
    t.join()
    assert(otherSaw.isDefined, "other thread's metrics missing")
    assert(otherSaw == EventStream.stateMetrics.get("metrics_spec_b")
      .map(fp => (fp.rows, fp.bytes)))

    // the other thread's run must not have replaced THIS thread's view
    assert(EventStream.lastStateMetricsHere == mineBefore,
      "another thread's run replaced this thread's attribution")
    assert(EventStream.stateMetrics.get("metrics_spec_a")
      .map(fp => (fp.rows, fp.bytes)) == mineBefore)
    // the two shapes genuinely differ, so a cross-read would be visible
    assert(mineBefore != otherSaw,
      "fixture shapes coincide — pick shapes with different state rows")

    // a cleared thread reads nothing: a batch query timed after a
    // streaming one can't inherit the stale attribution — and the
    // consumed entry is PRUNED, so a long-lived process sweeping many
    // corpus dirs never accumulates one entry per (query, dir)
    EventStream.clearThreadStateAttribution()
    assert(EventStream.lastStateMetricsHere.isEmpty)
    assert(EventStream.stateMetrics.get("metrics_spec_a").isEmpty,
      "clearThreadStateAttribution did not prune the consumed entry")
  }

  test("a stale thread never reads a newer run of the same sink name") {
    val src = sf() + "/events.parquet"
    // this thread runs sink name "metrics_spec_stale" and deliberately
    // does NOT clear its attribution (the pooled-thread hazard) …
    EventStream.clearThreadStateAttribution()
    EventStream.runToMemory(spark, src, "metrics_spec_stale",
      EventStream.dedupKeys(_), OutputMode.Append()).count()
    assert(EventStream.lastStateMetricsHere.isDefined)

    // … then another thread RE-RUNS the same sink name with a different
    // state shape. The stale thread's run token no longer matches the
    // map entry, so it must read None — not the newer run's numbers.
    val t = new Thread(() => {
      EventStream.runToMemory(spark, src, "metrics_spec_stale",
        EventStream.windowedCounts(_), OutputMode.Complete()).count()
    })
    t.start()
    t.join()
    assert(EventStream.lastStateMetricsHere.isEmpty,
      "stale thread read a newer run's metrics through a reused sink name")

    // clearing the stale thread leaves the newer run's entry alone (it
    // is not ours to prune)
    EventStream.clearThreadStateAttribution()
    assert(EventStream.stateMetrics.contains("metrics_spec_stale"),
      "a stale thread's clear pruned another run's entry")
    EventStream.stateMetrics.remove("metrics_spec_stale")
    ()
  }
}
