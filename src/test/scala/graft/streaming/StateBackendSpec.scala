package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode

/** The state-store backend knob ([[StateBackend]] /
  * `SPARK_GRAFT_STATE_BACKEND`): env parsing fails fast on unknown
  * values, and a stateful stream on the RocksDB provider — the 100 TB
  * setting for exact per-key state — produces exactly the same answer
  * as the default in-heap provider (the provider changes WHERE state
  * lives, never what it says).
  */
class StateBackendSpec extends SparkSpec {

  test("backend resolution: default/hdfs pass through, rocksdb maps, junk refuses") {
    assert(StateBackend.resolve(None).isEmpty)
    assert(StateBackend.resolve(Some("")).isEmpty)
    assert(StateBackend.resolve(Some("hdfs")).isEmpty)
    assert(StateBackend.resolve(Some(" HDFS ")).isEmpty)
    assert(StateBackend.resolve(Some("rocksdb"))
      .contains(StateBackend.RocksDbProviderClass))
    assert(StateBackend.resolve(Some(" RocksDB "))
      .contains(StateBackend.RocksDbProviderClass))
    val e = intercept[IllegalArgumentException] {
      StateBackend.resolve(Some("leveldb"))
    }
    assert(e.getMessage.contains("leveldb"))
  }

  test("the rocksdb provider class ships with this Spark distribution") {
    // rocksdbjni is in /opt/spark/jars; a missing class here means the
    // knob would die at first micro-batch, not at env parse
    Class.forName(StateBackend.RocksDbProviderClass)
    ()
  }

  test("a stateful stream on rocksdb matches the batch answer and reports state") {
    val src = sf() + "/events.parquet"
    val result = EventStream.runToMemory(spark, src, "rocks_dedup_spec",
      EventStream.dedupKeys(_), OutputMode.Append(),
      stateProvider = Some(StateBackend.RocksDbProviderClass))
    val batch = spark.read.parquet(src)
      .select("user_id", "event_type").distinct()
    val nKeys = batch.count()
    assert(result.count() === nKeys)
    assert(result.exceptAll(batch).isEmpty)
    // progress metrics still flow from the RocksDB provider: state rows
    // are the distinct keys, same contract as the default provider
    val m = EventStream.stateMetrics.get("rocks_dedup_spec")
    assert(m.exists(_._1 == nKeys), s"state metrics $m != $nKeys keys")
  }
}
