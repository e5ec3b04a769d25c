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
    assert(m.exists(_.rows == nKeys), s"state metrics $m != $nKeys keys")
  }

  test("a checkpoint keeps the provider it started with across a restart") {
    // The deployment rule README documents — "a query must keep the
    // state-store provider it started with" — enforced by evidence:
    // this pins what actually happens when an hdfs-checkpointed query
    // is restarted with the session asking for rocksdb.
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("backend-mismatch")
    val in = work.resolve("in").toString
    val ckpt = work.resolve("ckpt").toString
    (0L until 32L).toDF("id").coalesce(1).write.mode("append").parquet(in)

    def runOnce(provider: Option[String]):
        Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = {
      val session = spark.newSession()
      session.conf.set("spark.sql.shuffle.partitions", "2")
      provider.foreach(c =>
        session.conf.set("spark.sql.streaming.stateStore.providerClass", c))
      val schema = session.read.parquet(in).schema
      val q = session.readStream.schema(schema).parquet(in)
        .dropDuplicates("id")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("noop")
        .start()
      try { q.processAllAvailable(); q.recentProgress.toSeq }
      finally q.stop()
    }

    def providerMetricSeen(
        ps: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress],
        rocks: Boolean): Boolean =
      ps.flatMap(_.stateOperators).exists { op =>
        val keys = op.customMetrics.keySet()
        // the two providers expose disjoint custom-metric families
        if (rocks) keys.stream().anyMatch(_.startsWith("rocksdb"))
        else keys.contains("loadedMapCacheHitCount")
      }

    // initial run on the DEFAULT (hdfs) provider
    val first = runOnce(None)
    assert(providerMetricSeen(first, rocks = false),
      "fixture assumption broke: initial run not on the hdfs provider")

    // new data lands, then a restart that ASKS for rocksdb
    (100L until 132L).toDF("id").coalesce(1).write.mode("append").parquet(in)
    val second = runOnce(Some(StateBackend.RocksDbProviderClass))
    // Spark persists stateStore.providerClass in the checkpoint's
    // offset-log metadata and force-restores it on restart: the flipped
    // session conf is IGNORED and the query stays on hdfs state — a
    // silent keep, not a corruption and not a crash. This is what makes
    // the backend a start-time-only knob: flipping it mid-checkpoint
    // cannot take effect (to migrate, start a fresh checkpoint).
    assert(providerMetricSeen(second, rocks = false) &&
        !providerMetricSeen(second, rocks = true),
      "restart under a flipped provider conf did not keep the " +
        "checkpointed provider — the documented deployment rule " +
        "(provider is pinned at first start) no longer holds")
  }
}
