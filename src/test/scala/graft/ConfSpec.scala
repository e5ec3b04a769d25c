package graft

import graft.cdc.ChunkerParams

class ConfSpec extends SparkSpec {

  test("expectedChunkBytes: mask expectation gated by minLen and maxLen") {
    // default params: 16 mask bits -> 8 KiB min + 64 KiB expectation,
    // under the 128 KiB max
    assert(Conf.expectedChunkBytes(ChunkerParams.Default) ==
      (8L << 10) + (64L << 10))
    // a very coarse mask caps at maxLen
    assert(Conf.expectedChunkBytes(ChunkerParams.Default.copy(
      mask = 0xffffffff00000000L)) == 128L << 10)
  }

  test("sizeShufflePartitions: the 100 TB worked example and the clamps") {
    // README cluster-sizing paragraph: 100 TB at ~72 KiB expected chunks,
    // 48 B rows, 64 MiB target -> ~1000 partitions (vs 32 local default)
    val p = Conf.sizeShufflePartitions(
      inputBytes = 100L * 1000 * 1000 * 1000 * 1000,
      avgChunkBytes = Conf.expectedChunkBytes(ChunkerParams.Default))
    assert(p > 900 && p < 1100, s"100 TB should size to ~1000 partitions, got $p")
    // formula is exact: ceil(rows) * rowBytes / target, ceil again
    assert(Conf.sizeShufflePartitions(1000, 10, targetPartitionBytes = 100,
      rowBytes = 7) == 7) // 100 rows * 7 B = 700 B -> ceil(700/100) = 7
    // small inputs clamp to the floor
    assert(Conf.sizeShufflePartitions(1, 1 << 16, minPartitions = 32) == 32)
    // absurd inputs clamp to the ceiling
    assert(Conf.sizeShufflePartitions(Long.MaxValue / 64, 1024,
      maxPartitions = 200000) == 200000)
    // zero input is valid (empty estimate) and takes the floor
    assert(Conf.sizeShufflePartitions(0, 1 << 16) == 1)
    intercept[IllegalArgumentException] {
      Conf.sizeShufflePartitions(10, 0)
    }
  }

  test("applyChunkShufflePartitions: grows for big inputs, never shrinks") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // small input: setting untouched
      val p0 = Conf.applyChunkShufflePartitions(spark, 1L << 20,
        ChunkerParams.Default)
      assert(p0.toString == prev)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == prev)
      // 10 TB input: setting grows past any local default
      Conf.applyChunkShufflePartitions(spark, 10L * 1000 * 1000 * 1000 * 1000,
        ChunkerParams.Default)
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt > prev.toInt)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("ChunkRowShuffleBytes is the right order for a real exchange") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // shuffle 10k ChunkRows through a repartition and read the exchange's
    // write metrics: the constant must sit within 2x of the measured
    // bytes/row (it sizes partitions — order of magnitude is the contract)
    val rows = (0L until 10000L).map(i =>
      graft.operators.ChunkRow(i % 7, i, i * 0x9E3779B97F4A7C15L, 65536, 30000))
    val ds = spark.createDataset(rows).repartition(8, col("hash"))
    // collect (not count): count spawns its own QueryExecution and would
    // leave THIS plan unexecuted with zeroed metrics
    assert(ds.collect().length == 10000)
    val written = findShuffleBytes(ds.queryExecution.executedPlan)
    assert(written > 0, "expected shuffle write metrics")
    val perRow = written.toDouble / 10000
    assert(perRow < Conf.ChunkRowShuffleBytes * 2 &&
      perRow > Conf.ChunkRowShuffleBytes / 2.0,
      s"measured $perRow B/row vs constant ${Conf.ChunkRowShuffleBytes}")
  }

  private def findShuffleBytes(
      p: org.apache.spark.sql.execution.SparkPlan): Long = {
    val self = p match {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.metrics.get("shuffleBytesWritten").orElse(
          e.metrics.get("bytesWritten")).map(_.value).getOrElse(0L)
      case _ => 0L
    }
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self + kids.map(findShuffleBytes).sum
  }
}
