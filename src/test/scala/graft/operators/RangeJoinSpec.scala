package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("binned interval join equals the naive cross-join filter, any bin width") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val points = (0 until 500).map(i =>
      (i.toLong, (rng.nextInt(5)).toLong, rng.nextInt(10000).toLong))
      .toDF("pid", "k", "t")
    val intervals = (0 until 200).map { i =>
      val s = rng.nextInt(10000).toLong
      (i.toLong, (rng.nextInt(5)).toLong, s, s + rng.nextInt(500).toLong)
    }.toDF("iid", "k2", "s", "e")

    val naive = points.join(intervals,
        col("k") === col("k2") && col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet

    for (binWidth <- Seq(1L, 64L, 500L, 100000L)) {
      val binned = RangeJoin.intervalJoin(points, intervals,
          leftKey = col("k"), rightKey = col("k2"), leftTime = col("t"),
          rightStart = col("s"), rightEnd = col("e"), binWidth = binWidth)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(binned == naive, s"binWidth=$binWidth")
    }
  }

  test("bins are exact above 2^53 (epoch-nanos territory)") {
    import spark.implicits._
    // 2^60-ish timestamps: double arithmetic loses ~128-unit granularity
    // here, so a float bin computation drops pairs near bin edges
    val base = 1L << 60
    val points = Seq(
      (1L, 1L, base + 999L),   // just below an interval start
      (2L, 1L, base + 1000L),  // exactly at the start (bin edge region)
      (3L, 1L, base + 1500L),
      (4L, 1L, base + 2001L))  // just past the end
      .toDF("pid", "k", "t")
    val intervals = Seq((10L, 1L, base + 1000L, base + 2000L))
      .toDF("iid", "k2", "s", "e")
    val out = RangeJoin.intervalJoin(points, intervals,
        col("k"), col("k2"), col("t"), col("s"), col("e"), binWidth = 1000L)
      .select("pid").as[Long].collect().toSet
    assert(out == Set(2L, 3L))
  }

  test("empty and degenerate intervals") {
    import spark.implicits._
    val points = Seq((1L, 1L, 100L)).toDF("pid", "k", "t")
    // degenerate single-instant interval containing the point; inverted
    // interval dropped
    val intervals = Seq((1L, 1L, 100L, 100L), (2L, 1L, 200L, 150L))
      .toDF("iid", "k2", "s", "e")
    val out = RangeJoin.intervalJoin(points, intervals,
        col("k"), col("k2"), col("t"), col("s"), col("e"), binWidth = 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L)))
  }
}
