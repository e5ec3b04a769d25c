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
