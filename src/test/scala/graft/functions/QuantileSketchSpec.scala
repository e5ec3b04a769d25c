package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {

  private val Probes = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  /** max(1, ceil(q·n)) rank into the sorted values — DuckDB's
    * quantile_disc convention, the contract of the exact window.
    */
  private def exactQ(sorted: Array[Double], q: Double): Double =
    sorted(math.max(1L, math.ceil(q * sorted.length).toLong).toInt - 1)

  test("exact window: quantiles equal the discrete ranks below capacity") {
    import spark.implicits._
    val values = Array(5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 10.0)
    val got = values.toSeq.toDF("v")
      .agg(QuantileSketch.quantiles(col("v"), Probes, capacity = 64))
      .head().getSeq[Double](0)
    val sorted = values.sorted
    Probes.zipWithIndex.foreach { case (q, i) =>
      assert(got(i) == exactQ(sorted, q), s"q=$q: ${got(i)}")
    }
  }

  test("partition-invariant: 1 vs 13 partitions give identical exact results") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val values = Array.fill(3000)(rng.nextInt(100000).toDouble)
    def run(parts: Int) = values.toSeq.toDF("v").repartition(parts)
      .agg(QuantileSketch.quantiles(col("v"), Probes, capacity = 4096))
      .head().getSeq[Double](0)
    val a = run(1)
    assert(a == run(13), "exact-window results must not depend on partitioning")
    val sorted = values.sorted
    Probes.zipWithIndex.foreach { case (q, i) =>
      assert(a(i) == exactQ(sorted, q), s"q=$q: ${a(i)}")
    }
  }

  test("compacted regime: rank error ≤ 2% under 1, 8, AND 500-partial folds") {
    // 500 partials of ~200 rows folded sequentially is Spark's real
    // final-aggregation shape for a wide scan — the merge pattern that
    // exposed the single-compactor design's compounding bias (review
    // finding): level-aligned compactors must hold the bound for EVERY
    // merge tree, not just the friendly 8-way one
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val n = 100000
    val values = Array.fill(n)(rng.nextDouble() * 1e6)
    val sorted = values.sorted
    for (parts <- Seq(1, 8, 500)) {
      val got = values.toSeq.toDF("v").repartition(parts)
        .agg(QuantileSketch.quantiles(col("v"), Probes, capacity = 1024))
        .head().getSeq[Double](0)
      Probes.zipWithIndex.foreach { case (q, i) =>
        // rank of the returned value vs the target, as a fraction of n
        val rank = {
          val r = java.util.Arrays.binarySearch(sorted, got(i))
          if (r >= 0) r + 1 else -r
        }
        val target = math.max(1L, math.ceil(q * n).toLong)
        val err = math.abs(rank - target).toDouble / n
        info(f"parts=$parts q=$q rank error ${err * 100}%.2f%%")
        assert(err <= 0.02,
          f"parts=$parts q=$q: rank error ${err * 100}%.2f%% exceeds 2%%")
      }
    }
  }

  test("empty input yields NaN probes; per-group sketches stay independent") {
    import spark.implicits._
    val empty = Seq.empty[Double].toDF("v")
      .agg(QuantileSketch.quantiles(col("v"), Probes, capacity = 16))
      .head().getSeq[Double](0)
    assert(empty.forall(_.isNaN), empty.toString)
    val grouped = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0))
      .toDF("g", "v")
      .groupBy(col("g"))
      .agg(QuantileSketch.quantiles(col("v"), Seq(0.5), capacity = 16).as("qs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).head)
      .toMap
    assert(grouped == Map("a" -> 1.0, "b" -> 10.0), grouped.toString)
  }
}
