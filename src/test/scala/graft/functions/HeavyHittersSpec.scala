package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  private def run(tokens: Seq[String], capacity: Int, parts: Int = 8)
      : (Map[String, Long], Long) = {
    import spark.implicits._
    val rows = tokens.toDF("t").repartition(parts)
      .agg(HeavyHitters.heavy_hitters(col("t"), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1"), col("e._2"), col("e._3"))
      .as[(String, Long, Long)].collect()
    (rows.map(r => r._1 -> r._2).toMap, rows.headOption.map(_._3).getOrElse(0L))
  }

  test("exact under capacity, any partitioning") {
    val tokens = Seq.fill(100)("a") ++ Seq.fill(40)("b") ++ Seq.fill(7)("c")
    val truth = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 32)) {
      val (est, decs) = run(tokens, capacity = 16, parts)
      assert(est == truth, s"parts=$parts")
      assert(decs == 0L)
    }
  }

  test("over capacity: heavy keys survive with bounded undercount") {
    val rng = new scala.util.Random(3)
    // 3 heavy keys + 2000 singleton keys, capacity 64
    val heavy = Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2") ++ Seq.fill(200)("hot3")
    val noise = (0 until 2000).map(i => s"n$i")
    val tokens = rng.shuffle(heavy ++ noise)
    val truth = Map("hot1" -> 500L, "hot2" -> 300L, "hot3" -> 200L)
    val (est, decs) = run(tokens, capacity = 64)
    // MG guarantee: true - n/(k+1) <= est <= true, and decs bounds the gap
    val bound = tokens.size.toLong / 65 + 1
    truth.foreach { case (k, c) =>
      assert(est.contains(k), s"$k evicted")
      assert(est(k) <= c && est(k) >= c - decs, s"$k est=${est(k)} true=$c decs=$decs")
      assert(c - est(k) <= bound, s"$k undercount ${c - est(k)} > bound $bound")
    }
  }

  test("decrement debt survives merging with an emptied buffer") {
    // capacity=1: stream [x, y] decrements x away entirely (used=0, decs=1);
    // merging that with a buffer holding (x, 5, decs=0) must NOT claim
    // exactness — est ∈ [true-decs, true] requires decs >= 1 in the output
    val agg = new HeavyHittersAgg(1)
    val emptied = agg.reduce(agg.reduce(agg.zero, "x"), "y")
    assert(emptied.used == 0 && emptied.decs == 1L)
    val other = (1 to 5).foldLeft(agg.zero)((b, _) => agg.reduce(b, "x"))
    for (merged <- Seq(agg.merge(emptied, other), agg.merge(other, emptied))) {
      val out = agg.finish(merged)
      assert(out.length == 1)
      val (k, est, decs) = out.head
      assert(k == "x" && est == 5L && decs == 1L,
        s"got ($k, $est, $decs) — exactness claim would be wrong")
    }
  }

  test("null tokens are ignored") {
    import spark.implicits._
    val rows = Seq(Some("x"), None, Some("x"), None).toDF("t")
      .agg(HeavyHitters.heavy_hitters(col("t"), 8).as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e._1"), col("e._2"))
      .as[(String, Long)].collect().toMap
    assert(rows == Map("x" -> 2L))
  }
}
