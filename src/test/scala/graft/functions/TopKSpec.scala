package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** TopKByScore must be row-identical to the window form it replaces
  * (row_number over score DESC, id ASC; rank <= k) under any partitioning,
  * including adversarial tie pile-ups and groups smaller than k.
  */
class TopKSpec extends SparkSpec with Matchers {

  private def windowReference(
      rows: Seq[(String, Double, Long)], k: Int): Set[(String, Long, Long, Double)] =
    rows
      .groupBy(_._1)
      .flatMap { case (g, rs) =>
        rs.sortBy { case (_, s, id) => (-s, id) }
          .take(k)
          .zipWithIndex
          .map { case ((_, s, id), i) => (g, (i + 1).toLong, id, s) }
      }
      .toSet

  private def viaAggregate(
      rows: Seq[(String, Double, Long)], k: Int, partitions: Int): Set[(String, Long, Long, Double)] = {
    import spark.implicits._
    rows
      .toDF("g", "score", "id")
      .repartition(partitions)
      .groupBy(col("g"))
      .agg(TopK.top_k_by_score(col("score"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("id"), col("col._1").as("score"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  test("matches the window-form reference, ties broken by ascending id") {
    val rng = new scala.util.Random(7)
    // scores drawn from a tiny set so ties are common; 3 uneven groups
    val rows = (0L until 500L).map { id =>
      val g = if (id % 7 == 0) "small" else if (id % 2 == 0) "even" else "odd"
      (g, (rng.nextInt(5) * 0.25) - 0.5, id)
    }
    val expect = windowReference(rows, 5)
    viaAggregate(rows, 5, partitions = 1) shouldBe expect
    viaAggregate(rows, 5, partitions = 13) shouldBe expect
  }

  test("NaN scores rank first (Spark's DESC order) under any partitioning") {
    // java.lang.Double.compare semantics: NaN is the LARGEST double, so
    // under score DESC it takes rank 1 with the id tie-break — matching
    // row_number over orderBy(desc); a non-total comparator would drop or
    // misplace NaN depending on buffer fill order
    val rows = Seq(
      ("g", Double.NaN, 7L), ("g", 5.0, 1L), ("g", Double.NaN, 3L),
      ("g", 4.0, 2L), ("g", 3.0, 4L), ("g", 2.0, 5L), ("g", 1.0, 6L))
    val expect = Set(
      ("g", 1L, 3L, Double.NaN), ("g", 2L, 7L, Double.NaN),
      ("g", 3L, 1L, 5.0), ("g", 4L, 2L, 4.0), ("g", 5L, 4L, 3.0))
    // NaN != NaN defeats plain Set equality; compare on bit patterns
    def bits(s: Set[(String, Long, Long, Double)]) =
      s.map { case (g, r, i, d) => (g, r, i, java.lang.Double.doubleToLongBits(d)) }
    assert(bits(viaAggregate(rows, 5, partitions = 1)) == bits(expect))
    assert(bits(viaAggregate(rows, 5, partitions = 7)) == bits(expect))
  }

  test("groups smaller than k return all their rows, ranked") {
    val rows = Seq(("a", 1.0, 10L), ("a", 2.0, 11L), ("b", 0.0, 12L))
    viaAggregate(rows, 5, partitions = 3) shouldBe Set(
      ("a", 1L, 11L, 2.0), ("a", 2L, 10L, 1.0), ("b", 1L, 12L, 0.0))
  }

  test("long-keyed variant stays exact past 2^53 where doubles collapse") {
    import spark.implicits._
    val base = 1L << 53
    // base+1 .. base+3 are NOT all representable as doubles (adjacent
    // doubles are 2 apart up there): a double-keyed buffer would tie or
    // misorder them; the long-keyed buffer must rank them exactly
    val rows = Seq(("g", base + 1L, 1L), ("g", base + 2L, 2L),
      ("g", base + 3L, 3L), ("g", base + 3L, 0L))
    val out = rows.toDF("g", "score", "id").repartition(3)
      .groupBy(col("g"))
      .agg(TopK.top_k_by_long_score(col("score"), col("id"), 3).as("top"))
      .select(posexplode(col("top")))
      .select(col("pos"), col("col._1"), col("col._2"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    // ties broken by ascending id, same contract as the double form
    assert(out == Seq((0, base + 3L, 0L), (1, base + 3L, 3L),
      (2, base + 2L, 2L)))
  }

  test("plan is partial+final aggregate, not a window sort") {
    import spark.implicits._
    val df = (0L until 100L).map(i => ("g" + (i % 3), i * 0.5, i))
      .toDF("g", "score", "id")
      .groupBy(col("g"))
      .agg(TopK.top_k_by_score(col("score"), col("id"), 5).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "Window"
    // partial + final: the aggregate appears in two modes around the exchange
    plan.toLowerCase should include("partial")
  }
}
