package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("asof picks the latest state at or before each probe time") {
    import spark.implicits._
    val probes = Seq((1L, 10L, 5L), (2L, 10L, 15L), (3L, 10L, 25L), (4L, 20L, 100L))
      .toDF("probe_id", "key", "t")
    val state = Seq((10L, 10L, "a"), (10L, 20L, "b"), (30L, 1L, "z"))
      .toDF("key", "t", "v")
    val out = AsOfJoin
      .asof(probes, state, col("key"), col("key"), col("t"), col("t"),
        Seq("val" -> col("v")))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(3)))
      .toMap
    assert(out(1L).isEmpty, "probe before any state must get null")
    assert(out(2L).contains("a"))
    assert(out(3L).contains("b"))
    assert(out(4L).isEmpty, "unseen key gets null")
  }

  test("inclusive semantics: state at exactly probe time is visible") {
    import spark.implicits._
    val probes = Seq((1L, 7L, 50L)).toDF("probe_id", "key", "t")
    val state = Seq((7L, 50L, "exact")).toDF("key", "t", "v")
    val out = AsOfJoin.asof(probes, state, col("key"), col("key"), col("t"), col("t"),
      Seq("val" -> col("v"))).head()
    assert(out.getString(3) == "exact")
  }

  test("matched right row with null value beats older non-null state") {
    import spark.implicits._
    val probes = Seq((1L, 5L, 25L)).toDF("probe_id", "key", "t")
    val state = Seq((5L, 10L, Some("a")), (5L, 20L, None))
      .toDF("key", "t", "v")
    val out = AsOfJoin.asof(probes, state, col("key"), col("key"), col("t"), col("t"),
      Seq("val" -> col("v"))).head()
    assert(out.isNullAt(3), "the t=20 matched row's null must win over the stale 'a'")
  }

  test("output name colliding with a left column is rejected") {
    import spark.implicits._
    val probes = Seq((1L, 5L, 25L)).toDF("probe_id", "key", "t")
    val state = Seq((5L, 10L, "a")).toDF("key", "t", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(probes, state, col("key"), col("key"), col("t"), col("t"),
        Seq("t" -> col("v")))
    }
  }

  test("multiple value columns carry independently") {
    import spark.implicits._
    val probes = Seq((1L, 1L, 10L)).toDF("probe_id", "key", "t")
    val state = Seq((1L, 5L, "x", 100L)).toDF("key", "t", "v", "w")
    val out = AsOfJoin.asof(probes, state, col("key"), col("key"), col("t"), col("t"),
      Seq("sv" -> col("v"), "sw" -> col("w"))).head()
    assert(out.getString(3) == "x" && out.getLong(4) == 100L)
  }
}
