package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("hashSplit is deterministic, partition-invariant, and near the target rate") {
    import spark.implicits._
    val df = spark.range(20000).select(col("id"))
    def holdoutIds(parts: Int): Set[Long] =
      Sampling.hashSplit(df.repartition(parts), col("id"), holdoutPct = 10)
        .filter(col("split") === "holdout").select("id").as[Long].collect().toSet
    val a = holdoutIds(1)
    val b = holdoutIds(32)
    assert(a == b)
    val rate = a.size.toDouble / 20000
    assert(rate > 0.08 && rate < 0.12, s"rate=$rate")
    // stability under corpus change: a subset's membership is unchanged
    val subset = Sampling.hashSplit(df.filter(col("id") < 5000), col("id"), 10)
      .filter(col("split") === "holdout").select("id").as[Long].collect().toSet
    assert(subset == a.filter(_ < 5000))
  }

  test("hashSample keeps exactly the holdout rows; pct bounds validated") {
    import spark.implicits._
    val df = spark.range(1000).select(col("id"))
    val sampled = Sampling.hashSample(df, col("id"), 25).select("id")
      .as[Long].collect().toSet
    val viaSplit = Sampling.hashSplit(df, col("id"), 25)
      .filter(col("split") === "holdout").select("id").as[Long].collect().toSet
    assert(sampled == viaSplit)
    assertThrows[IllegalArgumentException](Sampling.hashSplit(df, col("id"), 101))
    assert(Sampling.thresholdHex(10) == "1999")
    assert(Sampling.thresholdHex(0) == "0000")
    // boundary percentages behave, not just format: 100 keeps everything
    // (the naive 5-char "10000" threshold would keep ~6%), 0 keeps nothing
    assert(Sampling.hashSample(df, col("id"), 100).count() == 1000L)
    assert(Sampling.hashSample(df, col("id"), 0).count() == 0L)
  }

  test("null split keys fail loudly instead of silently landing in train") {
    import spark.implicits._
    val df = Seq(Some(1L), None, Some(3L)).toDF("id")
    for (pct <- Seq(10, 100)) {
      val e = intercept[Exception] {
        Sampling.hashSplit(df, col("id"), pct).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("null split key")), s"pct=$pct: $e")
    }
    // non-null rows are unaffected
    val ok = Sampling.hashSplit(df.filter(col("id").isNotNull), col("id"), 10)
    assert(ok.count() == 2L)
  }
}
