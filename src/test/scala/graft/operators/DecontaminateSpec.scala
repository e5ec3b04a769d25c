package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {

  test("flags documents sharing k-grams with the benchmark, counts exact") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares "alpha beta gamma" etc.
      (2L, "zeta eta theta iota kappa"),      // disjoint
      (3L, "alpha beta gamma zeta eta"),      // shares exactly 1 gram
      (4L, "")                                // empty → no rows emitted? no: no grams
    ).toDF("doc_id", "text")
    val bench = Seq((10L, "alpha beta gamma delta epsilon")).toDF("bid", "text")
    val r = Decontaminate.report(corpus, "doc_id", "text", bench, "text", k = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getBoolean(4))).toMap
    // doc 1: grams {abg, bgd, gde} all in bench → 3/3
    assert(r(1L) == ((3L, 3L, true)))
    // doc 2: 3 grams, 0 hits
    assert(r(2L) == ((3L, 0L, false)))
    // doc 3: grams {abg, bgz, gze} → 1 hit
    assert(r(3L) == ((3L, 1L, true)))
    // empty doc contributes no grams → absent from the report
    assert(!r.contains(4L))
  }

  test("minHits raises the flag bar; short docs use the whole-text gram") {
    import spark.implicits._
    val corpus = Seq((1L, "one two"), (2L, "one two three four")).toDF("doc_id", "text")
    val bench = Seq((10L, "one two")).toDF("bid", "text")
    // "one two" (< k words) is one whole-text gram, and matches the
    // benchmark's identical whole-text gram
    val r = Decontaminate.report(corpus, "doc_id", "text", bench, "text",
      k = 3, minHits = 2L)
      .collect().map(x => x.getLong(0) -> (x.getLong(2), x.getBoolean(4))).toMap
    assert(r(1L) == ((1L, false)), "1 hit < minHits=2")
    assert(r(2L)._1 == 0L)
  }

  test("bloomReport equals report exactly, even at a false-positive-heavy fpp") {
    import spark.implicits._
    val corpus = (0L until 400L)
      .map(i => (i, s"tok${i % 37} tok${(i * 7) % 41} tok${(i * 13) % 43} " +
        s"tok${(i * 17) % 47} shared tail run ${i % 5}"))
      .toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") % 19 === 0)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("id").collect().map(_.toString).toSeq
    for (fpp <- Seq(0.5, 0.01)) {
      val exact = Decontaminate.report(corpus, "doc_id", "text", bench, "text", k = 3)
      val bloom = Decontaminate.bloomReport(corpus, "doc_id", "text", bench, "text",
        k = 3, fpp = fpp)
      assert(canon(bloom) == canon(exact), s"fpp=$fpp diverged")
    }
  }

  test("bloomReport validates fpp and keeps empty docs out of the report") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta gamma delta"), (2L, "")).toDF("doc_id", "text")
    val bench = Seq((9L, "alpha beta gamma")).toDF("bid", "text")
    assertThrows[IllegalArgumentException](
      Decontaminate.bloomReport(corpus, "doc_id", "text", bench, "text", fpp = 0.0))
    val ids = Decontaminate.bloomReport(corpus, "doc_id", "text", bench, "text", k = 3)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("the benchmark side broadcasts") {
    import spark.implicits._
    val corpus = (0L until 100L).map(i => (i, s"word$i and some shared tail text")).toDF("doc_id", "text")
    val bench = Seq((0L, "some shared tail text here")).toDF("bid", "text")
    val plan = Decontaminate.report(corpus, "doc_id", "text", bench, "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in:\n$plan")
  }
}
