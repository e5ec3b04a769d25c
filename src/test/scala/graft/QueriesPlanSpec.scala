package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan assertions for the scale-critical query shapes: the point
  * of bucketing is the ABSENCE of a shuffle, which only the executed plan
  * can prove.
  */
class QueriesPlanSpec extends SparkSpec {

  private val sfDir = sf()

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // finalize AQE so the executed plan is the real one
    // AQE hides subtrees behind LEAF QueryStageExec nodes (Result/Shuffle
    // stages), so a plain collect undercounts — recurse through stage
    // wrappers explicitly and count the exchanges themselves
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeExec => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  test("bucketed join: co-located buckets, ZERO shuffle on the join itself") {
    // force multi-partition file scans: a single-partition side satisfies
    // any clustering trivially, which would make the control vacuous
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (16 * 1024).toString)
    try {
      val (li, orders) = Queries.bucketedPair(spark, sfDir)
      val joined = li.hint("merge")
        .join(orders, li("l_orderkey") === orders("o_orderkey"))
      assert(shuffles(joined) == 0,
        s"bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")
      // same join over the raw (unbucketed) parquet DOES shuffle both
      // sides — the control proving the bucketing removed them
      val rawLi = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
      val rawOrd = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val control = rawLi.hint("merge")
        .join(rawOrd, rawLi("l_orderkey") === rawOrd("o_orderkey"))
      assert(shuffles(control) == 2,
        s"control join should shuffle both sides:\n${control.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("q15 results match the plain join regardless of bucketing") {
    val bucketed = Queries.all("q15_bucketed_join")(spark, sfDir)
      .orderBy("o_orderpriority").collect().toSeq
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val plain = li
      .join(orders, li("l_orderkey") === orders("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(bucketed == plain)
  }
}
