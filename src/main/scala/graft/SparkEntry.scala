package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Estimator

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (the reference's `de dedup f1 f2 ...`, SURVEY §3.1):
    * CDC-chunk the sf0.001 parquet tables, merge chunk streams by hash,
    * and report per-group dedup estimation stats. Driver smoke-checks
    * rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val paths = Seq(s"$dir/lineitem.parquet", s"$dir/orders.parquet", s"$dir/customer.parquet")
    val r = Estimator.estimate(spark, paths, group = "sf0.001", format = "parquet")
    spark.createDataset(Seq(r)).toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Queries.oracles
}
