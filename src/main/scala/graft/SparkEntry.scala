package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Estimator

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (the reference's `de dedup f1 f2 ...`, SURVEY §3.1):
    * CDC-chunk sf0.001 parquet files, merge chunk streams by hash, report
    * per-group dedup stats. Two groups in one grid job: `selfdup` lists
    * lineitem twice (the reference's estimate(f,f) case — dedup ratio
    * ≈ 0.5 shows the estimator finding every shared chunk) and `tables`
    * spans three distinct tables (ratio ≈ 1.0: nothing shared). Driver
    * smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val li = s"$dir/lineitem.parquet"
    val grid = Estimator.estimateGrid(
      spark,
      Seq(
        ("selfdup", "parquet", li),
        ("selfdup", "parquet", li),
        ("tables", "parquet", li),
        ("tables", "parquet", s"$dir/orders.parquet"),
        ("tables", "parquet", s"$dir/customer.parquet")))
    spark.createDataset(grid).toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Queries.oracles
}
