package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** The engine's query catalog: every operator from SURVEY §2 (plus the
  * large-scale-pipeline extensions) exposed as a named query over the
  * driver's testdata tables, with a DuckDB oracle where the semantics are
  * ANSI-SQL-expressible.
  *
  * Column names are aliased identically in the Spark plan and the oracle
  * SQL (the driver sorts columns by name before hashing). Floating-point
  * aggregates are cast to DECIMAL before summing so Spark and DuckDB get
  * bit-identical results regardless of accumulation order.
  */
object Queries {

  private def t(sfDir: String, name: String) = s"$sfDir/$name.parquet"

  /** CDC estimate over the scale-factor directory's parquet files —
    * rows-only check (the chunker has no SQL equivalent).
    */
  private def cdcEstimate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val paths = Seq(t(sfDir, "lineitem"), t(sfDir, "orders"))
    spark.createDataset(Seq(Estimator.estimate(spark, paths, group = "sf", format = "parquet"))).toDF()
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_estimate" -> cdcEstimate
  )

  val oracles: Map[String, String] = Map()
}
