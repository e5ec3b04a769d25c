package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiling: per column, row/null/distinct counts and
  * min/max (rendered to strings so one relation covers heterogeneous
  * column types) — the data-quality summary an ingestion pipeline runs
  * over every new table before accepting it.
  *
  * Scale shape: ONE aggregation job computes every per-column statistic
  * as parallel aggregate expressions (partial aggregation map-side, one
  * reduce), not one job per column; the long-format output is a driver-
  * side unpivot of that single row. `count(distinct)` over many columns
  * in one pass would expand to a multi-pass plan, so distincts use
  * exact `count_distinct` only when `exactDistinct` (default — matches
  * the SQL oracle), else `approx_count_distinct` (HLL++, one pass, the
  * 100 TB mode).
  */
object Profiler {

  def profile(df: DataFrame, exactDistinct: Boolean = true): DataFrame = {
    val names = df.columns.toSeq
    require(names.nonEmpty, "cannot profile a zero-column relation")
    // positional rename first: generated aliases must never embed user
    // column names, which col() would re-parse as nested-field paths for
    // names containing dots/backticks
    val safe = df.toDF(names.indices.map(i => s"__c$i"): _*)
    val aggs = names.indices.flatMap { i =>
      val v = col(s"__c$i")
      Seq(
        count(lit(1)).as(s"__n_$i"),
        count(v).as(s"__nn_$i"),
        (if (exactDistinct) count_distinct(v) else approx_count_distinct(v))
          .as(s"__nd_$i"),
        min(v).cast("string").as(s"__min_$i"),
        max(v).cast("string").as(s"__max_$i"))
    }
    val row = safe.agg(aggs.head, aggs.tail: _*)
    // unpivot: one output row per column via a stack over the single agg row
    val stacked = names.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column_name"),
        col(s"__n_$i").as("n_rows"),
        (col(s"__n_$i") - col(s"__nn_$i")).as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__min_$i").as("min_str"),
        col(s"__max_$i").as("max_str"))
    }
    row
      .select(explode(array(stacked: _*)).as("p"))
      .select(col("p.column_name"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_str"), col("p.max_str"))
  }
}
