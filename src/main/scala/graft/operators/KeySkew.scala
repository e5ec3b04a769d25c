package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-key skew profiler — the measurement that decides BEFORE a big
  * join whether [[SaltedJoin]] (or AQE skew splitting) is needed, and
  * with how many buckets: per hot key, how many rows it holds, what
  * multiple of the mean key load that is, and the salt-bucket count
  * that would level it back to the mean.
  *
  * Scale shape: one map-side-combined count aggregation over the fact
  * table (the only corpus-wide exchange), a one-row totals aggregate
  * over the ~|keys| count relation, and a TakeOrderedAndProject top-k —
  * the totals row joins back by broadcast, nothing resorts globally.
  *
  * Arithmetic contract: skew_ratio = cnt·n_keys / total in IEEE double
  * — both factors are exact integers below 2^53 and division is
  * correctly rounded, so the value is bit-identical across engines (the
  * [[DriftStats]] ln-free design rule). salt_buckets =
  * ceil(cnt·n_keys/total) is the integer bucket count that spreads the
  * hot key to ≤ mean-load partitions.
  */
object KeySkew {

  /** Top-`k` heaviest values of `key` in `rows`, with corpus totals and
    * per-key skew metrics. Deterministic: ties on count break by key
    * (ascending string form), so the top-k SET is stable across runs
    * and partitionings.
    */
  def profile(rows: DataFrame, key: Column, k: Int = 20): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val counts = rows.select(key.as("key")).groupBy("key")
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    counts
      .orderBy(col("cnt").desc, col("key").cast("string").asc)
      .limit(k)
      .crossJoin(broadcast(totals))
      .select(
        col("key").cast("string").as("key"),
        col("cnt"),
        col("total_rows"),
        col("n_keys"),
        (col("cnt") * col("n_keys") / col("total_rows")).as("skew_ratio"),
        ceil(col("cnt") * col("n_keys") / col("total_rows"))
          .cast("long").as("salt_buckets"))
  }
}
