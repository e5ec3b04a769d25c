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

  /** Exact join-size forecast — what an equi-join on `lKey`/`rKey`
    * would produce, BEFORE paying for it: |A ⋈ B| = Σ_k cntA(k)·cntB(k)
    * computed from the two per-key count relations (each a
    * map-side-combined aggregate; their join carries |keys| rows, never
    * corpus rows — the 100 TB shape). One row out: side totals, key
    * cardinalities, exact join rows, the hottest key and its
    * contribution, and the output amplification vs the left side. All
    * integers except two correctly-rounded double divisions —
    * cross-engine bit-stable. The planning dual of [[profile]]: profile
    * says where the shuffle stragglers will be, this says how big the
    * output gets (the join-explosion guard for self-joins and
    * many-to-many keys).
    */
  def joinSizeProfile(
      left: DataFrame, lKey: Column,
      right: DataFrame, rKey: Column): DataFrame = {
    val a = left.select(lKey.as("key")).groupBy("key")
      .agg(count(lit(1)).as("cnt_a"))
    val b = right.select(rKey.as("key")).groupBy("key")
      .agg(count(lit(1)).as("cnt_b"))
    val j = a.join(b, Seq("key"))
      .select(col("key"), (col("cnt_a") * col("cnt_b")).as("prod"))
    val ta = a.agg(sum(col("cnt_a")).as("n_left"),
      count(lit(1)).as("n_keys_left"))
    val tb = b.agg(sum(col("cnt_b")).as("n_right"),
      count(lit(1)).as("n_keys_right"))
    val tj = j.agg(coalesce(sum(col("prod")), lit(0L)).as("join_rows"),
      count(lit(1)).as("n_common_keys"))
    // hottest key: deterministic ties (prod desc, then key string asc)
    val top = j.orderBy(col("prod").desc, col("key").cast("string").asc)
      .limit(1)
      .select(col("key").cast("string").as("top_key"),
        col("prod").as("top_key_rows"))
    // left join on a constant (not crossJoin) so a disjoint-key profile
    // still yields its one summary row with a NULL top_key
    ta.crossJoin(tb).crossJoin(tj).withColumn("_k", lit(1))
      .join(broadcast(top.withColumn("_k", lit(1))), Seq("_k"), "left")
      .select(col("n_left"), col("n_right"),
        col("n_keys_left"), col("n_keys_right"), col("n_common_keys"),
        col("join_rows"), col("top_key"), col("top_key_rows"),
        (col("join_rows") / col("n_left")).as("amplification"),
        (col("top_key_rows") / col("join_rows")).as("top_key_share"))
  }

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
