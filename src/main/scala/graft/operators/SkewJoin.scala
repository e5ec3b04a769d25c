package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the classic hot-key mitigation for shuffle joins.
  *
  * A plain shuffle join routes every row of a hot key to ONE reducer; at
  * 100 TB a single viral key serializes the stage. Salting splits each
  * left-side key into `buckets` sub-keys via a deterministic per-row salt
  * and replicates every right-side row across all `buckets` sub-keys, so
  * the join becomes (key, salt)-keyed and the hot key's work spreads over
  * `buckets` reducers. Replication multiplies the right side by
  * `buckets` — use it dimension-side-small, like a broadcast you can't
  * afford but a shuffle you can't survive.
  *
  * Correctness never depends on the salt DISTRIBUTION (any per-row salt
  * value joins against exactly one of the replicated copies), only the
  * load-balancing does — pass a high-cardinality `saltSource` (a unique
  * id, not the join key) so hot-key rows actually spread.
  *
  * Spark's AQE skew-join handles most of this automatically at runtime
  * (split-and-replicate on detected skew); this operator is the explicit,
  * planner-independent form — for disabled-AQE contexts, for skew AQE's
  * post-shuffle stats miss (e.g. hot keys hidden behind a map-side
  * combine), and as the compositional building block.
  */
object SkewJoin {

  private val Reserved = Seq("__salt", "__lk", "__rk")

  /** Inner equi-join of `left` (large, skewed) with `right` (small enough
    * to replicate `buckets`×) on leftKey = rightKey. Null keys never
    * match, exactly like the plain inner join.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      saltSource: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    (left.columns ++ right.columns).find(Reserved.contains).foreach(c =>
      throw new IllegalArgumentException(
        s"input column '$c' collides with saltedJoin's internal columns"))
    val l = left
      .withColumn("__lk", leftKey)
      .withColumn("__salt",
        pmod(xxhash64(saltSource), lit(buckets.toLong)).cast("int"))
    val r = right
      .withColumn("__rk", rightKey)
      .withColumn("__salt",
        explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, l("__lk") === r("__rk") && l("__salt") === r("__salt"))
      .drop("__lk", "__rk", "__salt")
  }
}
