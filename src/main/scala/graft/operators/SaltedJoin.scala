package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the skew mitigation for a fact side whose join key
  * has hot values (one key holding a large share of rows turns the
  * shuffle partition for that key into a straggler): the fact side gets a
  * deterministic salt in [0, buckets), the dim side is exploded ×buckets,
  * and the join runs on (key, salt) — a hot key's rows spread across
  * `buckets` partitions at the cost of replicating the dim side.
  *
  * The salt must come from a column that VARIES within a hot key (a
  * unique row id is ideal); salting on the key itself — or on columns
  * constant within the hot key — would put every hot row in one salt
  * bucket and change nothing. Dim replication cost is |dims| × buckets
  * rows, so this is for fact-dim joins where the dim side is small-ish
  * but too big (or too skew-prone downstream) to broadcast outright.
  */
object SaltedJoin {

  // right/full outer joins are NOT salt-safe: an unmatched dim row would
  // surface once per salt replica instead of once
  private val SaltSafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  def saltedEquiJoin(
      facts: DataFrame,
      dims: DataFrame,
      factKey: Column,
      dimKey: Column,
      saltSource: Column,
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    require(SaltSafeJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"join type '$joinType' is not salt-safe: unmatched dim rows would be " +
        s"replicated once per salt bucket; use one of $SaltSafeJoinTypes")
    (facts.columns ++ dims.columns)
      .find(Seq("__fk", "__dk", "__salt").contains).foreach(c =>
        throw new IllegalArgumentException(
          s"input column '$c' collides with saltedEquiJoin's internal columns"))
    val salted = facts
      .withColumn("__fk", factKey)
      .withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets.toLong)))
    val replicated = dims
      .withColumn("__dk", dimKey)
      .withColumn("__salt",
        explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted
      .join(replicated,
        salted("__fk") === replicated("__dk") &&
          salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__fk", "__dk", "__salt")
  }
}
