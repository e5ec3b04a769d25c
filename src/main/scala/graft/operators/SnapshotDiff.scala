package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-hash diff of two snapshots of the same keyed table — the
  * dataset-version drift audit a training-data pipeline runs between
  * crawl refreshes ("what changed since the last cut?"): every key is
  * classified added / removed / changed / unchanged.
  *
  * Scale shape: each snapshot is reduced to (key, md5-of-content)
  * BEFORE the full-outer join, so the one shuffle per side carries a
  * key and a 32-char digest — never the payload columns. At 100 TB the
  * digest projection is a map-only pass over each snapshot's scan and
  * the join is an ordinary hash/sort-merge exchange on the key; if both
  * snapshots are bucketed by the key the exchange disappears entirely.
  * Content equality via md5 equals payload equality up to hash
  * collisions (2^-64-scale at corpus sizes — the same contract the
  * exact-dedup family documents).
  */
object SnapshotDiff {

  /** NUL-coalesced, 0x01-joined canonical string of the content
    * columns: distinguishes NULL from "" and "a","b" from "ab" so two
    * rows hash equal iff their content columns are equal.
    */
  private def contentHash(contentCols: Seq[String]): Column =
    md5(concat_ws("\u0001",
      contentCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))

  /** Per-key status relation: (key, status) with status in
    * added | removed | changed | unchanged.
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must not be empty")
    val o = oldSnap.select(col(keyCol), contentHash(contentCols).as("old_hash"))
    val n = newSnap.select(col(keyCol), contentHash(contentCols).as("new_hash"))
    o.join(n, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Drift totals: one row per status with its key count. */
  def summary(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      contentCols: Seq[String]): DataFrame =
    diff(oldSnap, newSnap, keyCol, contentCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n_keys"))
}
