package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact interval (range) join — a join type Spark has no native operator
  * for: `left.t BETWEEN right.start AND right.end` (plus an equi-key).
  * Naively this plans as a broadcast-nested-loop or a shuffled
  * filter-after-cartesian; the scale-correct shape is BIN BUCKETING
  * (the standard banded/binned range-join decomposition): pick a bin
  * width, explode each right interval to the bins it overlaps, map each
  * left point to its bin, equi-join on (key, bin), then apply the exact
  * BETWEEN as a post-filter. Every matching pair shares the point's bin,
  * so the result is exact; the join is a plain hash shuffle on (key, bin).
  *
  * Bin-width choice: ≈ the typical interval length. Cost scales with
  * Σ (interval_len / binWidth + 1) exploded rows and with per-(key, bin)
  * fanout — same tuning story as any banded join.
  */
object RangeJoin {

  private val Reserved = Seq("__t", "__lk", "__bin", "__s", "__e", "__rk")

  /** Floor-division bin in pure LONG arithmetic. Spark's `/` is Divide
    * (double): above 2^53 the long→double conversion loses units and a
    * point near a bin edge can land in the adjacent bin — the exact
    * BETWEEN post-filter only removes false positives, it cannot recover
    * a pair whose bins never matched. `pmod` gives the nonnegative
    * remainder, so `t - pmod(t, w)` is the exact floor multiple and the
    * integral divide (`div`) is exact with no rounding mode in play.
    */
  private def binOf(t: Column, binWidth: Long): Column =
    call_function("div", t - pmod(t, lit(binWidth)), lit(binWidth))

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightStart: Column,
      rightEnd: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // fail fast rather than silently overwriting + dropping a caller column
    (left.columns ++ right.columns).find(Reserved.contains).foreach(c =>
      throw new IllegalArgumentException(
        s"input column '$c' collides with intervalJoin's internal columns"))
    val l = left
      // keys keep their RAW type: casting to long would truncate fractional
      // keys into false cross-key matches and null out string keys
      .withColumn("__lk", leftKey)
      .withColumn("__t", leftTime.cast("long"))
      .withColumn("__bin", binOf(col("__t"), binWidth))
      .as("l")
    val r = right
      .withColumn("__rk", rightKey)
      .withColumn("__s", rightStart.cast("long"))
      .withColumn("__e", rightEnd.cast("long"))
      .filter(col("__s") <= col("__e"))
      .withColumn("__bin",
        explode(sequence(binOf(col("__s"), binWidth),
          binOf(col("__e"), binWidth))))
      .as("r")
    l.join(r,
        col("l.__lk") === col("r.__rk") && col("l.__bin") === col("r.__bin"))
      .filter(col("l.__t") >= col("r.__s") && col("l.__t") <= col("r.__e"))
      .drop("__t", "__lk", "__bin", "__s", "__e", "__rk")
  }
}
