package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Point-in-time (as-of) join — the feature-store primitive: for each left
  * row, attach values from the latest right row with
  * `rightTime <= leftTime` for the same key. Spark has no native ASOF
  * join; this composes built-ins (preference (a) of the extension ladder):
  *
  *   union the two sides (right rows are "state updates", left rows are
  *   "probes") → ONE shuffle on the key → per-key time-ordered window →
  *   `last(value, ignoreNulls)` carries the most recent state forward →
  *   keep probe rows.
  *
  * At equal timestamps the right row sorts first, giving inclusive
  * (`<=`) semantics. Right rows must be unique per (key, time) for
  * deterministic output — pre-aggregate ties (the catalog query keeps
  * MAX(o_orderkey)).
  *
  * Scale: cost = shuffle of |left| + |right| rows keyed by join key plus a
  * per-key sort — same shape as a sort-merge join, no point-lookup storm
  * and no cross product. Hot keys skew the sort; salt by time-bucket with
  * a second merge pass if one key dominates (not needed for uniform keys).
  */
object AsOfJoin {

  /** Normalize a time column to a comparable long. Timestamps convert at
    * MICROSECOND resolution via unix_micros — `cast("long")` would truncate
    * to whole seconds, silently collapsing sub-second-distinct right rows
    * into a nondeterministic window order. Numeric columns pass through
    * (the caller owns their unit; both sides must agree).
    */
  private def timeAsLong(df: DataFrame, c: Column): Column = {
    import org.apache.spark.sql.types._
    df.select(c).schema.head.dataType match {
      case TimestampType | TimestampNTZType | DateType => unix_micros(c.cast("timestamp"))
      case _: NumericType => c.cast("long")
      case dt => throw new IllegalArgumentException(
        s"asof time column must be numeric or timestamp/date, got ${dt.catalogString}")
    }
  }

  /** @param valueCols output name → right-side column to carry. Output
    * names must not collide with left columns (checked).
    * Time resolution contract: timestamp/date inputs compare at
    * microsecond resolution; numeric inputs compare as-is (same unit on
    * both sides is the caller's contract).
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      valueCols: Seq[(String, Column)]): DataFrame = {
    val leftCols = left.columns.toSeq
    valueCols.foreach { case (n, _) =>
      require(!leftCols.contains(n), s"asof output column '$n' collides with a left column")
    }
    val probes = left
      .withColumn("__key", leftKey)
      .withColumn("__t", timeAsLong(left, leftTime))
      .withColumn("__is_probe", lit(1))
    // state is carried as ONE non-null struct per right row, so a matched
    // right row whose value column is null still wins over older state
    // (last(value, ignoreNulls) alone would skip it and return stale data)
    val state = right
      .select(rightKey.as("__key"), timeAsLong(right, rightTime).as("__t"),
        lit(0).as("__is_probe"),
        struct(valueCols.map { case (n, c) => c.as(n) }: _*).as("__state"))
    val unioned = probes.unionByName(state, allowMissingColumns = true)
    val w = Window
      .partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__carried", last(col("__state"), ignoreNulls = true).over(w))
      .filter(col("__is_probe") === 1)
      .select((leftCols.map(col) ++
        valueCols.map { case (n, _) => col(s"__carried.$n").as(n) }): _*)
  }
}
