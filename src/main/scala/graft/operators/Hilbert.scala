package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering — the space-filling curve with strictly
  * better locality than Morton/z-order (every consecutive pair of curve
  * positions is a GRID NEIGHBOR, so key-range "files" tile the 2-D space
  * in compact blobs instead of z-shaped jumps). This is the curve behind
  * Databricks liquid clustering and Delta's OPTIMIZE ZORDER successor
  * discussions; here it is a first-class layout next to [[ZOrder]].
  *
  * The classic per-level fold (quadrant index + rotate/reflect) is pure
  * integer CASE arithmetic — no XOR, which Spark spells `^` and DuckDB
  * spells `xor()` — so each level renders as ONE engine-neutral SQL
  * template over the previous level's columns. The engine applies the
  * levels as a `withColumn` chain; the oracle applies the identical
  * strings as a chained-CTE pipeline. Both engines therefore run
  * literally the same arithmetic, level for level.
  */
object Hilbert {

  /** Pure-Scala reference: Hilbert distance of (x, y) on a 2^bits grid
    * (top-down quadrant walk; validated by exhaustive adjacency in
    * HilbertSpec).
    */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y) = (x0, y0)
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the s×s sub-square so the child quadrant is re-oriented
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      // confine to the sub-square (the reference C keeps full coords and
      // masks implicitly via s; after the reflection x/y may go negative
      // unless we mask to the lower bits)
      x &= (s - 1)
      y &= (s - 1)
      s >>= 1
    }
    d
  }

  /** One level of the fold as engine-neutral SQL: given the previous
    * level's columns (xPrev, yPrev, dPrev) and the half-size s, returns
    * (xExpr, yExpr, dExpr) for the next level. Quadrant index
    * (3·rx) XOR ry spelled as a CASE over the two bits — no xor
    * operator needed.
    */
  def levelSql(s: Long, xPrev: String, yPrev: String,
      dPrev: String): (String, String, String) = {
    val rx = s"((($xPrev) & $s) > 0)"
    val ry = s"((($yPrev) & $s) > 0)"
    val quad =
      s"(CASE WHEN $rx AND $ry THEN 2 WHEN $rx THEN 3 WHEN $ry THEN 1 ELSE 0 END)"
    // CAST: s·s reaches 2^30 and ×3 overflows INT32 under ANSI; force
    // the accumulation into BIGINT on both engines
    val d = s"(($dPrev) + CAST(${s * s} AS BIGINT) * $quad)"
    // if ry==0: reflect when rx==1, then swap; mask to the sub-square
    val reflX = s"(CASE WHEN $rx THEN ${s - 1} - ($xPrev) ELSE ($xPrev) END)"
    val reflY = s"(CASE WHEN $rx THEN ${s - 1} - ($yPrev) ELSE ($yPrev) END)"
    val x = s"((CASE WHEN $ry THEN ($xPrev) ELSE $reflY END) & ${s - 1})"
    val y = s"((CASE WHEN $ry THEN ($yPrev) ELSE $reflX END) & ${s - 1})"
    (x, y, d)
  }

  /** Hilbert key column for already-quantized dims: a `withColumn`
    * chain applying [[levelSql]] per level (intermediate columns, never
    * an exponentially-substituted single expression).
    */
  def hilbertKey(df: DataFrame, qx: String, qy: String,
      bits: Int = ZOrder.Bits): DataFrame = {
    var out = df
      .withColumn("__hx0", col(qx))
      .withColumn("__hy0", col(qy))
      .withColumn("__hd0", lit(0L))
    var i = 0
    var s = 1L << (bits - 1)
    while (s > 0) {
      val (xE, yE, dE) = levelSql(s, s"__hx$i", s"__hy$i", s"__hd$i")
      out = out
        .withColumn(s"__hd${i + 1}", expr(dE))
        .withColumn(s"__hx${i + 1}", expr(xE))
        .withColumn(s"__hy${i + 1}", expr(yE))
      i += 1
      s >>= 1
    }
    val keep = out.withColumn("hkey", col(s"__hd$i"))
    keep.drop((0 to i).flatMap(j => Seq(s"__hx$j", s"__hy$j", s"__hd$j")): _*)
  }

  /** The same chain as chained CTEs for the DuckDB oracle: caller
    * provides CTE `__q(qx, qy)`; this emits `__h0 ... __h<bits>` where
    * the last carries (qx, qy, hkey).
    */
  def hilbertCtesSql(bits: Int = ZOrder.Bits): String = {
    val steps = new StringBuilder
    steps ++= "__h0 AS (SELECT qx, qy, qx AS hx, qy AS hy, CAST(0 AS BIGINT) AS hd FROM __q)"
    var i = 0
    var s = 1L << (bits - 1)
    while (s > 0) {
      val (xE, yE, dE) = levelSql(s, "hx", "hy", "hd")
      steps ++= s""",
         |__h${i + 1} AS (
         |  SELECT qx, qy, $xE AS hx, $yE AS hy, $dE AS hd FROM __h$i)"""
        .stripMargin
      i += 1
      s >>= 1
    }
    steps ++= s""",
       |__hk AS (SELECT qx, qy, hd AS hkey FROM __h$i)""".stripMargin
    steps.toString
  }

  /** Three-layout pruning experiment (linear, zorder, hilbert) over a
    * `xy(x, y)` BIGINT frame — [[ZOrder.layoutStats]] extended with the
    * Hilbert layout; same probe, same bucket granularity, same output
    * schema.
    */
  def layoutStats3(xy: DataFrame): DataFrame = {
    import ZOrder._
    val ev = xy.filter(col("x").isNotNull && col("y").isNotNull)
    val bounds = ev.agg(
      min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("y")).as("ymin"), max(col("y")).as("ymax"))
    val q = ev.crossJoin(broadcast(bounds))
      .select(
        expr(quantizeSql("x", "xmin", "xmax", SparkIDiv)).as("qx"),
        expr(quantizeSql("y", "ymin", "ymax", SparkIDiv)).as("qy"))
    val keyed = hilbertKey(q, "qx", "qy")
      .withColumn("zkey", expr(interleaveSql("qx", "qy")))
      .withColumn("linkey", shiftleft(col("qx"), Bits) + col("qy"))
    val shift = 2 * Bits - BucketBits
    // one pass, not a three-way self-union: each union branch copied the
    // ENTIRE keyed subtree (three fact scans, three bounds aggregations,
    // and three copies of the per-level Hilbert fold to analyze/codegen);
    // exploding a literal struct array emits the three (layout, bucket)
    // rows per input row from one scan, one bounds aggregate, one fold
    // (guide §2.4). Row multiplicity into the aggregate is identical to
    // the union's, so the result is row-for-row the same.
    def tag(layout: String, key: Column) =
      struct(lit(layout).as("layout"), shiftright(key, shift).as("bucket"))
    keyed
      .select(
        explode(array(tag("linear", col("linkey")), tag("zorder", col("zkey")),
          tag("hilbert", col("hkey")))).as("lb"),
        col("qx"), col("qy"))
      .select(col("lb.layout").as("layout"), col("lb.bucket").as("bucket"),
        col("qx"), col("qy"))
      .groupBy(col("layout"), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("qx")).as("min_qx"), max(col("qx")).as("max_qx"),
        min(col("qy")).as("min_qy"), max(col("qy")).as("max_qy"))
      .withColumn("probe_hit",
        (!(col("max_qx") < ProbeX0 || col("min_qx") > ProbeX1 ||
          col("max_qy") < ProbeY0 || col("min_qy") > ProbeY1))
          .cast("long"))
  }

  /** Full oracle body for [[layoutStats3]] over a caller-provided
    * `__ev(x, y)` CTE.
    */
  def layoutStats3OracleSql(idiv: ZOrder.IDiv = ZOrder.DuckIDiv): String = {
    import ZOrder._
    val shift = 2 * Bits - BucketBits
    s"""__b AS (
       |  SELECT MIN(x) AS xmin, MAX(x) AS xmax,
       |         MIN(y) AS ymin, MAX(y) AS ymax
       |  FROM __ev),
       |__q AS (
       |  SELECT ${quantizeSql("x", "xmin", "xmax", idiv)} AS qx,
       |         ${quantizeSql("y", "ymin", "ymax", idiv)} AS qy
       |  FROM __ev, __b),
       |${hilbertCtesSql()},
       |__k AS (
       |  SELECT qx, qy, hkey,
       |         ${interleaveSql("qx", "qy")} AS zkey,
       |         ((qx << $Bits) + qy) AS linkey
       |  FROM __hk),
       |__t AS (
       |  SELECT 'linear' AS layout, (linkey >> $shift) AS bucket, qx, qy FROM __k
       |  UNION ALL
       |  SELECT 'zorder' AS layout, (zkey >> $shift) AS bucket, qx, qy FROM __k
       |  UNION ALL
       |  SELECT 'hilbert' AS layout, (hkey >> $shift) AS bucket, qx, qy FROM __k),
       |__s AS (
       |  SELECT layout, bucket, COUNT(*) AS n_rows,
       |         MIN(qx) AS min_qx, MAX(qx) AS max_qx,
       |         MIN(qy) AS min_qy, MAX(qy) AS max_qy
       |  FROM __t GROUP BY layout, bucket)
       |SELECT layout, bucket, n_rows, min_qx, max_qx, min_qy, max_qy,
       |  CAST(NOT (max_qx < $ProbeX0 OR min_qx > $ProbeX1 OR
       |            max_qy < $ProbeY0 OR min_qy > $ProbeY1) AS BIGINT)
       |    AS probe_hit
       |FROM __s""".stripMargin
  }
}
