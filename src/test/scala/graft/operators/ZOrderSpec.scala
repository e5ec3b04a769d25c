package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import ZOrder._

  test("interleave SQL matches the pure-Scala reference bit-twiddle") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (43690L, 21845L), (256L, 255L), (12345L, 54321L))
    val got = pairs.toDF("qx", "qy")
      .select(col("qx"), col("qy"), expr(interleaveSql("qx", "qy")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (qx, qy, z) =>
      assert(z === interleaveRef(qx, qy), s"($qx, $qy)")
    }
    // directed values: x fills even bits, y odd bits
    assert(interleaveRef(65535L, 0L) === 0x55555555L)
    assert(interleaveRef(0L, 65535L) === 0xaaaaaaaaL)
  }

  test("quantize: in-range, monotone, overflow-safe at epoch-µs scale") {
    import spark.implicits._
    // a micros-scale range large enough that the naive (v-min)*65535
    // multiply would overflow BIGINT without the >>20 pre-shrink
    val min = 1700000000000000L
    val max = min + 300L * 86400L * 1000000L // ~300 days of µs
    val rnd = new scala.util.Random(42)
    val vs = (min +: max +: Seq.fill(500)(
      min + (rnd.nextLong() % (max - min + 1) + (max - min + 1)) % (max - min + 1)))
      .sorted
    val qs = vs.toDF("x")
      .withColumn("xmin", lit(min)).withColumn("xmax", lit(max))
      .select(col("x"), expr(quantizeSql("x", "xmin", "xmax", SparkIDiv)).as("q"))
      .orderBy(col("x"))
      .collect().map(_.getLong(1))
    qs.foreach(q => assert(q >= 0 && q < (1L << Bits)))
    // sorted inputs must produce non-decreasing quantized values
    qs.sliding(2).foreach { case Array(a, b) => assert(a <= b); case _ => }
    assert(qs.head === 0L)
  }

  test("quantize spreads a tiny domain across the full width") {
    import spark.implicits._
    // 15 users must not collapse into one top-bits cell: max q near 2^16
    val q = (0L to 14L).toDF("y")
      .withColumn("ymin", lit(0L)).withColumn("ymax", lit(14L))
      .select(expr(quantizeSql("y", "ymin", "ymax", SparkIDiv)).as("q"))
      .collect().map(_.getLong(0)).sorted
    assert(q.head === 0L)
    assert(q.last > 60000L, s"tiny domain collapsed: max q = ${q.last}")
    assert(q.distinct.length === 15)
  }

  test("layoutStats: z-order prunes the 2-D probe strictly better than linear") {
    val ev = spark.read.parquet(sf() + "/events.parquet")
    val stats = ZOrder.layoutStats(
      ev.select(graft.Events.microsExpr(ev).as("x"), col("user_id").as("y")))
      .collect()
    def hits(layout: String) =
      stats.filter(r => r.getString(0) == layout && r.getLong(7) == 1L).length
    def rowsScanned(layout: String) =
      stats.filter(r => r.getString(0) == layout && r.getLong(7) == 1L)
        .map(_.getLong(2)).sum
    assert(hits("zorder") < hits("linear"),
      s"z=${hits("zorder")} lin=${hits("linear")}")
    assert(rowsScanned("zorder") < rowsScanned("linear"))
    // both layouts partition the same corpus
    val totals = stats.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(totals("zorder") === totals("linear"))
  }

  test("bucket boxes tile without row loss and stay inside the quantized grid") {
    val ev = spark.read.parquet(sf() + "/events.parquet")
    val n = ev.filter(col("ts").isNotNull && col("user_id").isNotNull).count()
    val stats = ZOrder.layoutStats(
      ev.select(graft.Events.microsExpr(ev).as("x"), col("user_id").as("y")))
      .collect()
    assert(stats.map(_.getLong(2)).sum === 2 * n)
    stats.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < (1L << BucketBits))
      Seq(3, 4, 5, 6).foreach { i =>
        assert(r.getLong(i) >= 0 && r.getLong(i) < (1L << Bits))
      }
      assert(r.getLong(3) <= r.getLong(4) && r.getLong(5) <= r.getLong(6))
    }
  }
}
