package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkSpec {
  import Hilbert._

  test("xy2d: exhaustive bijection + strict adjacency on 4-bit grids") {
    val bits = 4
    val n = 1 << bits
    val pos = (for { x <- 0 until n; y <- 0 until n }
      yield xy2d(bits, x.toLong, y.toLong) -> (x, y)).toMap
    assert(pos.size === n * n, "not a bijection")
    (0 until n * n - 1).foreach { d =>
      val (x1, y1) = pos(d.toLong)
      val (x2, y2) = pos((d + 1).toLong)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve jumps at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("generated SQL chain equals the pure-Scala reference on a 6-bit grid") {
    import spark.implicits._
    val bits = 6
    val n = 1 << bits
    val grid = (for { x <- 0L until n; y <- 0L until n } yield (x, y))
      .toDF("qx", "qy")
    val got = hilbertKey(grid, "qx", "qy", bits)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for { x <- 0L until n; y <- 0L until n } {
      assert(got((x, y)) === xy2d(bits, x, y), s"($x,$y)")
    }
  }

  test("hilbertKey at full 16-bit width stays in range and distinct on samples") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
      .distinct
    val got = hilbertKey(pts.toDF("qx", "qy"), "qx", "qy")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    got.foreach { case ((x, y), h) =>
      assert(h >= 0L && h < (1L << 32))
      assert(h === xy2d(16, x, y), s"($x,$y)")
    }
    assert(got.map(_._2).distinct.length === pts.length)
  }

  test("layoutStats3: hilbert prunes at least as well as zorder, both beat linear") {
    val ev = spark.read.parquet(sf() + "/events.parquet")
    val stats = Hilbert.layoutStats3(
      ev.select(graft.Events.microsExpr(ev).as("x"), col("user_id").as("y")))
      .collect()
    def hits(l: String) =
      stats.filter(r => r.getString(0) == l && r.getLong(7) == 1L).length
    def total(l: String) =
      stats.filter(_.getString(0) == l).map(_.getLong(2)).sum
    info(s"files opened: linear ${hits("linear")}, zorder ${hits("zorder")}, " +
      s"hilbert ${hits("hilbert")}")
    assert(hits("hilbert") <= hits("zorder"))
    assert(hits("zorder") < hits("linear"))
    assert(total("hilbert") === total("zorder") && total("zorder") === total("linear"))
  }
}
