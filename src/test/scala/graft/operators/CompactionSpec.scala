package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import Compaction._

  test("packGreedy: first-fit-in-order invariants") {
    val files = Seq(("c", 300L), ("a", 400L), ("b", 500L), ("d", 900L), ("e", 100L))
    val p = packGreedy(files, 1000L)
    // ordered by name, bins consecutive from 0
    assert(p.map(_.file_name) === Seq("a", "b", "c", "d", "e"))
    // a+b=900 fills bin 0; c opens bin 1; c+d=1200 overflows so d opens
    // bin 2; e fits with d (900+100 = target exactly)
    assert(p.map(_.bin) === Seq(0L, 0L, 1L, 2L, 2L))
    // no bin over target unless it holds a single oversized file
    p.groupBy(_.bin).foreach { case (_, fs) =>
      assert(fs.map(_.n_bytes).sum <= 1000L || fs.length == 1)
    }
  }

  test("packGreedy: oversized file gets its own bin, packing continues after") {
    val p = packGreedy(Seq(("a", 100L), ("big", 5000L), ("z", 100L)), 1000L)
    assert(p.find(_.file_name == "big").get.bin === 1L)
    assert(p.find(_.file_name == "z").get.bin === 2L)
  }

  test("packGreedy: empty input and single file") {
    assert(packGreedy(Nil, 100L) === Nil)
    assert(packGreedy(Seq(("only", 999999L)), 100L) ===
      Seq(PlannedFile("only", 999999L, 0L)))
  }

  test("plan over the sf dir lists every visible table file exactly once") {
    val p = plan(spark, sf(), 1L << 20).collect()
    val names = p.map(_.getString(0)).sorted
    assert(names.distinct.length === names.length)
    assert(names.contains("lineitem.parquet") && names.contains("events.parquet"))
    // bins numbered 0..max with no gaps
    val bins = p.map(_.getLong(2)).distinct.sorted
    assert(bins === (0L to bins.max).toArray)
  }

  test("compact executes the plan: one file per bin, zero row loss") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact-in")
    val out = java.nio.file.Files.createTempDirectory("compact-out")
    // 6 small same-schema files with distinct row ranges
    (0 until 6).foreach { i =>
      writeFlatParquet(
        spark.range(i * 100, (i + 1) * 100).toDF("id"),
        dir, f"f$i%02d.parquet")
    }
    val sizes = plan(spark, dir.toString, Long.MaxValue).collect()
      .map(_.getLong(1))
    val target = sizes.sum / 3 // ~3 output files
    val stats = compact(spark, dir.toString, target, out.toString).collect()
    assert(stats.map(_.getLong(2)).sum === 600L)
    assert(stats.length > 1 && stats.length < 6,
      s"expected real consolidation, got ${stats.length} bins")
    // each bin directory holds exactly one parquet part and the union of
    // all compacted rows is the original id range
    val back = spark.read.parquet(s"$out/bin=*")
    assert(back.count() === 600L)
    assert(back.agg(min($"id"), max($"id")).head ===
      org.apache.spark.sql.Row(0L, 599L))
    stats.foreach { r =>
      val binDir = new java.io.File(s"$out/bin=${r.getLong(0)}")
      val parts = binDir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1)
    }
  }
}
