package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomProfilerSpec extends SparkSpec {

  private def writeOne(df: org.apache.spark.sql.DataFrame,
      dir: java.nio.file.Path, opts: Map[String, String]): String = {
    val w = df.repartition(1).write.mode("overwrite")
    opts.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
      .parquet(s"$dir/data")
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/data"))
    val parts =
      try s.toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && p.contains("part-"))
      finally s.close()
    require(parts.length == 1)
    parts.head
  }

  test("no bloom in the file -> bloom_maybe is vacuously true everywhere") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomspec")
    graft.Queries.cleanupOnExit(dir)
    val path = writeOne((0L until 100L).map(i => (i * 7L, s"row$i"))
      .toDF("pk", "payload"), dir, Map.empty)
    val (cells, spans) = BloomProfiler.probe(spark, path, "pk",
      Seq(0L, 3L, 693L))
    assert(spans.count() >= 1)
    val rows = cells.collect()
    assert(rows.nonEmpty)
    // missing structure must never fake pruning
    assert(rows.forall(_.getBoolean(2)), "bloom_maybe must be vacuously true")
    // min/max still answers: 3 is in range (maybe), 0 and 693 present
    assert(rows.filter(_.getLong(0) == 3L).forall(_.getBoolean(3)))
  }

  test("bloom present: no false negatives, absent keys pruned; unknown column fails") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomspec2")
    graft.Queries.cleanupOnExit(dir)
    // md5-scattered order + tiny row groups -> several groups
    // ~200 B payloads so 400 rows overflow the 8 KiB block size into
    // several row groups (tiny rows would fit one group)
    val df = (0L until 400L).map(i => (i * 7L, s"payload row $i " * 12))
      .toDF("pk", "payload")
      .sortWithinPartitions(md5(col("pk").cast("string")))
    val path = writeOne(df, dir, Map(
      "parquet.bloom.filter.enabled#pk" -> "true",
      "parquet.bloom.filter.expected.ndv#pk" -> "1000",
      "parquet.block.size" -> (8 * 1024).toString,
      "parquet.page.size" -> (4 * 1024).toString,
      "parquet.block.size.row.check.min" -> "10",
      "parquet.block.size.row.check.max" -> "50"))
    val present = Seq(0L, 7L, 1400L, 2793L)
    val absent = Seq(3L, 10L, 1403L)
    val (cells, spans) = BloomProfiler.probe(spark, path, "pk", present ++ absent)
    val nRg = spans.count()
    assert(nRg >= 2, s"need multiple row groups, got $nRg")
    val byKey = cells.collect().groupBy(_.getLong(0))
    // every present key is admitted by at least one row group's bloom
    present.foreach { k =>
      assert(byKey(k).exists(_.getBoolean(2)), s"false negative for $k")
    }
    // absent keys: bloom admits (almost) nowhere — allow fp slack of 1
    absent.foreach { k =>
      assert(byKey(k).count(_.getBoolean(2)) <= 1, s"bloom failed to prune $k")
    }
    intercept[IllegalArgumentException] {
      BloomProfiler.probe(spark, path, "nope", Seq(1L))
    }
  }
}
