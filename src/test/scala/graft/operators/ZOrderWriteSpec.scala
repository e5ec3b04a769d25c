package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end physical proof that [[ZOrder.layoutStats]]'s simulated
  * pruning win transfers to REAL parquet footers: write the same rows
  * under both layouts (repartitionByRange on the layout key, one
  * row-group per file), then apply min/max pruning exactly the way a
  * parquet reader does — from the footer column statistics — and count
  * the files a 2-D probe box must open.
  */
class ZOrderWriteSpec extends SparkSpec {
  import ZOrder._

  private case class FileBox(minX: Long, maxX: Long, minY: Long, maxY: Long,
      rows: Long)

  /** Footer column statistics (x, y) per part-file. */
  private def footerBoxes(dir: String): Seq[FileBox] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new org.apache.hadoop.conf.Configuration()
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.getName.startsWith("part-"))
    parts.toSeq.map { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getPath), conf))
      try {
        val blocks = reader.getFooter.getBlocks
        var (minX, maxX) = (Long.MaxValue, Long.MinValue)
        var (minY, maxY) = (Long.MaxValue, Long.MinValue)
        var rows = 0L
        (0 until blocks.size()).foreach { b =>
          val block = blocks.get(b)
          rows += block.getRowCount
          val cols = block.getColumns
          (0 until cols.size()).foreach { ci =>
            val c = cols.get(ci)
            val stat = c.getStatistics
            val lo = stat.genericGetMin.asInstanceOf[java.lang.Long].longValue()
            val hi = stat.genericGetMax.asInstanceOf[java.lang.Long].longValue()
            c.getPath.toDotString match {
              case "x" => minX = math.min(minX, lo); maxX = math.max(maxX, hi)
              case "y" => minY = math.min(minY, lo); maxY = math.max(maxY, hi)
              case _ => ()
            }
          }
        }
        FileBox(minX, maxX, minY, maxY, rows)
      } finally reader.close()
    }
  }

  private def hits(boxes: Seq[FileBox]): Seq[FileBox] =
    boxes.filterNot(b =>
      b.maxX < ProbeX0 || b.minX > ProbeX1 || b.maxY < ProbeY0 || b.minY > ProbeY1)

  test("z-ordered parquet files survive footer min/max pruning better than linear") {
    val n = 100000
    // uniform independent 16-bit dims (hash-derived, deterministic)
    val base = spark.range(n.toLong).select(
      pmod(hash(col("id"), lit(1)), lit(1 << Bits)).cast("long").as("x"),
      pmod(hash(col("id"), lit(2)), lit(1 << Bits)).cast("long").as("y"))
      .withColumn("zkey", expr(interleaveSql("x", "y")))
      .withColumn("linkey", shiftleft(col("x"), Bits) + col("y"))

    val dirZ = java.nio.file.Files.createTempDirectory("zw-z").toString
    val dirL = java.nio.file.Files.createTempDirectory("zw-l").toString
    base.repartitionByRange(32, col("zkey")).sortWithinPartitions("zkey")
      .select("x", "y").write.mode("overwrite").parquet(dirZ)
    base.repartitionByRange(32, col("linkey")).sortWithinPartitions("linkey")
      .select("x", "y").write.mode("overwrite").parquet(dirL)

    val (bz, bl) = (footerBoxes(dirZ), footerBoxes(dirL))
    assert(bz.map(_.rows).sum === n.toLong && bl.map(_.rows).sum === n.toLong)

    // the packaged rewrite operator must land the same z layout while
    // preserving every row and non-key column
    val dirR = java.nio.file.Files.createTempDirectory("zw-r").toString
    ZOrder.rewrite(base.withColumn("payload", col("x") + col("y")),
      "x", "y", dirR, 32)
    val back = spark.read.parquet(dirR)
    assert(back.count() === n.toLong)
    assert(back.columns.sorted.toSeq ===
      Seq("linkey", "payload", "x", "y", "zkey"))
    val br = footerBoxes(dirR)
    assert(hits(br).size <= br.size / 4,
      s"rewrite() files must prune like the hand-built layout: ${hits(br).size}/${br.size}")

    // the hilbert variant must prune at least as well on real footers
    val dirH = java.nio.file.Files.createTempDirectory("zw-h").toString
    ZOrder.rewrite(base, "x", "y", dirH, 32, curve = "hilbert")
    val bh = footerBoxes(dirH)
    assert(spark.read.parquet(dirH).count() === n.toLong)
    assert(hits(bh).size <= hits(br).size,
      s"hilbert ${hits(bh).size} vs zorder ${hits(br).size}")
    info(s"rewrite footer pruning: zorder ${hits(br).size}/32, hilbert ${hits(bh).size}/32")

    val (hz, hl) = (hits(bz), hits(bl))
    info(s"files opened: zorder ${hz.size}/${bz.size}, linear ${hl.size}/${bl.size}")
    info(s"rows scanned: zorder ${hz.map(_.rows).sum}, linear ${hl.map(_.rows).sum}")
    assert(hz.size < hl.size,
      s"real-footer pruning: zorder ${hz.size} vs linear ${hl.size}")
    assert(hz.map(_.rows).sum < hl.map(_.rows).sum)
    // the probe box is ~1/16 of the key space: z-order should confine it
    // to a small fraction of files, linear cannot do better than its
    // x-slab coverage (~1/4 of files on uniform data)
    assert(hz.size <= bz.size / 4)
  }
}
