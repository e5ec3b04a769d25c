package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet page/row-group metadata profiler (reference: S9,
  * `get_page_chunk_sizes` de/fileutils.py:67-76 + `de page-chunks`
  * de/cli.py:273-307 — which shells out to `parquet-layout`; we read
  * footers + page headers in-process with parquet-hadoop, distributed as a
  * flatMap over the path list).
  */
object PageProfiler {

  final case class PageStat(
      path: String,
      row_group: Int,
      column: String,
      page_index: Int,
      page_type: String,
      uncompressed_bytes: Long,
      num_values: Long)

  final case class RowGroupStat(
      row_group: Long,
      column_name: String,
      num_values: Long,
      total_compressed_size: Long,
      total_uncompressed_size: Long)

  /** Row-group/column-chunk stats from the footer only (no page reads) —
    * cross-checkable against DuckDB's parquet_metadata().
    */
  def rowGroupStats(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    spark
      .createDataset(paths)
      .repartition(math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism)))
      .flatMap { path =>
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        val conf = new org.apache.hadoop.conf.Configuration()
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(path), conf))
        try {
          val blocks = reader.getFooter.getBlocks
          (0 until blocks.size()).iterator.flatMap { rg =>
            val block = blocks.get(rg)
            val cols = block.getColumns
            (0 until cols.size()).map { ci =>
              val c = cols.get(ci)
              RowGroupStat(rg.toLong, c.getPath.toDotString, c.getValueCount,
                c.getTotalSize, c.getTotalUncompressedSize)
            }
          }.toVector.iterator
        } finally reader.close()
      }
      .toDF()
  }

  /** One row per data page across all files. */
  def pageStats(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    spark
      .createDataset(paths)
      .repartition(math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism)))
      .flatMap(readPages)
      .toDF()
  }

  private def readPages(path: String): Iterator[PageStat] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new org.apache.hadoop.conf.Configuration()
    val in = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(path), conf)
    val reader = ParquetFileReader.open(in)
    val out = scala.collection.mutable.ArrayBuffer.empty[PageStat]
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      var rg = 0
      var store = reader.readNextRowGroup()
      while (store != null) {
        schema.getColumns.forEach { cd =>
          val pageReader = store.getPageReader(cd)
          val dict = pageReader.readDictionaryPage()
          val colName = cd.getPath.mkString(".")
          if (dict != null)
            out += PageStat(path, rg, colName, -1, "dictionary",
              dict.getUncompressedSize.toLong, dict.getDictionarySize.toLong)
          var idx = 0
          var page = pageReader.readPage()
          while (page != null) {
            out += PageStat(path, rg, colName, idx, "data",
              page.getUncompressedSize.toLong, page.getValueCount.toLong)
            idx += 1
            page = pageReader.readPage()
          }
        }
        rg += 1
        store = reader.readNextRowGroup()
      }
    } finally reader.close()
    out.iterator
  }

  /** A8: 100-bin histogram of data-page uncompressed sizes (reference
    * plots `nbinsx=100`, de/cli.py:286-296). Fixed-width integer buckets.
    */
  def pageSizeHistogram(stats: DataFrame, binBytes: Long = 4096): DataFrame =
    stats
      .filter(col("page_type") === "data")
      .select((col("uncompressed_bytes") / binBytes).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pages"))
      .withColumn("bucket_lo_bytes", col("bucket") * binBytes)
      .select(col("bucket"), col("bucket_lo_bytes"), col("n_pages"))
}
