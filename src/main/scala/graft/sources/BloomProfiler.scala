package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet BLOOM FILTER point-lookup profiler — the read side of the
  * split-block bloom filters parquet-java writes under
  * `parquet.bloom.filter.enabled#<col>` (PARQUET-41). Blooms are the
  * pruning structure min/max statistics cannot replace: on data that is
  * NOT clustered by the probe column, every row group's [min, max]
  * straddles every key (zero pruning), while the bloom answers
  * "definitely not here" per row group with no false negatives — the
  * point-lookup dual of the z-order/minmax range story.
  *
  * The footer walk is driver-side over ONE file's metadata (bounded by
  * |row groups| — file metadata, not data; the distributed analogue is a
  * flatMap over the path list exactly like [[PageProfiler]]).
  */
object BloomProfiler {

  /** Per (probe key, row group): does the bloom admit the key, and does
    * the min/max range admit it. `bloom_maybe` is vacuously true when
    * the column chunk carries no bloom (missing structure must never
    * fake pruning).
    */
  final case class Cell(key: Long, rg: Int, bloom_maybe: Boolean, mm_maybe: Boolean)

  /** Row-group row spans: global row index [first_row, first_row + num_rows). */
  final case class RgSpan(rg: Int, first_row: Long, num_rows: Long)

  /** Probe every (key, row group) pair of `path`'s INT64 column `column`.
    * Returns (cells, spans) as small local DataFrames.
    */
  def probe(
      spark: SparkSession,
      path: String,
      column: String,
      keys: Seq[Long]): (DataFrame, DataFrame) = {
    import spark.implicits._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new org.apache.hadoop.conf.Configuration()
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(path), conf))
    try {
      val blocks = reader.getFooter.getBlocks
      val cells = Vector.newBuilder[Cell]
      val spans = Vector.newBuilder[RgSpan]
      var firstRow = 0L
      for (rg <- 0 until blocks.size()) {
        val block = blocks.get(rg)
        spans += RgSpan(rg, firstRow, block.getRowCount)
        firstRow += block.getRowCount
        val colMeta = {
          val cols = block.getColumns
          (0 until cols.size()).map(cols.get)
            .find(_.getPath.toDotString == column)
            .getOrElse(throw new IllegalArgumentException(
              s"$path row group $rg has no column '$column'"))
        }
        val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(colMeta)
        val stats = colMeta.getStatistics
        val mmBounds: Option[(Long, Long)] = stats match {
          case s: org.apache.parquet.column.statistics.LongStatistics
              if !s.isEmpty && s.hasNonNullValue =>
            Some((s.getMin, s.getMax))
          case _ => None
        }
        keys.foreach { k =>
          val bloomMaybe = bloom == null || bloom.findHash(bloom.hash(k))
          val mmMaybe = mmBounds.forall { case (lo, hi) => k >= lo && k <= hi }
          cells += Cell(k, rg, bloomMaybe, mmMaybe)
        }
      }
      (spark.createDataset(cells.result()).toDF(),
        spark.createDataset(spans.result()).toDF())
    } finally reader.close()
  }
}
