package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.cdc.{ChunkIterator, ChunkerParams, Lz4Len, XXH64}

/** One row per chunk occurrence — the engine's core relation (SURVEY §1.1):
  * `(file_idx, chunk_idx, hash, size, compressed)`, optionally `data`.
  * `seen_in` / `first_seen_in` are derived by aggregation (Estimator), not
  * stored — the reference's per-file HashMap accumulate (src/store.rs:43-63)
  * collapses into this occurrence stream plus a groupBy.
  */
final case class ChunkRow(
    file_idx: Long,
    chunk_idx: Long,
    hash: Long,
    size: Long,
    compressed: Long)

final case class ChunkRowWithData(
    file_idx: Long,
    chunk_idx: Long,
    hash: Long,
    size: Long,
    compressed: Long,
    data: Array[Byte])

/** 128-bit chunk identity (two independent-seed xxh64 values) for the
  * 1e9+-chunk regime where 64-bit birthday collisions become material
  * (~0.4% at 100 TB / 64 KiB chunks — SURVEY §7.4-5). Dedup keys on
  * (hash, hash2); collision odds drop to ~2^-128 scale.
  */
final case class ChunkRow128(
    file_idx: Long,
    chunk_idx: Long,
    hash: Long,
    hash2: Long,
    size: Long,
    compressed: Long)

object ChunkRelation {

  /** Chunk a list of files into the occurrence relation.
    *
    * Scale design: one task per file (reference parallelism, rayon par_iter
    * at src/store.rs:103-112, is Spark's native file-parallelism here); each
    * task streams its file through `ChunkIterator` with bounded memory
    * (1 MiB buffer + maxLen carry), so >2 GB files are fine — no
    * `binaryFile` whole-file materialization. Hash + lz4-length are computed
    * inside the flatMap, so raw chunk bytes never enter Tungsten rows unless
    * `withData = true` (column retained only on request — the reference's
    * `store_data` flag, src/store.rs:30, becomes plain column pruning).
    *
    * Hadoop FileSystem API is used for the open, so the same code reads
    * local paths in tests and HDFS/S3 paths on a cluster.
    */
  def chunkFiles(
      spark: SparkSession,
      paths: Seq[String],
      params: ChunkerParams = ChunkerParams.Default): Dataset[ChunkRow] =
    chunkIndexedFiles(spark, paths.zipWithIndex.map { case (p, i) => (i.toLong, p) }, params)

  /** Shared per-file chunk-row production (single definition keeps the
    * plain and auto paths byte-identical by construction).
    */
  private def chunkIndexedFiles(
      spark: SparkSession,
      indexed: Seq[(Long, String)],
      params: ChunkerParams): Dataset[ChunkRow] = {
    import spark.implicits._
    val parallelism = math.max(1, math.min(indexed.size, spark.sparkContext.defaultParallelism))
    spark
      .createDataset(indexed)
      .repartition(parallelism)
      .flatMap { case (fileIdx, path) =>
        openAndChunk(path, params).zipWithIndex.map { case (bytes, ci) =>
          ChunkRow(fileIdx, ci.toLong, XXH64.hash(bytes, XXH64.DefaultSeed),
            bytes.length.toLong, Lz4Len(bytes).toLong)
        }
      }
  }

  /** Scale-aware chunking: files at or above `largeFileThreshold` go
    * through the split-parallel DistributedChunker (intra-file
    * parallelism), the rest through the one-task-per-file streaming path.
    * Output is identical either way (DistributedChunkerSpec proves
    * byte-identity), so this is purely a scheduling decision.
    */
  def chunkFilesAuto(
      spark: SparkSession,
      paths: Seq[String],
      params: ChunkerParams = ChunkerParams.Default,
      largeFileThreshold: Long = 1L << 30): Dataset[ChunkRow] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val sized = paths.zipWithIndex.map { case (p, i) =>
      val hp = new org.apache.hadoop.fs.Path(p)
      (p, i.toLong, hp.getFileSystem(conf).getFileStatus(hp).getLen)
    }
    val (large, small) = sized.partition(_._3 >= largeFileThreshold)
    val smallDs =
      if (small.isEmpty) None
      else Some(chunkIndexedFiles(spark, small.map { case (p, i, _) => (i, p) }, params))
    val largeDs = large.map { case (p, i, _) =>
      DistributedChunker.chunkLargeFile(spark, p, fileIdx = i, params)
    }
    (smallDs.toSeq ++ largeDs).reduceOption(_ unionAll _)
      .getOrElse(spark.emptyDataset(implicitly[org.apache.spark.sql.Encoder[ChunkRow]](
        org.apache.spark.sql.Encoders.product[ChunkRow])))
  }

  /** 128-bit-identity variant of `chunkFiles` — the 100 TB configuration. */
  def chunkFiles128(
      spark: SparkSession,
      paths: Seq[String],
      params: ChunkerParams = ChunkerParams.Default): Dataset[ChunkRow128] = {
    import spark.implicits._
    val indexed = paths.zipWithIndex.map { case (p, i) => (i.toLong, p) }
    val parallelism = math.max(1, math.min(indexed.size, spark.sparkContext.defaultParallelism))
    spark
      .createDataset(indexed)
      .repartition(parallelism)
      .flatMap { case (fileIdx, path) =>
        openAndChunk(path, params).zipWithIndex.map { case (bytes, ci) =>
          ChunkRow128(fileIdx, ci.toLong,
            XXH64.hash(bytes, XXH64.DefaultSeed),
            XXH64.hash(bytes, 0x5ECD5EED5ECD5EEDL), // independent second seed
            bytes.length.toLong, Lz4Len(bytes).toLong)
        }
      }
  }

  /** As `chunkFiles` but retaining chunk payloads (reference `store_data`). */
  def chunkFilesWithData(
      spark: SparkSession,
      paths: Seq[String],
      params: ChunkerParams = ChunkerParams.Default): Dataset[ChunkRowWithData] = {
    import spark.implicits._
    val indexed = paths.zipWithIndex.map { case (p, i) => (i.toLong, p) }
    val parallelism = math.max(1, math.min(indexed.size, spark.sparkContext.defaultParallelism))
    spark
      .createDataset(indexed)
      .repartition(parallelism)
      .flatMap { case (fileIdx, path) =>
        openAndChunk(path, params).zipWithIndex.map { case (bytes, ci) =>
          ChunkRowWithData(fileIdx, ci.toLong, XXH64.hash(bytes, XXH64.DefaultSeed),
            bytes.length.toLong, Lz4Len(bytes).toLong, bytes)
        }
      }
  }

  /** Chunk an arbitrary binary column (one row in → N chunk rows out): the
    * generator-shaped surface (SURVEY §2.2) for payloads already inside a
    * DataFrame, e.g. document text bytes or multimodal blobs.
    * Input must have columns (id LONG, content BINARY).
    */
  def chunkColumn(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      params: ChunkerParams = ChunkerParams.Default): Dataset[ChunkRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(idCol, contentCol)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, content) =>
        val bytes = if (content == null) Array.emptyByteArray else content
        graft.cdc.Chunker.chunkStats(bytes, params).zipWithIndex.map {
          case ((hash, size, compressed), ci) =>
            ChunkRow(id, ci.toLong, hash, size.toLong, compressed.toLong)
        }
      }
  }

  private def openAndChunk(path: String, params: ChunkerParams): Iterator[Array[Byte]] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
    new ChunkIterator(fs.open(hPath), params, params.readBufSize)
  }
}
