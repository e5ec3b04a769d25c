package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in bounded batches.
  *
  * The decode step is a clearly-marked deterministic STUB (this container
  * has no image/audio codecs); everything around it — schema, partitioning,
  * batch shape, feature vectors — is real and tested. Swapping the stub for
  * a codec call is a one-function change.
  *
  * At scale: rows carry blobs, so partitions are sized by
  * `spark.sql.files.maxPartitionBytes` on read and the transforms are
  * narrow (no shuffle); feature extraction emits small fixed-width vectors
  * so downstream joins/aggs shuffle features, never blobs.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int, durationMs: Long)

  /** STUB decode: deterministic pseudo-metadata derived from the blob hash.
    * Replace with a real codec (e.g. javax.imageio for images) when
    * available; signature and callers stay unchanged.
    */
  def decodeMetaStub(content: Array[Byte]): MediaMeta = {
    val h = graft.cdc.XXH64.hash(if (content == null) Array.emptyByteArray else content, 42L)
    MediaMeta(
      width = (math.floorMod(h, 1920L) + 1L).toInt,
      height = (math.floorMod(h >>> 16, 1080L) + 1L).toInt,
      channels = (math.floorMod(h >>> 32, 3L) + 1L).toInt,
      durationMs = math.floorMod(h >>> 40, 600000L))
  }

  /** REAL feature extraction: 64-bin byte histogram normalized to unit L1 —
    * an honest content feature usable by the Similarity operators.
    */
  def byteHistogram(content: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](64)
    if (content == null || content.isEmpty) return bins
    var i = 0
    while (i < content.length) { bins((content(i) & 0xff) >> 2) += 1f; i += 1 }
    val n = content.length.toFloat
    var j = 0
    while (j < 64) { bins(j) /= n; j += 1 }
    bins
  }

  /** Resize STUB: deterministic fixed-size "thumbnail" — samples
    * `targetBytes` evenly-spaced bytes from the blob. Real resize plugs a
    * codec into the same (blob in → smaller blob out) narrow transform;
    * schema, batching, and downstream compatibility are what's exercised.
    */
  def resizeStub(content: Array[Byte], targetBytes: Int = 1024): Array[Byte] = {
    if (content == null || content.isEmpty) Array.emptyByteArray
    else if (content.length <= targetBytes) content
    else {
      val out = new Array[Byte](targetBytes)
      var i = 0
      while (i < targetBytes) {
        out(i) = content((i.toLong * content.length / targetBytes).toInt)
        i += 1
      }
      out
    }
  }

  /** Per-row resize over a blob DataFrame: (id, content) → (id, thumb);
    * the output id column keeps the caller's `idCol` name.
    */
  def resize(df: DataFrame, idCol: String, contentCol: String, targetBytes: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .map { case (id, c) => (id, resizeStub(c, targetBytes)) }
      .toDF(idCol, "thumb")
  }

  /** Frame sampling STUB: every `strideBytes` block stands in for a decoded
    * frame; emits (blob_id, frame_idx, frame_bytes) — the generator shape a
    * real video pipeline needs (one row in → N frame rows out).
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      strideBytes: Int = 4096,
      maxFrames: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, content) =>
        val bytes = if (content == null) Array.emptyByteArray else content
        val n = math.min(maxFrames, math.max(1, bytes.length / strideBytes))
        (0 until n).iterator.map { f =>
          val start = f * strideBytes
          val end = math.min(bytes.length, start + strideBytes)
          (id, f.toLong, java.util.Arrays.copyOfRange(bytes, start, math.max(start, end)))
        }
      }
      .toDF("blob_id", "frame_idx", "frame_bytes")
  }

  /** Full enrichment pass: metadata (stub) + features (real) per blob, as
    * one narrow mapPartitions-shaped transform.
    */
  def enrich(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, content) =>
          val meta = decodeMetaStub(content)
          val size = if (content == null) 0L else content.length.toLong
          (id, size, meta.width, meta.height, meta.channels, meta.durationMs,
            byteHistogram(content))
        }
      }
      .toDF("blob_id", "n_bytes", "width", "height", "channels", "duration_ms", "features")
  }

  /** Build a binary-blob DataFrame from any table's row bytes (JSON-encoded
    * rows as payload) — turns the documents table into a multimodal-shaped
    * corpus for tests and the catalog query.
    *
    * Contract: `content` is NEVER null (coalesced to the empty blob).
    * Downstream operators emit one empty frame / zero-byte features for an
    * empty blob, while a NULL would diverge between engines (e.g. DuckDB's
    * octet_length(NULL) is NULL, silently dropping the blob from a
    * generate-series oracle instead of producing the empty-frame row).
    */
  def blobsFromTable(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("blob_id"),
      coalesce(encode(to_json(struct(df.columns.map(col).toSeq: _*)), "UTF-8"),
        lit(Array.emptyByteArray)).as("content"))
}
