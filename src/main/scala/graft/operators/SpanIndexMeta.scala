package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Sidecar metadata for a persisted span [[Dedupe.windowIndex]] — the
  * refresh-contract guard for [[Dedupe.cutSpansIncremental]]. The index
  * parquet alone is just (wlo, whi) pairs: nothing in it records the
  * window size or hash width it was built with, and nothing enforces
  * the append-only id invariant ("every base id < every batch id")
  * that makes the incremental cut exactly keep-earliest. A refresh run
  * against a mismatched index silently yields a wrong-but-plausible
  * cut, so `span-index` writes this one-line JSON beside the parquet
  * and `cut-spans-incremental` refuses loudly unless every field
  * checks out (and the batch's min id clears `maxDocId`).
  *
  * File name starts with `_` so Spark/Hadoop parquet readers ignore it
  * as a non-data file, exactly like `_SUCCESS`.
  */
final case class SpanIndexMeta(
    windowTokens: Int,
    hash128: Boolean,
    maxDocId: Long,
    windows: Long)

object SpanIndexMeta {

  val FileName = "_graft_span_index_meta.json"

  def write(conf: Configuration, dir: String, meta: SpanIndexMeta): Unit = {
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try {
      val json =
        s"""{"windowTokens":${meta.windowTokens},"hash128":${meta.hash128},""" +
          s""""maxDocId":${meta.maxDocId},"windows":${meta.windows}}"""
      out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
  }

  /** None when the sidecar is absent (an index from before the guard —
    * callers decide whether to refuse or warn).
    */
  def read(conf: Configuration, dir: String): Option[SpanIndexMeta] = {
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val json =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(parse(json))
    }
  }

  /** Parses exactly the flat integer/boolean JSON [[write]] emits (we
    * are our own only producer — a full JSON parser would be a new
    * dependency for four fields).
    */
  private[operators] def parse(json: String): SpanIndexMeta = {
    def field(name: String): String = {
      val m = ("\"" + name + "\"\\s*:\\s*([^,}\\s]+)").r
        .findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(
          s"span-index meta missing field '$name': $json"))
      m.group(1)
    }
    SpanIndexMeta(
      windowTokens = field("windowTokens").toInt,
      hash128 = field("hash128").toBoolean,
      maxDocId = field("maxDocId").toLong,
      windows = field("windows").toLong)
  }
}
