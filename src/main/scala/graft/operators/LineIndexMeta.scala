package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Sidecar metadata for a persisted [[LineDedupe.lineIndex]] — the
  * refresh-contract guard for [[LineDedupe.cutLinesIncremental]], the
  * exact analogue of [[SpanIndexMeta]] for the line family. The index
  * parquet alone is just (llo, lhi) pairs: nothing records the
  * min-line-length it was built with, and nothing enforces the
  * append-only id invariant ("every base id < every batch id") that
  * makes the incremental cut exactly keep-earliest. `Cli line-index`
  * writes this one-line JSON beside the parquet and
  * `Cli cut-lines-incremental` refuses loudly unless every field checks
  * out (and the batch's min id clears `maxDocId`).
  *
  * File name starts with `_` so parquet readers skip it as a non-data
  * file, exactly like `_SUCCESS`.
  */
final case class LineIndexMeta(
    minLineChars: Int,
    maxDocId: Long,
    lines: Long)

object LineIndexMeta {

  val FileName = "_graft_line_index_meta.json"

  def write(conf: Configuration, dir: String, meta: LineIndexMeta): Unit = {
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try {
      val json =
        s"""{"minLineChars":${meta.minLineChars},""" +
          s""""maxDocId":${meta.maxDocId},"lines":${meta.lines}}"""
      out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
  }

  /** None when the sidecar is absent (callers decide refuse vs warn). */
  def read(conf: Configuration, dir: String): Option[LineIndexMeta] = {
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

  /** Parses exactly the flat JSON [[write]] emits (we are our own only
    * producer).
    */
  private[operators] def parse(json: String): LineIndexMeta = {
    def field(name: String): String =
      ("\"" + name + "\"\\s*:\\s*([^,}\\s]+)").r
        .findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(
          s"line-index meta missing field '$name': $json"))
        .group(1)
    LineIndexMeta(
      minLineChars = field("minLineChars").toInt,
      maxDocId = field("maxDocId").toLong,
      lines = field("lines").toLong)
  }
}
