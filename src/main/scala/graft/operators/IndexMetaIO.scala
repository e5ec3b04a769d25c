package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Shared read/write/parse core of the persisted-index sidecar guards
  * ([[SpanIndexMeta]], [[LineIndexMeta]] — and any future index family):
  * one-line flat JSON written beside an index parquet, `_`-prefixed so
  * parquet readers skip it as a non-data file, exactly like `_SUCCESS`.
  * The sidecars exist because an index parquet alone records none of the
  * parameters it was built with, and a refresh against a mismatched
  * index is silently wrong — each family's object holds only its typed
  * fields and delegates the I/O and the loud-refusal field extraction
  * here.
  */
private[operators] object IndexMetaIO {

  def write(conf: Configuration, dir: String, fileName: String,
      json: String): Unit = {
    val p = new Path(dir, fileName)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** None when the sidecar is absent (an index from before the guard —
    * callers decide whether to refuse or warn).
    */
  def read(conf: Configuration, dir: String, fileName: String): Option[String] = {
    val p = new Path(dir, fileName)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** Extract one scalar field from the flat integer/boolean JSON the
    * sidecars emit (we are our own only producer — a full JSON parser
    * would be a new dependency for a handful of fields). `kind` names
    * the family in the refusal message.
    */
  def field(kind: String, json: String, name: String): String =
    ("\"" + name + "\"\\s*:\\s*([^,}\\s]+)").r
      .findFirstMatchIn(json)
      .getOrElse(throw new IllegalArgumentException(
        s"$kind meta missing field '$name': $json"))
      .group(1)
}
