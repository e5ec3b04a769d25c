package graft.operators

import org.apache.hadoop.conf.Configuration

/** Sidecar metadata for a persisted span [[Dedupe.windowIndex]] — the
  * refresh-contract guard for [[Dedupe.cutSpansIncremental]]. The index
  * parquet alone is just (wlo, whi) pairs: nothing in it records the
  * window size or hash width it was built with, and nothing enforces
  * the append-only id invariant ("every base id < every batch id")
  * that makes the incremental cut exactly keep-earliest. A refresh run
  * against a mismatched index silently yields a wrong-but-plausible
  * cut, so `span-index` writes this one-line JSON beside the parquet
  * and `cut-spans-incremental` refuses loudly unless every field
  * checks out (and the batch's min id clears `maxDocId`). I/O and
  * field extraction are the shared [[IndexMetaIO]] core.
  */
final case class SpanIndexMeta(
    windowTokens: Int,
    hash128: Boolean,
    maxDocId: Long,
    windows: Long)

object SpanIndexMeta {

  val FileName = "_graft_span_index_meta.json"

  def write(conf: Configuration, dir: String, meta: SpanIndexMeta): Unit =
    IndexMetaIO.write(conf, dir, FileName,
      s"""{"windowTokens":${meta.windowTokens},"hash128":${meta.hash128},""" +
        s""""maxDocId":${meta.maxDocId},"windows":${meta.windows}}""")

  /** None when the sidecar is absent (an index from before the guard —
    * callers decide whether to refuse or warn).
    */
  def read(conf: Configuration, dir: String): Option[SpanIndexMeta] =
    IndexMetaIO.read(conf, dir, FileName).map(parse)

  private[operators] def parse(json: String): SpanIndexMeta = {
    def field(name: String) = IndexMetaIO.field("span-index", json, name)
    SpanIndexMeta(
      windowTokens = field("windowTokens").toInt,
      hash128 = field("hash128").toBoolean,
      maxDocId = field("maxDocId").toLong,
      windows = field("windows").toLong)
  }
}
