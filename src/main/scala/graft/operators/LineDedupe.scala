package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Conf

/** Line-level exact deduplication across a corpus — the RefinedWeb /
  * FineWeb curation pass that whole-document dedup ([[Dedupe.exactDuplicates]])
  * and token-window span dedup ([[Dedupe.duplicateSpans]]) both miss:
  * boilerplate lines (headers, footers, nav text, license banners) that
  * recur verbatim across otherwise-distinct documents.
  *
  * Granularity ladder, for orientation:
  *   - document: [[Dedupe.exactDuplicates]] (whole-text fingerprint)
  *   - line: THIS — exact `\n`-delimited lines, keep-earliest
  *   - token window: [[Dedupe.duplicateSpans]] (Lee et al. ExactSubstr)
  *
  * Identity is the raw line STRING, not a hash: the groupBy key ships the
  * line bytes, so equality is byte-exact and a cut can never delete an
  * innocent line (the failure mode that pushed the span family to 128-bit
  * identity does not exist here by construction). The exchange is
  * corpus-sized — the same bytes a full-corpus `groupBy(text)` would
  * move — and partial aggregation collapses repeated lines map-side
  * before the shuffle, so a hot boilerplate line contributes one partial
  * row per map task, not one row per occurrence.
  *
  * Lines shorter than `minLineChars` are never deduplicated: short lines
  * ("", "---", "## Intro") are generic, and cutting them would mangle
  * unrelated documents. This mirrors the reference pipelines' min-length
  * guard on line-wise filtering.
  *
  * 100 TB shape: one corpus-sized line exchange (groupBy line, partial
  * agg collapses hot keys map-side), then either a broadcast of the
  * duplicated-line index back over a narrow scan (`nDup <=
  * broadcastDupLimit`, the production path — the corpus never shuffles
  * again) or an input-sized shuffle join on the line string (fallback;
  * a mega-hot boilerplate key lands on one task there, the same skew
  * caveat as the containment gram join). The final rebuild regroups by
  * doc id — input-bounded. Shuffle partitions for the line exchange are
  * sized from the measured corpus line bytes
  * ([[Conf.applyRowShufflePartitions]]).
  */
object LineDedupe {

  /** `(id, ord, line)` — 1-based line ordinal within each document.
    * `split(text, '\n', -1)` keeps trailing empty lines, matching
    * DuckDB `string_split` (the oracle side) exactly.
    */
  private def linesRelation(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
        col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol).cast("string"), "\n", -1)))
      .select(col("id"), (col("pos") + 1).cast("long").as("ord"),
        col("col").as("line"))

  private def eligible(lines: DataFrame, minLineChars: Int): DataFrame =
    lines.filter(length(col("line")) >= minLineChars)

  /** Σ line bytes (shuffle payload estimate) in ONE pass over the narrow
    * line relation: string bytes + per-row UnsafeRow overhead (8 B null
    * bitmap + 2×8 B long slots + 8 B string offset/len word).
    */
  private def lineShuffleBytes(lines: DataFrame): Long =
    lines.agg(coalesce(sum(length(col("line")).cast("long") + 32L), lit(0L)))
      .collect()(0).getLong(0)

  /** Duplicated-line classes: one row per eligible line string occurring
    * more than once in the corpus.
    *
    * @return `(line, n_occ, n_docs, line_chars, first_doc, first_ord)`
    *         where (first_doc, first_ord) is the globally earliest
    *         occurrence (doc id, then position — the occurrence
    *         [[cutDuplicateLines]] keeps).
    */
  def duplicateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLineChars: Int = 10): DataFrame = {
    require(minLineChars >= 1, s"minLineChars must be >= 1, got $minLineChars")
    val session = df.sparkSession
    val lines = linesRelation(df, idCol, textCol)
    val prevParts = Conf.applyRowShufflePartitions(
      session, lineShuffleBytes(lines), rowBytes = 1L)
    try {
      eligible(lines, minLineChars)
        .groupBy(col("line"))
        .agg(
          count(lit(1)).as("n_occ"),
          countDistinct(col("id")).as("n_docs"),
          min(struct(col("id"), col("ord"))).as("f"))
        .filter(col("n_occ") > 1)
        .select(col("line"), col("n_occ"), col("n_docs"),
          length(col("line")).cast("long").as("line_chars"),
          col("f.id").as("first_doc"), col("f.ord").as("first_ord"))
    } finally session.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** Keep-earliest line cut: every eligible line occurring more than once
    * keeps only its globally earliest occurrence (doc id, then position);
    * all later occurrences are removed and each document's text is
    * rebuilt from its surviving lines in original order. Ineligible
    * (short) lines always survive. Documents with nothing to cut pass
    * through unchanged — the output has exactly one row per input row.
    *
    * @return `(doc_id, n_lines, n_dropped, chars_dropped, text_clean)` —
    *         `chars_dropped` counts line bytes only (not the removed
    *         `\n` separators).
    */
  def cutDuplicateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLineChars: Int = 10,
      broadcastDupLimit: Long = 4L * 1000 * 1000): DataFrame = {
    require(minLineChars >= 1, s"minLineChars must be >= 1, got $minLineChars")
    val session = df.sparkSession
    val lines = linesRelation(df, idCol, textCol)
    val prevParts = Conf.applyRowShufflePartitions(
      session, lineShuffleBytes(lines), rowBytes = 1L)
    try {
      val elig = eligible(lines, minLineChars)
      val dupFirsts = elig
        .groupBy(col("line"))
        .agg(count(lit(1)).as("n_occ"),
          min(struct(col("id"), col("ord"))).as("f"))
        .filter(col("n_occ") > 1)
        .select(col("line"), col("f.id").as("f_id"), col("f.ord").as("f_ord"))
      // duplicated-line index back over the corpus: broadcast when small
      // (production path — the corpus lines never shuffle again), else an
      // input-sized shuffle join on the line string (skew caveat above)
      val dupSide =
        if (dupFirsts.count() <= broadcastDupLimit) broadcast(dupFirsts)
        else dupFirsts
      val drops = elig
        .join(dupSide, Seq("line"))
        .filter(!(col("id") === col("f_id") && col("ord") === col("f_ord")))
        .select(col("id"), col("ord"),
          length(col("line")).cast("long").as("line_chars"))
      val dropsPerDoc = drops
        .groupBy(col("id"))
        .agg(sort_array(collect_list(col("ord"))).as("drop_ords"),
          count(lit(1)).as("n_dropped"),
          sum(col("line_chars")).as("chars_dropped"))
      // rebuild from the original line array (narrow — no second explode):
      // null-mark dropped ordinals, filter, rejoin. `drop_ords` per doc is
      // bounded by the doc's own line count, so no collect_list skew.
      val arr = split(col(textCol).cast("string"), "\n", -1)
      df.select(col(idCol).cast("long").as("id"), arr.as("arr"))
        .join(dropsPerDoc, Seq("id"), "left")
        .select(
          col("id").as("doc_id"),
          size(col("arr")).cast("long").as("n_lines"),
          coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
          coalesce(col("chars_dropped"), lit(0L)).as("chars_dropped"),
          when(col("drop_ords").isNull, array_join(col("arr"), "\n"))
            .otherwise(array_join(filter(
              zip_with(
                col("arr"),
                sequence(lit(1L), size(col("arr")).cast("long")),
                (line: Column, ord: Column) =>
                  when(array_contains(col("drop_ords"), ord), lit(null))
                    .otherwise(line)),
              (x: Column) => x.isNotNull), "\n"))
            .as("text_clean"))
    } finally session.conf.set("spark.sql.shuffle.partitions", prevParts)
  }
}
