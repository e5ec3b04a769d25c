package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composed flow a 100 TB corpus
  * actually runs — quality gating, language filtering, exact dedup, then
  * near-dedup — with per-stage accounting so data loss is auditable.
  *
  * Shape: stages 1-3 are narrow or single-shuffle; the near-dedup stage is
  * MinHash-LSH (banded buckets, capped). Every document carries its
  * elimination reason, so the report is one groupBy over the final frame —
  * no per-stage recounting jobs.
  */
object CuratePipeline {

  final case class CurateParams(
      minTokens: Int = 10,
      maxStopwordRatio: Double = 1.0,
      minStopwordRatio: Double = 0.0,
      keepLangs: Set[String] = Set.empty, // empty = keep all
      nearDupThreshold: Double = 0.8)

  /** Annotate every doc with its fate: kept | quality | lang | exact_dup |
    * near_dup. Returns the full annotated frame (filter on
    * `fate = 'kept'` for the surviving corpus).
    */
  /** @param precomputedPairs optional near-dup pairs frame
    * (id_a, id_b, ..., jaccard) computed over the FULL corpus (e.g. the
    * catalog's shared `dedup_ngram` pass) — re-used instead of re-signing
    * the corpus. Pairs are filtered to `jaccard >= nearDupThreshold` and to
    * ids still alive after the earlier stages. With exact pair generation
    * (ngram join) this equals running it on the alive subset (Jaccard is
    * per-pair, corpus-independent; full-corpus candidates are a superset).
    * CAVEAT with capped-LSH pairs (minhash/simhash star buckets): over-cap
    * buckets emit only star pairs around the bucket's min id, so if that
    * center doc dies in an earlier stage, its star partners lose their
    * only candidate edge — the precomputed path can then have LOWER recall
    * than re-running LSH on the alive subset. Prefer exact pairs here, or
    * accept the (bounded, hot-bucket-only) recall loss.
    */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      params: CurateParams = CurateParams(),
      precomputedPairs: Option[DataFrame] = None): DataFrame = {
    val quality = TextAnalysis.qualityScore(docs, textCol)
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))

    // null text must fail the quality gate, not slip through on three-valued
    // logic (NULL predicates skip every `when` branch)
    val qualityFail =
      col(textCol).isNull ||
        col("n_tokens") < params.minTokens ||
        col("stopword_ratio") > params.maxStopwordRatio ||
        col("stopword_ratio") < params.minStopwordRatio
    val langFail =
      if (params.keepLangs.isEmpty) lit(false)
      else !col("lang_pred").isin(params.keepLangs.toSeq: _*)

    val exact = Dedupe.exactDuplicates(quality, idCol, col(textCol))

    // near-dups only among docs still alive after earlier stages
    val alive = exact.filter(!qualityFail && !langFail && !col("is_dup"))
    val pairs = precomputedPairs match {
      case Some(p) =>
        // pairs carry LONG ids; an id value that does not cast to long
        // would become null, match nothing in the semi-joins, and silently
        // disable near-dup removal — fail loudly instead. Integral columns
        // are safe by construction; other types (numeric strings, decimals)
        // get a one-off cast-null check.
        {
          import org.apache.spark.sql.types._
          val integral = docs.schema(idCol).dataType match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          }
          if (!integral) {
            val bad = docs
              .filter(col(idCol).isNotNull && col(idCol).cast("long").isNull)
              .limit(1).count()
            require(bad == 0,
              s"precomputedPairs needs ids castable to long; column '$idCol' " +
                s"(${docs.schema(idCol).dataType.catalogString}) has values " +
                "that cast to null")
          }
        }
        val aliveIds = alive.select(col(idCol).cast("long").as("__alive_id"))
        p.filter(col("jaccard") >= params.nearDupThreshold)
          .join(aliveIds.withColumnRenamed("__alive_id", "id_a"), Seq("id_a"), "left_semi")
          .join(aliveIds.withColumnRenamed("__alive_id", "id_b"), Seq("id_b"), "left_semi")
      case None =>
        Dedupe.minhashPairs(alive, idCol, textCol, threshold = params.nearDupThreshold)
    }
    val nearDupIds = pairs
      .select(col("id_b").as("__near_dup_id"))
      .distinct()

    exact
      .join(nearDupIds, exact(idCol) === col("__near_dup_id"), "left")
      .withColumn("fate",
        when(qualityFail, "quality")
          .when(langFail, "lang")
          .when(col("is_dup"), "exact_dup")
          .when(col("__near_dup_id").isNotNull, "near_dup")
          .otherwise("kept"))
      .drop("__near_dup_id")
  }

  /** Per-(source, fate) accounting: docs and token mass in/out. */
  def report(annotated: DataFrame, sourceCol: String = "source"): DataFrame =
    annotated
      .groupBy(col(sourceCol), col("fate"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
}
