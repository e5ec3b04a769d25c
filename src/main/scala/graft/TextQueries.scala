package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedupe, TextAnalysis}

/** Text-pipeline query catalog: dedup + text-analysis operators over the
  * `documents` table. Oracle SQL provided wherever DuckDB can express the
  * same semantics (md5, pure column arithmetic, windows); signature-based
  * ops (minhash/simhash/fingerprint/langid) are rows-only.
  */
object TextQueries {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  private def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Dedupe
      .exactDuplicates(docs(spark, sfDir), "doc_id", col("text"))
      .select(col("doc_id"), col("fp"), col("canonical_id"), col("is_dup"))

  /** Near-exact: duplicate classes on a 40-char prefix — exercises the
    * same shape with actual collisions in synthetic data.
    */
  private def dedupPrefix(spark: SparkSession, sfDir: String): DataFrame =
    Dedupe
      .exactDuplicates(docs(spark, sfDir), "doc_id", substring(col("text"), 1, 40))
      .select(col("doc_id"), col("fp"), col("canonical_id"), col("is_dup"))

  private def textTokens(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_m"),
        TextAnalysis.tokenCountCol(col("text")).cast("long").as("n_tokens"))

  private def textTokensBpe(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_tokens_bpe"))

  private def textQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val text = col("text")
    val nChars = length(text)
    val nTokens = TextAnalysis.tokenCountCol(text)
    docs(spark, sfDir)
      .select(
        col("doc_id"),
        ((nChars - (nTokens - lit(1))).cast("double") / nTokens.cast("double"))
          .as("avg_token_len"),
        ((length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("double") /
          greatest(nChars, lit(1)).cast("double")).as("punct_ratio"))
  }

  private def textStats(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(TextAnalysis.tokenCountCol(col("text")).cast("long")).as("sum_tokens"))

  private def langId(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), col("lang"), TextAnalysis.langId(col("text")).as("lang_pred"))

  private def docFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_fingerprints"),
        element_at(col("fp"), 1).as("min_fingerprint"))

  private def qualityFull(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis
      .qualityScore(docs(spark, sfDir))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("avg_token_len"), col("punct_ratio"), col("stopword_ratio"))

  private def minhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedupe.minhashPairs(docs(spark, sfDir), "doc_id", "text", threshold = 0.3)

  private def simhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedupe.simhashPairs(docs(spark, sfDir), "doc_id", "text", maxDistance = 3)

  private def ngramPairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedupe.ngramJaccardPairs(docs(spark, sfDir), "doc_id", "text", k = 3,
      threshold = 0.3)

  /** CDC over in-table payloads via the custom Catalyst Generator
    * expression: chunk each document's UTF-8 bytes (small chunk params for
    * doc-sized payloads), dedup chunks per source.
    */
  private def docCdc(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.plans.CdcChunks
    val chunked = Queries.oracleSide(spark, sfDir, "doc_chunks",
      docs(spark, sfDir)
        .select(col("doc_id"), col("source"),
          CdcChunks.cdc_chunks(encode(col("text"), "UTF-8"), minLen = 16,
            maxLen = 256, maskBits = 5))
        .select(col("source"), col("hash"), col("size")))
    chunked
      .groupBy(col("source"), col("hash"))
      .agg(first(col("size")).as("size"), sum(col("size")).as("occ_bytes"))
      .groupBy(col("source"))
      .agg(sum(col("occ_bytes")).as("total_bytes"),
        sum(col("size")).as("unique_bytes"))
      .withColumn("dedup_ratio",
        col("unique_bytes").cast("double") / col("total_bytes").cast("double"))
  }

  /** Composed curation pipeline over documents: quality → lang → exact
    * dedup → MinHash near-dedup, with per-(source, fate) accounting.
    */
  private def curate(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.CuratePipeline
    val annotated = CuratePipeline.curate(
      docs(spark, sfDir), "doc_id", "text",
      CuratePipeline.CurateParams(minTokens = 20, nearDupThreshold = 0.8))
    CuratePipeline.report(annotated)
  }

  /** Per-source content-overlap matrix from KMV sketches over CDC chunk
    * hashes: one distributed sketch pass, then pairwise Jaccard on the
    * collected k-samples (sources × k longs — tiny). Answers "which
    * sources share content" without any pairwise shuffle.
    */
  private def sourceSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.plans.CdcChunks
    import graft.functions.KmvSketch
    val chunked = docs(spark, sfDir)
      .select(col("source"),
        CdcChunks.cdc_chunks(encode(col("text"), "UTF-8"), minLen = 16,
          maxLen = 256, maskBits = 5))
    // pre-aggregate to DISTINCT (source, hash) before sketching: KMV is a
    // set sketch (duplicates are no-ops), but each occurrence row used to
    // pay a full Aggregator encode/decode through the udaf() bridge —
    // the relational distinct collapses duplicates map-side in codegen,
    // leaving the bridge ~occurrence/distinct-factor fewer rows to touch
    val sketches = chunked
      .filter(col("source").isNotNull)
      .select(col("source"), col("hash")).distinct()
      .groupBy(col("source"))
      .agg(KmvSketch.kmv_sample(col("hash")).as("sample"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val pairs = for {
      i <- sketches.indices
      j <- (i + 1) until sketches.length
    } yield (sketches(i)._1, sketches(j)._1,
      KmvSketch.jaccardEstimate(sketches(i)._2, sketches(j)._2, k = 1024))
    pairs.toSeq.toDF("source_a", "source_b", "est_jaccard")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> curate _,
    "source_similarity" -> sourceSimilarity _,
    "dedup_exact" -> dedupExact _,
    "dedup_prefix" -> dedupPrefix _,
    "dedup_minhash" -> minhashPairs _,
    "dedup_simhash" -> simhashPairs _,
    "dedup_ngram" -> ngramPairs _,
    "text_tokens" -> textTokens _,
    "text_tokens_bpe" -> textTokensBpe _,
    "text_quality" -> textQuality _,
    "text_stats" -> textStats _,
    "text_quality_full" -> qualityFull _,
    "lang_id" -> langId _,
    "doc_fingerprint" -> docFingerprint _,
    "doc_cdc" -> docCdc _
  )

  val oracles: Map[String, String] = Map(
    "doc_cdc" ->
      s"""WITH per AS (
        |  SELECT source, hash, MIN(size) AS size, SUM(size) AS occ_bytes
        |  FROM read_parquet('${Queries.oracleSidePath("doc_chunks")}')
        |  GROUP BY source, hash)
        |SELECT source, CAST(SUM(occ_bytes) AS BIGINT) AS total_bytes,
        |  CAST(SUM(size) AS BIGINT) AS unique_bytes,
        |  CAST(SUM(size) AS DOUBLE) / CAST(SUM(occ_bytes) AS DOUBLE) AS dedup_ratio
        |FROM per GROUP BY source""".stripMargin,
    "dedup_ngram" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
        |  FROM documents),
        |g0 AS (
        |  SELECT doc_id, UNNEST(list_distinct(
        |    CASE WHEN len(words) >= 3
        |      THEN list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' '))
        |      ELSE [array_to_string(words, ' ')] END)) AS gram
        |  FROM w),
        |g AS (SELECT doc_id, gram FROM g0 WHERE gram IS NOT NULL AND gram <> ''),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
        |common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(n_common AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - n_common AS DOUBLE) AS jaccard,
        |  CAST(n_common AS DOUBLE) / CAST(sa.n_grams AS DOUBLE) AS containment_a,
        |  CAST(n_common AS DOUBLE) / CAST(sb.n_grams AS DOUBLE) AS containment_b
        |FROM common
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - n_common AS DOUBLE) >= 0.3""".stripMargin,
    "dedup_exact" ->
      """SELECT doc_id, md5(text) AS fp,
        |  MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
        |  doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        |FROM documents""".stripMargin,
    "dedup_prefix" ->
      """SELECT doc_id, md5(substr(text, 1, 40)) AS fp,
        |  MIN(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40))) AS canonical_id,
        |  doc_id <> MIN(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40))) AS is_dup
        |FROM documents""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id, length(text) AS n_chars_m,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
        |FROM documents""".stripMargin,
    "text_tokens_bpe" ->
      """SELECT doc_id,
        |  CAST(COALESCE(list_sum(list_transform(
        |    list_filter(string_split_regex(text, '[^A-Za-z0-9]+'), x -> x <> ''),
        |    x -> 1 + (length(x) - 1) // 4)), 0) AS BIGINT) AS n_tokens_bpe
        |FROM documents""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) - (length(text) - length(replace(text, ' ', ''))) AS DOUBLE)
        |    / CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) AS avg_token_len,
        |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |    / CAST(GREATEST(length(text), 1) AS DOUBLE) AS punct_ratio
        |FROM documents""".stripMargin,
    "text_quality_full" ->
      """SELECT doc_id,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |  CAST(length(text) - (length(text) - length(replace(text, ' ', ''))) AS DOUBLE)
        |    / CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) AS avg_token_len,
        |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |    / CAST(GREATEST(length(text), 1) AS DOUBLE) AS punct_ratio,
        |  CAST(len(list_filter(words, x -> x IN ('the','a','an','and','or','of','to','in',
        |    'is','it','that','for','on','with','as','at','by','be','this','are','was'))) AS DOUBLE)
        |    / CAST(len(words) AS DOUBLE) AS stopword_ratio
        |FROM (SELECT doc_id, text,
        |        list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
        |      FROM documents)""".stripMargin,
    "text_stats" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS sum_tokens
        |FROM documents GROUP BY lang, source""".stripMargin
  )
}
