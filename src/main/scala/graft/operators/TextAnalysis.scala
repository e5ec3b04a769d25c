package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprinting.
  * All narrow (per-row) transforms — no shuffle; they stay inside
  * whole-stage codegen where expressible as `functions._` columns and drop
  * to (deterministic) Scala UDFs only for set-based logic.
  */
object TextAnalysis {

  /** Whitespace-token count as pure column arithmetic (codegen-friendly and
    * ANSI-expressible for the oracle): spaces + 1.
    */
  def tokenCountCol(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", ""))) + lit(1)

  /** BPE-ish subword token estimate: word count plus an extra token per 4
    * characters of long words — a cheap deterministic proxy for tokenizer
    * cost accounting (real BPE needs a vocab; the regex split is the
    * documented stand-in). Pure column expressions (codegen, SQL-parity).
    */
  def bpeishTokenCount(text: Column): Column =
    coalesce(
      aggregate(
        filter(split(text, "[^A-Za-z0-9]+"), w => w =!= ""),
        lit(0L),
        (acc, w) => acc + lit(1L) + ((length(w) - 1) / 4).cast("long")),
      lit(0L))

  private val Stopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "are", "was")

  /** Quality metrics per document: char/token counts, average word length,
    * punctuation ratio, stopword ratio — all pure column expressions
    * (whole-stage codegen, no UDF): the stopword membership test is
    * array_contains over a literal array inside a higher-order filter.
    */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val nChars = length(text)
    val nTokens = tokenCountCol(text)
    val stopArr = array(Stopwords.toSeq.sorted.map(lit): _*)
    // literal single-space split: matches the DuckDB oracle's string_split
    // exactly (regex \s+ would diverge on tabs/newlines) and skips regex cost
    val words = filter(split(lower(text), " "), w => w =!= "")
    val stopRatio = when(size(words) > 0,
      size(filter(words, w => array_contains(stopArr, w))).cast("double") /
        size(words).cast("double")).otherwise(lit(0.0))
    df.withColumn("n_chars_m", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("avg_token_len",
        (nChars - (nTokens - lit(1))).cast("double") / nTokens.cast("double"))
      .withColumn("punct_ratio",
        (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("double") /
          greatest(nChars, lit(1)).cast("double"))
      .withColumn("stopword_ratio", stopRatio)
  }

  /** Statistical language-model quality scoring — the perplexity-style
    * filter stage (KenLM-shaped), self-trained: a char-bigram model is
    * fit on the corpus itself and every document is scored by its mean
    * transition probability under that model. Low scores = improbable
    * character sequences (mojibake, binary spill, wrong-language text).
    *
    * Determinism contract: per-transition probabilities are INTEGER-
    * scaled — floor(scale · count(c₁c₂) / count(c₁·)) — and summed as
    * BIGINTs, so no float accumulation order exists anywhere; the single
    * final division (sum / n) divides the same two integers in every
    * engine. That makes train + score fully expressible as a SQL oracle,
    * unlike log-prob scoring (ln is not bit-stable across engines; the
    * induced ranking family is the same).
    *
    * Scale shape: ONE corpus scan. Bigrams are INT codepoint pairs (no
    * per-bigram String allocation) pre-aggregated to per-(doc, bigram)
    * counts; the model counts derive from THAT relation (not a second
    * text scan), and both consumers share the same shuffle exchange
    * (ReusedExchange — plan-asserted in QueriesPlanSpec), so text bytes
    * are read and bigram-exploded exactly once. The model is
    * charset²-sized, so both model joins broadcast; the only shuffles
    * move (doc, bigram, count) rows, never text.
    */
  def bigramLmScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      scale: Long = 1000000L): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    // loud null-id guard (the Boilerplate/Sampling convention): a null id
    // would otherwise die inside the typed encoder as an opaque NPE
    val idChecked = when(col(idCol).isNull,
        raise_error(lit(s"bigramLmScore: null $idCol — document ids must be non-null")))
      .otherwise(col(idCol).cast("long"))
    val bi = df
      .select(idChecked, lower(col(textCol)).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, s) =>
        // iterate CODEPOINTS, not UTF-16 code units: the DuckDB oracle's
        // len/substr are codepoint-based, and splitting a surrogate pair
        // would emit unpaired-surrogate "chars" for non-BMP text.
        // Codepoints stay INTs end-to-end — grouping by (c1, c2) ints is
        // bijective with grouping by 1-codepoint strings, minus the two
        // String allocations per position.
        if (s == null || s.length < 2) Iterator.empty
        else {
          val cps = s.codePoints().toArray
          (0 until cps.length - 1).iterator.map(i => (id, cps(i), cps(i + 1)))
        }
      }
      .toDF("id", "c1", "c2")
    // per-(doc, bigram) occurrence counts — the single text-derived
    // relation BOTH the model aggregate and the scoring join consume;
    // identical subtree ⟹ Spark reuses one shuffle, one corpus scan
    val docBi = bi.groupBy(col("id"), col("c1"), col("c2"))
      .agg(count(lit(1)).as("dc"))
    val counts = docBi.groupBy(col("c1"), col("c2")).agg(sum(col("dc")).as("c12"))
    val prefix = counts.groupBy(col("c1")).agg(sum(col("c12")).as("c1n"))
    // loud overflow guard, zero extra jobs: scale·c12 must fit in a Long
    // (a silent wrap here would poison scores while the HUGEINT oracle
    // kept going). A corpus hot enough to trip it (c12 > ~9.2e18/scale)
    // needs a smaller `scale` — the error says so.
    val c12Checked = when(col("c12") > lit(Long.MaxValue / scale),
        raise_error(concat(lit("bigramLmScore: bigram count "), col("c12"),
          lit(s" overflows Long at scale=$scale; lower the scale parameter"))))
      .otherwise(col("c12"))
    // Σ over occurrences = Σ dc·p over distinct doc-bigrams: identical
    // integers to the per-occurrence formulation, so the oracle SQL (which
    // scores per occurrence) matches bit-for-bit
    docBi.join(broadcast(counts), Seq("c1", "c2"))
      .join(broadcast(prefix), Seq("c1"))
      .withColumn("p_scaled",
        call_function("div", lit(scale) * c12Checked, col("c1n")))
      .groupBy(col("id"))
      .agg(sum(col("dc")).as("n_bigrams"),
        sum(col("dc") * col("p_scaled")).as("score_scaled"))
      .withColumn("avg_scaled",
        col("score_scaled").cast("double") / col("n_bigrams").cast("double"))
  }

  /** Model-based quality filtering — the fasttext-style LINEAR classifier
    * stage of CCNet/Dolma-like pipelines, as a pure column expression over
    * engine-computed features. The weight vector is a caller parameter
    * (no learned artifact ships with the engine; at scale you'd plug in
    * trained weights — the pipeline shape is identical).
    *
    * The score is the raw LOGIT (bias + Σ wᵢ·xᵢ, folded left-to-right in
    * the caller's feature order): monotone in the class probability, and
    * pure IEEE +/× so the SQL oracle is cell-exact. sigmoid is
    * deliberately NOT applied — exp() is not bit-stable across engines,
    * and thresholding `logit > 0` is exactly `p > 0.5`.
    */
  def linearScore(features: Seq[(Column, Double)], bias: Double): Column =
    features.foldLeft(lit(bias): Column) {
      case (acc, (x, w)) => acc + lit(w) * x.cast("double")
    }

  /** Language-ID heuristic: score per-language marker word/character-class
    * hits; highest count wins, `und` when nothing matches. A real system
    * uses char n-gram models; the marker table keeps this deterministic and
    * dependency-free while exercising the full distributed shape.
    */
  private val LangMarkers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "is", "in", "that", "it", "with"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr" -> Set("le", "la", "les", "et", "est", "une", "dans", "pour"),
    "es" -> Set("el", "la", "los", "las", "es", "una", "por", "para"),
    "it" -> Set("il", "la", "che", "di", "non", "per", "una", "sono"))

  private val langIdUdf = udf { (text: String) =>
    if (text == null || text.isEmpty) "und"
    else {
      val words = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").iterator.filter(_.nonEmpty).take(200).toSeq
      if (words.exists(w => w.exists(c => c >= '一' && c <= '鿿'))) "zh"
      else {
        val scores = LangMarkers.map { case (lang, markers) =>
          lang -> words.count(markers.contains)
        }
        val (best, score) = scores.maxBy { case (l, s) => (s, l) }
        if (score == 0) "und" else best
      }
    }
  }

  def langId(text: Column): Column = langIdUdf(text)

  /** Document fingerprint via winnowing (public algorithm: Schleimer et al.,
    * SIGMOD'03): rolling hash over k-grams, minimum per sliding window →
    * compact fingerprint set that is robust to local edits. Returns a
    * sorted distinct array of fingerprint hashes.
    */
  private def winnow(text: String, k: Int, window: Int): Array[Long] = {
    if (text == null || text.length < k) Array.empty
    else {
      val s = text.toLowerCase(java.util.Locale.ROOT)
      val n = s.length - k + 1
      val hashes = new Array[Long](n)
      // Polynomial rolling hash over a k-char window, base 257 mod 2^64.
      val base = 257L
      var pow = 1L
      var i = 1
      while (i < k) { pow *= base; i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = h * base + s.charAt(i); i += 1 }
      hashes(0) = h
      i = 1
      while (i < n) {
        h = (h - s.charAt(i - 1) * pow) * base + s.charAt(i + k - 1)
        hashes(i) = h
        i += 1
      }
      // O(n) sliding-window minimum via monotonic deque; record only when
      // the window's min index changes (classic winnowing), dedup at end
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      if (n <= window) out += hashes.min
      else {
        val deque = new java.util.ArrayDeque[Int]()
        var lastRecorded = -1
        var i2 = 0
        while (i2 < n) {
          while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(i2)) deque.pollLast()
          deque.addLast(i2)
          if (deque.peekFirst() <= i2 - window) deque.pollFirst()
          if (i2 >= window - 1) {
            val minIdx = deque.peekFirst()
            if (minIdx != lastRecorded) { out += hashes(minIdx); lastRecorded = minIdx }
          }
          i2 += 1
        }
      }
      out.distinct.sorted.toArray
    }
  }

  private val fingerprintUdf = udf { (text: String) => winnow(text, 8, 16) }

  def fingerprint(text: Column): Column = fingerprintUdf(text)

  /** Substring-duplication candidates via shared winnowing fingerprints —
    * the scalable stand-in for exact suffix-array substring dedup (Lee et
    * al. 2022's dedup target, reached with Schleimer et al.'s winnowing
    * guarantee): any two documents sharing a substring of at least
    * window + k − 1 = 23 chars share at least one fingerprint, so the
    * fingerprint join has FULL RECALL on long shared spans; `minShared`
    * trims coincidental single-hash matches.
    *
    * Shape: explode (doc, fp) — sub-linear in text length (winnowing keeps
    * ~2/window of positions) — one fp-keyed self-join (ReusedExchange
    * serves both sides; a hot boilerplate fingerprint streams through the
    * join's spillable buffer), one pair-keyed count. `maxFpFreq` is the
    * hot-fingerprint guardrail at scale, same contract as
    * ngramJaccardPairs' maxGramFreq.
    *
    * @param fpSink hook over the (doc_id, fp) relation the join actually
    *   consumes — AFTER the maxFpFreq cap, so the catalog's persisted
    *   side table and the DuckDB oracle see exactly the candidate
    *   universe (capping hot boilerplate fps is part of the operator's
    *   semantics, not a lossy shortcut: template fingerprints shared by
    *   a large corpus fraction are noise for DUP detection)
    */
  def sharedFingerprintPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minShared: Long = 2L,
      maxFpFreq: Long = Long.MaxValue,
      fpSink: DataFrame => DataFrame = identity): DataFrame = {
    val rel0 = df
      .select(col(idCol).cast("long").as("doc_id"),
        explode(fingerprint(col(textCol))).as("fp"))
      .distinct()
    val rel = fpSink(
      if (maxFpFreq == Long.MaxValue) rel0
      else rel0.join(
        rel0.groupBy(col("fp")).agg(count(lit(1)).as("fp_df"))
          .filter(col("fp_df") <= maxFpFreq).select(col("fp")),
        "fp"))
    rel.as("a")
      .join(rel.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared_fp"))
      .filter(col("n_shared_fp") >= minShared)
  }

  /** Top characteristic terms per group (source/domain) by TF-ICF: term
    * frequency within the group × inverse collection frequency (number of
    * groups containing the term). The idf-style weight uses PURE DIVISION
    * of exact integers — score = (tf · n_groups) / cf — instead of a
    * logarithm: IEEE division is correctly rounded and therefore
    * bit-identical across engines, while ln() is not, and the ranking it
    * induces is the same monotone family. Relational end-to-end (explode →
    * two aggregates → window top-k), so the oracle replays it exactly.
    *
    * Scale: the exploded (group, word) relation is the cost — one shuffle
    * keyed by (group, word), then a word-keyed aggregate over the already-
    * aggregated distinct (group, word) pairs (vocabulary-sized), then a
    * per-group window. For vocabulary-bounded corpora this is cheap; for
    * open vocabularies cap with [[HeavyHitters]] first.
    */
  def topTermsPerGroup(
      df: DataFrame,
      groupCol: String,
      textCol: String = "text",
      topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null groups are excluded from BOTH the term rows and the group count
    // — mirroring SQL's COUNT(DISTINCT g), which ignores NULL; counting
    // the null group on one side only would scale every score
    val grouped = df.filter(col(groupCol).isNotNull)
    val words = filter(split(lower(col(textCol)), " "), w => w =!= "")
    val exploded = grouped
      .select(col(groupCol).as("grp"), explode(words).as("word"))
    val tf = exploded.groupBy(col("grp"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy(col("word"))
      .agg(count(lit(1)).as("cf")) // groups containing the word
    val nGroups = grouped.select(col(groupCol)).distinct().count()
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("word").asc)
    tf.join(cf, "word")
      .withColumn("score",
        (col("tf") * lit(nGroups)).cast("double") / col("cf").cast("double"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("grp").as(groupCol), col("rank"), col("word"),
        col("tf"), col("cf"), col("score"))
  }

  /** Gopher-style per-document quality rules (public method: the
    * repetition/length/ratio filters of Rae et al. 2021 "Scaling Language
    * Models: ... Gopher", Appendix A — re-parameterized): word-count
    * bounds, mean-word-length bounds, within-document repetition via the
    * top-word ratio, and lexical diversity via the distinct-word ratio.
    *
    * All pure column expressions over one split-words array — per-row,
    * no shuffle, whole-stage codegen, exact DuckDB list-function mirror.
    * The top-word ratio is O(words × distinct words) per row — fine for
    * document-sized payloads; a corpus with book-length rows should
    * switch to a kernel like [[Dedupe.wordGramHashes]]'s.
    *
    * Ratios divide exact integers, so cross-engine doubles are
    * bit-identical (same IEEE operands), making every column oracled.
    */
  def gopherFlags(
      df: DataFrame,
      textCol: String = "text",
      minWords: Int = 20,
      maxWords: Int = 80,
      minMeanWordLen: Double = 2.0,
      maxMeanWordLen: Double = 12.0,
      maxTopWordRatio: Double = 0.12,
      minDistinctRatio: Double = 0.4): DataFrame = {
    // coalesce first: a NULL text would otherwise propagate null through
    // split/size into null metrics and a null (not false) quality_pass —
    // and a downstream filter(quality_pass) would drop the row without it
    // ever counting as rejected
    val words =
      filter(split(lower(coalesce(col(textCol), lit(""))), " "), w => w =!= "")
    val wc = size(words)
    // greatest(wc,1) + coalesce keep empty/null docs at ratio 0 (all-false
    // rules) instead of null-poisoning quality_pass
    val safeWc = greatest(wc, lit(1)).cast("double")
    val meanLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
      .cast("double") / safeWc
    val topFreq = coalesce(array_max(transform(array_distinct(words),
      w => size(filter(words, x => x === w)))), lit(0))
    val distinctRatio = size(array_distinct(words)).cast("double") / safeWc
    df.withColumn("word_count", wc.cast("long"))
      .withColumn("mean_word_len", meanLen)
      .withColumn("top_word_ratio", topFreq.cast("double") / safeWc)
      .withColumn("distinct_ratio", distinctRatio)
      .withColumn("r_word_count", wc.between(minWords, maxWords))
      .withColumn("r_mean_word_len",
        col("mean_word_len").between(minMeanWordLen, maxMeanWordLen))
      .withColumn("r_repetition", col("top_word_ratio") <= maxTopWordRatio)
      .withColumn("r_diversity", col("distinct_ratio") >= minDistinctRatio)
      .withColumn("quality_pass",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_repetition") && col("r_diversity"))
  }

  /** Within-document n-gram repetition metrics — the word-n-gram half of
    * Gopher's repetition filters (Rae et al. 2021, Appendix A: "fraction of
    * characters in the most frequent 2/3/4-gram", "fraction of characters
    * in duplicated n-grams"), re-expressed over word occurrences:
    *
    *  - `top_{bi,tri}gram_ratio`  — occurrences of the single most frequent
    *    word n-gram / total n-gram occurrences;
    *  - `dup_{bi,tri}gram_frac`   — fraction of n-gram occurrences whose
    *    gram appears at least twice in the document.
    *
    * All pure column expressions over one split-words array — per-row, no
    * shuffle, whole-stage codegen, and an exact DuckDB list-function
    * mirror. Ratios divide exact integers so the doubles are bit-identical
    * across engines. Like [[gopherFlags]]' top-word ratio, the inner
    * count-per-distinct-gram scan is O(grams × distinct grams) per row —
    * fine for document-sized payloads; book-length rows should pre-hash
    * grams with a kernel like [[Dedupe.wordGramHashes]]'s.
    */
  def repetitionMetrics(
      df: DataFrame,
      textCol: String = "text",
      maxTopBigramRatio: Double = 0.08,
      maxDupBigramFrac: Double = 0.10): DataFrame = {
    val words =
      filter(split(lower(coalesce(col(textCol), lit(""))), " "), w => w =!= "")
    // sequence(1, size-n+1) is DESCENDING when size < n (Spark infers a
    // negative step) — the when() guard is load-bearing, not cosmetic
    def grams(n: Int): Column = {
      val idx = sequence(lit(1), size(col("__words")) - lit(n - 1))
      val mk = (i: Column) =>
        concat_ws(" ", (0 until n).map(o => element_at(col("__words"), i + lit(o))): _*)
      when(size(col("__words")) >= n, transform(idx, mk))
        .otherwise(array().cast("array<string>"))
    }
    def metrics(gcol: String, prefix: String)(d: DataFrame): DataFrame = {
      val g = col(gcol)
      val n = size(g)
      val safeN = greatest(n, lit(1)).cast("double")
      val topCnt = coalesce(
        array_max(transform(array_distinct(g), x => size(filter(g, y => y === x)))),
        lit(0))
      val dupOcc = size(filter(g, x => size(filter(g, y => y === x)) >= 2))
      d.withColumn(s"n_${prefix}grams", n.cast("long"))
        .withColumn(s"top_${prefix}gram_ratio", topCnt.cast("double") / safeN)
        .withColumn(s"dup_${prefix}gram_frac", dupOcc.cast("double") / safeN)
    }
    val base = df.withColumn("__words", words)
      .withColumn("__bigrams", grams(2))
      .withColumn("__trigrams", grams(3))
    metrics("__trigrams", "tri")(metrics("__bigrams", "bi")(base))
      .withColumn("r_top_bigram", col("top_bigram_ratio") <= maxTopBigramRatio)
      .withColumn("r_dup_bigram", col("dup_bigram_frac") <= maxDupBigramFrac)
      .withColumn("repetition_pass", col("r_top_bigram") && col("r_dup_bigram"))
      .drop("__words", "__bigrams", "__trigrams")
  }

  /** Per-document LZ4 compressibility — the entropy-proxy quality
    * filter (highly compressible text = repetitive boilerplate;
    * near-incompressible = binary spill / high-entropy junk): UTF-8
    * byte count, LZ4-compressed size, their exact-division ratio, and
    * the band flags. Narrow per-row work through a codegen Catalyst
    * expression ([[graft.plans.Lz4Length]] — no UDF serialization, the
    * projection stays inside whole-stage codegen), same codec the chunk
    * estimator sizes with; no shuffle. The compressed size is
    * engine-computed (no LZ4 in SQL engines), so catalog oracling
    * persists it as a side table and re-derives the relational half
    * independently.
    */
  def compressionRatio(df: DataFrame, idCol: String,
      textCol: String = "text",
      minRatio: Double = 0.3, maxRatio: Double = 1.0): DataFrame = {
    import graft.plans.Lz4Length.lz4_len
    ratioFlag(minRatio, maxRatio)(
      df.select(col(idCol),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        coalesce(lz4_len(encode(col(textCol), "UTF-8")), lit(0L))
          .as("lz4_bytes")))
  }

  /** [[compressionRatio]]'s finish from pre-computed (idCol, lz4_bytes)
    * sizes — lets a caller that already persisted the LZ4 pass (e.g. an
    * oracle side table) derive the ratio relation without re-compressing
    * the corpus.
    */
  def compressionFromSizes(df: DataFrame, idCol: String, textCol: String,
      sizes: DataFrame,
      minRatio: Double = 0.3, maxRatio: Double = 1.0): DataFrame =
    ratioFlag(minRatio, maxRatio)(
      df.select(col(idCol), octet_length(col(textCol)).cast("long")
        .as("n_bytes"))
        .join(sizes, Seq(idCol)))

  /** The one source of truth for the ratio/flag columns. */
  private def ratioFlag(minRatio: Double, maxRatio: Double)(
      df: DataFrame): DataFrame =
    df.withColumn("compress_ratio",
        when(col("n_bytes") > 0,
          col("lz4_bytes").cast("double") / col("n_bytes").cast("double"))
          .otherwise(lit(1.0)))
      .withColumn("entropy_pass",
        col("compress_ratio") >= minRatio && col("compress_ratio") <= maxRatio)

  /** Per-document term novelty in id order — the curation/curriculum
    * signal "how much does this doc add that no earlier doc had?": of a
    * document's DISTINCT words, the fraction first introduced by this
    * document (first introduction = smallest id containing the word;
    * ties inside one id are one introduction). Novelty collapsing to ~0
    * over an id-ordered corpus slice is the saturation signal that
    * stops further same-source ingestion.
    *
    * Scale shape: distinct (id, word) pairs shuffle once on word for the
    * min-id first-seen, then once on id for the per-doc ratio — both
    * map-side combined; no windows, no corpus-order sort (the "order" is
    * the id itself).
    */
  def termNovelty(df: DataFrame, idCol: String,
      textCol: String = "text"): DataFrame = {
    val docWords = docWordsRelation(df, idCol, textCol)
    noveltyFromFirstSeen(docWords,
      docWords.groupBy(col("word")).agg(min(col(idCol)).as("first_id")),
      idCol)
  }

  /** The (id, distinct word) relation both novelty paths derive from —
    * THE word semantics; batch and stream sharing this is what the
    * shared oracle's exactness rests on.
    */
  def docWordsRelation(df: DataFrame, idCol: String,
      textCol: String = "text"): DataFrame =
    df.select(col(idCol), explode(array_distinct(
      filter(split(lower(col(textCol)), " "), w => w =!= ""))).as("word"))

  /** Novelty finish from any (word, first_id) source — the batch min-id
    * aggregate or a streaming state store's first-introduction events.
    */
  def noveltyFromFirstSeen(docWords: DataFrame, firstSeen: DataFrame,
      idCol: String): DataFrame =
    docWords.join(firstSeen, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        sum(when(col(idCol) === col("first_id"), 1L).otherwise(0L))
          .as("n_new"))
      .withColumn("novelty",
        col("n_new").cast("double") / col("n_terms").cast("double"))
}
