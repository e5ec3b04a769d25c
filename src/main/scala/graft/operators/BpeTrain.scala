package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING — learn the first k merge rules
  * over a document corpus (Sennrich et al. 2016, the byte-pair-encoding
  * step every LLM tokenizer pipeline runs before anything else).
  *
  * Scale shape: the corpus is touched ONCE (word-count shuffle). Every
  * training iteration then runs over the distinct-word VOCABULARY
  * relation — Zipf-bounded, orders of magnitude smaller than the corpus
  * (100 TB of text is ~1e8–1e9 distinct words ≈ a few GB of vocab rows,
  * comfortably distributed). Per iteration: one narrow pair-explode +
  * one aggregation on (lhs, rhs), an argmax of ONE collected row, and a
  * narrow merge pass. Driver state is k merge rows — never data.
  *
  * Cross-engine exactness (the DuckDB oracle replays training
  * end-to-end — vocab build, k iterations, the learned rules):
  *  - pair counts include overlapping occurrences ("a a a" counts
  *    (a,a) twice), the classic get_stats semantics;
  *  - merges apply left-to-right non-overlapping ("a a a" → "aa a"),
  *    exactly DuckDB `replace` on a space-delimited symbol string;
  *  - argmax tie-breaks on (freq DESC, lhs ASC, rhs ASC) and the
  *    comparison happens IN Spark SQL, so string order is UTF-8 byte
  *    order on both engines (a driver-side Scala sort would be UTF-16
  *    code-unit order and could disagree on supplementary characters);
  *  - words split to Unicode CODEPOINTS (`String.codePoints`), matching
  *    DuckDB's `string_split(w, '')`.
  */
object BpeTrain {

  /** Left-to-right non-overlapping merge of the (l, r) symbol pair —
    * the same scan `replace(seqstr, ' l r ', ' lr ')` performs on the
    * padded string encoding.
    */
  def mergePair(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Split to Unicode codepoints (surrogate-pair safe). */
  def codepoints(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Learn `k` merges from `docs(textCol)`. Returns (merge_idx, lhs,
    * rhs, freq) — merge_idx in training order.
    */
  /** Above this many distinct words, iterations run distributed; at or
    * below it the vocab is collected once and iterated on the driver
    * (≤ ~10 MB of strings) with byte-identical kernels — the same
    * size-adaptive strategy switch Spark applies to broadcast joins.
    * k Spark jobs over a 31-word vocab is all scheduler overhead.
    */
  val LocalVocabLimit = 100000

  def learn(docs: DataFrame, textCol: String, k: Int,
      localVocabLimit: Int = LocalVocabLimit): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k >= 0, s"k must be non-negative: $k")

    // the only corpus-scale pass: distinct words with counts
    val words = docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .persist()

    // one cheap probe decides the strategy: limit+1 rows, not a count
    val probe = words.limit(localVocabLimit + 1).collect()
    val merges =
      if (probe.length <= localVocabLimit) learnLocal(probe, k)
      else learnDistributed(spark, words, k)
    words.unpersist()
    spark.createDataset(merges.toSeq).toDF("merge_idx", "lhs", "rhs", "freq")
  }

  /** UTF-8 byte-order comparison — MUST match Spark SQL's string
    * ordering (and DuckDB's binary collation); String.compareTo is
    * UTF-16 code-unit order and disagrees on supplementary planes.
    */
  private def utf8Lt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  /** Driver-side iterations over a collected small vocab; semantics are
    * pin-identical to [[learnDistributed]] (same pair counts, same
    * UTF-8 argmax tie-break).
    */
  private def learnLocal(vocab0: Array[(String, Long)],
      k: Int): Seq[(Long, String, String, Long)] = {
    var vocab = vocab0.map { case (w, f) => (codepoints(w), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var i = 0
    var done = false
    while (i < k && !done) {
      val counts = new java.util.HashMap[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var j = 0
        while (j + 1 < syms.length) {
          counts.merge((syms(j), syms(j + 1)), f, _ + _)
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, f) =>
          if (best == null || f > best._2 ||
            (f == best._2 && (utf8Lt(p._1, best._1._1) ||
              (p._1 == best._1._1 && utf8Lt(p._2, best._1._2)))))
            best = (p, f)
        }
        val ((l, r), f) = best
        merges += ((i.toLong, l, r, f))
        vocab = vocab.map { case (syms, fr) => (mergePair(syms, l, r), fr) }
        i += 1
      }
    }
    merges.toSeq
  }

  /** Distributed iterations — the 1e8+-word-vocab path: per iteration
    * one pair-explode aggregation and a one-row argmax collect.
    */
  private def learnDistributed(spark: SparkSession,
      words: Dataset[(String, Long)],
      k: Int): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    var vocab: Dataset[(Array[String], Long)] =
      words.map { case (w, f) => (codepoints(w), f) }
    vocab.persist()

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var i = 0
    while (i < k) {
      // overlapping adjacent pairs, weighted by word frequency
      val pairs = vocab.flatMap { case (syms, f) =>
        (0 until syms.length - 1).iterator.map(j => (syms(j), syms(j + 1), f))
      }.toDF("lhs", "rhs", "freq")
        .groupBy("lhs", "rhs").agg(sum("freq").as("freq"))
      // argmax INSIDE Spark SQL: UTF-8 byte-order ties, one collected row
      val top = pairs
        .orderBy(col("freq").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) { i = k } // vocab fully merged: nothing left to learn
      else {
        val r = top.head
        val (l, rr, f) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += ((i.toLong, l, rr, f))
        val next = vocab.map { case (syms, fr) => (mergePair(syms, l, rr), fr) }
        next.persist()
        // materialize before dropping the parent so each iteration's
        // lineage stays one map deep, not k maps
        next.count()
        vocab.unpersist()
        vocab = next
        i += 1
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** The learn CTE chain (everything up to, not including, a final
    * SELECT): vocab seed + k recursive working-table iterations +
    * `__merges` reconstructing the rule chosen at each iteration by the
    * same argmax. Shared by [[learnOracleSql]] and [[tokenizeOracleSql]].
    */
  private def learnCtesSql(table: String, textCol: String, k: Int): String =
    s"""__words AS (
       |  SELECT w AS word, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split_regex($textCol, '\\s+')) AS w FROM $table)
       |  WHERE w <> '' GROUP BY w),
       |__seed AS (
       |  SELECT 0 AS it, freq,
       |    ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS seqstr
       |  FROM __words),
       |__bpe AS (
       |  SELECT it, freq, seqstr FROM __seed
       |  UNION ALL
       |  SELECT b.it + 1, b.freq, replace(b.seqstr, best.pat, best.rep)
       |  FROM __bpe b,
       |    (SELECT ' ' || lhs || ' ' || rhs || ' ' AS pat,
       |            ' ' || lhs || rhs || ' ' AS rep
       |     FROM (
       |       SELECT parts[g.i] AS lhs, parts[g.i + 1] AS rhs, SUM(freq) AS f
       |       FROM (SELECT string_split(trim(seqstr), ' ') AS parts, freq
       |             FROM __bpe),
       |            LATERAL (SELECT unnest(range(1, len(parts))) AS i) g
       |       GROUP BY 1, 2)
       |     ORDER BY f DESC, lhs, rhs LIMIT 1) best
       |  WHERE b.it < $k),
       |__merges AS (
       |  -- CAST to BIGINT: `it` is an INT32 literal chain and SUM yields
       |  -- HUGEINT — both must land on the Spark side's (long, long)
       |  SELECT CAST(it AS BIGINT) AS merge_idx, lhs, rhs,
       |    CAST(f AS BIGINT) AS freq FROM (
       |    SELECT it, lhs, rhs, SUM(freq) AS f,
       |      ROW_NUMBER() OVER (PARTITION BY it
       |                         ORDER BY SUM(freq) DESC, lhs, rhs) AS rn
       |    FROM (SELECT it, string_split(trim(seqstr), ' ') AS parts, freq
       |          FROM __bpe),
       |         LATERAL (SELECT unnest(range(1, len(parts))) AS i) g,
       |         LATERAL (SELECT parts[g.i] AS lhs, parts[g.i + 1] AS rhs) p
       |    GROUP BY it, lhs, rhs)
       |  WHERE rn = 1 AND it < $k)""".stripMargin

  /** The DuckDB oracle: replays [[learn]] end-to-end — vocab seed, k
    * recursive iterations over the working table (DuckDB's recursive
    * CTE carries exactly the previous iteration's rows), merge rules
    * reconstructed per iteration by the same argmax. Caller supplies a
    * `documents`-style relation name and text column.
    */
  def learnOracleSql(table: String, textCol: String, k: Int): String =
    s"""WITH RECURSIVE ${learnCtesSql(table, textCol, k)}
       |SELECT merge_idx, lhs, rhs, freq FROM __merges""".stripMargin

  /** Tokenize `word` with learned merges applied in training order —
    * the standard greedy BPE apply (used by the spec to sanity-check
    * that learned rules compose).
    */
  def applyMerges(word: String, merges: Seq[(String, String)]): Array[String] =
    merges.foldLeft(codepoints(word)) { case (syms, (l, r)) => mergePair(syms, l, r) }

  /** Tokenize the corpus with rules learned by [[learn]]: per document,
    * the token count under the learned tokenizer plus the raw codepoint
    * count (the compression the merges bought). The merge table is k
    * collected rows broadcast into one narrow pass — the corpus never
    * shuffles; at 100 TB this is a map-only job.
    */
  def tokenize(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val merges = learn(docs, textCol, k).collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(col(idCol), col(textCol)).as[(Long, String)].map {
      case (id, text0) =>
        val text = if (text0 == null) "" else text0
        val words = text.split("\\s+").filter(_.nonEmpty)
        var nTok = 0L
        var nCp = 0L
        words.foreach { w =>
          val cps = codepoints(w)
          nCp += cps.length
          nTok += bc.value.foldLeft(cps) {
            case (syms, (l, r)) => mergePair(syms, l, r)
          }.length
        }
        (id, nTok, nCp)
    }.toDF(idCol, "n_tokens_learned", "n_codepoints")
  }

  /** DuckDB oracle for [[tokenize]]: learns the same merges (shared
    * [[learnCtesSql]] chain) and applies them with a second recursive
    * CTE over (doc x iteration) - step i replaces merge rule i in every
    * document's padded symbol string, exactly the engine's fold. Words
    * are separated by DOUBLE spaces in the doc string, so the
    * single-space pair patterns can never merge across a word boundary
    * - mirroring the engine's per-word tokenization.
    */
  /** The tokenize-replay CTE chain ending in a named CTE
    * `__tok($idCol, n_tokens_learned, n_codepoints)` — ONE definition
    * shared by [[tokenizeOracleSql]] and any oracle that consumes
    * learned-tokenizer counts downstream (doc_pack_bpe's prefix sums),
    * so the replay can never drift between consumers. Callers embed it
    * as `WITH RECURSIVE $chain` and select from `__tok`.
    */
  def tokenizeCtesSql(table: String, textCol: String, idCol: String,
      k: Int): String =
    s"""${learnCtesSql(table, textCol, k)},
       |__docs AS (
       |  SELECT $idCol,
       |    ' ' || array_to_string(list_transform(
       |        list_filter(string_split_regex($textCol, '\\s+'), w -> w <> ''),
       |        w -> array_to_string(string_split(w, ''), ' ')), '  ') || ' '
       |      AS seqstr
       |  FROM $table),
       |__applied AS (
       |  SELECT $idCol, 0 AS it, seqstr FROM __docs
       |  UNION ALL
       |  SELECT a.$idCol, a.it + 1,
       |    replace(a.seqstr, ' ' || m.lhs || ' ' || m.rhs || ' ',
       |            ' ' || m.lhs || m.rhs || ' ')
       |  FROM __applied a JOIN __merges m ON m.merge_idx = a.it
       |  WHERE a.it < $k),
       |__tok AS (
       |  SELECT f.$idCol,
       |    CAST(len(list_filter(string_split(trim(f.seqstr), ' '),
       |         s -> s <> '')) AS BIGINT) AS n_tokens_learned,
       |    CAST(len(list_filter(string_split(trim(d.seqstr), ' '),
       |         s -> s <> '')) AS BIGINT) AS n_codepoints
       |  FROM __applied f JOIN __docs d ON d.$idCol = f.$idCol
       |  WHERE f.it = (SELECT COALESCE(MAX(merge_idx) + 1, 0) FROM __merges))""".stripMargin

  def tokenizeOracleSql(table: String, textCol: String, idCol: String,
      k: Int): String =
    s"""WITH RECURSIVE ${tokenizeCtesSql(table, textCol, idCol, k)}
       |SELECT $idCol, n_tokens_learned, n_codepoints FROM __tok""".stripMargin

}
