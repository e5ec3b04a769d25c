package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("tokenCountCol counts whitespace tokens") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "single"), (3L, "x y")).toDF("id", "text")
    val counts = df.select(TextAnalysis.tokenCountCol(col("text"))).collect().map(_.getInt(0))
    assert(counts.toSeq == Seq(3, 1, 2))
  }

  test("bpeish token count: long words cost extra tokens") {
    import spark.implicits._
    val df = Seq((1L, "hi"), (2L, "internationalization")).toDF("id", "text")
    val counts = df.select(TextAnalysis.bpeishTokenCount(col("text"))).collect().map(_.getLong(0))
    assert(counts(0) == 1L)
    assert(counts(1) == 1L + (20 - 1) / 4)
  }

  test("qualityScore produces ratios in [0,1] and sane avg token length") {
    import spark.implicits._
    val df = Seq((1L, "the cat sat on the mat.")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df, "text").head()
    val stopRatio = r.getAs[Double]("stopword_ratio")
    val punct = r.getAs[Double]("punct_ratio")
    assert(stopRatio > 0.0 && stopRatio <= 1.0)
    assert(punct > 0.0 && punct < 0.1)
    assert(r.getAs[Double]("avg_token_len") > 1.0)
  }

  test("langId picks marker language, und for empty") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog is in the house with it"),
      (2L, "der hund und die katze ist nicht ein problem"),
      (3L, "el perro es una de las cosas por la casa"),
      (4L, ""),
      (5L, "zzz qqq www")).toDF("id", "text")
    val preds = df.select(TextAnalysis.langId(col("text"))).collect().map(_.getString(0))
    assert(preds.toSeq == Seq("en", "de", "es", "und", "und"))
  }

  test("null text: operators degrade gracefully, no crashes") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "real text here"))
      .toDF("doc_id", "text")
    // quality metrics: null text -> null/zero metrics, no exception
    assert(TextAnalysis.qualityScore(df, "text").count() == 2)
    assert(df.select(TextAnalysis.langId(col("text"))).collect()
      .map(_.getString(0)).contains("und"))
    assert(df.select(TextAnalysis.fingerprint(col("text"))).count() == 2)
    assert(df.select(TextAnalysis.bpeishTokenCount(col("text"))).count() == 2)
    // dedup ops over null text
    assert(graft.operators.Dedupe.exactDuplicates(df, "doc_id", col("text")).count() == 2)
    assert(graft.operators.Dedupe.ngramJaccardPairs(df, "doc_id", "text").count() == 0)
    assert(graft.operators.Dedupe.simhashPairs(df, "doc_id", "text").count() == 0)
  }

  test("fingerprint: identical docs identical, edits change few fingerprints") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 10
    val edited = base.replaceFirst("fox", "cat")
    val df = Seq((1L, base), (2L, base), (3L, edited)).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).collect()
      .map(_.getSeq[Long](0).toSet)
    assert(fps(0) == fps(1))
    val overlap = fps(0).intersect(fps(2)).size.toDouble / fps(0).size
    assert(overlap > 0.5, s"overlap=$overlap")
    assert(fps(0) != fps(2))
  }

  test("sharedFingerprintPairs: long shared substring pairs docs; strangers don't") {
    import spark.implicits._
    val shared = "this exact long passage appears verbatim inside both documents " * 3
    val df = Seq(
      (1L, s"first doc header $shared first doc tail"),
      (2L, s"second doc opener $shared and a different ending entirely"),
      (3L, "completely unrelated text with no overlap whatsoever to speak of"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis
      .sharedFingerprintPairs(df, "doc_id", "text", minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // hot-fingerprint cap drops the shared passage's fingerprints entirely
    val capped = TextAnalysis
      .sharedFingerprintPairs(df, "doc_id", "text", minShared = 1L, maxFpFreq = 1L)
      .count()
    assert(capped == 0)
  }

  test("bigramLmScore: hand-computed integer-scaled transition sums") {
    import spark.implicits._
    // counts: aa:1 ab:2 bb:1 ba:1; prefixes: a:3 b:2
    // ps: aa=1e6*1/3=333333, ab=666666, bb=500000, ba=500000
    val df = Seq((1L, "aab"), (2L, "abba"), (3L, null.asInstanceOf[String]),
      (4L, "x")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLmScore(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == Map(1L -> ((2L, 999999L)), 2L -> ((3L, 1666666L))),
      s"got $r")
  }

  test("bigramLmScore: non-BMP text pairs whole codepoints, null ids fail loudly") {
    import spark.implicits._
    // "a😀b" is 4 UTF-16 code units but 3 codepoints -> 2 bigrams; code-unit
    // iteration would produce 3 bigrams with unpaired surrogates (and
    // diverge from the DuckDB oracle's codepoint len/substr)
    val r = TextAnalysis.bigramLmScore(Seq((1L, "a😀b")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 2L), s"got $r")
    val err = intercept[Exception] {
      TextAnalysis.bigramLmScore(
        Seq((Some(1L), "ab"), (None, "cd")).toDF("doc_id", "text"),
        "doc_id", "text").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("null doc_id")), s"got $err")
  }

  test("bigramLmScore: probabilities bounded by scale, repartition-invariant") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val docs = (0L until 40L)
      .map(i => (i, (0 until 50).map(_ => ('a' + rng.nextInt(4)).toChar).mkString))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bigramLmScore(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val a = run(docs)
    assert(a.size == 40)
    a.foreach { case (id, (n, score)) =>
      assert(n == 49, s"doc $id: 50 chars -> 49 bigrams")
      // each term is floor(scale*c12/c1n) <= scale
      assert(score >= 0 && score <= n * 1000000L, s"doc $id score $score")
    }
    assert(run(docs.repartition(13)) == a, "partitioning must not change scores")
  }

  test("topTermsPerGroup ranks group-characteristic terms above shared ones") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple apple apple shared", "g1"),
      (2L, "apple shared shared", "g1"),
      (3L, "banana banana shared", "g2"),
      (4L, "banana shared cherry", "g2")
    ).toDF("doc_id", "text", "src")
    val r = TextAnalysis.topTermsPerGroup(df, "src", "text", topK = 2)
      .collect().map(x => (x.getString(0), x.getLong(1)) ->
        (x.getString(2), x.getLong(3), x.getLong(4), x.getDouble(5))).toMap
    // g1: apple tf=4 cf=1 score=4*2/1=8; shared tf=3 cf=2 score=3
    assert(r(("g1", 1L)) == (("apple", 4L, 1L, 8.0)))
    assert(r(("g1", 2L)) == (("shared", 3L, 2L, 3.0)))
    // g2: banana tf=3 cf=1 score=6; cherry tf=1 cf=1 (2.0) ties with
    // shared tf=2 cf=2 (2.0) and wins the word-asc tiebreak
    assert(r(("g2", 1L)) == (("banana", 3L, 1L, 6.0)))
    assert(r(("g2", 2L)) == (("cherry", 1L, 1L, 2.0)))
  }

  test("gopherFlags: metrics exact, rules catch repetition and length") {
    import spark.implicits._
    val df = Seq(
      (1L, Array.fill(30)("word").mkString(" ")),        // pure repetition
      (2L, (1 to 30).map(i => s"w$i").mkString(" ")),    // fully diverse
      (3L, "too short"),                                 // under min words
      (4L, "")                                           // empty
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherFlags(df).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("word_count") == 30L)
    assert(r(1L).getAs[Double]("top_word_ratio") == 1.0)
    assert(r(1L).getAs[Double]("distinct_ratio") == 1.0 / 30)
    assert(!r(1L).getAs[Boolean]("r_repetition"))
    assert(!r(1L).getAs[Boolean]("quality_pass"))
    assert(r(2L).getAs[Double]("distinct_ratio") == 1.0)
    assert(r(2L).getAs[Boolean]("r_diversity"))
    assert(r(2L).getAs[Boolean]("quality_pass"))
    assert(!r(3L).getAs[Boolean]("r_word_count"))
    assert(!r(3L).getAs[Boolean]("quality_pass"))
    // empty doc: ratios 0, every rule false — never null-poisoned
    assert(r(4L).getAs[Long]("word_count") == 0L)
    assert(r(4L).getAs[Double]("top_word_ratio") == 0.0)
    assert(!r(4L).getAs[Boolean]("quality_pass"))
  }

  test("gopherFlags and topTermsPerGroup: nulls never poison or skew") {
    import spark.implicits._
    val withNullText = Seq((1L, Option.empty[String]), (2L, Some("real text here")))
      .toDF("doc_id", "text")
    val g = TextAnalysis.gopherFlags(withNullText).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(g(1L).getAs[Long]("word_count") == 0L)
    assert(g(1L).getAs[Boolean]("quality_pass") == false, "null text → false, not null")
    // a null group must not inflate the group count (SQL COUNT(DISTINCT))
    val withNullGrp = Seq(
      (1L, "alpha beta", Some("g1")), (2L, "alpha gamma", Some("g2")),
      (3L, "noise words", Option.empty[String])
    ).toDF("doc_id", "text", "src")
    val t = TextAnalysis.topTermsPerGroup(withNullGrp, "src", "text", topK = 10)
      .collect()
    assert(!t.exists(r => r.isNullAt(0)), "no null-group rows")
    // alpha: tf=1 cf=2 over nGroups=2 → score 1.0 (3 groups would give 1.5)
    val alpha = t.find(r => r.getString(0) == "g1" && r.getString(2) == "alpha").get
    assert(alpha.getDouble(5) == 1.0)
  }

  test("repetitionMetrics: hand-computed gram ratios, short/null docs safe") {
    import spark.implicits._
    val df = Seq(
      // "a b a b a" → bigrams [a b, b a, a b, b a]: top 2/4, all dup 4/4
      //             → trigrams [a b a, b a b, a b a]: top 2/3, dup 2/3
      (1L, Some("a b a b a")),
      (2L, Some((1 to 20).map(i => s"w$i").mkString(" "))), // no repeats
      (3L, Some("solo")),                                   // no grams at all
      (4L, Option.empty[String])
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionMetrics(df).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_bigrams") == 4L)
    assert(r(1L).getAs[Double]("top_bigram_ratio") == 0.5)
    assert(r(1L).getAs[Double]("dup_bigram_frac") == 1.0)
    assert(r(1L).getAs[Long]("n_trigrams") == 3L)
    assert(r(1L).getAs[Double]("top_trigram_ratio") == 2.0 / 3)
    assert(r(1L).getAs[Double]("dup_trigram_frac") == 2.0 / 3)
    assert(!r(1L).getAs[Boolean]("repetition_pass"))
    assert(r(2L).getAs[Long]("n_bigrams") == 19L)
    assert(r(2L).getAs[Double]("dup_bigram_frac") == 0.0)
    // 19 unique bigrams → top ratio 1/19 > 0.08 fails r_top_bigram; that's
    // the documented small-doc behavior (ratio thresholds assume real docs)
    assert(r(2L).getAs[Boolean]("r_dup_bigram"))
    // single-word and null docs: zero grams, ratios 0, pass (nothing repeats)
    for (id <- Seq(3L, 4L)) {
      assert(r(id).getAs[Long]("n_bigrams") == 0L)
      assert(r(id).getAs[Double]("top_bigram_ratio") == 0.0)
      assert(r(id).getAs[Boolean]("repetition_pass"))
    }
  }

  test("compressionRatio: repetitive text flagged, normal text passes") {
    import spark.implicits._
    val df = Seq(
      (1L, "ab " * 400),                      // pure repetition -> tiny ratio
      (2L, (0 until 300).map(i =>
        s"w${i * 7919 % 1000}x${i}").mkString(" ")), // varied -> high ratio
      (3L, "")                                // empty -> ratio 1.0, pass
    ).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(df, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = got(1L).getAs[Double]("compress_ratio")
    val r2 = got(2L).getAs[Double]("compress_ratio")
    assert(r1 < 0.1, s"repetition must compress hard: $r1")
    assert(!got(1L).getAs[Boolean]("entropy_pass"))
    assert(r2 > 0.3 && got(2L).getAs[Boolean]("entropy_pass"), s"r2=$r2")
    assert(got(3L).getAs[Double]("compress_ratio") == 1.0 &&
      got(3L).getAs[Boolean]("entropy_pass"))
    // byte accounting is exact: lz4_bytes is a real compressed size
    assert(got(1L).getAs[Long]("lz4_bytes") > 0L)
    assert(got(1L).getAs[Long]("n_bytes") == 1200L)
  }

  test("termNovelty: first introduction wins, repeats inside a doc count once") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta alpha"),   // introduces alpha, beta    -> 2/2
      (2L, "beta gamma"),         // introduces gamma          -> 1/2
      (3L, "alpha beta gamma"),   // nothing new               -> 0/3
      (4L, "")                    // no words -> no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.termNovelty(df, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_terms"), r.getAs[Long]("n_new"),
          r.getAs[Double]("novelty")))).toMap
    assert(got == Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((3L, 0L, 0.0))))
  }
}
