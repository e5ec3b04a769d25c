package graft.operators

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {
  import BpeTrain._

  test("mergePair: left-to-right non-overlapping, replace() semantics") {
    assert(mergePair(Array("a", "a", "a"), "a", "a").toSeq === Seq("aa", "a"))
    assert(mergePair(Array("a", "a", "a", "a"), "a", "a").toSeq === Seq("aa", "aa"))
    assert(mergePair(Array("x", "a", "a", "a", "y"), "a", "a").toSeq ===
      Seq("x", "aa", "a", "y"))
    assert(mergePair(Array("h", "e", "l", "l", "o"), "l", "l").toSeq ===
      Seq("h", "e", "ll", "o"))
    assert(mergePair(Array("h", "i"), "x", "y").toSeq === Seq("h", "i"))
    assert(mergePair(Array.empty[String], "a", "b").toSeq === Seq.empty)
  }

  test("codepoints: surrogate pairs stay whole") {
    assert(codepoints("héllo").toSeq === Seq("h", "é", "l", "l", "o"))
    val emoji = new String(Character.toChars(0x1F600))
    assert(codepoints(s"a${emoji}b").toSeq === Seq("a", emoji, "b"))
  }

  test("learn: hand-computed merges on a tiny corpus") {
    import spark.implicits._
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3  (the classic
    // Sennrich example shape). Pair counts, iteration 1:
    //   (e,s) = 6+3 = 9, (s,t) = 9, (w,e) = 2+6 = 8, (l,o) = 7, ...
    // tie (e,s) vs (s,t) at 9 -> lexicographic: "e" < "s" -> (e,s) first.
    val docs = Seq(
      Array.fill(5)("low").mkString(" "),
      Array.fill(2)("lower").mkString(" "),
      Array.fill(6)("newest").mkString(" "),
      Array.fill(3)("widest").mkString(" ")
    ).toDF("text")
    val merges = learn(docs, "text", 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges(0) === ((0L, "e", "s", 9L)))
    assert(merges(1) === ((1L, "es", "t", 9L)))
    // after (es,t): newest -> n e w est, widest -> w i d est — the
    // (w,e) pair inside newest is GONE (w now precedes est), so
    // (l,o) = 5+2 = 7 is the next max
    assert(merges(2) === ((2L, "l", "o", 7L)))
    assert(merges(3) === ((3L, "lo", "w", 7L)))
  }

  test("learn stops early when the vocab is fully merged") {
    import spark.implicits._
    val docs = Seq("ab ab ab").toDF("text")
    // "ab" collapses after one merge; no pairs remain
    val merges = learn(docs, "text", 10).collect()
    assert(merges.length === 1)
    assert(merges.head.getString(1) === "a" && merges.head.getString(2) === "b")
  }

  test("applyMerges tokenizes with the learned rules") {
    import spark.implicits._
    val docs = Seq("low low lower lowest").toDF("text")
    val merges = learn(docs, "text", 3).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val toks = applyMerges("lowest", merges)
    // whatever the learned order, applying all rules must reproduce a
    // segmentation that concatenates back to the word
    assert(toks.mkString === "lowest")
    assert(toks.length < "lowest".length)
  }

  test("local and distributed strategies learn identical merges") {
    val docs = docs0()
    val local = learn(docs, "text", 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // localVocabLimit = 0 forces the distributed path on the same corpus
    val dist = learn(docs, "text", 6, localVocabLimit = 0).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(local.toSeq === dist.toSeq)
  }

  test("tokenize: learned merges compress the corpus, counts are exact") {
    import spark.implicits._
    val docs = Seq((0L, "low low low"), (1L, "lowest"), (2L, ""))
      .toDF("doc_id", "text")
    val out = tokenize(docs, "text", "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // merges on this corpus: (l,o) f=4, then (lo,w) f=4
    // doc0: 3 words "low" -> 1 token each = 3 tokens, 9 codepoints
    assert(out(0) === ((0L, 3L, 9L)))
    // doc1: "lowest" -> low e s t = 4 tokens, 6 codepoints
    assert(out(1) === ((1L, 4L, 6L)))
    assert(out(2) === ((2L, 0L, 0L)))
  }

  test("learn over the sf0.001 documents matches the DuckDB-prototyped head") {
    // the oracle prototype (same semantics, run against the same file)
    // produced: er/4650, or/2880, in/2858, ow/2763, st/2721, lu/1928 —
    // pin the first three so a semantics drift in either engine fails here
    val merges = learn(docs0(), "text", 3).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges(0) === (("e", "r", 4650L)))
    assert(merges(1) === (("o", "r", 2880L)))
    assert(merges(2) === (("i", "n", 2858L)))
  }

  private def docs0() = spark.read.parquet(sf() + "/documents.parquet")
}
