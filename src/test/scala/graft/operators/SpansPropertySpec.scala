package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style validation of the span family against a SEQUENTIAL
  * reference model — the invariants the per-row DuckDB oracle can't see
  * across randomized inputs:
  *
  *  - detector soundness + completeness: reported spans are exactly the
  *    maximal runs of corpus-duplicated windows (a token is in a span iff
  *    covered by a duplicated window);
  *  - cut soundness: a token is removed iff covered by a REDUNDANT
  *    occurrence (duplicated window that is not the corpus-earliest for
  *    its hash) — in particular the earliest occurrence is never cut on
  *    account of its OWN window, and no token outside a duplicated
  *    window is ever removed;
  *  - both builds (broadcast and forced-shuffle, the 100 TB path) equal
  *    the model exactly.
  *
  * Corpora are ScalaCheck-generated (seeded, deterministic): small vocab
  * for dense natural duplication, plus explicit cross-doc splices so
  * larger windows see real duplicated passages. Each window size batches
  * its corpora into ONE DataFrame with per-corpus token tags (cross-
  * corpus windows disjoint), so one distributed run validates all of
  * them — 150 corpora × 4 window sizes = 600 model comparisons per
  * build per operator.
  */
class SpansPropertySpec extends SparkSpec {

  private val Vocab = Vector("a", "b", "c", "d", "e", "f")
  private val CorporaPerW = 150

  /** One corpus: up to 8 docs of up to 30 vocab tokens; ~40% of docs
    * splice a ≥w-token slice of an earlier doc at a random offset.
    */
  private def corpusGen(w: Int, tag: String): Gen[Seq[(Long, String)]] = for {
    nDocs <- Gen.choose(1, 8)
    base <- Gen.listOfN(nDocs,
      Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, Gen.oneOf(Vocab))))
    plant <- Gen.listOfN(nDocs, Gen.choose(0, 99))
    picks <- Gen.listOfN(nDocs, for {
      a <- Gen.choose(0, 1 << 20); b <- Gen.choose(0, 1 << 20)
      c <- Gen.choose(0, 1 << 20)
    } yield (a, b, c))
  } yield {
    val docs = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
    var j = 0
    while (j < nDocs) {
      var toks = base(j).toVector.map(t => s"$t$tag")
      if (j > 0 && plant(j) < 40) {
        val (a, b, c) = picks(j)
        val src = docs(a % j)
        if (src.length >= w) {
          val start = b % (src.length - w + 1)
          val maxExtra = math.min(8, src.length - start - w) + 1
          val len = w + (c % maxExtra)
          val slice = src.slice(start, start + len)
          val ins = if (toks.isEmpty) 0 else b % (toks.length + 1)
          toks = toks.take(ins) ++ slice ++ toks.drop(ins)
        }
      }
      docs += toks
      j += 1
    }
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }.toSeq
  }

  /** Sequential reference: spans = maximal runs of duplicated-window
    * positions (1-based start, run + w − 1 tokens). Independent run-merge
    * logic — only the hash kernel is shared with the code under test.
    */
  private def modelSpans(
      docs: Seq[(Long, String)], w: Int): Set[(Long, Long, Long)] = {
    val wins = docs.map { case (id, t) => id -> Dedupe.windowHashes(t, w) }
    val cnt = scala.collection.mutable.HashMap.empty[Long, Long]
    for ((_, ws) <- wins; h <- ws) cnt(h) = cnt.getOrElse(h, 0L) + 1L
    val out = Set.newBuilder[(Long, Long, Long)]
    for ((id, ws) <- wins) {
      var i = 0
      while (i < ws.length) {
        if (cnt(ws(i)) > 1) {
          var e = i
          while (e + 1 < ws.length && cnt(ws(e + 1)) > 1) e += 1
          out += ((id, (i + 1).toLong, (e - i + w).toLong))
          i = e + 1
        } else i += 1
      }
    }
    out.result()
  }

  /** Sequential reference for the keep-earliest cut: global first
    * occurrence per duplicated hash in (doc_id, pos) order; a token is
    * cut iff covered by a non-earliest duplicated window.
    */
  private def modelCut(
      docs: Seq[(Long, String)], w: Int): Map[Long, (Long, Long, String)] = {
    val wins = docs.map { case (id, t) => id -> Dedupe.windowHashes(t, w) }.toMap
    val cnt = scala.collection.mutable.HashMap.empty[Long, Long]
    for ((_, ws) <- wins; h <- ws) cnt(h) = cnt.getOrElse(h, 0L) + 1L
    val first = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
    for ((id, _) <- docs.sortBy(_._1)) {
      val ws = wins(id)
      var i = 0
      while (i < ws.length) {
        if (!first.contains(ws(i))) first(ws(i)) = (id, (i + 1).toLong)
        i += 1
      }
    }
    docs.map { case (id, text) =>
      val words = Dedupe.tokenizeWords(text)
      val ws = wins(id)
      val cut = new Array[Boolean](words.length)
      var i = 0
      while (i < ws.length) {
        if (cnt(ws(i)) > 1 && first(ws(i)) != ((id, (i + 1).toLong))) {
          var t = i
          while (t < i + w) { cut(t) = true; t += 1 }
        }
        i += 1
      }
      val kept = words.indices.collect { case t if !cut(t) => words(t) }
      (id, (words.length.toLong, cut.count(identity).toLong,
        kept.mkString(" ")))
    }.toMap
  }

  /** Sequential reference for [[Dedupe.spanProvenance]]: maximal runs of
    * redundant windows, each reporting its first window's global keeper.
    */
  private def modelProvenance(
      docs: Seq[(Long, String)], w: Int): Set[(Long, Long, Long, Long, Long)] = {
    val wins = docs.map { case (id, t) => id -> Dedupe.windowHashes(t, w) }.toMap
    val cnt = scala.collection.mutable.HashMap.empty[Long, Long]
    for ((_, ws) <- wins.toSeq; h <- ws) cnt(h) = cnt.getOrElse(h, 0L) + 1L
    val first = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
    for ((id, _) <- docs.sortBy(_._1)) {
      val ws = wins(id)
      var i = 0
      while (i < ws.length) {
        if (!first.contains(ws(i))) first(ws(i)) = (id, (i + 1).toLong)
        i += 1
      }
    }
    val out = Set.newBuilder[(Long, Long, Long, Long, Long)]
    for ((id, _) <- docs) {
      val ws = wins(id)
      val red = (0 until ws.length).filter { i =>
        cnt(ws(i)) > 1 && first(ws(i)) != ((id, (i + 1).toLong))
      }
      var k = 0
      while (k < red.length) {
        var e = k
        while (e + 1 < red.length && red(e + 1) == red(e) + 1) e += 1
        val (kd, kp) = first(ws(red(k)))
        out += ((id, (red(k) + 1).toLong, (red(e) - red(k) + w).toLong, kd, kp))
        k = e + 1
      }
    }
    out.result()
  }

  test("spans + cut match the sequential model over 600 generated corpora, both builds") {
    import spark.implicits._
    for (w <- Seq(1, 2, 3, 5)) {
      // one tagged DataFrame per window size: corpus k's tokens carry
      // suffix k, so cross-corpus windows never collide and one
      // distributed run decides every corpus at once
      val corpora = (0 until CorporaPerW).map { k =>
        val docs = corpusGen(w, s"$k").pureApply(
          Gen.Parameters.default, Seed(w * 100000L + k))
        k -> docs.map { case (j, t) => (k * 100L + j, t) }
      }
      val all = corpora.flatMap(_._2)
      val df = all.toDF("doc_id", "text").repartition(4)

      val wantSpans = corpora.flatMap { case (_, docs) => modelSpans(docs, w) }.toSet
      val wantCut = corpora.flatMap { case (_, docs) => modelCut(docs, w) }.toMap
      val wantProv = corpora.flatMap { case (_, docs) => modelProvenance(docs, w) }.toSet
      assert(wantSpans.nonEmpty, s"w=$w fixture generated no duplicates — weak test")
      val baseDf = df.filter(org.apache.spark.sql.functions.col("doc_id") % 100 < 4)
      val batchDf = df.filter(org.apache.spark.sql.functions.col("doc_id") % 100 >= 4)
      val incIdx = Dedupe.windowIndex(baseDf, "text", windowTokens = w)

      for (bcLimit <- Seq(Long.MaxValue, 0L)) {
        val tagB = if (bcLimit == 0L) "shuffle" else "broadcast"
        val gotSpans = Dedupe
          .duplicateSpans(df, "doc_id", "text", windowTokens = w,
            broadcastDupLimit = bcLimit)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(gotSpans == wantSpans,
          s"w=$w $tagB spans diverge from model: " +
            s"extra=${(gotSpans -- wantSpans).take(5)} " +
            s"missing=${(wantSpans -- gotSpans).take(5)}")
        val gotCut = Dedupe
          .cutDuplicateSpans(df, "doc_id", "text", windowTokens = w,
            broadcastDupLimit = bcLimit)
          .collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
          .toMap
        assert(gotCut == wantCut, {
          val bad = gotCut.collect {
            case (id, v) if wantCut.get(id) != Some(v) =>
              s"doc $id got $v want ${wantCut.get(id)}"
          }
          s"w=$w $tagB cut diverges from model: ${bad.take(3).mkString("; ")}"
        })
        val gotProv = Dedupe
          .spanProvenance(df, "doc_id", "text", windowTokens = w,
            broadcastDupLimit = bcLimit)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4)))
          .toSet
        assert(gotProv == wantProv,
          s"w=$w $tagB provenance diverges from model: " +
            s"extra=${(gotProv -- wantProv).take(5)} " +
            s"missing=${(wantProv -- gotProv).take(5)}")
        // incremental refresh: per-corpus docs j<4 are the base, j>=4 the
        // batch (base ids < batch ids within each corpus; cross-corpus
        // windows disjoint, so the per-corpus contract is the global
        // one). Must equal the full cut restricted to batch docs.
        val gotInc = Dedupe
          .cutSpansIncremental(incIdx, batchDf, "doc_id", "text",
            windowTokens = w, broadcastDupLimit = bcLimit)
          .collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
          .toMap
        val wantInc = wantCut.filter { case (id, _) => id % 100 >= 4 }
        assert(gotInc == wantInc, {
          val bad = gotInc.collect {
            case (id, v) if wantInc.get(id) != Some(v) =>
              s"doc $id got $v want ${wantInc.get(id)}"
          }
          s"w=$w $tagB incremental diverges from full-cut: " +
            s"${bad.take(3).mkString("; ")} " +
            s"(missing=${(wantInc.keySet -- gotInc.keySet).take(5)})"
        })
      }
    }
  }
}
