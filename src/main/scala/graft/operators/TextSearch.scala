package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational keyword search: BM25-family scoring of a fixed query-term
  * set over the corpus, entirely as column expressions — the "grep the
  * training set, ranked" tool (and the retrieval shape for corpus
  * inspection UIs). Okapi BM25 (Robertson et al., public method) with one
  * documented twist: the idf factor is the RATIO (N - df + 0.5)/(df + 0.5)
  * without the usual log — division of exact integer counts is
  * bit-identical across engines while ln() is libm-dependent, and the
  * per-term weight stays monotone in rarity (same trick as TF-ICF's
  * division-only weight).
  *
  * Cross-engine determinism contract (mirrored by the SQL oracle):
  *   - tokenization = lowercase split on single spaces, empties dropped;
  *   - per-term contributions are summed in the GIVEN term order by an
  *     explicit left-associative expression (never SUM over an exploded
  *     term relation, whose order is engine-defined);
  *   - b = 0.75 and the 0.5 offsets are exactly representable; k1 stays
  *     inside single multiplications so every operation is one IEEE op
  *     on identical operands.
  *
  * Scale shape: one narrow pass computes dl + per-term tf per document
  * (no token explosion); one tiny aggregation yields the corpus stats
  * (N, avgdl, per-term df) collected as a single driver row and embedded
  * as literals; the scored scan then sorts top-k (TakeOrderedAndProject,
  * no full sort). Nothing shuffles except the final top-k reduction.
  */
object TextSearch {

  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    require(terms.distinct.size == terms.size, "query terms must be unique")
    require(topK >= 1, "topK must be >= 1")
    val toks = filter(split(lower(coalesce(col(textCol), lit(""))), " "),
      x => x =!= lit(""))
    // tokenize ONCE: the stats pass and the scoring pass both read the
    // materialized narrow (doc_id, dl, tf*) relation (~tens of bytes per
    // document) instead of re-scanning and re-tokenizing the corpus;
    // localCheckpoint blocks are GC-reclaimed with the plan
    val withTf = docs.select(
      col(idCol).cast("long").as("doc_id") +:
        size(toks).as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).as(s"tf_$i")
        }: _*)
      .localCheckpoint(true)

    // corpus stats: one aggregation, one driver row, embedded as literals
    val statAggs =
      sum(col("dl")).as("sumdl") +:
        terms.indices.map(i =>
          sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i"))
    val s = withTf.agg(count(lit(1)).as("n"), statAggs: _*).head()
    val n = s.getLong(0)
    require(n > 0, "empty corpus")
    val avgdl = s.getLong(1).toDouble / n.toDouble
    val dfs = terms.indices.map(i => s.getLong(2 + i))

    // norm shared across terms; (1 - b) folded exactly when b is
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))
    val contribs = terms.indices.map { i =>
      val idf = (n - dfs(i) + 0.5) / (dfs(i) + 0.5)
      lit(idf) * (col(s"tf_$i") * lit(k1 + 1.0)) / (col(s"tf_$i") + norm)
    }
    val nHits = terms.indices.map(i => col(s"tf_$i")).reduce(_ + _)
    withTf
      .withColumn("score", contribs.reduce(_ + _))
      .withColumn("n_hits", nHits.cast("long"))
      .filter(col("n_hits") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
      .select(col("doc_id"), col("score"), col("n_hits"))
  }
}
