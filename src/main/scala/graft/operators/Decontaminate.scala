package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene pass that flags
  * corpus documents sharing word n-grams with a held-out evaluation set,
  * so eval answers don't leak into training data (the n-gram-overlap
  * method popularized by the GPT-2/GPT-3 and C4 dataset reports; public
  * method, public knowledge).
  *
  * Scale shape: the benchmark side is SMALL (eval suites are thousands of
  * documents, millions of grams at most) while the corpus is the 100 TB
  * side — so the gram join must BROADCAST the benchmark gram set and
  * stream the corpus grams through it narrowly; the only shuffle is the
  * per-document hit aggregation, keyed by doc id (and a partial-aggregate
  * map side combine makes that cheap). The corpus gram pass reuses
  * [[Dedupe.wordGramHashes]] — one tight kernel per document, no Generate
  * node (see the rationale there).
  */
object Decontaminate {

  /** Per-document contamination report against `bench`.
    *
    * @return one row per corpus document (including zero-hit documents):
    *         (id, n_grams, n_contaminated, contamination_ratio,
    *         is_contaminated); `is_contaminated` = at least `minHits`
    *         distinct grams shared with the benchmark.
    */
  def report(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      k: Int = 8,
      minHits: Long = 1L): DataFrame = {
    require(k >= 1, "gram size k must be >= 1")
    require(minHits >= 1, "minHits must be >= 1")
    val benchGrams = Dedupe
      .gramRows(bench, monotonically_increasing_id(), col(benchTextCol), k)
      .select(col("gram")).distinct()
    val corpusGrams = Dedupe.gramRows(corpus, col(idCol), col(textCol), k)

    // broadcast the small benchmark side, tag each corpus gram with a hit
    // marker (left join keeps zero-hit grams), then ONE per-doc shuffle
    // aggregates both the gram count and the hit count
    corpusGrams
      .join(broadcast(benchGrams.withColumn("__hit", lit(1))), Seq("gram"), "left")
      .groupBy(col("id"))
      .agg(first(col("n_grams")).as("n_grams"),
        count(col("__hit")).as("n_contaminated"))
      .select(
        col("id"),
        col("n_grams").cast("long").as("n_grams"),
        col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_grams").cast("double"))
          .as("contamination_ratio"),
        (col("n_contaminated") >= minHits).as("is_contaminated"))
  }
}
