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

  /** Bloom-gated variant of [[report]] with IDENTICAL output, for when the
    * benchmark gram set is too large to broadcast exactly (a 10^9-gram
    * blocklist is ~16+ GB as an exact broadcast hash set but ~1.2 GB as a
    * Bloom filter at 1% fpp). Three-stage shape:
    *
    *   1. per-doc gram counts come from a NARROW map over the corpus (one
    *      row in, one row out — no gram explosion, no shuffle);
    *   2. the Bloom filter (built distributed, merged on the driver,
    *      re-broadcast) prunes the exploded gram stream to candidates —
    *      false negatives are impossible, so no hit is lost;
    *   3. only the surviving ~fpp fraction of grams pays the exact join
    *      against the benchmark set (AQE broadcasts whichever side is
    *      small), which removes the false positives.
    *
    * Result is therefore exact for ANY fpp; fpp only tunes how much work
    * stage 3 does. Versus [[report]], the full-corpus gram shuffle is
    * replaced by a shuffle of bloom survivors only.
    */
  /** The REVERSE direction of [[report]]: per BENCHMARK document, how
    * much of it leaked into the corpus — n-gram coverage against the
    * corpus's distinct gram set. report answers "which training docs are
    * contaminated"; this answers the eval-integrity question "how much
    * of my benchmark does the corpus already contain" (a benchmark whose
    * items are fully covered is not measuring generalization).
    *
    * Scale shape: the corpus gram set is the big side — ONE distinct
    * shuffle on gram, then a gram-keyed semi-style left join against the
    * (small) benchmark gram relation and a per-bench-doc rollup. All
    * counts integer; coverage_bp is an integer basis-point division.
    */
  def benchCoverage(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1, "gram size k must be >= 1")
    val corpusGramSet = Dedupe.gramRows(corpus, col(idCol), col(textCol), k)
      .select(col("gram")).distinct()
    Dedupe.gramRows(bench, col(benchIdCol), col(benchTextCol), k)
      .join(corpusGramSet.withColumn("__hit", lit(1)), Seq("gram"), "left")
      .groupBy(col("id"))
      .agg(first(col("n_grams")).as("n_grams"),
        count(col("__hit")).as("n_found"))
      .select(
        col("id").as("bench_id"),
        col("n_grams").cast("long").as("n_grams"),
        col("n_found"),
        call_function("div", col("n_found") * 10000L,
          col("n_grams").cast("long")).as("coverage_bp"),
        (col("n_found") === col("n_grams").cast("long")).as("fully_covered"))
  }

  def bloomReport(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      k: Int = 8,
      minHits: Long = 1L,
      fpp: Double = 0.01): DataFrame = {
    require(k >= 1, "gram size k must be >= 1")
    require(minHits >= 1, "minHits must be >= 1")
    require(fpp > 0.0 && fpp < 1.0, "fpp must be in (0, 1)")
    val session = corpus.sparkSession
    import session.implicits._

    val benchGrams = Dedupe
      .gramRows(bench, monotonically_increasing_id(), col(benchTextCol), k)
      .select(col("gram")).distinct()
    // cache only across the two eager jobs (count + bloom build), then
    // release: a permanent cache would pin executor memory for the rest
    // of the session. The lazy exact join below recomputes the small
    // bench side once instead.
    benchGrams.cache()
    val bf =
      try benchGrams.stat.bloomFilter("gram", math.max(benchGrams.count(), 1L), fpp)
      finally benchGrams.unpersist(blocking = false)
    // the probe is Spark's own codegen BloomFilterMightContain predicate
    // (the expression runtime row-level filtering injects), fed the
    // serialized filter as a binary literal: a primitive long→boolean
    // path inside WholeStageCodegen, vs the boxing ScalaUDF bridge. The
    // literal rides the task binary exactly like a UDF closure capture
    // would, so the broadcast/cleanup story is unchanged.
    val serializedBf = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    def bloomHit(value: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.catalyst.expressions.Literal(
            serializedBf, org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.GraftBridge.expression(value)))

    // stage 1: doc universe + distinct-gram counts, narrow (report's
    // output universe is docs with >= 1 gram; empty docs emit none)
    val base = corpus
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) => (id, Dedupe.wordGramHashes(text, k).length.toLong) }
      .toDF("id", "n_grams")
      .filter(col("n_grams") > 0)

    // stages 2+3: bloom prune, then exact-join the survivors
    val exactHits = Dedupe
      .gramRows(corpus, col(idCol), col(textCol), k)
      .filter(bloomHit(col("gram")))
      .join(benchGrams, Seq("gram"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("__nc"))

    val nc = coalesce(col("__nc"), lit(0L))
    base
      .join(exactHits, Seq("id"), "left")
      .select(
        col("id"),
        col("n_grams"),
        nc.as("n_contaminated"),
        (nc.cast("double") / col("n_grams").cast("double"))
          .as("contamination_ratio"),
        (nc >= minHits).as("is_contaminated"))
  }
}
