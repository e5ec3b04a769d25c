package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedupe, KMeansExact, Pca, Similarity}

/** Similarity-search query catalog over the `embeddings` table
  * (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).
  */
object SimilarityQueries {

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  private val QueryIds: Seq[Long] = (0L until 8L)

  private def annBrute(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.bruteForceTopK(emb(spark, sfDir), "vec_id", "embedding", QueryIds, k = 5)

  private def annIvf(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.ivfTopK(emb(spark, sfDir), "vec_id", "embedding", QueryIds, k = 5,
      assignSink = df => Queries.oracleSide(spark, sfDir, "ivf_assign", df),
      probeSink = df => Queries.oracleSide(spark, sfDir, "ivf_probes", df))

  /** IVF-PQ: coarse buckets + product-quantized codes, integer ADC
    * scoring (catalog params: 8 subspaces × 8 dims, 16 codes each). The
    * trained state (codes, codebooks, probes) persists as side tables;
    * the oracle re-derives candidates, the scaled ADC dot, and the
    * ranking from them in pure integer arithmetic.
    */
  private def annIvfPq(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.ivfPqTopK(emb(spark, sfDir), "vec_id", "embedding", QueryIds, k = 5,
      codesSink = df => Queries.oracleSide(spark, sfDir, "pq_codes", df),
      booksSink = df => Queries.oracleSide(spark, sfDir, "pq_books", df),
      probesSink = df => Queries.oracleSide(spark, sfDir, "pq_probes", df))

  /** Incremental IVF maintenance ([[graft.operators.Similarity
    * .ivfAppendAssign]]): vec_id % 4 == 2 plays the newly-arrived batch,
    * the rest the already-indexed corpus. The quantizer trains on the
    * BASE only (the pre-existing index state, [[graft.operators
    * .KMeansExact]] integer-exact Lloyd's); the fold then assigns new
    * vectors to their nearest FROZEN centroid and appends — no retrain,
    * and the fold's plan touches only the batch plus ≤ k rows of bucket
    * metadata. The oracle REPLAYS the frozen-centroid assignment from
    * the persisted integer centroids (argmin dist2, tie to lowest
    * bucket) — unlike ann_ivf_topk it does not take the assignment on
    * faith — and rebuilds before/after bucket sizes from the persisted
    * base assignment.
    */
  private def annIvfIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val all = emb(spark, sfDir)
    val base = all.filter(col("vec_id") % 4 =!= 2)
    val newBatch = all.filter(col("vec_id") % 4 === 2)
    val model = KMeansExact.fit(base, "vec_id", "embedding", k = 8, iters = 2)
    Queries.oracleSide(spark, sfDir, "ivf_inc_cents",
      KMeansExact.centroidsDF(spark, model.centroids))
    val baseAssign = Queries.oracleSide(spark, sfDir, "ivf_inc_base",
      KMeansExact.assign(base, "vec_id", "embedding", model.centroids)
        .select(col("cluster").as("bucket"), col("id")))
    val baseCounts = baseAssign.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_base"))
    Similarity.ivfAppendAssign(newBatch, "vec_id", "embedding",
        model.centroids, baseCounts)
      .withColumnRenamed("id", "vec_id")
  }

  /** IVF recall evaluation — recall@5 of the coarse-quantizer search
    * against the brute-force cosine truth, per query (the
    * ship-the-measurement discipline of dedup_lsh_eval applied to ANN:
    * the spec suite asserts recall once at build time, this measures it
    * on the ACTUAL corpus every run). Both inputs are the already-oracled
    * catalog relations; the oracle recomputes the overlap from their
    * shared SQL bodies.
    */
  private def recallAgainstExact(
      spark: SparkSession, sfDir: String, approx0: DataFrame): DataFrame = {
    val exact = annBrute(spark, sfDir).select(col("query_id"), col("neighbor_id"))
    val approx = approx0.select(col("query_id"), col("neighbor_id"))
      .withColumn("hit", lit(1L))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), coalesce(sum(col("hit")), lit(0L)).as("hits"))
      .select(col("query_id"), col("k"), col("hits"),
        call_function("div", col("hits") * 10000L, col("k")).as("recall_bp"))
  }

  private def annRecallEval(spark: SparkSession, sfDir: String): DataFrame =
    recallAgainstExact(spark, sfDir, annIvf(spark, sfDir))

  /** IVF-PQ recall@5 vs the same brute-force cosine truth — unlike
    * ann_recall_eval (probe coverage only), this also prices the
    * QUANTIZATION loss: candidates come from the same probes, but the
    * ranking runs on 8-bit ADC codes instead of full vectors, so the
    * delta between the two evals is what the 16x code compression costs
    * in ranking fidelity.
    */
  private def annPqRecallEval(spark: SparkSession, sfDir: String): DataFrame =
    recallAgainstExact(spark, sfDir, annIvfPq(spark, sfDir))

  private def nearDups(spark: SparkSession, sfDir: String): DataFrame =
    Dedupe.embeddingNearDups(emb(spark, sfDir), "vec_id", "embedding", dim = 64,
      planes = 8, minCosine = 0.3,
      sigSink = df => Queries.oracleSide(spark, sfDir, "emb_sigs", df))

  /** Oracle-able projection of the embedding table: dimensions + label
    * counts (integer-only — DuckDB len(list) parity).
    */
  private def embDims(spark: SparkSession, sfDir: String): DataFrame =
    emb(spark, sfDir)
      .groupBy(col("label"), size(col("embedding")).cast("long").as("dim"))
      .agg(count(lit(1)).as("n_vectors"))

  /** Exact top-k by quantized dot product — the similarity-search operator
    * with a cell-exact DuckDB oracle: both engines quantize floats to
    * floor(x*1000 + 0.5) BIGINTs. Floor semantics (not HALF_UP round) is
    * deliberate: floats like odd/16 DO land exactly on k+0.5 after *1000,
    * and round-half-away differs between ties at negative values across
    * engines, while floor(x+0.5) is one unambiguous function everywhere.
    */
  private def annDotExact(spark: SparkSession, sfDir: String): DataFrame = {
    val base = emb(spark, sfDir)
    val q = base.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0)
    val qArr = array(q.map(f =>
      lit(math.floor(f.toDouble * 1000 + 0.5).toLong)): _*)
    base
      .filter(col("vec_id") =!= 0L)
      .withColumn("dot_scaled",
        aggregate(
          zip_with(col("embedding"), qArr,
            (x, y) => floor(x.cast("double") * 1000 + 0.5).cast("long") * y),
          lit(0L), (acc, x) => acc + x))
      .orderBy(col("dot_scaled").desc, col("vec_id").asc)
      .limit(5)
      .select(col("vec_id"), col("dot_scaled"))
  }

  /** Exact all-pairs near-duplicate baseline in pure integer arithmetic:
    * quantize each embedding to floor(x*1000 + 0.5) BIGINTs, then emit
    * pairs with cosine >= 0.3 via the cross-multiplied integer inequality
    * 100·dot² >= 9·‖a‖²·‖b‖² (dot > 0) — no float division or sqrt, so the
    * DuckDB oracle is cell-exact. This is the oracle/recall baseline for
    * `emb_neardup` (whose LSH candidates are the 100 TB scale path); the
    * all-pairs join is only viable at catalog scale and says so.
    */
  private def embNearDupExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // broadcast the quantized corpus and run the O(n²) dot products as
    // primitive-array loops, one task per left row stripe — 2M pairs of
    // 64-long dots is ~0.1 s of ALU, but would cost minutes as a
    // nested-loop JOIN decoding two array columns per pair. The corpus
    // collect is the op's documented scale bound (this is the exact
    // baseline; emb_neardup's LSH is the 100 TB path).
    val data = emb(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000 + lit(0.5)).cast("long")).as("qv"))
      .as[(Long, Array[Long])]
      .collect()
      .sortBy(_._1)
    // overflow safety for the 100·dot² >= 9·na·nb inequality: with
    // |q| <= 2000 and dim 64, 100·dot² <= 6.6e18 < Long.MaxValue. Beyond
    // that the Scala side would wrap silently while the DuckDB oracle
    // (HUGEINT) errors loudly — fail loudly on BOTH sides instead.
    val maxAbs = data.iterator.flatMap(_._2.iterator)
      .foldLeft(0L)((m, v) => math.max(m, math.abs(v)))
    require(maxAbs <= 2000L,
      s"quantized embedding component $maxAbs exceeds the overflow-safe " +
        "bound 2000 (embeddings must be within [-2, 2] at scale 1000)")
    val norms = data.map { case (_, qv) =>
      var s = 0L; var i = 0
      while (i < qv.length) { s += qv(i) * qv(i); i += 1 }
      s
    }
    val bc = spark.sparkContext.broadcast((data, norms))
    spark
      .createDataset(data.indices.toSeq)
      .repartition(math.max(1, spark.sparkContext.defaultParallelism))
      .flatMap { i =>
        val (d, n2) = bc.value
        val (idA, qa) = d(i)
        val na = n2(i)
        ((i + 1) until d.length).iterator.flatMap { j =>
          val (idB, qb) = d(j)
          var dot = 0L
          var k = 0
          while (k < qa.length) { dot += qa(k) * qb(k); k += 1 }
          if (dot > 0 && 100L * dot * dot >= 9L * na * n2(j))
            Some((idA, idB, dot, na, n2(j)))
          else None
        }
      }
      .toDF("id_a", "id_b", "dot_scaled", "norm2_a", "norm2_b")
  }

  /** SemDeDup (Abbas et al. 2023) over the embeddings table: coarse
    * k-means clusters, within-cluster cosine pruning. The trained
    * assignment persists as a side table; the oracle re-derives the
    * within-cluster pairs, the float cosine (bit-identical list_sum
    * accumulation), and the min-partner canonical labels from it.
    */
  private def semDedup(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.semanticDedup(emb(spark, sfDir), "vec_id", "embedding",
      threshold = 0.4, numCentroids = 8,
      assignSink = df => Queries.oracleSide(spark, sfDir, "sem_assign", df))

  // ------------------------------------------------------------- k-means

  /** Catalog parameters for the full (non-sample) clustering operator:
    * k matches the corpus's 10 labels; 5 Lloyd iterations.
    */
  private val KmK = 10
  private val KmIters = 5

  /** Final centroid set per sfDir, trained once per JVM (both k-means
    * queries and any later consumer share it). The centroids round-trip
    * through the `km_centroids` side table so the assignment provably
    * uses exactly the integers the oracle reads (longs — lossless).
    */
  private val kmCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Long]]]()

  private def kmCentroids(spark: SparkSession, sfDir: String): Array[Array[Long]] =
    kmCache.computeIfAbsent(sfDir, { _ =>
      val model = KMeansExact.fit(emb(spark, sfDir), "vec_id", "embedding",
        k = KmK, iters = KmIters)
      Queries.oracleSide(spark, sfDir, "km_centroids",
          KMeansExact.centroidsDF(spark, model.centroids))
        .select(col("cluster"), col("cw"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1)
        .map(_._2)
    })

  /** Distributed integer-exact Lloyd's assignment
    * ([[graft.operators.KMeansExact]]): every vector's cluster + exact
    * scaled squared distance. The oracle replays the assignment from the
    * persisted centroids in pure integer arithmetic.
    */
  private def embKmeans(spark: SparkSession, sfDir: String): DataFrame =
    KMeansExact.assign(emb(spark, sfDir), "vec_id", "embedding",
        kmCentroids(spark, sfDir))
      .withColumnRenamed("id", "vec_id")

  /** Cluster-balance / label-purity report over the k-means assignment —
    * the curation view (SemDeDup-style cluster-then-prune, mixture
    * rebalancing): per cluster its size, exact inertia, modal label and
    * purity. Modal tie breaks to the lowest label, mirroring the oracle's
    * `ORDER BY n DESC, label ASC`.
    */
  private def embClusterStats(spark: SparkSession, sfDir: String): DataFrame = {
    val a = embKmeans(spark, sfDir)
    val g = a.join(emb(spark, sfDir).select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("n"), sum(col("dist2_scaled")).as("inertia_part"))
    val tot = g.groupBy(col("cluster"))
      .agg(sum(col("n")).as("n_vectors"), sum(col("inertia_part")).as("inertia_scaled"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("n").desc, col("label").asc)
    val modal = g
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("cluster"), col("label").as("modal_label"), col("n").as("modal_count"))
    tot.join(modal, "cluster")
      .select(col("cluster"), col("n_vectors"), col("inertia_scaled"),
        col("modal_label"), col("modal_count"),
        (col("modal_count").cast("double") / col("n_vectors").cast("double")).as("purity"))
  }

  /** SemDeDup over the exact-k-means clusters: the same within-bucket
    * cosine pruning as `semantic_dedup`, but bucketed by the full-corpus
    * integer-exact Lloyd's model instead of a sampled quantizer — so the
    * oracle re-derives the buckets themselves from the persisted centroids
    * (nothing about the bucketing is taken on faith) and then replays the
    * pair pruning. Demonstrates the cluster-then-prune composition the
    * k-means operator exists for.
    */
  private def semDedupKmeans(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.semanticDedupFromAssignment(
      KMeansExact.assignWithVec(emb(spark, sfDir), "vec_id", "embedding",
        kmCentroids(spark, sfDir)),
      threshold = 0.4)

  /** Embedding sanity/outlier filter: integer-quantized squared norms
    * (the ann_dot_exact technique — exact in both engines) with fixed
    * acceptance bounds. The embedding-QA pass before any similarity
    * work: zero vectors, truncated rows, and exploded-magnitude vectors
    * all surface here first. The corpus is unit-normalized, so the
    * acceptance band is ±1% around (1000·1)² = 1e6; clean data flags
    * nothing and any preprocessing drift flags loudly.
    */
  private def embNorms(spark: SparkSession, sfDir: String): DataFrame =
    emb(spark, sfDir)
      .select(col("vec_id"),
        aggregate(
          transform(col("embedding"),
            x => floor(x.cast("double") * 1000 + lit(0.5)).cast("long")),
          lit(0L), (acc, q) => acc + q * q).as("norm2_scaled"))
      .withColumn("is_outlier",
        col("norm2_scaled") < 980000L || col("norm2_scaled") > 1020000L)

  /** Exact covariance numerators over the corpus ([[graft.operators.Pca
    * .covarianceDf]]): one narrow scan producing d(d+1)/2 rows of pure
    * integer moment sums — the distributed half of PCA. The oracle
    * recomputes every cell from the embeddings with the same quantizer.
    */
  private def embCovariance(spark: SparkSession, sfDir: String): DataFrame =
    Pca.covarianceDf(emb(spark, sfDir), "vec_id", "embedding")

  /** Shared 3-component PCA model per sfDir, trained once per JVM (the
    * projection, sign-bucket dedup, and any later consumer reuse it —
    * the kmCache discipline). The quantized eigenvectors round-trip
    * through the `pca_eigvecs` side table so every oracle replays from
    * exactly the integers the engine used.
    */
  private val pcaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Pca.CovStats, Array[Array[Double]])]()

  private def pcaModel(
      spark: SparkSession, sfDir: String): (Pca.CovStats, Array[Array[Double]]) = {
    val model = pcaCache.computeIfAbsent(sfDir, _ => {
      val st = Pca.covStats(emb(spark, sfDir), "vec_id", "embedding")
      (st, Pca.topEigvecs(st, components = 3)._1)
    })
    Queries.oracleSide(spark, sfDir, "pca_eigvecs",
      Pca.eigvecDf(emb(spark, sfDir), model._2))
    model
  }

  private def pcaVecs(spark: SparkSession, sfDir: String): Array[Array[Double]] =
    pcaModel(spark, sfDir)._2

  /** PCA projection onto the top-2 principal components ([[graft
    * .operators.Pca]]): covariance sweep → driver-local deterministic
    * power iteration (pinned sign, fixed start/iters) → exact long
    * projections in a second narrow pass. The quantized eigenvectors
    * persist as the `pca_eigvecs` side table; the oracle replays the
    * integer dot products from embeddings × that table, so the
    * distributed passes (both scans and the quantization) are verified
    * cell-exact while the d×d eigensolve stays a driver-local,
    * data-size-independent step (its correctness is spec-asserted via
    * the Rayleigh residual, not oracled — no SQL engine eigensolves).
    */
  private def embPcaProject(spark: SparkSession, sfDir: String): DataFrame =
    Pca.project(emb(spark, sfDir), "vec_id", "embedding",
      pcaVecs(spark, sfDir).take(2).map(_.map(Pca.qe)))

  /** SemDeDup over PCA sign-buckets ([[graft.operators.Pca.signBuckets]]):
    * vectors bucket by the sign bits of their exact projections onto the
    * top-3 principal axes (8 buckets splitting the corpus along its
    * highest-variance directions — deterministic LSH with no RNG), then
    * the same within-bucket cosine pruning as `semantic_dedup`. The
    * oracle re-derives the projections, the sign buckets, AND the pair
    * pruning from embeddings × the persisted eigenvector table — nothing
    * about the bucketing is taken on faith. Third bucketing family next
    * to the sampled quantizer (`semantic_dedup`) and exact k-means
    * (`semantic_dedup_kmeans`); at scale the component count (and so the
    * bucket fan-out 2^c) grows with the corpus.
    */
  private def semDedupPca(spark: SparkSession, sfDir: String): DataFrame = {
    val (st, vecs) = pcaModel(spark, sfDir)
    val qvecs = vecs.map(_.map(Pca.qe))
    Similarity.semanticDedupFromAssignment(
      Pca.signBuckets(emb(spark, sfDir), "vec_id", "embedding", qvecs,
        // MEAN split per axis (exact, from the moment sums — no extra
        // pass): a zero split on uncentered projections would collapse to
        // one bucket whenever the corpus mean is off-origin along an axis
        Pca.projectionCenters(st, qvecs)),
      threshold = 0.4,
      // the oracle replays within-bucket ALL-pairs; an over-cap bucket
      // would silently degrade to star pairs (the ADVICE r8 lesson), so
      // the catalog query disables the cap — the mean split keeps buckets
      // balanced at catalog scales (roughly-symmetric projections); the
      // true scale form grows the component count (2^c buckets), not the
      // bucket population
      maxBucketSize = Int.MaxValue)
  }

  /** Distributional outliers in PCA space — vectors whose exact top-2
    * projections sit far from the corpus mean (emb_norms flags bad
    * MAGNITUDES; this flags points far from the mass along the
    * highest-variance directions). Everything is integer: projections
    * are exact longs, and every division operates on NON-NEGATIVE
    * operands via a +OFFSET domain shift (OFFSET ≥ max|p| = d·1000·1e6),
    * because Spark's `div` truncates toward zero while DuckDB's `//`
    * floors — identical only when nothing is negative. dev_c =
    * |p'_c − (Σp'_c div n)| is the absolute deviation from the floored
    * integer mean (shift cancels exactly under floor division); a vector
    * flags when its total deviation exceeds 2× the corpus mean
    * deviation. Exactness bound: every per-row value and both sums stay
    * under n·2·OFFSET < 2⁶³ ⇒ n ≲ 7e7 rows at d = 64 (switch the sums
    * to DECIMAL beyond that). Two bounded aggregates over the projection
    * relation; vectors never shuffle.
    */
  private def embPcaOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val Off = 64000000000L // d·1000·1e6 at d=64: |p| can never exceed this
    // NOT cached: the projection is a cheap narrow scan and each of the
    // three consumers (two bounded aggregates + the final select) can
    // recompute it — a cache here would leak or force eager execution
    val proj = Pca.project(emb(spark, sfDir), "vec_id", "embedding",
        pcaVecs(spark, sfDir).take(2).map(_.map(Pca.qe)))
      .select(col("vec_id"), col("p0"), col("p1"),
        (col("p0") + Off).as("sp0"), (col("p1") + Off).as("sp1"))
    val stats = proj.agg(count(lit(1)).as("n"),
      sum(col("sp0")).as("s0"), sum(col("sp1")).as("s1"))
    // deviations against the FLOORED integer mean (sp - s div n), not the
    // n-scaled |n·sp − s| form: per-row values stay ≤ 2·OFFSET, so the
    // corpus-wide Σ total_dev is bounded by n·2·OFFSET — the same n ≲ 7e7
    // exactness envelope as the sp sums (the n-scaled form's Σ grows
    // ~n²·avg_dev and overflows Long around 1e5-1e6 rows)
    val withDev = proj.crossJoin(broadcast(stats))
      .withColumn("mean0", call_function("div", col("s0"), col("n")))
      .withColumn("mean1", call_function("div", col("s1"), col("n")))
      .withColumn("dev0", abs(col("sp0") - col("mean0")))
      .withColumn("dev1", abs(col("sp1") - col("mean1")))
      .withColumn("total_dev", col("dev0") + col("dev1"))
    val devTotal = withDev.agg(sum(col("total_dev")).as("t"),
      first(col("n")).as("n2"))
    withDev.crossJoin(broadcast(devTotal))
      .select(col("vec_id"), col("p0"), col("p1"), col("dev0"), col("dev1"),
        col("total_dev"),
        (col("total_dev") >
          lit(2L) * call_function("div", col("t"), col("n2")))
          .as("is_outlier"))
  }

  /** Incremental covariance maintenance — the `dedup_*_incremental`
    * pattern applied to the PCA state: [[graft.operators.Pca.CovStats]]
    * is a mergeable sketch (pure sums), so folding a new-vectors batch
    * (vec_id % 4 == 2, the ann_ivf_incremental split) into the persisted
    * base state is an exact ADD — no rescan of the base corpus, and the
    * merged output is bit-identical to a full recompute (spec-asserted;
    * the oracle independently re-derives the batch moments from
    * embeddings and adds them to the persisted base relation, so both
    * the base state and the additive merge are verified cell-exact).
    */
  private def embCovIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val all = emb(spark, sfDir)
    val base = all.filter(col("vec_id") % 4 =!= 2)
    val batch = all.filter(col("vec_id") % 4 === 2)
    val baseStats = Pca.covStats(base, "vec_id", "embedding")
    Queries.oracleSide(spark, sfDir, "cov_inc_base",
      Pca.statsDf(all, baseStats))
    val merged = Pca.merge(baseStats, Pca.covStats(batch, "vec_id", "embedding"))
    Pca.covDfFromStats(all, merged)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "semantic_dedup" -> semDedup _,
    "emb_norms" -> embNorms _,
    "emb_covariance" -> embCovariance _,
    "emb_pca_project" -> embPcaProject _,
    "emb_cov_incremental" -> embCovIncremental _,
    "emb_pca_outliers" -> embPcaOutliers _,
    "semantic_dedup_pca" -> semDedupPca _,
    "ann_cosine_topk" -> annBrute _,
    "ann_ivf_topk" -> annIvf _,
    "ann_recall_eval" -> annRecallEval _,
    "ann_pq_recall_eval" -> annPqRecallEval _,
    "ann_ivf_incremental" -> annIvfIncremental _,
    "ann_ivfpq_topk" -> annIvfPq _,
    "emb_neardup" -> nearDups _,
    "emb_neardup_exact" -> embNearDupExact _,
    "emb_dims" -> embDims _,
    "emb_drift" -> embDrift _,
    "emb_kmeans" -> embKmeans _,
    "emb_cluster_stats" -> embClusterStats _,
    "semantic_dedup_kmeans" -> semDedupKmeans _,
    "ann_dot_exact" -> annDotExact _
  )

  /** Embedding-distribution drift monitor
    * ([[graft.operators.DriftStats.centroidDrift]]): per-label centroid
    * L1 shift between the embeddings table and a deterministic next cut
    * (vec_id % 11 == 0 dropped; vec_id % 7 == 0 relabeled to
    * (label+1) % 10 — pure integer edits, so the snapshot itself is
    * engine-exact and the whole relation carries a cell-exact oracle).
    */
  private def embDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val old = emb(spark, sfDir)
    val next = old.filter(col("vec_id") % 11 =!= 0)
      .withColumn("label",
        when(col("vec_id") % 7 === 0, (col("label") + 1) % 10)
          .otherwise(col("label")))
    graft.operators.DriftStats.centroidDrift(old, next, "label", "embedding")
  }

  /** Sequential-double cosine between two FLOAT[] columns `a` and `b` —
    * the SQL twin of Similarity.cosine: per-element float→double casts,
    * left-to-right list_sum accumulation, sqrt norms, zero-norm → 0.
    * DuckDB's list_sum over list_transform accumulates in list order, so
    * the doubles are BIT-IDENTICAL to the Scala kernel's (verified
    * empirically over full corpora) — which is what lets float cosine
    * queries carry cell-exact oracles without quantization.
    */
  private def cosineSql(a: String, b: String): String =
    s"""CASE WHEN
       |  sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0
       |  OR sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0
       |THEN CAST(0 AS DOUBLE)
       |ELSE
       |  list_sum(list_transform(range(1, len($a) + 1),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |  / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |     * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
       |END""".stripMargin

  /** Shared k-means assignment replay: from the persisted integer
    * centroids, the exact scaled squared distance to every centroid and
    * the argmin with ties to the lowest cluster — pure BIGINT arithmetic,
    * the exact twin of [[graft.operators.KMeansExact.nearest]].
    */
  private def kmAssignSql: String =
    s"""c AS (
       |  SELECT cluster, cw FROM read_parquet('${Queries.oracleSidePath("km_centroids")}')),
       |qv AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings),
       |dd AS (
       |  SELECT qv.vec_id, c.cluster,
       |    CAST(list_sum(list_transform(range(1, len(qv.qv) + 1),
       |      i -> (qv.qv[i] - c.cw[i]) * (qv.qv[i] - c.cw[i]))) AS BIGINT) AS dist2
       |  FROM qv CROSS JOIN c),
       |asg AS (
       |  SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, dist2
       |  FROM (SELECT vec_id, cluster, dist2,
       |          ROW_NUMBER() OVER (PARTITION BY vec_id
       |            ORDER BY dist2 ASC, cluster ASC) AS rk
       |        FROM dd)
       |  WHERE rk = 1)""".stripMargin

  // def, not val: the SQL embeds oracleSidePath, which must resolve AFTER
  // Verify sets graft.oracle.sfbase / root — object-init-time vals bake in
  // the defaults before main() runs
  /** Shared by ann_cosine_topk and ann_recall_eval: the brute-force
    * cosine top-5 in pure SQL (def, not val — oracleSidePath timing).
    */
  private def AnnBruteSql: String =
    s"""WITH c AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |    ${cosineSql("a.embedding", "b.embedding")} AS cosine
      |  FROM embeddings a JOIN embeddings b
      |    ON a.vec_id IN (0, 1, 2, 3, 4, 5, 6, 7) AND b.vec_id <> a.vec_id),
      |r AS (
      |  SELECT query_id, neighbor_id, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id ASC) AS rank
      |  FROM c)
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
      |FROM r WHERE rank <= 5""".stripMargin

  /** Shared by ann_ivf_topk and ann_recall_eval: the IVF candidate
    * replay from the persisted assignment + probes.
    */
  private def AnnIvfSql: String =
    s"""WITH a AS (
      |  SELECT bucket, id FROM read_parquet('${Queries.oracleSidePath("ivf_assign")}')),
      |p AS (
      |  SELECT query_id, bucket FROM read_parquet('${Queries.oracleSidePath("ivf_probes")}')),
      |cand AS (
      |  SELECT DISTINCT p.query_id, a.id AS neighbor_id
      |  FROM p JOIN a USING (bucket) WHERE a.id <> p.query_id),
      |c AS (
      |  SELECT query_id, neighbor_id,
      |    ${cosineSql("eq.embedding", "en.embedding")} AS cosine
      |  FROM cand
      |  JOIN embeddings eq ON eq.vec_id = query_id
      |  JOIN embeddings en ON en.vec_id = neighbor_id),
      |r AS (
      |  SELECT query_id, neighbor_id, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id ASC) AS rank
      |  FROM c)
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
      |FROM r WHERE rank <= 5""".stripMargin

  /** Shared by ann_ivfpq_topk and ann_pq_recall_eval: the IVF-PQ
    * integer-ADC replay from the persisted codes/codebooks/probes.
    */
  private def AnnIvfPqSql: String =
    s"""WITH cds AS (
        |  SELECT bucket, id, codes FROM read_parquet('${Queries.oracleSidePath("pq_codes")}')),
        |bks AS (
        |  SELECT sub, code, cw FROM read_parquet('${Queries.oracleSidePath("pq_books")}')),
        |pr AS (
        |  SELECT query_id, bucket FROM read_parquet('${Queries.oracleSidePath("pq_probes")}')),
        |cand AS (
        |  SELECT DISTINCT p.query_id, c.id AS neighbor_id
        |  FROM pr p JOIN cds c USING (bucket) WHERE c.id <> p.query_id),
        |s AS (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    CAST(SUM(
        |      CAST(FLOOR(CAST(q.embedding[(m.m - 1) * 8 + j.j] AS DOUBLE) * 1000 + 0.5) AS BIGINT)
        |      * CAST(FLOOR(CAST(b.cw[j.j] AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS adc_dot_scaled
        |  FROM cand
        |  JOIN cds c ON c.id = cand.neighbor_id
        |  JOIN embeddings q ON q.vec_id = cand.query_id
        |  CROSS JOIN (SELECT UNNEST(range(1, 9)) AS m) m
        |  JOIN bks b ON b.sub = m.m - 1 AND b.code = c.codes[m.m]
        |  CROSS JOIN (SELECT UNNEST(range(1, 9)) AS j) j
        |  GROUP BY cand.query_id, cand.neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id, adc_dot_scaled,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY adc_dot_scaled DESC, neighbor_id ASC) AS rank
        |  FROM s)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adc_dot_scaled
        |FROM r WHERE rank <= 5""".stripMargin

  def oracles: Map[String, String] = Map(
    "emb_kmeans" ->
      s"""WITH $kmAssignSql
        |SELECT vec_id, cluster, dist2 AS dist2_scaled FROM asg""".stripMargin,
    "emb_cluster_stats" ->
      s"""WITH $kmAssignSql,
        |g AS (
        |  SELECT a.cluster, e.label, COUNT(*) AS n,
        |    CAST(SUM(a.dist2) AS BIGINT) AS inertia_part
        |  FROM asg a JOIN embeddings e ON e.vec_id = a.vec_id
        |  GROUP BY 1, 2),
        |tot AS (
        |  SELECT cluster, CAST(SUM(n) AS BIGINT) AS n_vectors,
        |    CAST(SUM(inertia_part) AS BIGINT) AS inertia_scaled
        |  FROM g GROUP BY 1),
        |m AS (
        |  SELECT cluster, label AS modal_label, CAST(n AS BIGINT) AS modal_count,
        |    ROW_NUMBER() OVER (PARTITION BY cluster
        |      ORDER BY n DESC, label ASC) AS rk
        |  FROM g)
        |SELECT t.cluster, t.n_vectors, t.inertia_scaled,
        |  m.modal_label, m.modal_count,
        |  CAST(m.modal_count AS DOUBLE) / CAST(t.n_vectors AS DOUBLE) AS purity
        |FROM tot t JOIN m ON m.cluster = t.cluster AND m.rk = 1""".stripMargin,
    "semantic_dedup_kmeans" ->
      s"""WITH $kmAssignSql,
        |p AS (
        |  SELECT x.vec_id AS id_a, y.vec_id AS id_b,
        |    ${cosineSql("ex.embedding", "ey.embedding")} AS cosine
        |  FROM asg x JOIN asg y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
        |  JOIN embeddings ex ON ex.vec_id = x.vec_id
        |  JOIN embeddings ey ON ey.vec_id = y.vec_id),
        |d AS (
        |  SELECT id_b AS vid, MIN(id_a) AS dup_of
        |  FROM p WHERE cosine >= 0.4 GROUP BY id_b)
        |SELECT a.vec_id AS id, a.cluster AS bucket,
        |  COALESCE(d.dup_of, a.vec_id) AS canonical_id,
        |  d.dup_of IS NOT NULL AS is_dup
        |FROM asg a LEFT JOIN d ON d.vid = a.vec_id""".stripMargin,
    "emb_norms" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
        |           * CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))) AS BIGINT)
        |      AS norm2_scaled
        |  FROM embeddings)
        |SELECT vec_id, norm2_scaled,
        |  norm2_scaled < 980000 OR norm2_scaled > 1020000 AS is_outlier
        |FROM q""".stripMargin,
    "emb_covariance" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
        |  FROM embeddings),
        |d AS (SELECT UNNEST(range(1,
        |    (SELECT MAX(len(embedding)) FROM embeddings) + 1)) AS ii),
        |pr AS (SELECT a.ii AS ia, b.ii AS ib FROM d a JOIN d b ON a.ii <= b.ii),
        |s AS (
        |  SELECT ia, ib, COUNT(*) AS n, SUM(v[ia]) AS s_i, SUM(v[ib]) AS s_j,
        |    SUM(v[ia] * v[ib]) AS s_ij
        |  FROM q CROSS JOIN pr GROUP BY 1, 2)
        |SELECT CAST(ia - 1 AS INT) AS i, CAST(ib - 1 AS INT) AS j,
        |  CAST(n AS BIGINT) AS n, CAST(s_i AS BIGINT) AS s_i,
        |  CAST(s_j AS BIGINT) AS s_j, CAST(s_ij AS BIGINT) AS s_ij,
        |  CAST(n * s_ij - s_i * s_j AS BIGINT) AS cov_num
        |FROM s""".stripMargin,
    "emb_pca_project" ->
      s"""WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
        |  FROM embeddings),
        |e AS (SELECT comp, i, eq
        |  FROM read_parquet('${Queries.oracleSidePath("pca_eigvecs")}')),
        |u AS (
        |  SELECT vec_id, comp, CAST(SUM(v[i + 1] * eq) AS BIGINT) AS p
        |  FROM q JOIN e ON TRUE GROUP BY 1, 2)
        |SELECT vec_id, MAX(CASE WHEN comp = 0 THEN p END) AS p0,
        |  MAX(CASE WHEN comp = 1 THEN p END) AS p1
        |FROM u GROUP BY vec_id""".stripMargin,
    "emb_cov_incremental" ->
      s"""WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
        |  FROM embeddings WHERE vec_id % 4 = 2),
        |d AS (SELECT UNNEST(range(1,
        |    (SELECT MAX(len(embedding)) FROM embeddings) + 1)) AS ii),
        |pr AS (SELECT a.ii AS ia, b.ii AS ib FROM d a JOIN d b ON a.ii <= b.ii),
        |s AS (
        |  SELECT ia, ib, COUNT(*) AS n, SUM(v[ia]) AS s_i, SUM(v[ib]) AS s_j,
        |    SUM(v[ia] * v[ib]) AS s_ij
        |  FROM q CROSS JOIN pr GROUP BY 1, 2),
        |base AS (SELECT i, j, n, s_i, s_j, s_ij
        |  FROM read_parquet('${Queries.oracleSidePath("cov_inc_base")}')),
        |m AS (
        |  SELECT base.i, base.j,
        |    base.n + s.n AS n, base.s_i + s.s_i AS s_i,
        |    base.s_j + s.s_j AS s_j, base.s_ij + s.s_ij AS s_ij
        |  FROM base JOIN s ON s.ia - 1 = base.i AND s.ib - 1 = base.j)
        |SELECT i, j, CAST(n AS BIGINT) AS n, CAST(s_i AS BIGINT) AS s_i,
        |  CAST(s_j AS BIGINT) AS s_j, CAST(s_ij AS BIGINT) AS s_ij,
        |  CAST(n * s_ij - s_i * s_j AS BIGINT) AS cov_num
        |FROM m""".stripMargin,
    "emb_pca_outliers" ->
      s"""WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
        |  FROM embeddings),
        |e AS (SELECT comp, i, eq
        |  FROM read_parquet('${Queries.oracleSidePath("pca_eigvecs")}')
        |  WHERE comp < 2),
        |u AS (
        |  SELECT vec_id, comp, CAST(SUM(v[i + 1] * eq) AS BIGINT) AS p
        |  FROM q JOIN e ON TRUE GROUP BY 1, 2),
        |pj AS (
        |  SELECT vec_id, MAX(CASE WHEN comp = 0 THEN p END) AS p0,
        |    MAX(CASE WHEN comp = 1 THEN p END) AS p1
        |  FROM u GROUP BY vec_id),
        |sh AS (SELECT vec_id, p0, p1,
        |  p0 + 64000000000 AS sp0, p1 + 64000000000 AS sp1 FROM pj),
        |st AS (SELECT COUNT(*) AS n, CAST(SUM(sp0) AS BIGINT) AS s0,
        |  CAST(SUM(sp1) AS BIGINT) AS s1 FROM sh),
        |d AS (
        |  SELECT vec_id, p0, p1,
        |    ABS(sp0 - s0 // n) AS dev0, ABS(sp1 - s1 // n) AS dev1,
        |    ABS(sp0 - s0 // n) + ABS(sp1 - s1 // n) AS total_dev
        |  FROM sh, st),
        |t AS (SELECT CAST(SUM(total_dev) AS BIGINT) AS t,
        |  COUNT(*) AS n2 FROM d)
        |SELECT vec_id, p0, p1, CAST(dev0 AS BIGINT) AS dev0,
        |  CAST(dev1 AS BIGINT) AS dev1, CAST(total_dev AS BIGINT) AS total_dev,
        |  total_dev > 2 * (t // n2) AS is_outlier
        |FROM d, t""".stripMargin,
    "semantic_dedup_pca" ->
      s"""WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
        |  FROM embeddings),
        |e AS (SELECT comp, i, eq
        |  FROM read_parquet('${Queries.oracleSidePath("pca_eigvecs")}')),
        |u AS (
        |  SELECT vec_id, comp, CAST(SUM(v[i + 1] * eq) AS BIGINT) AS p
        |  FROM q JOIN e ON TRUE GROUP BY 1, 2),
        |pj AS (
        |  SELECT vec_id, MAX(CASE WHEN comp = 0 THEN p END) AS p0,
        |    MAX(CASE WHEN comp = 1 THEN p END) AS p1,
        |    MAX(CASE WHEN comp = 2 THEN p END) AS p2
        |  FROM u GROUP BY vec_id),
        |cen AS (
        |  -- `//` (exact integer floor division, Math.floorDiv's twin) —
        |  -- `/` would go through DOUBLE and can mis-floor large sums
        |  SELECT
        |    CAST(SUM(CASE WHEN comp = 0 THEN p END)
        |      // COUNT(DISTINCT vec_id) AS BIGINT) AS c0,
        |    CAST(SUM(CASE WHEN comp = 1 THEN p END)
        |      // COUNT(DISTINCT vec_id) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN comp = 2 THEN p END)
        |      // COUNT(DISTINCT vec_id) AS BIGINT) AS c2
        |  FROM u),
        |a AS (
        |  SELECT vec_id AS id,
        |    (CASE WHEN p0 >= c0 THEN 4 ELSE 0 END
        |     + CASE WHEN p1 >= c1 THEN 2 ELSE 0 END
        |     + CASE WHEN p2 >= c2 THEN 1 ELSE 0 END) AS bucket
        |  FROM pj, cen),
        |p AS (
        |  SELECT x.id AS id_a, y.id AS id_b,
        |    ${cosineSql("ex.embedding", "ey.embedding")} AS cosine
        |  FROM a x JOIN a y ON x.bucket = y.bucket AND x.id < y.id
        |  JOIN embeddings ex ON ex.vec_id = x.id
        |  JOIN embeddings ey ON ey.vec_id = y.id),
        |dd AS (
        |  SELECT id_b AS id, MIN(id_a) AS dup_of
        |  FROM p WHERE cosine >= 0.4 GROUP BY id_b)
        |SELECT a.id, CAST(a.bucket AS BIGINT) AS bucket,
        |  COALESCE(dd.dup_of, a.id) AS canonical_id,
        |  dd.dup_of IS NOT NULL AS is_dup
        |FROM a LEFT JOIN dd USING (id)""".stripMargin,
    "semantic_dedup" ->
      s"""WITH a AS (
        |  SELECT bucket, id FROM read_parquet('${Queries.oracleSidePath("sem_assign")}')),
        |p AS (
        |  SELECT x.id AS id_a, y.id AS id_b,
        |    ${cosineSql("ex.embedding", "ey.embedding")} AS cosine
        |  FROM a x JOIN a y ON x.bucket = y.bucket AND x.id < y.id
        |  JOIN embeddings ex ON ex.vec_id = x.id
        |  JOIN embeddings ey ON ey.vec_id = y.id),
        |d AS (
        |  SELECT id_b AS id, MIN(id_a) AS dup_of
        |  FROM p WHERE cosine >= 0.4 GROUP BY id_b)
        |SELECT a.id, CAST(a.bucket AS BIGINT) AS bucket,
        |  COALESCE(d.dup_of, a.id) AS canonical_id,
        |  d.dup_of IS NOT NULL AS is_dup
        |FROM a LEFT JOIN d USING (id)""".stripMargin,
    "ann_cosine_topk" -> AnnBruteSql,
    "ann_recall_eval" ->
      s"""WITH exact AS ($AnnBruteSql),
        |approx AS ($AnnIvfSql),
        |j AS (
        |  SELECT e.query_id, e.neighbor_id,
        |    a.neighbor_id IS NOT NULL AS hit
        |  FROM exact e LEFT JOIN approx a
        |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id)
        |SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k,
        |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) * 10000 // COUNT(*)
        |    AS BIGINT) AS recall_bp
        |FROM j GROUP BY query_id""".stripMargin,
    "ann_ivf_incremental" ->
      s"""WITH c AS (
        |  SELECT cluster, cw FROM read_parquet('${Queries.oracleSidePath("ivf_inc_cents")}')),
        |nb AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id % 4 = 2),
        |dd AS (
        |  SELECT nb.vec_id, c.cluster,
        |    CAST(list_sum(list_transform(range(1, len(nb.qv) + 1),
        |      i -> (nb.qv[i] - c.cw[i]) * (nb.qv[i] - c.cw[i]))) AS BIGINT) AS dist2
        |  FROM nb CROSS JOIN c),
        |asg AS (
        |  SELECT vec_id, CAST(cluster AS BIGINT) AS bucket, dist2
        |  FROM (SELECT vec_id, cluster, dist2,
        |          ROW_NUMBER() OVER (PARTITION BY vec_id
        |            ORDER BY dist2 ASC, cluster ASC) AS rk
        |        FROM dd)
        |  WHERE rk = 1),
        |bc AS (
        |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_base
        |  FROM read_parquet('${Queries.oracleSidePath("ivf_inc_base")}') GROUP BY 1),
        |nc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_new
        |  FROM asg GROUP BY 1)
        |SELECT asg.vec_id, asg.bucket, asg.dist2 AS dist2_scaled,
        |  COALESCE(bc.n_base, 0) AS n_before,
        |  COALESCE(bc.n_base, 0) + nc.n_new AS n_after
        |FROM asg LEFT JOIN bc USING (bucket) JOIN nc USING (bucket)""".stripMargin,
    "ann_ivf_topk" -> AnnIvfSql,
    "ann_ivfpq_topk" -> AnnIvfPqSql,
    "ann_pq_recall_eval" ->
      s"""WITH exact AS ($AnnBruteSql),
        |approx AS ($AnnIvfPqSql),
        |j AS (
        |  SELECT e.query_id, e.neighbor_id,
        |    a.neighbor_id IS NOT NULL AS hit
        |  FROM exact e LEFT JOIN approx a
        |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id)
        |SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k,
        |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) * 10000 // COUNT(*)
        |    AS BIGINT) AS recall_bp
        |FROM j GROUP BY query_id""".stripMargin,

    "emb_neardup" ->
      s"""WITH s AS (
        |  SELECT id, sig FROM read_parquet('${Queries.oracleSidePath("emb_sigs")}')),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM s a JOIN s b ON a.sig = b.sig AND a.id < b.id),
        |c AS (
        |  SELECT id_a, id_b,
        |    ${cosineSql("ea.embedding", "eb.embedding")} AS cosine
        |  FROM p
        |  JOIN embeddings ea ON ea.vec_id = id_a
        |  JOIN embeddings eb ON eb.vec_id = id_b)
        |SELECT id_a, id_b, cosine FROM c WHERE cosine >= 0.3""".stripMargin,
    "emb_neardup_exact" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot_scaled,
        |    CAST(list_sum(list_transform(a.qv, x -> x * x)) AS BIGINT) AS norm2_a,
        |    CAST(list_sum(list_transform(b.qv, x -> x * x)) AS BIGINT) AS norm2_b
        |  FROM q a JOIN q b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, dot_scaled, norm2_a, norm2_b
        |FROM p
        |WHERE dot_scaled > 0
        |  AND 100 * dot_scaled * dot_scaled >= 9 * norm2_a * norm2_b""".stripMargin,
    "emb_dims" ->
      """SELECT label, CAST(len(embedding) AS BIGINT) AS dim, COUNT(*) AS n_vectors
        |FROM embeddings GROUP BY label, len(embedding)""".stripMargin,
    "emb_drift" ->
      """WITH newsnap AS (
        |  SELECT vec_id, embedding,
        |    CASE WHEN vec_id % 7 = 0 THEN CAST((label + 1) % 10 AS INTEGER)
        |      ELSE label END AS label
        |  FROM embeddings WHERE vec_id % 11 <> 0),
        |oq AS (
        |  SELECT label, i - 1 AS dim,
        |    CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_old,
        |    COUNT(*) AS n_old
        |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
        |  GROUP BY 1, 2),
        |nq AS (
        |  SELECT label, i - 1 AS dim,
        |    CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_new,
        |    COUNT(*) AS n_new
        |  FROM newsnap, UNNEST(range(1, len(embedding) + 1)) AS t(i)
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT COALESCE(oq.label, nq.label) AS label,
        |    COALESCE(sum_old, 0) AS sum_old, COALESCE(n_old, 0) AS n_old,
        |    COALESCE(sum_new, 0) AS sum_new, COALESCE(n_new, 0) AS n_new
        |  FROM oq FULL JOIN nq ON oq.label = nq.label AND oq.dim = nq.dim)
        |SELECT label, CAST(MAX(n_old) AS BIGINT) AS n_old,
        |  CAST(MAX(n_new) AS BIGINT) AS n_new,
        |  CAST(SUM(ABS(sum_old * n_new - sum_new * n_old)) AS BIGINT) AS l1_drift_num,
        |  CASE WHEN MAX(n_old) > 0 AND MAX(n_new) > 0 THEN
        |    CAST(SUM(ABS(sum_old * n_new - sum_new * n_old)) AS DOUBLE)
        |      / CAST(MAX(n_old) * MAX(n_new) * 1000 AS DOUBLE) END AS l1_drift
        |FROM j GROUP BY label""".stripMargin,
    "ann_dot_exact" ->
      """SELECT b.vec_id,
        |  CAST(SUM(CAST(FLOOR(CAST(b.embedding[i.i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)
        |    * CAST(FLOOR(CAST(a.embedding[i.i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS dot_scaled
        |FROM embeddings b,
        |     (SELECT embedding FROM embeddings WHERE vec_id = 0) a,
        |     (SELECT UNNEST(range(1, 65)) AS i) i
        |WHERE b.vec_id <> 0
        |GROUP BY b.vec_id
        |ORDER BY dot_scaled DESC, b.vec_id ASC LIMIT 5""".stripMargin
  )
}
