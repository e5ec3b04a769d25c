package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Histogram drift between two snapshots of a numeric quantity — the
  * distribution-shift monitor a pipeline runs between corpus cuts
  * ("did the length/quality profile move?"). Values land in fixed-width
  * buckets (top bucket open-ended), each side aggregates to per-bucket
  * counts, and the per-bucket total-variation term |p_old − p_new|
  * comes out of pure IEEE arithmetic: correctly-rounded divisions and
  * subtractions ONLY, no ln() — the PSI/KL logarithm is not bit-stable
  * across engines, while this drift relation is exactly reproducible
  * anywhere (same reason lm_score ranks by probability ratios).
  *
  * Scale shape: two narrow map-side-combined count aggregations (one
  * per snapshot scan), a full-outer join on ≤ nBuckets rows, and a
  * single-row totals broadcast — nothing here grows with the corpus
  * beyond the two scans.
  */
object DriftStats {

  /** Fixed-width bucket index for `v` (top bucket open-ended). NULL
    * values stay NULL — Spark's least() would otherwise skip the null
    * operand and silently file missing data as maximal-length (and
    * engines disagree on LEAST's null semantics, so the explicit guard
    * is also what keeps the oracle cell-exact); a null-bucket row in the
    * histogram is visible, a miscounted top bucket is not.
    */
  def bucketize(v: Column, bucketWidth: Long, nBuckets: Int): Column =
    when(v.isNotNull, least(lit(nBuckets - 1L),
      floor(v.cast("double") / lit(bucketWidth.toDouble)).cast("long")))

  /** Per-bucket count histogram of `v` — the shape [[driftFromHists]]
    * consumes; exposed so a STREAMING side can accumulate the same
    * relation through the state store and drift against a batch one.
    */
  def histogram(df: DataFrame, v: Column, bucketWidth: Long, nBuckets: Int,
      countName: String): DataFrame =
    df.select(bucketize(v, bucketWidth, nBuckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(countName))

  /** Per-bucket drift relation: (bucket, old_n, new_n, old_frac,
    * new_frac, abs_drift, drift_scaled). `drift_scaled` is the term at
    * 1e-9 resolution as a BIGINT (floor(x·1e9 + 0.5) — deterministic
    * double arithmetic), summable without float-summation order
    * concerns; Σ abs_drift / 2 is the total-variation distance.
    */
  def histogramDrift(
      oldDf: DataFrame, oldVal: Column,
      newDf: DataFrame, newVal: Column,
      bucketWidth: Long, nBuckets: Int): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(nBuckets > 1, "need at least two buckets")
    driftFromHists(histogram(oldDf, oldVal, bucketWidth, nBuckets, "old_n"),
      histogram(newDf, newVal, bucketWidth, nBuckets, "new_n"))
  }

  /** The one source of truth for the drift output columns: fractions,
    * the TV term, and its 1e-9 BIGINT scaling, computed over a relation
    * carrying (old_n, new_n, old_total, new_total). `keys` prefixes the
    * projection (bucket, or group + bucket).
    */
  private def driftOutput(withTotals: DataFrame, keys: Column*): DataFrame = {
    val drift = abs(col("old_n") / col("old_total") -
      col("new_n") / col("new_total"))
    withTotals.select(keys ++ Seq(col("old_n"), col("new_n"),
      (col("old_n") / col("old_total")).as("old_frac"),
      (col("new_n") / col("new_total")).as("new_frac"),
      drift.as("abs_drift"),
      floor(drift * lit(1e9) + lit(0.5)).cast("long").as("drift_scaled")): _*)
  }

  /** Drift relation from two pre-bucketed histograms ((bucket, old_n)
    * and (bucket, new_n)) — the join/arithmetic half of
    * [[histogramDrift]], reusable when one side was accumulated
    * elsewhere (e.g. a streaming state store).
    */
  def driftFromHists(oldHist: DataFrame, newHist: DataFrame): DataFrame = {
    val joined = oldHist.join(newHist, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("old_n", "new_n"))
    val totals = joined.agg(sum(col("old_n")).as("old_total"),
      sum(col("new_n")).as("new_total"))
    driftOutput(joined.crossJoin(broadcast(totals)), col("bucket"))
  }

  /** Per-GROUP histogram drift — [[histogramDrift]] segmented by a key
    * column ("did src17's length profile move?"), which is how a
    * monitor localizes a shift that a corpus-wide histogram averages
    * away. Same arithmetic contract (divisions and subtractions only);
    * fractions are within-group, so each group's Σ abs_drift / 2 is its
    * own total-variation distance.
    *
    * Scale shape: one (group, bucket)-keyed count aggregation per side
    * (map-side combined), a full-outer join on |groups|·nBuckets rows,
    * a per-group totals re-aggregate of that same small relation, and a
    * totals join that AQE broadcasts — corpus rows never shuffle.
    *
    * NULL group keys are EXCLUDED on both sides (same documented
    * contract as topTermsPerGroup, mirroring SQL's COUNT(DISTINCT g)):
    * the joins here are null-unsafe, so a null segment would otherwise
    * split across join sides and silently vanish from the output —
    * filter explicitly, and key the relation on a real segment column.
    */
  def groupedHistogramDrift(
      oldDf: DataFrame, oldVal: Column,
      newDf: DataFrame, newVal: Column,
      groupCol: String, bucketWidth: Long, nBuckets: Int): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(nBuckets > 1, "need at least two buckets")
    def hist(df: DataFrame, v: Column, cnt: String): DataFrame =
      df.filter(col(groupCol).isNotNull)
        .select(col(groupCol), bucketize(v, bucketWidth, nBuckets).as("bucket"))
        .groupBy(col(groupCol), col("bucket")).agg(count(lit(1)).as(cnt))
    val joined = hist(oldDf, oldVal, "old_n")
      .join(hist(newDf, newVal, "new_n"), Seq(groupCol, "bucket"),
        "full_outer")
      .na.fill(0L, Seq("old_n", "new_n"))
    val totals = joined.groupBy(col(groupCol))
      .agg(sum(col("old_n")).as("old_total"),
        sum(col("new_n")).as("new_total"))
    driftOutput(joined.join(totals, Seq(groupCol)),
      col(groupCol), col("bucket"))
  }

  /** Per-group embedding-centroid L1 drift between two snapshots — the
    * vector-space counterpart of [[histogramDrift]] ("did each class's
    * embedding mass move?"). Every float quantizes to
    * floor(x·scale + 0.5) as a BIGINT (the same exactness trick as the
    * quantized ANN oracles), so all cross-row sums are integer and
    * order-free; the drift numerator per group is
    * Σ_dim |sum_old·n_new − sum_new·n_old| — the L1 distance between
    * centroids at common denominator n_old·n_new — and the single final
    * division is the only float op anywhere.
    *
    * Scale shape: two corpus scans, each exploding dims but collapsing
    * map-side to (group, dim) partial sums — the shuffle carries
    * |groups|·dim rows, not corpus rows. Exactness contract: products
    * stay inside BIGINT while scale·n_group² < 2⁶³ (n_group ≲ 1.5e8 at
    * scale=1000, |x|≤1); shard larger groups before calling.
    * Fixed-dimension embeddings assumed (validate with an emb_dims-style
    * profile first); a group absent on one side reports n=0 there and a
    * zero numerator — visible, not silently dropped.
    */
  def centroidDrift(
      oldDf: DataFrame, newDf: DataFrame,
      groupCol: String, embCol: String, scale: Long = 1000L): DataFrame = {
    require(scale > 0, "scale must be positive")
    def dimSums(df: DataFrame, sumName: String, nName: String): DataFrame =
      df.select(col(groupCol), posexplode(col(embCol)))
        .select(col(groupCol), col("pos").cast("long").as("dim"),
          floor(col("col").cast("double") * lit(scale.toDouble) + lit(0.5))
            .cast("long").as("q"))
        .groupBy(col(groupCol), col("dim"))
        .agg(sum(col("q")).as(sumName), count(lit(1)).as(nName))
    val j = dimSums(oldDf, "sum_old", "n_old")
      .join(dimSums(newDf, "sum_new", "n_new"), Seq(groupCol, "dim"),
        "full_outer")
      .na.fill(0L, Seq("sum_old", "n_old", "sum_new", "n_new"))
    val num = abs(col("sum_old") * col("n_new") - col("sum_new") * col("n_old"))
    j.groupBy(col(groupCol))
      .agg(max(col("n_old")).as("n_old"), max(col("n_new")).as("n_new"),
        sum(num).as("l1_drift_num"))
      .withColumn("l1_drift",
        when(col("n_old") > 0 && col("n_new") > 0,
          col("l1_drift_num").cast("double") /
            (col("n_old") * col("n_new") * lit(scale)).cast("double")))
  }
}
