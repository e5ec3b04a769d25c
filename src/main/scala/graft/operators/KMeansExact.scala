package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed, integer-exact Lloyd's k-means over an embedding column.
  *
  * Unlike the sample-based `Similarity.kmeansLite` (a driver-side trainer
  * for IVF coarse quantizers), this is the full clustering operator:
  * every corpus vector participates in every iteration, and everything
  * below the centroid mean is exact 64-bit integer arithmetic over
  * quantized coordinates (`floor(x*1000 + 0.5)` — the catalog's shared
  * quantizer), so assignments, distances and inertia all carry cell-exact
  * DuckDB oracles. Centroid means round half-up on the same integer grid
  * (`floor(sum/count + 1/2)` via exact `floorDiv(2s + n, 2n)`), keeping
  * the centroids themselves integer vectors end to end.
  *
  * Scale shape (the classic distributed-Lloyd's shape): each iteration is
  * ONE narrow pass over the corpus producing per-partition partial sums of
  * k×(dim+1) longs + k inertia terms, collected to the driver (~8 KB per
  * partition regardless of corpus size) and re-broadcast as the next
  * centroid set. The vectors themselves never shuffle — at 100 TB the
  * per-iteration cost is exactly one scan, and the quantized corpus is
  * cached across iterations (MEMORY_AND_DISK; on a cluster that is the
  * executors' storage tier, recomputed from parquet on eviction).
  *
  * Downstream use: the cluster-balance / label-purity report is the
  * curation view (SemDeDup-style "cluster then prune" pipelines, mixture
  * rebalancing), with `emb_kmeans` / `emb_cluster_stats` as the catalog
  * queries.
  */
object KMeansExact extends Serializable {

  /** Quantize a float to the catalog's shared integer grid. */
  def q1000(x: Float): Long = math.floor(x.toDouble * 1000 + 0.5).toLong

  /** Lowest-index argmin of exact squared L2 distance (tie → lowest
    * cluster id, mirroring the oracle's `ORDER BY dist2, cluster`).
    */
  private[operators] def nearest(centroids: Array[Array[Long]], v: Array[Long]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var i = 0
    while (i < centroids.length) {
      val ci = centroids(i)
      var d = 0L
      var j = 0
      while (j < v.length) { val t = v(j) - ci(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  private[operators] def dist2(c: Array[Long], v: Array[Long]): Long = {
    var d = 0L
    var j = 0
    while (j < v.length) { val t = v(j) - c(j); d += t * t; j += 1 }
    d
  }

  /** Exact floor(sum/count + 1/2) on longs — no double rounding anywhere.
    * Safe while |2·sum| stays inside Long: with |coord| ≤ 2000 (unit-ish
    * embeddings at scale 1000) that holds to ~2.3e15 member vectors.
    */
  private def roundedMean(sum: Long, count: Long): Long =
    Math.floorDiv(2 * sum + count, 2 * count)

  final case class Model(
      centroids: Array[Array[Long]],
      /** Σ dist2(v, centroid_assigned) per iteration, measured against the
        * centroids that produced the assignment — Lloyd's monotone
        * objective.
        */
      inertiaTrace: Array[Long])

  /** One narrow pass: per-partition partial (counts, flat sums, inertia)
    * for the given centroid set, merged on the driver. Deterministic under
    * any partitioning — all merges are integer additions.
    */
  private def sweep(
      data: Dataset[(Long, Array[Long])],
      centroids: Array[Array[Long]]): (Array[Long], Array[Array[Long]], Long) = {
    val spark = data.sparkSession
    import spark.implicits._
    val k = centroids.length
    val dim = centroids.head.length
    val bc = spark.sparkContext.broadcast(centroids)
    val partials = data
      .mapPartitions { it =>
        val c = bc.value
        val counts = new Array[Long](c.length)
        val sums = new Array[Long](c.length * dim)
        var inertia = 0L
        it.foreach { case (_, v) =>
          val b = nearest(c, v)
          counts(b) += 1
          inertia += dist2(c(b), v)
          var j = 0
          while (j < dim) { sums(b * dim + j) += v(j); j += 1 }
        }
        Iterator.single((counts, sums, inertia))
      }
      .collect()
    bc.destroy()
    val counts = new Array[Long](k)
    val sums = Array.fill(k)(new Array[Long](dim))
    var inertia = 0L
    partials.foreach { case (pc, ps, pi) =>
      inertia += pi
      var i = 0
      while (i < k) {
        counts(i) += pc(i)
        var j = 0
        while (j < dim) { sums(i)(j) += ps(i * dim + j); j += 1 }
        i += 1
      }
    }
    (counts, sums, inertia)
  }

  /** Fit k centroids with `iters` Lloyd iterations. Init is the k vectors
    * with the smallest ids — deterministic and replayable by the oracle
    * (no RNG; the corpus rows themselves seed the model).
    */
  def fit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k >= 1 && iters >= 1, s"need k >= 1 and iters >= 1, got k=$k iters=$iters")
    val data = quantize(df, idCol, vecCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val init = data.orderBy(col("id").asc).limit(k).as[(Long, Array[Long])]
        .collect().sortBy(_._1).map(_._2)
      require(init.length == k, s"corpus has only ${init.length} vectors, need k=$k")
      var centroids = init
      val trace = new Array[Long](iters)
      var it = 0
      while (it < iters) {
        val (counts, sums, inertia) = sweep(data, centroids)
        trace(it) = inertia
        centroids = centroids.indices.map { i =>
          if (counts(i) == 0L) centroids(i) // empty cluster keeps its seat
          else Array.tabulate(centroids(i).length)(j => roundedMean(sums(i)(j), counts(i)))
        }.toArray
        it += 1
      }
      Model(centroids, trace)
    } finally { data.unpersist(); () }
  }

  private def quantize(df: DataFrame, idCol: String, vecCol: String): Dataset[(Long, Array[Long])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * 1000 + lit(0.5)).cast("long")).as("qv"))
      .as[(Long, Array[Long])]
  }

  /** Per-vector assignment against a fixed centroid set:
    * (id, cluster, dist2_scaled), exact integers throughout.
    */
  def assign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Long]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    quantize(df, idCol, vecCol)
      .map { case (id, v) =>
        val c = bc.value
        val b = nearest(c, v)
        (id, b.toLong, dist2(c(b), v))
      }
      .toDF("id", "cluster", "dist2_scaled")
  }

  /** Assignment carrying the raw float vector: `(bucket, id, vec)` — the
    * input contract of [[Similarity.semanticDedupFromAssignment]]. Buckets
    * come from the exact integer argmin; the float vector rides along for
    * the downstream cosine kernel.
    */
  def assignWithVec(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Long]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        (nearest(bc.value, v.map(q1000)).toLong, id, v)
      }
      .toDF("bucket", "id", "vec")
  }

  /** Centroids as a relation (cluster, cw) — the oracle side table. */
  def centroidsDF(spark: SparkSession, centroids: Array[Array[Long]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (cw, i) => (i.toLong, cw) }.toSeq
      .toDF("cluster", "cw")
  }
}
