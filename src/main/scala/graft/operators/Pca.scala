package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed, integer-exact PCA over an embedding column — the
  * dimensionality-reduction step in front of clustering / ANN at corpus
  * scale (project to a few principal components, then bucket or index in
  * the reduced space).
  *
  * Everything data-parallel is exact 64-bit integer arithmetic over
  * quantized coordinates (`floor(x·1000 + 0.5)` — the catalog's shared
  * quantizer, [[KMeansExact.q1000]]):
  *
  *  - the covariance pass accumulates (n, Σq_i, Σq_i·q_j) per partition
  *    in one narrow scan — d + d(d+1)/2 longs per partition (~17 KB at
  *    d = 64), merged on the driver exactly like the k-means sweep; the
  *    reported `cov_num = n·Σq_iq_j − Σq_i·Σq_j` is the n²-scaled
  *    covariance numerator, exact by construction (and guarded by
  *    `multiplyExact`, which fails loudly instead of wrapping at
  *    astronomically-large n·Σq² — the bound is n ≲ 9e11 rows at unit
  *    scale, documented rather than silently violated);
  *  - the eigensolve is DRIVER-LOCAL (d×d doubles, power iteration with
  *    deflation — O(d²·iters), microseconds at d = 64, fine to d ≈ 2000):
  *    the one non-distributed stage, on a matrix whose size is
  *    data-independent;
  *  - the projection pass re-quantizes the eigenvectors to an integer
  *    grid (`floor(v·1e6 + 0.5)`) and takes exact long dot products in a
  *    second narrow scan — vectors never shuffle, the quantized
  *    eigenvector table broadcasts by closure (d·components longs).
  *
  * Because the projection is integer·integer, the engine rows are exactly
  * reproducible by the DuckDB oracle from the embeddings plus the
  * persisted eigenvector side-table — no float comparison anywhere.
  *
  * Sign convention: each eigenvector is oriented so its
  * largest-|component| coordinate (lowest index on ties) is positive —
  * power iteration's sign is otherwise arbitrary, and an unpinned sign
  * would flip the whole projection between runs.
  */
object Pca extends Serializable {

  /** Quantized-eigenvector grid: 6 decimal digits keeps the unit-norm
    * components' relative error ≤ 1e-6 while leaving ~12 digits of long
    * headroom for the projection dot product.
    */
  def qe(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  final case class CovStats(
      n: Long,
      dim: Int,
      /** Σ q_i per dimension. */
      sums: Array[Long],
      /** Upper-triangle Σ q_i·q_j, row-major: index of (i ≤ j) is
        * i·d − i(i−1)/2 + (j − i).
        */
      prods: Array[Long]) {
    def triIndex(i: Int, j: Int): Int = i * dim - i * (i - 1) / 2 + (j - i)
  }

  private def quantized(df: DataFrame, idCol: String, vecCol: String)
    : Dataset[(Long, Array[Long])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v.map(KMeansExact.q1000)) }
  }

  /** ONE narrow pass over the corpus → exact integer moment sums. */
  def covStats(df: DataFrame, idCol: String, vecCol: String): CovStats = {
    val spark = df.sparkSession
    import spark.implicits._
    val partials = quantized(df, idCol, vecCol)
      .mapPartitions { it =>
        var n = 0L
        var sums: Array[Long] = null
        var prods: Array[Long] = null
        var dim = 0
        it.foreach { case (_, v) =>
          if (sums == null) {
            dim = v.length
            sums = new Array[Long](dim)
            prods = new Array[Long](dim * (dim + 1) / 2)
          }
          require(v.length == dim, s"ragged embedding: ${v.length} vs $dim")
          n += 1
          var i = 0
          var t = 0
          while (i < dim) {
            sums(i) += v(i)
            var j = i
            while (j < dim) { prods(t) += v(i) * v(j); j += 1; t += 1 }
            i += 1
          }
        }
        if (n == 0) Iterator.empty
        else Iterator.single((n, dim, sums, prods))
      }
      .collect()
    require(partials.nonEmpty, "covStats: empty corpus")
    val dim = partials.head._2
    require(partials.forall(_._2 == dim), "covStats: inconsistent dims")
    val sums = new Array[Long](dim)
    val prods = new Array[Long](dim * (dim + 1) / 2)
    var n = 0L
    partials.foreach { case (pn, _, ps, pp) =>
      n += pn
      var i = 0
      while (i < sums.length) { sums(i) = Math.addExact(sums(i), ps(i)); i += 1 }
      var t = 0
      while (t < prods.length) { prods(t) = Math.addExact(prods(t), pp(t)); t += 1 }
    }
    CovStats(n, dim, sums, prods)
  }

  /** Exact additive merge of two moment-sum states — covStats is a
    * MERGEABLE sketch (all fields are sums), which is what makes
    * incremental maintenance exact: stats(base ∪ batch) =
    * merge(stats(base), stats(batch)) with no rescan of base.
    */
  def merge(a: CovStats, b: CovStats): CovStats = {
    require(a.dim == b.dim, s"dim mismatch: ${a.dim} vs ${b.dim}")
    val sums = Array.tabulate(a.dim)(i => Math.addExact(a.sums(i), b.sums(i)))
    val prods = Array.tabulate(a.prods.length)(t =>
      Math.addExact(a.prods(t), b.prods(t)))
    CovStats(Math.addExact(a.n, b.n), a.dim, sums, prods)
  }

  /** The raw moment sums as a (d(d+1)/2)-row relation
    * (i, j, n, s_i, s_j, s_ij) — the persistable/side-table form of the
    * mergeable state.
    */
  def statsDf(df: DataFrame, st: CovStats): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = for {
      i <- 0 until st.dim
      j <- i until st.dim
    } yield (i, j, st.n, st.sums(i), st.sums(j), st.prods(st.triIndex(i, j)))
    spark.createDataset(rows).toDF("i", "j", "n", "s_i", "s_j", "s_ij")
  }

  /** (i, j, n, s_i, s_j, s_ij, cov_num) from a moment-sum state, with
    * cov_num = n·s_ij − s_i·s_j — the n²-scaled covariance, exact
    * (multiplyExact fails loudly rather than wrapping).
    */
  def covDfFromStats(df: DataFrame, st: CovStats): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = for {
      i <- 0 until st.dim
      j <- i until st.dim
    } yield {
      val sij = st.prods(st.triIndex(i, j))
      val cov = Math.subtractExact(
        Math.multiplyExact(st.n, sij),
        Math.multiplyExact(st.sums(i), st.sums(j)))
      (i, j, st.n, st.sums(i), st.sums(j), sij, cov)
    }
    spark.createDataset(rows)
      .toDF("i", "j", "n", "s_i", "s_j", "s_ij", "cov_num")
  }

  /** Covariance numerators over a corpus in one pass — see
    * [[covDfFromStats]] for the output contract.
    */
  def covarianceDf(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    covDfFromStats(df, covStats(df, idCol, vecCol))

  /** Exact per-component projection MEANS (floored), derived from the
    * moment sums with no extra pass: Σ_v p_v = Σ_v Σ_i q_vi·e_i =
    * dot(Σq, e), so center_c = ⌊dot(sums, e_c) / n⌋ — Math.floorDiv to
    * match the oracle's `//`. These are the [[signBuckets]] thresholds
    * that make the sign split a MEAN split per axis (a zero split on
    * uncentered projections collapses to one bucket whenever the corpus
    * mean has a nonzero component along an axis).
    */
  def projectionCenters(st: CovStats, qvecs: Array[Array[Long]]): Array[Long] =
    qvecs.map { e =>
      require(e.length == st.dim, s"dim mismatch: ${e.length} vs ${st.dim}")
      var s = 0L
      var i = 0
      while (i < st.dim) {
        s = Math.addExact(s, Math.multiplyExact(st.sums(i), e(i)))
        i += 1
      }
      Math.floorDiv(s, st.n)
    }

  /** Sign-bucket assignment — the PCA twist on LSH: bucket = the
    * above/below-center bits of the exact projections onto the top
    * components (component 0 is the high bit), giving 2^components
    * buckets that split the corpus along its highest-variance
    * directions. `centers` (default all-zero) should be the exact
    * projection means ([[projectionCenters]]) so each axis splits at its
    * mean — balanced for symmetric distributions. Because projections
    * and centers are exact longs, the bucketing is exactly replayable
    * from the persisted eigenvector table — unlike random-hyperplane LSH
    * there is no RNG anywhere. One narrow pass; output (bucket, id, vec)
    * feeds [[Similarity.semanticDedupFromAssignment]].
    */
  def signBuckets(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      qvecs: Array[Array[Long]],
      centers: Array[Long] = null): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nc = qvecs.length
    // Long bucket: bit 63 is the sign bit, and JVM long shifts wrap mod
    // 64 (1L << 64 == 1L) — cap at 63 so buckets stay non-negative and
    // never alias. Fail loudly past that — callers wanting more
    // components must widen the bucket encoding, not lose bits.
    require(nc <= 63,
      s"signBuckets packs sign bits into a Long: at most 63 components, got $nc")
    val cen = if (centers == null) new Array[Long](nc) else centers
    require(cen.length == nc, s"need one center per component, got ${cen.length}")
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val q = v.map(KMeansExact.q1000)
        var bucket = 0L
        var c = 0
        while (c < nc) {
          val e = qvecs(c)
          require(e.length == q.length,
            s"dim mismatch: vec ${q.length} vs eigvec ${e.length}")
          var s = 0L
          var i = 0
          while (i < q.length) {
            s = Math.addExact(s, Math.multiplyExact(q(i), e(i)))
            i += 1
          }
          if (s >= cen(c)) bucket |= 1L << (nc - 1 - c)
          c += 1
        }
        (bucket, id, v)
      }
      .toDF("bucket", "id", "vec")
  }

  /** Top-`components` eigenvectors of the covariance numerator matrix
    * (scale-free: eigenvectors of c·C equal those of C) by power
    * iteration with deflation. Deterministic: fixed start (uniform
    * 1/√d), fixed `iters`, pinned sign. Returns (eigvecs, eigvals) with
    * eigvals in the cov_num scale.
    */
  def topEigvecs(
      st: CovStats,
      components: Int,
      iters: Int = 200): (Array[Array[Double]], Array[Double]) = {
    val d = st.dim
    // dense symmetric covariance numerators as doubles
    val c = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val sij = st.prods(st.triIndex(i, j))
      val cov = Math.subtractExact(
        Math.multiplyExact(st.n, sij),
        Math.multiplyExact(st.sums(i), st.sums(j))).toDouble
      c(i)(j) = cov
      c(j)(i) = cov
    }
    val vecs = Array.ofDim[Double](components, d)
    val vals = new Array[Double](components)
    val work = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- 0 until d) work(i)(j) = c(i)(j)
    var comp = 0
    while (comp < components) {
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      var it = 0
      while (it < iters) {
        val next = new Array[Double](d)
        var i = 0
        while (i < d) {
          var s = 0.0
          var j = 0
          while (j < d) { s += work(i)(j) * v(j); j += 1 }
          next(i) = s
          i += 1
        }
        val norm = math.sqrt(next.map(x => x * x).sum)
        // a zero iterate (eigenvalue ~0 after deflation) keeps the
        // previous direction — the component carries no variance anyway
        if (norm > 0) { var k = 0; while (k < d) { next(k) /= norm; k += 1 }; v = next }
        it += 1
      }
      // pinned sign: largest-|component| coordinate positive
      var mi = 0
      var i = 1
      while (i < d) {
        if (math.abs(v(i)) > math.abs(v(mi))) mi = i
        i += 1
      }
      if (v(mi) < 0) { var k = 0; while (k < d) { v(k) = -v(k); k += 1 } }
      // Rayleigh quotient on the UNDEFLATED matrix
      var lam = 0.0
      for (a <- 0 until d; b <- 0 until d) lam += v(a) * c(a)(b) * v(b)
      vecs(comp) = v
      vals(comp) = lam
      // deflate: work -= λ v vᵀ (in the deflated matrix's own scale)
      var lamW = 0.0
      for (a <- 0 until d; b <- 0 until d) lamW += v(a) * work(a)(b) * v(b)
      for (a <- 0 until d; b <- 0 until d) work(a)(b) -= lamW * v(a) * v(b)
      comp += 1
    }
    (vecs, vals)
  }

  /** Quantized eigenvector relation (comp, i, eq) — the broadcastable /
    * side-table form of the model.
    */
  def eigvecDf(df: DataFrame, vecs: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = for {
      c <- vecs.indices
      i <- vecs(c).indices
    } yield (c, i, qe(vecs(c)(i)))
    spark.createDataset(rows).toDF("comp", "i", "eq")
  }

  /** Second narrow pass: exact long projections of every vector onto the
    * quantized eigenvectors. Output (idCol, p0, p1, ..., p{c-1}).
    */
  def project(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      qvecs: Array[Array[Long]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val components = qvecs.length
    val out = quantized(df, idCol, vecCol)
      .map { case (id, v) =>
        val ps = new Array[Long](components)
        var c = 0
        while (c < components) {
          val e = qvecs(c)
          require(e.length == v.length,
            s"dim mismatch: vec ${v.length} vs eigvec ${e.length}")
          var s = 0L
          var i = 0
          while (i < v.length) {
            s = Math.addExact(s, Math.multiplyExact(v(i), e(i)))
            i += 1
          }
          ps(c) = s
          c += 1
        }
        (id, ps)
      }
    out.select(col("_1").as(idCol) +:
      (0 until components).map(c => col("_2")(c).as(s"p$c")): _*)
  }
}
