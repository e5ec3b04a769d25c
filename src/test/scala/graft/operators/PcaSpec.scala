package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("covarianceDf: hand-computed cells on a tiny corpus") {
    // q-vectors (scale 1000): (1000, 0), (0, 1000), (1000, 1000)
    val d = df(Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f))))
    val m = Pca.covarianceDf(d, "vec_id", "embedding").collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // n=3; s = (2000, 2000); s_00 = 2e6, s_01 = 1e6, s_11 = 2e6
    assert(m((0, 0)) == ((3L, 2000L, 2000L, 2000000L, 3L * 2000000L - 2000L * 2000L)))
    assert(m((0, 1)) == ((3L, 2000L, 2000L, 1000000L, 3L * 1000000L - 2000L * 2000L)))
    assert(m((1, 1)) == ((3L, 2000L, 2000L, 2000000L, 3L * 2000000L - 2000L * 2000L)))
    assert(m.size == 3, "upper triangle only")
  }

  test("covStats: partition-count invariance (integer merges)") {
    val rows = (0L until 40L).map(i =>
      (i, Array.tabulate(5)(j => math.sin(i * 0.7 + j).toFloat)))
    val a = Pca.covStats(df(rows).repartition(1), "vec_id", "embedding")
    val b = Pca.covStats(df(rows).repartition(7), "vec_id", "embedding")
    assert(a.n == b.n && a.dim == b.dim)
    assert(a.sums.sameElements(b.sums))
    assert(a.prods.sameElements(b.prods))
  }

  test("topEigvecs: recovers a planted dominant direction, pinned sign") {
    // points spread along (3, 4)/5 with small orthogonal noise — the top
    // eigenvector must align with the planted axis
    val dir = Array(0.6, 0.8)
    val rows = (0L until 200L).map { i =>
      val t = (i.toDouble - 100) / 25.0
      val noise = math.sin(i * 2.13) * 0.03
      (i, Array(
        (t * dir(0) - noise * dir(1)).toFloat,
        (t * dir(1) + noise * dir(0)).toFloat))
    }
    val st = Pca.covStats(df(rows), "vec_id", "embedding")
    val (vecs, vals) = Pca.topEigvecs(st, components = 2)
    val v0 = vecs(0)
    val cosine = v0(0) * dir(0) + v0(1) * dir(1)
    assert(math.abs(cosine) > 0.999, s"top eigvec off-axis: ${v0.toSeq}")
    // pinned sign: largest-|component| coordinate positive -> aligned, not flipped
    assert(cosine > 0, s"sign not pinned: ${v0.toSeq}")
    assert(vals(0) > vals(1) && vals(1) >= -1e-6 * vals(0),
      s"eigenvalues out of order: ${vals.toSeq}")
    // Rayleigh residual ||Cv - λv|| / λ small for the dominant component
    val d = st.dim
    val c = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val cov = (BigInt(st.n) * BigInt(st.prods(st.triIndex(i, j))) -
        BigInt(st.sums(i)) * BigInt(st.sums(j))).toDouble
      c(i)(j) = cov; c(j)(i) = cov
    }
    val cv = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v0(j)).sum)
    val resid = math.sqrt(Array.tabulate(d)(i =>
      math.pow(cv(i) - vals(0) * v0(i), 2)).sum) / vals(0)
    assert(resid < 1e-9, s"Rayleigh residual $resid")
  }

  test("orthogonality of the two components") {
    val rows = (0L until 100L).map(i =>
      (i, Array.tabulate(6)(j => math.sin(i * 0.37 + j * 1.3).toFloat)))
    val st = Pca.covStats(df(rows), "vec_id", "embedding")
    val (vecs, _) = Pca.topEigvecs(st, components = 2)
    val dot = vecs(0).zip(vecs(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-6, s"components not orthogonal: $dot")
  }

  test("project: exact long dot products, deterministic under repartition") {
    val rows = (0L until 30L).map(i =>
      (i, Array.tabulate(4)(j => math.cos(i + j * 0.5).toFloat)))
    val d4 = df(rows)
    val st = Pca.covStats(d4, "vec_id", "embedding")
    val (vecs, _) = Pca.topEigvecs(st, components = 2)
    val qv = vecs.map(_.map(Pca.qe))
    val got = Pca.project(d4, "vec_id", "embedding", qv).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // independent recomputation on the driver
    rows.foreach { case (id, v) =>
      val q = v.map(KMeansExact.q1000)
      val want = qv.map(e => q.zip(e).map { case (a, b) => a * b }.sum)
      assert(got(id) == ((want(0), want(1))), s"row $id")
    }
    val re = Pca.project(d4.repartition(5), "vec_id", "embedding", qv).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(re == got)
  }

  test("merge: incremental fold is bit-identical to a full recompute") {
    val rows = (0L until 60L).map(i =>
      (i, Array.tabulate(6)(j => math.sin(i * 1.1 + j * 0.4).toFloat)))
    val all = df(rows)
    val base = all.filter(col("vec_id") % 4 =!= 2)
    val batch = all.filter(col("vec_id") % 4 === 2)
    val merged = Pca.merge(
      Pca.covStats(base, "vec_id", "embedding"),
      Pca.covStats(batch, "vec_id", "embedding"))
    val full = Pca.covStats(all, "vec_id", "embedding")
    assert(merged.n == full.n && merged.dim == full.dim)
    assert(merged.sums.sameElements(full.sums))
    assert(merged.prods.sameElements(full.prods))
    // dim mismatch fails loudly
    val other = Pca.covStats(
      df(Seq((0L, Array(1.0f, 2.0f)))), "vec_id", "embedding")
    intercept[IllegalArgumentException] { Pca.merge(full, other) }
  }

  test("signBuckets: sign bits of exact projections, component 0 is the high bit") {
    // eigvec stand-ins: axis-aligned units at the qe grid — projections
    // are then just the quantized coordinates, signs fully predictable
    val qv = Array(Array(1000000L, 0L), Array(0L, 1000000L))
    val rows = Seq(
      (0L, Array(0.5f, 0.5f)),   // (+,+) -> 3
      (1L, Array(-0.5f, 0.5f)),  // (-,+) -> 1
      (2L, Array(0.5f, -0.5f)),  // (+,-) -> 2
      (3L, Array(-0.5f, -0.5f)), // (-,-) -> 0
      (4L, Array(0.0f, -0.5f)))  // zero projection counts as >= 0 -> 2
    val got = Pca.signBuckets(df(rows), "vec_id", "embedding", qv)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(got == Map(0L -> 3L, 1L -> 1L, 2L -> 2L, 3L -> 0L, 4L -> 2L))
  }

  test("signBuckets: Long buckets carry 63 components without aliasing") {
    // two vectors that differ only on the HIGH component (c = 0, shifted
    // by 62): an Int-packed bucket would have wrapped this bit away
    val nc = 63
    val qv = Array.tabulate(nc)(c => Array.tabulate(nc)(i =>
      if (i == c) 1000000L else 0L))
    val rows = Seq(
      (0L, Array.fill(nc)(0.5f)),
      (1L, Array.tabulate(nc)(i => if (i == 0) -0.5f else 0.5f)))
    val got = Pca.signBuckets(df(rows), "vec_id", "embedding", qv)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(got(0L) == (1L << 63) - 1L) // all 63 sign bits set, non-negative
    assert(got(1L) == (1L << 63) - 1L - (1L << 62)) // high bit cleared
    intercept[IllegalArgumentException] {
      Pca.signBuckets(df(rows), "vec_id", "embedding",
        Array.fill(64)(Array.fill(nc)(0L)))
    }
  }

  test("covStats rejects ragged embeddings") {
    val bad = df(Seq((0L, Array(1.0f, 2.0f)), (1L, Array(1.0f))))
      .repartition(1)
    val e = intercept[Exception] {
      Pca.covStats(bad, "vec_id", "embedding")
    }
    assert(e.getMessage != null)
  }
}
