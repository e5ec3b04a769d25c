package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansExactSpec extends SparkSpec {

  private def emb = spark.read.parquet(sf() + "/embeddings.parquet")

  test("assignment matches a driver-side brute-force replay exactly") {
    val model = KMeansExact.fit(emb, "vec_id", "embedding", k = 10, iters = 3)
    val got = KMeansExact.assign(emb, "vec_id", "embedding", model.centroids)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

    val raw = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(KMeansExact.q1000)))
    assert(raw.length === got.size)
    raw.foreach { case (id, v) =>
      var best = 0L
      var bestD = Long.MaxValue
      model.centroids.zipWithIndex.foreach { case (c, i) =>
        var d = 0L
        var j = 0
        while (j < v.length) { val t = v(j) - c(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = i.toLong }
      }
      assert(got(id) === ((best, bestD)), s"vec $id")
    }
  }

  test("Lloyd's objective is non-increasing across iterations") {
    val model = KMeansExact.fit(emb, "vec_id", "embedding", k = 10, iters = 5)
    val t = model.inertiaTrace
    assert(t.length === 5)
    t.sliding(2).foreach { case Array(a, b) => assert(b <= a, t.mkString(",")) }
    // and it genuinely moved: iteration 1 must beat the raw seed placement
    assert(t.last < t.head)
  }

  test("deterministic under repartitioning") {
    val base = emb
    val shuffled = emb.repartition(7)
    val m1 = KMeansExact.fit(base, "vec_id", "embedding", k = 8, iters = 4)
    val m2 = KMeansExact.fit(shuffled, "vec_id", "embedding", k = 8, iters = 4)
    assert(m1.centroids.map(_.toSeq).toSeq === m2.centroids.map(_.toSeq).toSeq)
    assert(m1.inertiaTrace.toSeq === m2.inertiaTrace.toSeq)
    val a1 = KMeansExact.assign(base, "vec_id", "embedding", m1.centroids)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val a2 = KMeansExact.assign(shuffled, "vec_id", "embedding", m2.centroids)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a1 === a2)
  }

  test("planted well-separated clusters are recovered exactly") {
    import spark.implicits._
    // 3 tight blobs far apart; the lowest-id seeds land one per blob
    // (id % 3), so Lloyd's must contract each centroid onto its blob mean
    // and every point must land with its own blob
    val rng = new java.util.Random(42)
    val rows = (0 until 300).map { i =>
      val blob = i % 3
      val base = Array.fill(8)(0f)
      base(blob) = 10f
      val v = base.map(x => x + (rng.nextFloat() - 0.5f) * 0.2f)
      (i.toLong, v, blob)
    }
    val df = rows.toDF("vec_id", "embedding", "blob")
    val m = KMeansExact.fit(df, "vec_id", "embedding", k = 3, iters = 6)
    val a = KMeansExact.assign(df, "vec_id", "embedding", m.centroids)
      .join(df.select(col("vec_id").as("id"), col("blob")), "id")
      .groupBy("cluster", "blob").count().collect()
    // every cluster maps to exactly one blob and vice versa
    val byCluster = a.groupBy(_.getLong(0))
    assert(byCluster.size === 3, a.mkString(", "))
    byCluster.values.foreach(g => assert(g.length === 1, a.mkString(", ")))
    assert(a.map(_.getLong(2)).sum === 300)
  }

  test("empty clusters keep their previous centroid") {
    import spark.implicits._
    // two far-apart groups, k=3: the third seed (id 2) sits inside group A
    // and loses all members once centroid 0 centers the group
    val df = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0.001f, 0f)), (2L, Array(0.002f, 0f)),
      (3L, Array(10f, 10f)), (4L, Array(10.001f, 10f))
    ).toDF("vec_id", "embedding")
    val m = KMeansExact.fit(df, "vec_id", "embedding", k = 3, iters = 4)
    assert(m.centroids.length === 3)
    // all centroids stay finite integer vectors (no NaN/collapse)
    m.centroids.foreach(c => assert(c.length === 2))
    val a = KMeansExact.assign(df, "vec_id", "embedding", m.centroids).collect()
    assert(a.length === 5)
  }
}
