package graft

/** The verification-harness KMV saturation guard
  * ([[TextQueries.assertUnsaturated]]): its whole job is converting a
  * sketch that outgrew its exact regime into a LOUD error instead of an
  * unexplained oracle hash mismatch. The subtle case is the boundary: a
  * distinct count just past k yields a saturated estimate of k·(1 ± rsd)
  * that can land back UNDER k, so the guard must assert at a margin
  * below k (5·rsd·k, the KmvSketchSpec-pinned worst case), not at k
  * itself.
  */
class KmvGuardSpec extends SparkSpec {
  import spark.implicits._

  private val k = 1 << 14 // the dedup_spans_approx_source tier
  private def bound: Long = (k - 5.0 * k / math.sqrt(k - 1.0)).toLong

  private def guarded(est: Long): Unit = {
    val df = Seq((est, 0L)).toDF("kmv_distinct", "other")
    TextQueries.kmvOracleGuard = true
    try TextQueries.assertUnsaturated(df, "kmv_distinct", k, "spec_query")
    finally TextQueries.kmvOracleGuard = false
  }

  test("estimates below the margin pass") {
    guarded(0L)
    guarded(bound - 1)
  }

  test("a saturated estimate that lands back under k still raises") {
    // distinct ≈ k + ε saturates the sketch; its estimate can read below
    // k (e.g. k − 2·rsd·k) — the blind window an `>= k` test misses
    val underK = (k - 2.0 * k / math.sqrt(k - 1.0)).toLong
    assert(underK < k && underK >= bound)
    val e = intercept[IllegalStateException] { guarded(underK) }
    assert(e.getMessage.contains("spec_query"))
    assert(e.getMessage.contains("saturation margin"))
  }

  test("estimates at and past k raise") {
    intercept[IllegalStateException] { guarded(k.toLong) }
    intercept[IllegalStateException] { guarded(k + 1000L) }
  }

  test("the guard is a no-op outside the verification harness") {
    val df = Seq((k + 1000L, 0L)).toDF("kmv_distinct", "other")
    // kmvOracleGuard stays false — Bench/ScaleRun deliberately saturate
    TextQueries.assertUnsaturated(df, "kmv_distinct", k, "spec_query")
  }
}
