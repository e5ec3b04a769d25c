package graft

/** The verification-harness KMV saturation guard
  * ([[TextQueries.assertUnsaturated]]): its whole job is converting a
  * sketch that outgrew its exact regime into a LOUD error instead of an
  * unexplained oracle hash mismatch. The subtle case is the boundary: a
  * distinct count just past k yields a saturated estimate of k·(1 ± rsd)
  * that can land back UNDER k, so the guard must assert at a margin
  * below k (5·rsd·k, the KmvSketchSpec-pinned worst case), not at k
  * itself. The spec passes `enabled = true` per call (or enters the
  * thread-scoped [[TextQueries.withKmvOracleGuard]] bracket — the shape
  * Verify uses) instead of flipping any global, so it stays correct
  * even if forked suites ever run in parallel.
  */
class KmvGuardSpec extends SparkSpec {
  import spark.implicits._

  private val k = graft.functions.KmvSketch.SourceTriageK // the per-source tier
  private def bound: Long = (k - 5.0 * k / math.sqrt(k - 1.0)).toLong

  private def guarded(est: Long): Unit = {
    val df = Seq((est, 0L)).toDF("kmv_distinct", "other")
    TextQueries.assertUnsaturated(df, "kmv_distinct", k, "spec_query",
      enabled = true)
    ()
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
    // default enabled = the thread's guard scope, not entered here —
    // Bench/ScaleRun deliberately saturate
    TextQueries.assertUnsaturated(df, "kmv_distinct", k, "spec_query")
  }

  test("withKmvOracleGuard scopes the guard to the bracket and the thread") {
    val df = Seq((k + 1000L, 0L)).toDF("kmv_distinct", "other")
    // inside the bracket the default-enabled path raises …
    intercept[IllegalStateException] {
      TextQueries.withKmvOracleGuard {
        TextQueries.assertUnsaturated(df, "kmv_distinct", k, "spec_query")
      }
    }
    // … and the scope is RESTORED on exit (even an exceptional one)
    TextQueries.assertUnsaturated(df, "kmv_distinct", k, "spec_query")
    // another thread never sees this thread's scope — the parallel-
    // suite hazard the retired @volatile global carried
    @volatile var otherThreadRaised = false
    TextQueries.withKmvOracleGuard {
      val t = new Thread(() => {
        try TextQueries.assertUnsaturated(df, "kmv_distinct", k, "spec_query")
        catch { case _: IllegalStateException => otherThreadRaised = true }
      })
      t.start()
      t.join()
    }
    assert(!otherThreadRaised,
      "guard scope leaked across threads — the global-switch hazard is back")
  }

  test("tiny k refuses loudly instead of guarding nonsensically") {
    // at k ≤ ~27 the 5·rsd margin goes non-positive (every estimate
    // would read as saturated); the guard requires k >= 1024
    val df = Seq((0L, 0L)).toDF("kmv_distinct", "other")
    val e = intercept[IllegalArgumentException] {
      TextQueries.assertUnsaturated(df, "kmv_distinct", 16, "spec_query",
        enabled = true)
    }
    assert(e.getMessage.contains("k >= 1024"))
  }
}
