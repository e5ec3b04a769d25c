package graft

/** Smoke coverage for the full catalog: every query must run and return a
  * schema at sf0.001; oracle-backed queries additionally return rows
  * (deep value checks are the external differential-replay harness's
  * DuckDB compare).
  */
class QueriesSpec extends SparkSpec {

  test("every catalog query runs at sf0.001") {
    val failures = Queries.all.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sf()).count()
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle keys are a subset of query keys") {
    val missing = Queries.oracles.keySet -- Queries.all.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("EVERY catalog query is oracled — the gate must not silently weaken") {
    // the driver downgrades oracle-less queries to a rows-only check;
    // the catalog's standing contract is full cross-engine verification,
    // so a new query without an oracle fails HERE, not in a judge table
    val unoracled = Queries.all.keySet -- Queries.oracles.keySet
    assert(unoracled.isEmpty,
      s"queries without a DuckDB oracle: ${unoracled.toSeq.sorted.mkString(", ")}")
  }

  test("oracle-backed queries return rows at sf0.001") {
    Queries.oracles.keys.foreach { name =>
      assert(Queries.all(name)(spark, sf()).count() > 0, s"$name returned 0 rows")
    }
  }
}
