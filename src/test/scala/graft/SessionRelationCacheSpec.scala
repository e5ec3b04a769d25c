package graft

import org.apache.spark.storage.StorageLevel

/** The per-corpus release hook for session-shared relations (ADVICE r13):
  * shared builds are deliberately untracked (releaseTrackedCaches would
  * recompute them per consumer), so [[Queries.SessionRelationCache.releaseFor]]
  * is the only way a long-lived session sweeping several sf dirs can drop
  * a finished corpus's pinned storage. Contract: evicts + unpersists
  * exactly the entries keyed by the dir, leaves other corpora cached,
  * and an evicted key rebuilds on next use.
  */
class SessionRelationCacheSpec extends SparkSpec {

  test("releaseFor evicts + unpersists per dir; other corpora stay cached") {
    import spark.implicits._
    val cache = new Queries.SessionRelationCache[org.apache.spark.sql.DataFrame]
    var builds = 0
    def build() = {
      builds += 1
      Seq(builds).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    }
    val dirA = s"/graft-test-cache/${System.nanoTime()}/a"
    val dirB = s"/graft-test-cache/${System.nanoTime()}/b"
    val a = cache.getOrElseUpdate(spark, dirA)(build())
    a.count()
    val b = cache.getOrElseUpdate(spark, dirB)(build())
    b.count()
    assert(builds == 2 && a.storageLevel != StorageLevel.NONE)

    assert(Queries.SessionRelationCache.releaseFor(dirA) == 1)
    assert(a.storageLevel == StorageLevel.NONE,
      "evicted relation must be unpersisted")
    assert(b.storageLevel != StorageLevel.NONE,
      "another corpus's relation must stay cached")

    cache.getOrElseUpdate(spark, dirA)(build())
    assert(builds == 3, "evicted key must rebuild on next use")
    cache.getOrElseUpdate(spark, dirB)(build())
    assert(builds == 3, "retained key must still hit the cache")

    assert(Queries.SessionRelationCache.releaseFor(dirA) +
      Queries.SessionRelationCache.releaseFor(dirB) == 2)
  }
}
