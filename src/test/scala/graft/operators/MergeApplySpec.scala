package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

class MergeApplySpec extends SparkSpec {
  import spark.implicits._

  private def snap = Seq(
    (1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"), (4L, "four", "b"))
    .toDF("id", "text", "src")

  test("merge: upsert replaces, insert adds, delete removes, rest unchanged") {
    val changes = Seq(
      (2L, 1L, "U", "TWO", "a2"),   // update existing
      (5L, 1L, "U", "five", "c"),   // insert new key
      (3L, 1L, "D", null, null),    // delete existing
      (9L, 1L, "D", null, null))    // delete absent key: no-op
      .toDF("id", "seq", "op", "text", "src")
    val out = MergeApply.merge(snap, changes, "id", Seq("text", "src"))
      .orderBy("id").as[(Long, String, String)].collect()
    assert(out.toSeq == Seq(
      (1L, "one", "a"), (2L, "TWO", "a2"), (4L, "four", "b"), (5L, "five", "c")))
  }

  test("merge: last writer wins per key, delete-then-reinsert resurrects") {
    val changes = Seq(
      (1L, 1L, "U", "first", "x"),
      (1L, 3L, "U", "last", "y"),   // seq 3 shadows seq 1
      (2L, 1L, "D", null, null),
      (2L, 2L, "U", "back", "z"))   // reinsert after delete
      .toDF("id", "seq", "op", "text", "src")
    val out = MergeApply.merge(snap, changes, "id", Seq("text", "src"))
      .orderBy("id").as[(Long, String, String)].collect()
    assert(out.toSeq == Seq(
      (1L, "last", "y"),
      (2L, "back", "z"), (3L, "three", "b"), (4L, "four", "b")))
  }

  test("mergeEvolve: changelog-only columns null-fill untouched rows") {
    // changelog carries `rev` (long) and `tag` (string) the snapshot lacks
    val changes = Seq(
      (2L, 1L, "U", "TWO", "a2", 7L, "t7"),    // update: carries rev/tag
      (5L, 1L, "U", "five", "c", 9L, null),    // insert: rev, null tag
      (3L, 1L, "D", null, null, 0L, null))     // delete
      .toDF("id", "seq", "op", "text", "src", "rev", "tag")
    val out = MergeApply.mergeEvolve(
        snap, changes, "id", Seq("text", "src"), Seq("rev", "tag"))
      .orderBy("id")
      .as[(Long, String, String, Option[Long], Option[String])].collect()
    assert(out.toSeq == Seq(
      (1L, "one", "a", None, None),            // untouched: NULL evolved cols
      (2L, "TWO", "a2", Some(7L), Some("t7")),
      (4L, "four", "b", None, None),
      (5L, "five", "c", Some(9L), None)))
  }

  test("mergeEvolve rejects evolved columns the snapshot already has") {
    val changes = Seq((2L, 1L, "U", "TWO", "a2"))
      .toDF("id", "seq", "op", "text", "src")
    val e = intercept[IllegalArgumentException] {
      MergeApply.mergeEvolve(snap, changes, "id", Seq("text"), Seq("src"))
    }
    assert(e.getMessage.contains("already exist"))
  }

  test("mergeStats: updated / inserted / deleted / unchanged counts") {
    val changes = Seq(
      (1L, 1L, "U", "x", "x"), (2L, 1L, "U", "y", "y"), // 2 updates
      (7L, 1L, "U", "n", "n"),                           // 1 insert
      (3L, 1L, "D", null, null),                         // 1 delete
      (4L, 1L, "D", null, null), (4L, 2L, "U", "r", "r")) // resurrect -> update
      .toDF("id", "seq", "op", "text", "src")
    val row = MergeApply.mergeStats(snap, changes, "id").head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      (3L, 1L, 1L, 0L)) // ids 1,2,4 updated; 7 inserted; 3 deleted; none untouched
  }

  test("plan: small delta broadcasts — the snapshot side never shuffles") {
    val bigSnap = spark.range(0L, 50000L)
      .select(col("id"), concat(lit("t"), col("id")).as("text"),
        lit("s").as("src"))
    val delta = Seq((5L, 1L, "U", "new", "s"), (99999L, 1L, "U", "ins", "s"))
      .toDF("id", "seq", "op", "text", "src")
    val merged = MergeApply.merge(bigSnap, delta, "id", Seq("text", "src"))
    merged.collect() // finalize AQE
    def count(p: org.apache.spark.sql.execution.SparkPlan)(
        pred: org.apache.spark.sql.execution.SparkPlan => Boolean): Int = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      (if (pred(p)) 1 else 0) + kids.map(count(_)(pred)).sum
    }
    val plan = merged.queryExecution.executedPlan
    // apply (left outer) + matched (left semi) + inserts (left anti),
    // each broadcasting the delta side
    assert(count(plan) { case _: BroadcastHashJoinExec => true; case _ => false } == 3,
      s"expected all three merge joins to broadcast the delta:\n$plan")
    // the only exchanges are the delta's last-writer aggregation (which
    // AQE may re-use across the consuming joins); the 50k-row snapshot
    // must stay map-only
    assert(count(plan) { case _: ShuffleExchangeExec => true; case _ => false } <= 2,
      s"snapshot side must not shuffle:\n$plan")
  }

  test("plan: mergeEvolve keeps the snapshot map-only (widening is a projection)") {
    val bigSnap = spark.range(0L, 50000L)
      .select(col("id"), concat(lit("t"), col("id")).as("text"))
    val delta = Seq((5L, 1L, "U", "new", 7L), (99999L, 1L, "U", "ins", 9L))
      .toDF("id", "seq", "op", "text", "rev")
    val merged = MergeApply.mergeEvolve(
      bigSnap, delta, "id", Seq("text"), Seq("rev"))
    merged.collect()
    def count(p: org.apache.spark.sql.execution.SparkPlan)(
        pred: org.apache.spark.sql.execution.SparkPlan => Boolean): Int = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      (if (pred(p)) 1 else 0) + kids.map(count(_)(pred)).sum
    }
    val plan = merged.queryExecution.executedPlan
    assert(count(plan) { case _: BroadcastHashJoinExec => true; case _ => false } == 3,
      s"expected all three evolve-merge joins to broadcast the delta:\n$plan")
    assert(count(plan) { case _: ShuffleExchangeExec => true; case _ => false } <= 2,
      s"null-widened snapshot must stay map-only:\n$plan")
  }
}
