package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {

  test("classifies known / intra_dup / new against the index") {
    import spark.implicits._
    val incoming = Seq(
      (1L, "aaa"), // new (first of fp A in batch)
      (2L, "aaa"), // intra_dup (same fp, higher id)
      (3L, "bbb"), // known (in index)
      (4L, "ccc")  // new
    ).toDF("doc_id", "text")
    val index = Seq("bbb", "ddd").toDF("t").select(md5(col("t")).as("fp"))
    val r = IncrementalDedup
      .classify(incoming, "doc_id", md5(col("text")), index, "fp")
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r == Map(1L -> "new", 2L -> "intra_dup", 3L -> "known", 4L -> "new"))
  }

  test("known beats intra_dup: duplicate fp that is also indexed is known for ALL rows") {
    import spark.implicits._
    val incoming = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "text")
    val index = Seq("x").toDF("t").select(md5(col("t")).as("fp"))
    val r = IncrementalDedup
      .classify(incoming, "doc_id", md5(col("text")), index, "fp")
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r == Map(1L -> "known", 2L -> "known"))
  }

  test("index join and first-occurrence window share one exchange of the batch") {
    import spark.implicits._
    // disable broadcast so the plan takes the big-index (100 TB) shape:
    // SMJ on fp whose output partitioning must feed the window directly
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val incoming = (0L until 100L).map(i => (i, s"t${i % 30}")).toDF("doc_id", "text")
      val index = (0L until 10L).map(i => s"t$i").toDF("t")
        .select(md5(col("t")).as("fp"))
      val df = IncrementalDedup.classify(incoming, "doc_id", md5(col("text")), index, "fp")
      df.collect()
      // AQE's toString prints current AND initial plans — count only the
      // current section or every exchange is double-counted
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning"))
      // one per input side; a third would mean the window re-shuffles what
      // the join already partitioned by fp
      assert(exchanges <= 2, s"expected <=2 exchanges, plan:\n$plan")
      assert(plan.contains("Window"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("appending the 'new' rows to the index makes a re-run all-known") {
    import spark.implicits._
    val batch = (0L until 200L).map(i => (i, s"doc ${i % 60}")).toDF("doc_id", "text")
    val index = (0L until 30L).map(i => s"doc $i").toDF("t")
      .select(md5(col("t")).as("fp"))
    val first = IncrementalDedup.classify(batch, "doc_id", md5(col("text")), index, "fp")
    val grown = index.union(
      first.filter(col("status") === "new").select(col("fp")))
    val second = IncrementalDedup.classify(batch, "doc_id", md5(col("text")), grown, "fp")
    assert(second.filter(col("status") =!= "known").count() == 0L)
  }
}
