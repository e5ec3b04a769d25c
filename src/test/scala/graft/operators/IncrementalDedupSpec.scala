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
