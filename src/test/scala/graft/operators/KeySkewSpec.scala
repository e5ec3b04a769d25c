package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeySkewSpec extends SparkSpec {
  import spark.implicits._

  test("profile: hot key tops the list with exact counts and salt sizing") {
    // 90 rows on key 7, 10 keys of 1 row each => 100 rows over 11 keys
    val rows = (Seq.fill(90)(7L) ++ (100L until 110L)).toDF("k")
    val out = KeySkew.profile(rows, col("k"), k = 3).collect()
    assert(out.length == 3)
    val hot = out.head
    assert(hot.getString(0) == "7")
    assert(hot.getLong(1) == 90L)
    assert(hot.getLong(2) == 100L) // total_rows
    assert(hot.getLong(3) == 11L)  // n_keys
    assert(hot.getDouble(4) == 90.0 * 11 / 100) // skew_ratio 9.9
    assert(hot.getLong(5) == 10L)  // ceil(9.9) salt buckets
  }

  test("profile: count ties break by key string ascending — deterministic set") {
    val rows = (Seq(5L, 5L, 30L, 30L, 12L, 12L, 4L)).toDF("k")
    // counts: 5->2, 30->2, 12->2, 4->1; top-2 by (cnt desc, str key asc)
    // string order among the tied: "12" < "30" < "5"
    val keys = KeySkew.profile(rows, col("k"), k = 2).collect().map(_.getString(0))
    assert(keys.toSeq == Seq("12", "30"))
  }

  test("profile: stable under repartitioning") {
    val rows = (Seq.fill(40)(1L) ++ Seq.fill(25)(2L) ++ (10L until 40L)).toDF("k")
    val a = KeySkew.profile(rows, col("k"), k = 5).collect().toSeq
    val b = KeySkew.profile(rows.repartition(13), col("k"), k = 5).collect().toSeq
    assert(a == b)
  }
}
