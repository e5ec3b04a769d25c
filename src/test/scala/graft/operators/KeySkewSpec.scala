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

  test("joinSizeProfile: exact sum-of-products, hot key, amplification") {
    // left: key 1 ×3, key 2 ×2, key 9 ×1; right: key 1 ×4, key 2 ×1, key 8 ×2
    val left = Seq(1L, 1L, 1L, 2L, 2L, 9L).toDF("k")
    val right = Seq(1L, 1L, 1L, 1L, 2L, 8L, 8L).toDF("k")
    val r = KeySkew.joinSizeProfile(left, col("k"), right, col("k")).head()
    assert(r.getLong(0) == 6L)   // n_left
    assert(r.getLong(1) == 7L)   // n_right
    assert(r.getLong(2) == 3L)   // n_keys_left
    assert(r.getLong(3) == 3L)   // n_keys_right
    assert(r.getLong(4) == 2L)   // n_common_keys (1, 2)
    assert(r.getLong(5) == 14L)  // join_rows = 3*4 + 2*1
    assert(r.getString(6) == "1")
    assert(r.getLong(7) == 12L)
    assert(r.getDouble(8) == 14.0 / 6)
    assert(r.getDouble(9) == 12.0 / 14)
  }

  test("joinSizeProfile: disjoint keys still yield the one summary row") {
    val left = Seq(1L, 2L).toDF("k")
    val right = Seq(3L, 4L).toDF("k")
    val rows = KeySkew.joinSizeProfile(left, col("k"), right, col("k")).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(5) == 0L)      // join_rows
    assert(r.getLong(4) == 0L)      // n_common_keys
    assert(r.isNullAt(6) && r.isNullAt(7)) // no top key
  }

  test("profile: stable under repartitioning") {
    val rows = (Seq.fill(40)(1L) ++ Seq.fill(25)(2L) ++ (10L until 40L)).toDF("k")
    val a = KeySkew.profile(rows, col("k"), k = 5).collect().toSeq
    val b = KeySkew.profile(rows.repartition(13), col("k"), k = 5).collect().toSeq
    assert(a == b)
  }
}
