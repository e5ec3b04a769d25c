package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {

  test("salted join equals the plain join on skewed data, and spreads the hot key") {
    import spark.implicits._
    // 50k facts, 90% on one hot key — the classic straggler shape
    val facts = spark.range(50000).select(
      col("id").as("row_id"),
      when(col("id") % 10 < 9, lit(7L)).otherwise(col("id") % 100).as("k"),
      (col("id") * 3).as("payload"))
    val dims = spark.range(100).select(col("id").as("dk"),
      concat(lit("dim-"), col("id")).as("label"))

    val plain = facts.join(dims, col("k") === col("dk"))
      .select("row_id", "label").as[(Long, String)].collect().toSet
    val salted = SaltedJoin.saltedEquiJoin(
        facts, dims, factKey = col("k"), dimKey = col("dk"),
        saltSource = col("row_id"), buckets = 16)
      .select("row_id", "label").as[(Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 50000)

    // the hot key's rows really do land in many salt buckets
    val spread = facts.filter(col("k") === 7L)
      .select(pmod(xxhash64(col("row_id")), lit(16L)).as("salt"))
      .distinct().count()
    assert(spread == 16L)
  }

  test("dup dim keys keep multiplicity; null fact keys never match; buckets invariant") {
    import spark.implicits._
    // row 4's key 99 has NO dim row: the inner join must drop it — a
    // salt-comparison bug manufacturing matches from replicas would not
    val facts = Seq((1L, Some(2L)), (2L, Some(2L)), (3L, Option.empty[Long]),
      (4L, Some(99L)))
      .toDF("row_id", "k")
    // dim key 2 duplicated: each fact row must match BOTH dim rows
    val dims = Seq((2L, "a"), (2L, "a2"), (5L, "b")).toDF("dk", "tag")
    def run(buckets: Int) = SaltedJoin
      .saltedEquiJoin(facts, dims, col("k"), col("dk"), col("row_id"), buckets)
      .select("row_id", "tag").as[(Long, String)].collect().sorted.toSeq
    val expected = Seq((1L, "a"), (1L, "a2"), (2L, "a"), (2L, "a2"))
    for (b <- Seq(1, 4, 16)) assert(run(b) == expected, s"buckets=$b")
  }

  test("reserved column collision fails loudly") {
    import spark.implicits._
    val bad = Seq((1L, 2L)).toDF("__salt", "k")
    val dims = Seq((1L, "x")).toDF("dk", "tag")
    intercept[IllegalArgumentException] {
      SaltedJoin.saltedEquiJoin(bad, dims, col("k"), col("dk"), col("k"), 4)
    }
  }

  test("left join keeps unmatched facts exactly once") {
    import spark.implicits._
    val facts = Seq((1L, 10L), (2L, 99L)).toDF("row_id", "k")
    val dims = Seq((10L, "x")).toDF("dk", "label")
    val out = SaltedJoin.saltedEquiJoin(facts, dims, col("k"), col("dk"),
        col("row_id"), buckets = 8, joinType = "left")
      .select(col("row_id"), col("label"))
      .as[(Long, Option[String])].collect().toSet
    assert(out == Set((1L, Some("x")), (2L, None)))
  }
}
