package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  private def sides = {
    import spark.implicits._
    // heavy skew: key 1 carries half the fact rows; nulls never match;
    // key 99 has no dim row; dim key 2 is DUPLICATED (multiplicity must
    // survive salting)
    val fact = ((0L until 500L).map(i => (i, if (i % 2 == 0) 1L else i % 7)) ++
      Seq((1000L, 99L)))
      .toDF("row_id", "k")
      .unionByName(Seq((2000L, Option.empty[Long])).toDF("row_id", "k"))
    val dim = Seq((1L, "hot"), (2L, "a"), (2L, "a2"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (0L, "z")).toDF("dk", "tag")
    (fact, dim)
  }

  test("saltedJoin equals the plain inner join, including dup dim keys") {
    val (fact, dim) = sides
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("row_id", "k", "dk", "tag").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sorted.toSeq
    val plain = canon(fact.join(dim, fact("k") === dim("dk")))
    for (buckets <- Seq(1, 4, 16)) {
      val salted = canon(SkewJoin.saltedJoin(fact, dim,
        leftKey = col("k"), rightKey = col("dk"),
        saltSource = col("row_id"), buckets = buckets))
      assert(salted == plain, s"mismatch at buckets=$buckets")
    }
  }

  test("hot key actually spreads across salt buckets") {
    import spark.implicits._
    val (fact, _) = sides
    // the distribution the operator exists for: the hot key's rows must
    // land in >1 salt bucket when salted on the unique row id
    val nBuckets = fact.filter(col("k") === 1L)
      .select(pmod(xxhash64(col("row_id")), lit(8L)).as("salt"))
      .distinct().count()
    assert(nBuckets > 4, s"hot key spread over only $nBuckets of 8 buckets")
  }

  test("reserved column collision fails loudly") {
    import spark.implicits._
    val bad = Seq((1L, 2L)).toDF("__salt", "k")
    val dim = Seq((1L, "x")).toDF("dk", "tag")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(bad, dim, col("k"), col("dk"), col("k"), 4)
    }
  }
}
