package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class PackingSpec extends SparkSpec {

  test("distributed prefix-sum equals the single-partition window cumsum") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val df = (0L until 5000L).map(i => (i, rng.nextInt(500).toLong))
      .toDF("doc_id", "n_tokens")
      .repartition(16) // scrambled input partitioning
    val got = Packing.tokenStreamPack(df, "doc_id", col("n_tokens"), 4096L)
      .select("id", "start_offset", "pack_id")
      .as[(Long, Long, Long)].collect().toMap2
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val want = df
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("start_offset"),
        (col("start_offset") / 4096L).cast("long").as("pack_id"))
      .as[(Long, Long, Long)].collect().toMap2
    assert(got == want)
  }

  test("pack boundaries: doc straddling a window belongs to its start pack") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 90L), (3L, 10L)).toDF("doc_id", "n_tokens")
    val r = Packing.tokenStreamPack(df, "doc_id", col("n_tokens"), 100L)
      .select("id", "start_offset", "pack_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // doc 2 starts at offset 10 (pack 0) and runs past 100 — stays pack 0;
    // doc 3 starts at 100 — pack 1
    assert(r.toSeq == Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 100L, 1L)))
  }

  test("null token counts pack as zero-length") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L))).toDF("doc_id", "n_tokens")
    val r = Packing.tokenStreamPack(df, "doc_id", col("n_tokens"), 100L)
      .select("id", "start_offset").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 0L, 2L -> 5L, 3L -> 5L))
  }

  private implicit class Map2[A, B, C](s: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = s.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
