package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class PackingSpec extends SparkSpec {

  test("slidingWindows: full coverage, clamped tail, overlap, zero-doc exclusion") {
    import spark.implicits._
    val df = Seq(
      (1L, 100L), // 64@0, [48,100) tail short
      (2L, 64L),  // exactly one full window
      (3L, 10L),  // one short window
      (4L, 0L)    // no windows
    ).toDF("doc_id", "toks")
    val r = Packing.slidingWindows(df, "doc_id", col("toks"), 64L, 48L)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(r.toSeq == Seq(
      (1L, 0L, 0L, 64L, 64L), (1L, 1L, 48L, 100L, 52L),
      (2L, 0L, 0L, 64L, 64L),
      (3L, 0L, 0L, 10L, 10L)))
    // coverage: every token index of doc 1 falls in >= 1 window
    val covered = r.filter(_._1 == 1L)
      .flatMap(t => t._3 until t._4).toSet
    assert(covered == (0L until 100L).toSet)
    // validations
    assertThrows[IllegalArgumentException](
      Packing.slidingWindows(df, "doc_id", col("toks"), 64L, 65L))
    assertThrows[IllegalArgumentException](
      Packing.slidingWindows(df, "doc_id", col("toks"), 0L, 1L))
  }

  test("slidingWindows boundary: n just past a stride multiple adds exactly one window") {
    import spark.implicits._
    // W=8, S=4: n=8 -> 1 window; n=9 -> 2 windows ([0,8),[4,9))
    val df = Seq((1L, 8L), (2L, 9L), (3L, 12L), (4L, 13L)).toDF("doc_id", "toks")
    val counts = Packing.slidingWindows(df, "doc_id", col("toks"), 8L, 4L)
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 3L))
  }

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

  test("pow2BucketSql: exact integer bucket ladder, engine-evaluated") {
    import spark.implicits._
    val cases = Seq(0L -> 16L, 1L -> 16L, 16L -> 16L, 17L -> 32L,
      1000L -> 1024L, 1024L -> 1024L, 1025L -> 2048L,
      (1L << 20) -> (1L << 20), (1L << 20) + 1 -> (1L << 20))
    val got = cases.map(_._1).toDF("n_tokens")
      .select(col("n_tokens"),
        expr(Packing.pow2BucketSql("n_tokens")).cast("long").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (n, want) => assert(got(n) === want, s"n=$n") }
  }

  test("lengthBuckets: padding accounting is exact, overlong docs clamp to 0") {
    import spark.implicits._
    val docs = Seq(10L, 16L, 17L, 100L, (1L << 20) + 5L).toDF("n")
    val out = Packing.lengthBuckets(docs, col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(out === Seq(
      (16L, 2L, 26L, 6L),          // 10 and 16: padding 6 + 0
      (32L, 1L, 17L, 15L),
      (128L, 1L, 100L, 28L),
      ((1L << 20), 1L, (1L << 20) + 5L, 0L))) // clamped, never negative
  }
}
