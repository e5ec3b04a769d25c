package graft.streaming

import graft.SparkSpec
import graft.operators.Dedupe
import org.apache.spark.sql.functions._

class StreamNearDupSpec extends SparkSpec {

  /** Planted corpus: docs 0/3 share text A, 1/4 share text B (near-
    * identical word sets collide in every band), 2 is unique. Written as
    * one parquet file so the stream arrives id-ordered.
    */
  private def plantedPath(): String = {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "pack my box with five dozen liquor jugs for the long trip home"
    val rows = Seq(
      (0L, a), (1L, b), (2L, "completely different text with unrelated words entirely"),
      (3L, a), (4L, b + " extra"))
    val dir = java.nio.file.Files.createTempDirectory("snd").toString
    rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("planted duplicates match their earlier twin; firsts emit null") {
    val dir = plantedPath()
    val out = StreamNearDup.runNearDupOnce(spark, dir, "snd_planted")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L), out.toString)
    assert(out(0L) == -1L && out(1L) == -1L && out(2L) == -1L,
      s"firsts and the unique doc must not match: $out")
    assert(out(3L) == 0L, s"doc 3 duplicates doc 0: $out")
    assert(out(4L) == 1L, s"doc 4 near-duplicates doc 1: $out")
  }

  test("stream result equals the batch band relation's min-lower-id semantics") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val bands = StreamNearDup.bandRelation(docs, "doc_id", "text").cache()
    val expected = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("b.id") < col("a.id"))
      .groupBy(col("a.id").as("doc_id"))
      .agg(min(col("b.id")).as("match_id"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val got = StreamNearDup
      .runNearDupOnce(spark, sf() + "/documents.parquet", "snd_docs")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    bands.unpersist()
    val nDocs = docs.count()
    assert(got.size.toLong == nDocs, s"${got.size} != $nDocs")
    got.foreach { case (id, m) =>
      assert(m == expected.get(id),
        s"doc $id: stream says $m, batch relation says ${expected.get(id)}")
    }
    assert(expected.nonEmpty, "corpus should contain at least one near-dup pair")
  }

  test("state carries across micro-batches (maxFilesPerTrigger=1, 3 files)") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "pack my box with five dozen liquor jugs for the long trip home"
    // three id-ordered files: dup pairs SPAN files, so a match can only
    // come from state written by an earlier micro-batch
    val dir = java.nio.file.Files.createTempDirectory("sndmb")
    def writeOne(rows: Seq[(Long, String)], name: String): Unit =
      writeFlatParquet(rows.toDF("doc_id", "text"), dir, name)
    writeOne(Seq((0L, a), (1L, b)), "f0.parquet")
    writeOne(Seq((2L, a)), "f1.parquet")
    writeOne(Seq((3L, b + " tail")), "f2.parquet")

    // own harness: one file per micro-batch, lexicographic = id order
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "8")
    val schema = session.read.parquet(s"$dir/f0.parquet").schema
    val stream = session.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .option("pathGlobFilter", "f*.parquet")
      .parquet(dir.toString)
    val q = StreamNearDup.bandMatches(stream, "doc_id", "text", 3, 64, 16)
      .writeStream.outputMode("append").format("memory").queryName("snd_mb").start()
    try q.processAllAvailable() finally q.stop()
    val matches = session.table("snd_mb")
      .groupBy(col("id")).agg(min(col("match_id")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(matches.get(2L).contains(0L),
      s"doc 2 (batch 2) must match doc 0 from batch 1's state: $matches")
    assert(matches.get(3L).contains(1L),
      s"doc 3 (batch 3) must match doc 1 from batch 1's state: $matches")
    assert(!matches.contains(0L) && !matches.contains(1L),
      s"firsts must not match: $matches")
  }

  test("out-of-id-order ingest fails loudly instead of omitting matches") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again"
    // batch 1 carries the HIGHER id of a dup pair, batch 2 the lower:
    // doc 5 was already emitted match-less, so its owed match to doc 1
    // cannot be produced — the matcher must throw, not stay silent
    val dir = java.nio.file.Files.createTempDirectory("sndooo")
    writeFlatParquet(Seq((5L, a)).toDF("doc_id", "text"), dir, "f0.parquet")
    writeFlatParquet(Seq((1L, a)).toDF("doc_id", "text"), dir, "f1.parquet")
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "8")
    val schema = session.read.parquet(s"$dir/f0.parquet").schema
    val stream = session.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .option("pathGlobFilter", "f*.parquet")
      .parquet(dir.toString)
    val q = StreamNearDup.bandMatches(stream, "doc_id", "text", 3, 64, 16)
      .writeStream.outputMode("append").format("memory")
      .queryName("snd_ooo").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("out-of-order ingest")),
      s"expected the ordering guard, got: ${messages(e).take(3)}")
  }

  test("bandBucket is shared verbatim with the batch MinHash path") {
    // the streaming oracle joins the batch band relation — identical
    // banding is the contract, so pin it on a concrete signature
    val sig = Dedupe.minhashSignature(Dedupe.wordShingles("a b c d e f g", 3), 64)
    (0 until 16).foreach { b =>
      assert(StreamNearDup.bandRelation(
        { import spark.implicits._; Seq((7L, "a b c d e f g")).toDF("doc_id", "text") },
        "doc_id", "text").collect()
        .find(_.getInt(0) == b).get.getLong(1) == Dedupe.bandBucket(sig, b, 4))
    }
  }
}
