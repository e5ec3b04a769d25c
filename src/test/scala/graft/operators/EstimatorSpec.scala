package graft.operators

import graft.SparkSpec
import graft.cdc.{ChunkerParams, XXH64}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

class EstimatorSpec extends SparkSpec {

  private def writeTemp(name: String, bytes: Array[Byte]): Path = {
    val dir = Files.createTempDirectory("graft-est")
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p
  }

  private def randomBytes(n: Int, seed: Long): Array[Byte] = {
    val r = new java.util.Random(seed)
    val a = new Array[Byte](n)
    r.nextBytes(a)
    a
  }

  test("XXH64 matches Spark's built-in xxhash64 (seed 42)") {
    import spark.implicits._
    val payloads = Seq(
      Array.emptyByteArray,
      "hello".getBytes("UTF-8"),
      randomBytes(7, 1),
      randomBytes(32, 2),
      randomBytes(1000, 3))
    val fromSpark = payloads
      .toDF("b")
      .select(xxhash64(col("b")))
      .collect()
      .map(_.getLong(0))
    val ours = payloads.map(XXH64.hash(_, 42L))
    assert(fromSpark.toSeq == ours)
  }

  test("two identical files dedup to ~half the total bytes") {
    val bytes = randomBytes(2 << 20, 11L)
    val f1 = writeTemp("a.bin", bytes)
    val f2 = writeTemp("b.bin", bytes)
    val r = Estimator.estimate(spark, Seq(f1.toString, f2.toString))
    assert(r.numfiles == 2)
    assert(r.total_len == bytes.length.toLong * 2)
    assert(r.chunk_bytes == bytes.length.toLong, "identical files must share every chunk")
    assert(math.abs(r.dedup_ratio - 0.5) < 1e-9)
    assert(r.xet_bytes == bytes.length.toLong)
  }

  test("merge semantics: first_seen_in = min file idx, seen_in ascending per-file set") {
    val shared = randomBytes(1 << 20, 12L)
    val only2 = randomBytes(1 << 20, 13L)
    val f1 = writeTemp("a.bin", shared)
    val f2 = writeTemp("b.bin", shared ++ only2)
    val chunks = ChunkRelation.chunkFiles(spark, Seq(f1.toString, f2.toString))
    val m = Estimator.merged(chunks).cache()
    import spark.implicits._
    val bothFiles = m.filter(size(col("seen_in")) === 2)
    assert(bothFiles.count() > 0, "shared prefix must produce chunks seen in both files")
    assert(bothFiles.filter(col("first_seen_in") =!= 0).count() == 0)
    val seenLists = m.select(col("seen_in")).as[Seq[Long]].collect()
    seenLists.foreach(s => assert(s == s.sorted && s.distinct == s))
    m.unpersist()
  }

  test("empty input: estimate returns zeros, not NPE") {
    val empty = writeTemp("empty.bin", Array.emptyByteArray)
    val r = Estimator.estimate(spark, Seq(empty.toString))
    assert(r.total_len == 0 && r.chunk_bytes == 0 && r.dedup_ratio == 0.0)
    val grid = Estimator.estimateGrid(spark, Seq(("g", "f", empty.toString)))
    assert(grid.size == 1 && grid.head.total_len == 0 && grid.head.numfiles == 1)
  }

  test("estimate on real parquet testdata returns sane ratios") {
    val paths = Seq(sf() + "/lineitem.parquet", sf() + "/orders.parquet")
    val r = Estimator.estimate(spark, paths)
    assert(r.total_len > 0)
    assert(r.dedup_ratio > 0.0 && r.dedup_ratio <= 1.0)
    assert(r.compressed_chunk_bytes > 0 && r.compressed_chunk_bytes <= r.chunk_bytes)
  }

  test("metamorphic: append-only edit adds ~appended bytes of unique chunks") {
    val base = randomBytes(4 << 20, 21L)
    val appended = randomBytes(512 << 10, 22L)
    val f1 = writeTemp("a.bin", base)
    val f2 = writeTemp("b.bin", base ++ appended)
    val r = Estimator.estimate(spark, Seq(f1.toString, f2.toString))
    assert(r.total_len == base.length.toLong * 2 + appended.length)
    // unique ≈ base + appended + at most a couple of boundary chunks
    val slack = 2 * 128 * 1024
    assert(r.chunk_bytes >= base.length.toLong + appended.length)
    assert(r.chunk_bytes <= base.length.toLong + appended.length + slack,
      s"unique=${r.chunk_bytes}")
  }

  test("metamorphic: concatenation preserves total bytes") {
    val a = randomBytes(1 << 20, 23L)
    val b = randomBytes(1 << 20, 24L)
    val fa = writeTemp("a.bin", a)
    val fb = writeTemp("b.bin", b)
    val fab = writeTemp("ab.bin", a ++ b)
    val separate = Estimator.estimate(spark, Seq(fa.toString, fb.toString))
    val joined = Estimator.estimate(spark, Seq(fab.toString))
    assert(separate.total_len == joined.total_len)
    // shared content dominates: concatenated file shares almost all chunks
    val both = Estimator.estimate(spark, Seq(fa.toString, fb.toString, fab.toString))
    assert(both.chunk_bytes < both.total_len * 0.6)
  }

  test("metamorphic: sharding the same bytes barely moves unique-chunk bytes") {
    // the reference's varying-file-splits study (BASELINE.md: 5/10/20
    // shards -> same ~3.2 GB unique): gear boundaries are content-local,
    // so only the chunks STRADDLING a split point can change identity —
    // unique bytes shift by at most ~(splits x maxLen), total bytes not
    // at all
    val params = ChunkerParams(
      mask = -1L << (64 - 10), minLen = 256, maxLen = 8 * 1024)
    val blob = randomBytes(512 * 1024, 77L)
    // duplicated content so dedup is non-trivial in every sharding
    val content = blob ++ blob
    def statsOf(splits: Int): (Long, Long) = {
      val dir = Files.createTempDirectory(s"graft-shard$splits")
      val per = content.length / splits
      val files = (0 until splits).map { i =>
        val from = i * per
        val until = if (i == splits - 1) content.length else (i + 1) * per
        val p = dir.resolve(s"part$i.bin")
        Files.write(p, java.util.Arrays.copyOfRange(content, from, until))
        p.toString
      }
      val (total, unique, _) =
        Estimator.stats(ChunkRelation.chunkFiles(spark, files, params))
      (total, unique)
    }
    val Seq((t1, u1), (t4, u4), (t8, u8)) = Seq(1, 4, 8).map(statsOf)
    assert(t1 == content.length.toLong && t4 == t1 && t8 == t1,
      "total bytes are sharding-invariant")
    val slack = 8 * 2 * params.maxLen // straddling chunks per split, both copies
    assert(math.abs(u4 - u1) <= slack, s"u1=$u1 u4=$u4")
    assert(math.abs(u8 - u1) <= slack, s"u1=$u1 u8=$u8")
    // and dedup genuinely happened (content is doubled)
    assert(u1 < t1 * 6 / 10, s"expected ~half unique, got $u1 of $t1")
  }

  test("128-bit identity agrees with 64-bit on collision-free data") {
    val bytes = randomBytes(2 << 20, 31L)
    val f1 = writeTemp("a.bin", bytes)
    val f2 = writeTemp("b.bin", bytes)
    val paths = Seq(f1.toString, f2.toString)
    val (t64, c64, z64) = Estimator.stats(ChunkRelation.chunkFiles(spark, paths))
    val (t128, c128, z128) = Estimator.stats128(ChunkRelation.chunkFiles128(spark, paths))
    assert((t64, c64, z64) == ((t128, c128, z128)))
    assert(c128 == bytes.length.toLong, "identical files share every 128-bit chunk id")
    // the two hash lanes are genuinely independent values
    val wide = ChunkRelation.chunkFiles128(spark, paths).head()
    assert(wide.hash != wide.hash2)
  }

  test("grid estimate: one result per (group, format) with correct numfiles") {
    val a = writeTemp("a.bin", randomBytes(512 << 10, 14L))
    val b = writeTemp("b.bin", randomBytes(512 << 10, 15L))
    val res = Estimator.estimateGrid(
      spark,
      Seq(("g1", "raw", a.toString), ("g1", "raw", b.toString), ("g2", "raw", a.toString)))
    assert(res.size == 2)
    val g1 = res.find(_.group == "g1").get
    assert(g1.numfiles == 2)
    assert(res.find(_.group == "g2").get.numfiles == 1)
    res.foreach(r => assert(r.dedup_ratio > 0 && r.dedup_ratio <= 1.0))
  }

  test("segments: ordered provenance stream with correct length") {
    val bytes = randomBytes(1 << 20, 16L)
    val f1 = writeTemp("a.bin", bytes)
    val f2 = writeTemp("b.bin", bytes)
    val chunks = ChunkRelation.chunkFiles(spark, Seq(f1.toString, f2.toString)).cache()
    val occ = chunks.count()
    val seg = Estimator.segments(chunks).collect()
    assert(seg.length == occ)
    // file 2's chunks are all first seen in file 0 (identical content)
    seg.filter(_.getLong(0) == 1L).foreach(r => assert(r.getLong(4) == 0L))
    chunks.unpersist()
  }
}
