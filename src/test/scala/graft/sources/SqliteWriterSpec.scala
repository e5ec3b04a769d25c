package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import scala.sys.process._

/** Round-trips SqliteWriter's output through the container's REAL sqlite3
  * (python3 stdlib) — the same implementation the reference's sink uses —
  * plus `PRAGMA integrity_check` over the b-tree/overflow structure. This
  * is the S7 verification: the file is read by sqlite itself, not by a
  * re-written reader.
  */
class SqliteWriterSpec extends SparkSpec {

  /** Run a python3 snippet against a db; returns stdout lines. */
  private def py(db: String, script: String): Seq[String] = {
    val full =
      s"""import sqlite3, sys
         |con = sqlite3.connect("$db")
         |$script
         |""".stripMargin
    // force UTF-8 across the subprocess boundary: a C-locale python would
    // otherwise mangle non-ASCII round-trip output in the TEST harness
    Process(Seq("python3", "-c", full), None, "PYTHONIOENCODING" -> "utf-8")
      .!!.linesIterator.toSeq
  }

  test("small mixed-type table reads back exactly through real sqlite") {
    import spark.implicits._
    val df = Seq(
      (0L, 1L, -7L, 3000000000L, 1.5, "hello", Some(true)),
      (1L, 0L, 127L, -3000000000L, -0.25, "wörld √2", Some(false)),
      (2L, 42L, -128L, 140737488355327L, 0.0, null.asInstanceOf[String], None))
      .toDF("id", "a", "b", "c", "d", "s", "flag")
    val path = Files.createTempDirectory("sq").resolve("t.sqlite")
    SqliteWriter.write(df, path, "table")
    assert(py(path.toString,
      """print(con.execute("PRAGMA integrity_check").fetchone()[0])""") == Seq("ok"))
    // ascii() keeps the subprocess pipe 7-bit clean (the JVM decodes the
    // pipe with the platform charset, which is C-locale here)
    val rows = py(path.toString,
      """for r in con.execute('SELECT id, a, b, c, d, s, flag FROM "table" ORDER BY id'):
        |    print(ascii(r))""".stripMargin)
    assert(rows == Seq(
      "(0, 1, -7, 3000000000, 1.5, 'hello', 1)",
      "(1, 0, 127, -3000000000, -0.25, 'w\\xf6rld \\u221a2', 0)",
      "(2, 42, -128, 140737488355327, 0.0, None, None)"), rows.mkString("\n"))
    // schema surfaces with the declared affinities and quoted identifiers
    val schema = py(path.toString,
      """print(con.execute("SELECT sql FROM sqlite_master").fetchone()[0])""")
    assert(schema.head.contains("\"id\" INTEGER") && schema.head.contains("\"d\" REAL")
      && schema.head.contains("\"s\" TEXT"), schema.head)
  }

  test("multi-leaf + interior b-tree and overflow chains are walkable") {
    import spark.implicits._
    // ~3000 rows of ~100 B forces many leaves under one interior level;
    // the planted 10 KiB strings force multi-page overflow chains
    val big = "x" * 10240
    val df = (0L until 3000L)
      .map(i => (i, s"row-$i-" + ("pad" * 30), if (i % 500 == 0) big else s"v$i"))
      .toDF("id", "mid", "payload")
    val path = Files.createTempDirectory("sq").resolve("big.sqlite")
    SqliteWriter.write(df, path, "table")
    assert(py(path.toString,
      """print(con.execute("PRAGMA integrity_check").fetchone()[0])""") == Seq("ok"))
    val out = py(path.toString,
      """n, = con.execute('SELECT COUNT(*) FROM "table"').fetchone()
        |s, = con.execute('SELECT SUM(id) FROM "table"').fetchone()
        |o, = con.execute('SELECT COUNT(*) FROM "table" WHERE LENGTH(payload) = 10240').fetchone()
        |m, = con.execute('SELECT payload FROM "table" WHERE id = 500').fetchone()
        |print(n, s, o, m == "x" * 10240)""".stripMargin)
    assert(out == Seq(s"3000 ${(0L until 3000L).sum} 6 True"), out.mkString)
  }

  test("property: random mixed tables round-trip value-exact through real sqlite") {
    import spark.implicits._
    val rng = new scala.util.Random(97)
    for (trial <- 0 until 8) {
      val n = 1 + rng.nextInt(200)
      val rows = (0L until n.toLong).map { i =>
        (i,
          rng.nextLong(),
          if (rng.nextInt(5) == 0) null
          else rng.alphanumeric.take(rng.nextInt(300)).mkString,
          // exact binary64 values: i/8 avoids float-format round-trip noise
          (rng.nextInt(1000) - 500) / 8.0,
          rng.nextBoolean())
      }
      val df = rows.toDF("id", "v", "s", "d", "b")
      val path = Files.createTempDirectory("sqp").resolve(s"t$trial.sqlite")
      SqliteWriter.write(df, path, "table")
      val got = py(path.toString,
        """print(con.execute("PRAGMA integrity_check").fetchone()[0])
          |for r in con.execute('SELECT id, v, s, d, b FROM "table" ORDER BY id'):
          |    print(ascii(r))""".stripMargin)
      assert(got.head == "ok", s"trial $trial: integrity ${got.head}")
      val expect = rows.map { case (i, v, s, d, b) =>
        val sTxt = if (s == null) "None"
          else "'" + s.flatMap(c => if (c == '\'') "\\'" else c.toString) + "'"
        val dTxt = if (d == d.floor && math.abs(d) < 1e15) f"$d%.1f" else d.toString
        s"($i, $v, $sTxt, $dTxt, ${if (b) 1 else 0})"
      }
      assert(got.tail == expect, s"trial $trial (n=$n) mismatch:\n" +
        got.tail.zip(expect).filter(p => p._1 != p._2).take(3).mkString("\n"))
    }
  }

  test("rewriting a path REPLACES the table (reference de/formats.py:196-202 semantics)") {
    import spark.implicits._
    val path = Files.createTempDirectory("sq").resolve("r.sqlite")
    SqliteWriter.write(
      (0L until 50L).map(i => (i, s"old-$i")).toDF("id", "s"), path, "table")
    // second write: fewer rows, DIFFERENT schema — an append (or a stale
    // schema row) would show up in count, content, or the CREATE TABLE sql
    SqliteWriter.write(
      (0L until 5L).map(i => (i, i * 2.5)).toDF("id", "d"), path, "table")
    val out = py(path.toString,
      """print(con.execute("PRAGMA integrity_check").fetchone()[0])
        |print(con.execute('SELECT COUNT(*) FROM "table"').fetchone()[0])
        |print(con.execute("SELECT COUNT(*) FROM sqlite_master").fetchone()[0])
        |print(con.execute("SELECT sql FROM sqlite_master").fetchone()[0])
        |print(ascii(con.execute('SELECT id, d FROM "table" ORDER BY id').fetchall()))""".stripMargin)
    assert(out(0) == "ok", out.mkString("|"))
    assert(out(1) == "5", s"replace must not append: ${out(1)} rows")
    assert(out(2) == "1", s"exactly one schema row: ${out(2)}")
    assert(out(3).contains("\"d\" REAL") && !out(3).contains("\"s\""), out(3))
    assert(out(4) == "[(0, 0.0), (1, 2.5), (2, 5.0), (3, 7.5), (4, 10.0)]", out(4))
  }

  test("pre-collect cardinality guard fires without materializing the frame") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "s")
    val path = Files.createTempDirectory("sq").resolve("cap.sqlite")
    val e = intercept[IllegalArgumentException] {
      SqliteWriter.write(df, path, "table", maxRows = 10)
    }
    assert(e.getMessage.contains("maxRows=10"))
    assert(!Files.exists(path), "guard must fire before any write")
  }

  test("timestamp (tz + ntz), date, decimal columns write as deterministic TEXT") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(1L, 2L).toDF("id").select(
      col("id"),
      expr("timestamp'2024-03-01 12:34:56.789'").as("ts"),
      expr("timestamp_ntz'2024-03-01 12:34:56.789'").as("tsn"),
      expr("date'2024-03-01'").as("d"),
      (col("id") * 2.5).cast("decimal(10,2)").as("dec"))
    val path = Files.createTempDirectory("sq").resolve("t.sqlite")
    SqliteWriter.write(df, path, "table")
    val out = py(path.toString,
      """print(con.execute("PRAGMA integrity_check").fetchone()[0])
        |print(ascii(con.execute('SELECT ts, tsn, d, dec FROM "table" WHERE id = 1').fetchone()))""".stripMargin)
    assert(out(0) == "ok", out.mkString("|"))
    // session tz is UTC: tz-ts renders as ISO instant, ntz as zone-less ISO
    assert(out(1) ==
      "('2024-03-01T12:34:56.789Z', '2024-03-01T12:34:56.789', '2024-03-01', '2.50')",
      out(1))
  }

  test("nested columns (array/struct/map) write as JSON TEXT sqlite can query") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Seq(1.5f, -2.0f), Map("b" -> 2L, "a" -> 1L)), (2L, Seq.empty[Float], Map.empty[String, Long]))
      .toDF("id", "vec", "m")
      .withColumn("st", struct(col("id").as("k"), lit("x\"y").as("s")))
    val path = Files.createTempDirectory("sq").resolve("n.sqlite")
    SqliteWriter.write(df, path, "table")
    val out = py(path.toString,
      """print(con.execute("PRAGMA integrity_check").fetchone()[0])
        |print(ascii(con.execute('SELECT vec, m, st FROM "table" WHERE id = 1').fetchone()))
        |print(con.execute('SELECT json_extract(vec, "$[1]") FROM "table" WHERE id = 1').fetchone()[0])""".stripMargin)
    assert(out(0) == "ok", out.mkString("|"))
    assert(out(1) == """('[1.5,-2.0]', '{"a":1,"b":2}', '{"k":1,"s":"x\\"y"}')""", out(1))
    assert(out(2) == "-2.0", s"sqlite json_extract must read it back: ${out(2)}")
  }

  test("non-finite floats in nested columns become JSON null (json stays valid)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.5f, Float.NaN, Float.PositiveInfinity), Seq(2.5, Double.NegativeInfinity)))
      .toDF("id", "fv", "dv")
    val path = Files.createTempDirectory("sq").resolve("nf.sqlite")
    SqliteWriter.write(df, path, "table")
    // json_valid is the contract: Java's "NaN"/"Infinity" renderings are
    // rejected by sqlite's json functions as malformed
    val out = py(path.toString,
      """print(con.execute('SELECT json_valid(fv), json_valid(dv) FROM "table"').fetchone())
        |print(con.execute('SELECT fv, dv FROM "table"').fetchone())""".stripMargin)
    assert(out(0) == "(1, 1)", out.mkString("|"))
    assert(out(1) == "('[1.5,null,null]', '[2.5,null]')", out(1))
  }

  test("blobs and an empty table round-trip") {
    import spark.implicits._
    val blobs = Seq((1L, Array[Byte](0, 1, 2, -1)), (2L, Array.emptyByteArray))
      .toDF("id", "content")
    val p1 = Files.createTempDirectory("sq").resolve("b.sqlite")
    SqliteWriter.write(blobs, p1, "table")
    val r = py(p1.toString,
      """for i, c in con.execute('SELECT id, content FROM "table" ORDER BY id'):
        |    print(i, c.hex())""".stripMargin)
    assert(r == Seq("1 000102ff", "2 "), r.mkString("|"))
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val p2 = Files.createTempDirectory("sq").resolve("e.sqlite")
    SqliteWriter.write(empty, p2, "table")
    assert(py(p2.toString,
      """print(con.execute("PRAGMA integrity_check").fetchone()[0])
        |print(con.execute('SELECT COUNT(*) FROM "table"').fetchone()[0])""".stripMargin)
      == Seq("ok", "0"))
  }
}
