package graft.sources

import graft.SparkSpec
import graft.operators.CompareFormats
import graft.synthetic.{DType, DataGenerator, EditPoints}
import java.nio.file.Files

class FormatsSpec extends SparkSpec {

  private lazy val gen = new DataGenerator(DType.parseSchema("""{"a": "int", "b": "str"}"""), 42L)

  test("parquet writer round-trips and respects naming") {
    val df = gen.generate(spark, 100)
    val dir = Files.createTempDirectory("graft-fmt")
    val fmt = TableFormat.ParquetFormat("zstd")
    val paths = fmt.write(df, dir, "g1", "t1")
    assert(paths.size == 1)
    assert(paths.head.endsWith("g1/parquet-zstd/t1.parquet"))
    val back = spark.read.parquet(paths.head)
    assert(back.count() == 100)
    assert(back.columns.toSet == df.columns.toSet)
  }

  test("orc writer round-trips and respects naming") {
    val df = gen.generate(spark, 100)
    val dir = Files.createTempDirectory("graft-fmt")
    val paths = TableFormat.OrcFormat("none").write(df, dir, "g1", "t1")
    assert(paths.size == 1)
    assert(paths.head.endsWith("g1/orc-none/t1.orc"))
    val back = spark.read.orc(paths.head)
    assert(back.count() == 100)
    assert(back.columns.toSet == df.columns.toSet)
  }

  test("jsonlines writer writes newline-delimited json") {
    val df = gen.generate(spark, 50)
    val dir = Files.createTempDirectory("graft-fmt")
    val paths = TableFormat.JsonLinesFormat(None).write(df, dir, "g", "t")
    val lines = Files.readAllLines(java.nio.file.Paths.get(paths.head))
    assert(lines.size == 50)
    assert(lines.get(0).startsWith("{"))
  }

  test("jsonlines gzip and lz4 writers collect their part files; zstd rejected") {
    val df = gen.generate(spark, 30)
    val dir = Files.createTempDirectory("graft-fmt")
    Seq("gzip", "lz4").foreach { codec =>
      val paths = TableFormat.JsonLinesFormat(Some(codec)).write(df, dir, "g", s"t-$codec")
      assert(paths.size == 1, s"$codec: $paths")
      assert(Files.size(java.nio.file.Paths.get(paths.head)) > 0)
    }
    intercept[IllegalArgumentException] { TableFormat.JsonLinesFormat(Some("zstd")) }
  }

  test("row-group size knob produces multiple row groups") {
    val df = gen.generate(spark, 5000)
    val dir = Files.createTempDirectory("graft-fmt")
    val paths = TableFormat
      .ParquetFormat("none", rowGroupBytes = Some(64 * 1024))
      .write(df, dir, "g", "t")
    val stats = PageProfiler.pageStats(spark, paths)
    val rgs = stats.select("row_group").distinct().count()
    assert(rgs > 1, s"expected multiple row groups, got $rgs")
  }

  test("page profiler reports data pages with positive sizes") {
    val stats = PageProfiler.pageStats(spark, Seq(sf() + "/lineitem.parquet"))
    import org.apache.spark.sql.functions._
    val dataPages = stats.filter(col("page_type") === "data")
    assert(dataPages.count() > 0)
    assert(dataPages.filter(col("uncompressed_bytes") <= 0).count() == 0)
    assert(dataPages.filter(col("num_values") <= 0).count() == 0)
    val hist = PageProfiler.pageSizeHistogram(stats)
    assert(hist.count() > 0)
  }

  test("compare grid over synthetic variants: appended group dedups best") {
    val n = 20000L
    val tables = gen.generateSyntheticTables(spark, n, EditPoints.linspace(2), 100)
    val dir = Files.createTempDirectory("graft-grid")
    // compare original vs each variant in its own group (reference's
    // synthetic grid groups by variant, each group = {original, variant})
    val grouped = Map(
      "appended" -> Map("original" -> tables("original"), "appended" -> tables("appended")),
      "updated" -> Map("original" -> tables("original"), "updated" -> tables("updated")))
    val results = CompareFormats.compareTables(
      spark, grouped, Seq(TableFormat.ParquetFormat("none")), dir)
    assert(results.size == 2)
    results.foreach { r =>
      assert(r.numfiles == 2)
      assert(r.dedup_ratio > 0 && r.dedup_ratio <= 1.0)
    }
    val report = CompareFormats.formatReport(results)
    assert(report.contains("appended") && report.contains("parquet-none"))
    val md = CompareFormats.formatMarkdown(results)
    assert(md.startsWith("| group |") && md.contains("**"))
    val html = CompareFormats.barReportHtml(results)
    assert(html.contains("<h2>appended</h2>") && html.contains("<h2>updated</h2>"))
    assert(html.contains("parquet-none") && html.contains("class=\"bar\""))
    // one bar per result row, legend present, dark-mode block present
    assert(html.sliding(11).count(_ == "class=\"bar\"") == results.size)
    assert(html.contains("class=\"legend\"") && html.contains("prefers-color-scheme:dark"))
  }

  test("provenance png renders without error") {
    val segments = Seq.tabulate(100)(i => ((i % 3).toLong, 1000L + i))
    val out = Files.createTempDirectory("graft-viz").resolve("prov.png")
    graft.tools.Viz.provenancePng(segments, out)
    assert(Files.size(out) > 0)
    val img = javax.imageio.ImageIO.read(out.toFile)
    assert(img.getWidth == 256 && img.getHeight == 256)
  }
}
