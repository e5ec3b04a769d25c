package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Interleaved A/B harness for the line-family front-half grouping
  * strategies (test scope only — never ships):
  * `sbt "Test/runMain graft.LinesAb [corpusDir] [rounds]"`.
  *
  * Times the dedup_lines report and the dedup_lines_cut rewrite under
  * BOTH [[graft.operators.LineDedupe.HashFirstGroup]] strategies,
  * alternating string→hash within each round so the two sides of every
  * published ratio run seconds apart in the same host window — two
  * separate sweeps are NOT comparable on this burst-noisy shared box
  * (round-19 measurement: back-to-back sweeps' sentinel floors read
  * 0.26 s vs 0.44 s, a 1.7× box drift that dwarfed the strategy delta).
  * Mins per (query, strategy) across rounds are the published figures.
  */
object LinesAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_x100")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def paged(d: String) = TextQueries.pageTransform(
      spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("source"), col("text")))

    def time(hf: Boolean, cut: Boolean, d: String): Double = {
      val t0 = System.nanoTime()
      graft.operators.Dedupe.withTrackedCaches {
        val df =
          if (cut) graft.operators.LineDedupe.cutDuplicateLines(
            paged(d), "doc_id", "text", 10, hashFirstGroup = hf)
          else graft.operators.LineDedupe.duplicateLines(
            paged(d), "doc_id", "text", 10, hashFirstGroup = hf)
        df.count()
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm both code paths on the 1× corpus (JIT + codegen); same env
    // override every other harness honors
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (hf <- Seq(false, true); cut <- Seq(false, true))
      time(hf, cut, warmDir)

    val best = scala.collection.mutable.Map
      .empty[(String, String), Double].withDefaultValue(Double.MaxValue)
    for (r <- 1 to rounds; cut <- Seq(false, true)) {
      val q = if (cut) "cut" else "report"
      val a = time(hf = false, cut, dir)
      val b = time(hf = true, cut, dir)
      best(("string", q)) = math.min(best(("string", q)), a)
      best(("hash", q)) = math.min(best(("hash", q)), b)
      println(f"[lines-ab] round $r $q%-6s string $a%7.2f s  hash $b%7.2f s  (hash/string ${b / a}%.3f)")
    }
    for (q <- Seq("report", "cut"))
      println(f"[lines-ab] MIN $q%-6s string ${best(("string", q))}%7.2f s  " +
        f"hash ${best(("hash", q))}%7.2f s  (hash/string ${best(("hash", q)) / best(("string", q))}%.3f)")
    spark.stop()
  }
}
