package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: one JSON line with per-query wall times.
  *
  * Hygiene: queries run in FIXED (sorted) order so per-query numbers are
  * comparable across rounds, and a warmup pass (one scan-agg + one chunker
  * query, excluded from totals) absorbs JVM/codegen/classloading cost that
  * otherwise lands on whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.ts is TIMESTAMP(NANOS); Spark 4 rejects it unless read as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: exercise scan+shuffle+window+UDF code paths once, discarded
    // NonFatal only: an OOM/fatally-broken JVM must abort, not proceed into
    // the timed section and report bogus numbers
    // stream_dedup/stream_join warm the streaming machinery (state-store
    // providers, micro-batch planner, join state classes) whose one-time
    // class-loading otherwise lands on the first timed streaming query;
    // nothing persists across runs, so no timed work moves out
    for (w <- Seq("q01_pricing_summary", "q05_window_best", "dedup_exact",
        "stream_dedup", "stream_join"))
      SparkEntry.queries.get(w).foreach { fn =>
        try fn(spark, sfDir).count()
        catch { case scala.util.control.NonFatal(_) => () }
      }
    // code-path warmup on a TINY in-session dataset (never the sf data —
    // that would pre-fill the catalog's shared caches and move real work
    // out of the timed section): JITs the typed-kernel encoders,
    // collect_list aggregate, and union-find/window paths the dedup
    // family compiles on first use. On a real cluster these compile once
    // per executor and never appear in steady-state numbers.
    try {
      import spark.implicits._
      val tiny = (0L until 64L)
        .map(i => (i, s"warm doc $i shares words with doc ${i / 2}"))
        .toDF("doc_id", "text")
      val pairs = graft.operators.Dedupe.ngramJaccardPairs(
        tiny, "doc_id", "text", k = 3, threshold = 0.1)
      graft.operators.Dedupe.duplicateClusters(pairs).count()
      pairs.unpersist()
    } catch { case scala.util.control.NonFatal(_) => () }

    // local-iteration subset (comma-separated names); full sorted catalog
    // when unset — the driver's per-round run never sets it
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
