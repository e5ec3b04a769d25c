package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local profiling harness (test scope only — never ships):
  * `sbt "Test/runMain graft.Scratch <query> [runs] [sfDir]"` times a catalog
  * query N times in one session and prints the final plan.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("doc_select_topk")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(s"RUN$i: ${(System.nanoTime() - t0) / 1e9}")
    }
    if (sys.env.contains("SCRATCH_EXPLAIN"))
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
