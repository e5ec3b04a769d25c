package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = time("read docs") {
      val d = spark.read.parquet(s"$sfDir/documents.parquet").cache()
      d.count(); d
    }
    val pairs = time("ngramJaccardPairs cold") {
      graft.operators.Dedupe.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.3)
    }
    println(s"[probe] pairs rows = ${pairs.count()}")
    val clusters = time("duplicateClusters") {
      val c = graft.operators.Dedupe.duplicateClusters(pairs, maxIter = 40)
      c.count(); c
    }
    println(s"[probe] cluster rows = ${clusters.count()}")
    spark.stop()
  }
}
