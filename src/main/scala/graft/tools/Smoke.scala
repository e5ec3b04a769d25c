package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke runner mirroring the driver's t1 check: run SparkEntry.entry
  * in a forked JVM and assert rows > 0. `sbt "runMain graft.tools.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(20, truncate = false)
    println(s"SMOKE entry rows=$n ${if (n > 0) "OK" else "FAIL"}")
    // extension-registered SQL surface: cdc_chunks via spark.sql.extensions
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "encode(text, 'UTF-8') AS payload")
      .createOrReplaceTempView("smoke_blobs")
    val chunkRows = spark
      .sql("SELECT doc_id, c.hash FROM smoke_blobs LATERAL VIEW cdc_chunks(payload) c")
      .count()
    println(s"SMOKE cdc_chunks-via-extensions rows=$chunkRows ${if (chunkRows > 0) "OK" else "FAIL"}")
    spark.stop()
    if (n == 0 || chunkRows == 0) sys.exit(1)
  }
}
