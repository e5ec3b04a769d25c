package graft

/** Tripwire: a driver-side testdata regeneration that changes any table's
  * physical schema must fail HERE, naming the drifted column — not three
  * layers deep in whichever query's arithmetic stops analyzing (the round-7
  * events.ts TIMESTAMP(NANOS) → TIMESTAMP(MICROS) flip broke eight queries
  * with no direct signal).
  */
class SchemaContractSpec extends SparkSpec {

  test("sf0.001 testdata matches the schema contract (names drifted columns)") {
    val drift = SchemaContract.diff(spark, sf())
    assert(drift.isEmpty,
      "TESTDATA SCHEMA DRIFT — update graft.Events/SchemaContract and every " +
        "consumer of the drifted column:\n  " + drift.mkString("\n  "))
  }

  test("contract detector actually fires on a wrong type and an extra table") {
    // sanity-check the tripwire itself: a deliberately mistyped view of
    // events must produce a named, column-specific drift line, and an
    // unknown table file must surface as EXTRA
    val dir = java.nio.file.Files.createTempDirectory("contract-neg")
    val ev = spark.read.parquet(sf() + "/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("string"))
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    ev.limit(1).write.mode("overwrite").parquet(s"$dir/surprise.parquet")
    val drift = SchemaContract.diff(spark, dir.toString)
    assert(drift.exists(d => d.startsWith("events.ts:") && d.contains("string")),
      s"expected an events.ts drift line, got: $drift")
    assert(drift.exists(d => d.startsWith("surprise.parquet:") && d.contains("EXTRA table")),
      s"expected an extra-table drift line, got: $drift")
  }
}
