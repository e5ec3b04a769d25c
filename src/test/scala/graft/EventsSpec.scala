package graft

import org.apache.spark.sql.functions._

/** [[Events]] must read the same instant out of every physical layout the
  * testdata has ever shipped for `events.ts`: epoch-nanos BIGINT,
  * TIMESTAMP_NTZ (the current parquet TIMESTAMP(MICROS) reading), and
  * session-zoned TIMESTAMP.
  */
class EventsSpec extends SparkSpec {

  private val instantUs = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  test("microsExpr agrees across long-nanos, TIMESTAMP_NTZ, and TIMESTAMP") {
    import spark.implicits._
    val asLong = Seq(instantUs * 1000L).toDF("ts") // legacy epoch-nanos
    val asNtz = asLong
      .select(timestamp_micros(lit(instantUs)).cast("timestamp_ntz").as("ts"))
    val asTs = asLong.select(timestamp_micros(lit(instantUs)).as("ts"))
    for (df <- Seq(asLong, asNtz, asTs)) {
      val got = df.select(Events.microsExpr(df).as("us")).head().getLong(0)
      assert(got == instantUs, s"${df.schema("ts").dataType}: $got")
    }
  }

  test("eventTimeExpr yields the same TIMESTAMP for every layout") {
    import spark.implicits._
    val asLong = Seq(instantUs * 1000L).toDF("ts")
    val asNtz = asLong
      .select(timestamp_micros(lit(instantUs)).cast("timestamp_ntz").as("ts"))
    val asTs = asLong.select(timestamp_micros(lit(instantUs)).as("ts"))
    val instants = Seq(asLong, asNtz, asTs).map { df =>
      df.select(Events.eventTimeExpr(df).as("event_time"))
        .select(unix_micros(col("event_time"))).head().getLong(0)
    }
    assert(instants.toSet == Set(instantUs), instants.toString)
  }

  test("layout agreement holds across a spread of instants (incl. pre-epoch)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // epoch-negative through 2100, µs precision — the full range the
    // TIMESTAMP(MICROS) physical type can ship
    val instants = Seq(-1234567L, 0L, 1L, 999999L) ++
      Seq.fill(100)((rng.nextDouble() * 4.1e15).toLong - 5e14.toLong)
    val asLong = instants.map(_ * 1000L).toDF("ts")
    def micros(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(Events.microsExpr(df).as("us")).collect().map(_.getLong(0)).toSeq
    val viaLong = micros(asLong)
    val viaNtz = micros(asLong.select(
      timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz").as("ts")))
    val viaTs = micros(asLong.select(
      timestamp_micros(expr("ts div 1000")).as("ts")))
    assert(viaLong == instants)
    assert(viaNtz == instants)
    assert(viaTs == instants)
  }

  test("an unsupported ts type fails loudly, not with shifted arithmetic") {
    import spark.implicits._
    val df = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalArgumentException] { Events.microsExpr(df) }
    assert(e.getMessage.contains("unsupported type"))
  }
}
