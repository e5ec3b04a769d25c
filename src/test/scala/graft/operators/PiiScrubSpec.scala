package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class PiiScrubSpec extends SparkSpec {

  private def one(text: String): Row = {
    import spark.implicits._
    PiiScrub.scrub(Seq(text).toDF("text")).select(
      col("scrubbed"), col("n_email"), col("n_phone"), col("n_ipv4"),
      col("n_number"), col("n_redactions")).head()
  }

  test("each rule class redacts and counts independently") {
    val r = one("mail a.b+c@ex-1.org tel 12-345-678-9012 ip 10.0.255.1 acct 1234567 end")
    assert(r.getString(0) == "mail [EMAIL] tel [PHONE] ip [IP] acct [NUM] end")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 1L, 1L, 1L)))
    assert(r.getLong(5) == 4L)
  }

  test("rule order: an email's digits are counted as email, not as digit runs") {
    val r = one("x 123456789@example.com y")
    assert(r.getString(0) == "x [EMAIL] y")
    assert(r.getLong(1) == 1L && r.getLong(4) == 0L)
  }

  test("short digit runs and plain text survive; null text maps to empty") {
    val r = one("order 12345 of 99 units")
    assert(r.getString(0) == "order 12345 of 99 units" && r.getLong(5) == 0L)
    import spark.implicits._
    val n = PiiScrub.scrub(Seq[String](null).toDF("text")).head()
    assert(n.getAs[String]("scrubbed") == "" && n.getAs[Long]("n_redactions") == 0L)
  }

  test("multiple matches of one class are all redacted and counted") {
    val r = one("a@b.co c@d.io 11.22.33.44 55.66.77.88")
    assert(r.getLong(1) == 2L && r.getLong(3) == 2L)
    assert(r.getString(0) == "[EMAIL] [EMAIL] [IP] [IP]")
  }

  test("rules are validated: empty and duplicate names rejected") {
    import spark.implicits._
    val df = Seq("x").toDF("text")
    assertThrows[IllegalArgumentException](PiiScrub.scrub(df, rules = Seq.empty))
    assertThrows[IllegalArgumentException](PiiScrub.scrub(df, rules = Seq(
      PiiScrub.PiiRule("a", "x", "y"), PiiScrub.PiiRule("a", "z", "w"))))
    // output-column collision is loud, not a silent clobber
    val already = PiiScrub.scrub(df)
    assertThrows[IllegalArgumentException](PiiScrub.scrub(already, "scrubbed"))
  }
}
