package graft

/** The span_dedup (doc_id, span_idx) → doc_id·10⁶ + span_idx packing is
  * only order-isomorphic while span_idx < 10⁶; a document past 8M tokens
  * must raise instead of silently aliasing another doc's spans.
  */
class SpanGuardSpec extends SparkSpec {

  private def messages(t: Throwable): List[String] =
    if (t == null) Nil
    else Option(t.getMessage).toList ++ messages(t.getCause)

  test("span_dedup raises on a planted >8M-token document") {
    import spark.implicits._
    // 8,000,016 single-char words → ⌈dl/8⌉ = 1,000,002 spans, so the last
    // span_idx (1,000,001) crosses the 10⁶ packing bound
    val big = "a ".repeat(8000016).trim
    val df = Seq((42L, big)).toDF("doc_id", "text")
    val e = intercept[Exception] { TextQueries.spanDedupOn(df).collect() }
    assert(messages(e).exists(_.contains("span_dedup")),
      s"expected the span_dedup packing guard, got: ${messages(e).take(3)}")
  }

  test("span_dedup passes docs at the packing bound") {
    import spark.implicits._
    // exactly 10⁶ spans (span_idx max = 999,999) stays legal
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h i"))
      .toDF("doc_id", "text")
    val rows = TextQueries.spanDedupOn(df).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(1)).sum == 3) // 1 + 2 spans
  }
}
