package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k by (score DESC, id ASC) as a typed `Aggregator` — the
  * scale-shaped replacement for `row_number().over(Window.partitionBy(g))`
  * + `rank <= k` when only the top k rows per group are wanted.
  *
  * The window form SORTS every group's full row set with parallelism
  * capped at the number of groups — a scale-killer when groups are few and
  * large (every score in a group funnels through one task). This aggregate
  * keeps a ≤ k sorted buffer per (partition, group) instead: Spark plans
  * it as partial + final aggregation, so each input partition reduces
  * locally to at most k entries per group it touches, and only those tiny
  * buffers shuffle. Wall-clock parallelism is the partition count and
  * shuffle volume is O(k · groups · partitions) regardless of corpus size.
  *
  * Determinism contract: the buffer order IS row_number's order-by
  * (score DESC, ties broken by ascending id), so `finish` enumerated with
  * its position 1..k is exactly the window query's (rank, id, score) rows.
  */
final case class TopKBuffer(scores: Array[Double], ids: Array[Long])

class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), TopKBuffer, Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  override def zero: TopKBuffer =
    TopKBuffer(Array.emptyDoubleArray, Array.emptyLongArray)

  // true when (sa, ia) orders strictly before (sb, ib): higher score first,
  // smaller id on ties — row_number's ORDER BY score DESC, id ASC.
  // Double.compare (not >/==) makes the order TOTAL: NaN sorts as the
  // largest double (rank 1 under DESC, exactly Spark's sort order) instead
  // of being silently dropped-or-misplaced by non-total float comparisons,
  // and -0.0 < 0.0 matches Spark's total order too.
  @inline private def before(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c > 0 || (c == 0 && ia < ib)
  }

  override def reduce(b: TopKBuffer, in: (Double, Long)): TopKBuffer = {
    val (s, id) = in
    val n = b.scores.length
    if (n >= k && !before(s, id, b.scores(n - 1), b.ids(n - 1))) b
    else {
      // insertion position: first index whose entry orders after (s, id)
      var ins = 0
      while (ins < n && before(b.scores(ins), b.ids(ins), s, id)) ins += 1
      val m = math.min(n + 1, k)
      val ss = new Array[Double](m)
      val is = new Array[Long](m)
      System.arraycopy(b.scores, 0, ss, 0, ins)
      System.arraycopy(b.ids, 0, is, 0, ins)
      ss(ins) = s
      is(ins) = id
      System.arraycopy(b.scores, ins, ss, ins + 1, m - ins - 1)
      System.arraycopy(b.ids, ins, is, ins + 1, m - ins - 1)
      TopKBuffer(ss, is)
    }
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    if (a.scores.isEmpty) return b
    if (b.scores.isEmpty) return a
    val m = math.min(a.scores.length + b.scores.length, k)
    val ss = new Array[Double](m)
    val is = new Array[Long](m)
    var i = 0
    var j = 0
    var o = 0
    while (o < m) {
      val takeA = j >= b.scores.length ||
        (i < a.scores.length && before(a.scores(i), a.ids(i), b.scores(j), b.ids(j)))
      if (takeA) { ss(o) = a.scores(i); is(o) = a.ids(i); i += 1 }
      else { ss(o) = b.scores(j); is(o) = b.ids(j); j += 1 }
      o += 1
    }
    TopKBuffer(ss, is)
  }

  override def finish(b: TopKBuffer): Seq[(Double, Long)] =
    b.scores.indices.map(i => (b.scores(i), b.ids(i)))

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

/** [[TopKByScore]] with BIGINT scores compared as exact integers — for
  * rankings whose scores are integer-scaled fixed-point values (bm25_rank's
  * score_scaled): a double-keyed buffer would collapse scores past 2^53 to
  * the same key and break the (score DESC, id ASC) total order exactly
  * where ties matter. Same partial+final shape and determinism contract.
  *
  * DELIBERATE mirror of TopKByScore's reduce/merge/finish rather than a
  * shared generic core: the Aggregator encoder needs a concrete buffer
  * case class per score type, and the double variant's comparator carries
  * NaN/-0.0 total-order semantics a shared comparator would have to
  * re-encode. Any logic fix to one MUST be applied to both — TopKSpec
  * pins both variants against the same window-form reference.
  */
class TopKByLongScore(k: Int)
    extends Aggregator[(Long, Long), TopKLongBuffer, Seq[(Long, Long)]] {
  require(k > 0, "k must be positive")

  @inline private def before(sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
    sa > sb || (sa == sb && ia < ib)

  override def zero: TopKLongBuffer =
    TopKLongBuffer(Array.emptyLongArray, Array.emptyLongArray)

  override def reduce(b: TopKLongBuffer, in: (Long, Long)): TopKLongBuffer = {
    val (s, id) = in
    val n = b.scores.length
    if (n >= k && !before(s, id, b.scores(n - 1), b.ids(n - 1))) b
    else {
      var ins = 0
      while (ins < n && before(b.scores(ins), b.ids(ins), s, id)) ins += 1
      val m = math.min(n + 1, k)
      val ss = new Array[Long](m)
      val is = new Array[Long](m)
      System.arraycopy(b.scores, 0, ss, 0, ins)
      System.arraycopy(b.ids, 0, is, 0, ins)
      ss(ins) = s
      is(ins) = id
      System.arraycopy(b.scores, ins, ss, ins + 1, m - ins - 1)
      System.arraycopy(b.ids, ins, is, ins + 1, m - ins - 1)
      TopKLongBuffer(ss, is)
    }
  }

  override def merge(a: TopKLongBuffer, b: TopKLongBuffer): TopKLongBuffer = {
    if (a.scores.isEmpty) return b
    if (b.scores.isEmpty) return a
    val m = math.min(a.scores.length + b.scores.length, k)
    val ss = new Array[Long](m)
    val is = new Array[Long](m)
    var i = 0
    var j = 0
    var o = 0
    while (o < m) {
      val takeA = j >= b.scores.length ||
        (i < a.scores.length && before(a.scores(i), a.ids(i), b.scores(j), b.ids(j)))
      if (takeA) { ss(o) = a.scores(i); is(o) = a.ids(i); i += 1 }
      else { ss(o) = b.scores(j); is(o) = b.ids(j); j += 1 }
      o += 1
    }
    TopKLongBuffer(ss, is)
  }

  override def finish(b: TopKLongBuffer): Seq[(Long, Long)] =
    b.scores.indices.map(i => (b.scores(i), b.ids(i)))

  override def bufferEncoder: Encoder[TopKLongBuffer] =
    Encoders.product[TopKLongBuffer]
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}

final case class TopKLongBuffer(scores: Array[Long], ids: Array[Long])

object TopK {
  /** Column function: `df.groupBy(g).agg(top_k_by_score($"score", $"id", 5))`
    * → array of (score, id) structs ordered by (score DESC, id ASC); explode
    * with posexplode for (rank − 1, entry).
    */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    udaf(new TopKByScore(k)).apply(score, id)

  /** [[top_k_by_score]] over BIGINT scores with exact integer comparison
    * (no 2^53 double collapse); same (score DESC, id ASC) order contract.
    */
  def top_k_by_long_score(score: Column, id: Column, k: Int): Column =
    udaf(new TopKByLongScore(k)).apply(score, id)
}
