package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries / space-saving heavy-hitters sketch as a typed Aggregator
  * (public algorithms: Misra-Gries '82; Metwally et al. SpaceSaving '05;
  * mergeable-summaries form per Agarwal et al. PODS'12) — the bounded-
  * memory token-frequency operator a vocabulary/stopword pass needs at
  * 100 TB, where an exact groupBy over raw tokens would shuffle the full
  * token stream.
  *
  * Buffer: ≤ `capacity` (key, count) counters, keys kept sorted for
  * O(log k) lookup. Update: increment if present; insert if room;
  * otherwise decrement ALL counters by one (amortized O(1) — each
  * decrement cancels a prior increment) dropping zeros, and add one to
  * the global decrement total. Merge: sum counters pairwise, then shrink
  * back to capacity by subtracting the (capacity+1)-th largest count.
  *
  * Guarantees: est_count ∈ [true − decs, true], with decs ≤ n/(capacity+1);
  * every key with true count > n/(capacity+1) is retained. When the
  * distinct-key count never exceeds the capacity, no decrement ever fires
  * and the counts are EXACT (decs = 0) — the property the DuckDB oracle
  * verifies at the correctness SF.
  */
final case class HhBuffer(keys: Array[String], counts: Array[Long], decs: Long)

class HeavyHittersAgg(capacity: Int)
    extends Aggregator[String, HhBuffer, Array[(String, Long, Long)]] {
  require(capacity >= 1, "capacity must be >= 1")

  override def zero: HhBuffer = HhBuffer(Array.empty, Array.emptyLongArray, 0L)

  override def reduce(b: HhBuffer, key: String): HhBuffer = {
    if (key == null) return b
    val idx = java.util.Arrays.binarySearch(b.keys.asInstanceOf[Array[AnyRef]],
      key, null)
    if (idx >= 0) {
      b.counts(idx) += 1L // in-place: Spark owns the buffer between rows
      b
    } else if (b.keys.length < capacity) {
      val ins = -idx - 1
      val keys = new Array[String](b.keys.length + 1)
      val counts = new Array[Long](b.counts.length + 1)
      System.arraycopy(b.keys, 0, keys, 0, ins)
      System.arraycopy(b.counts, 0, counts, 0, ins)
      keys(ins) = key
      counts(ins) = 1L
      System.arraycopy(b.keys, ins, keys, ins + 1, b.keys.length - ins)
      System.arraycopy(b.counts, ins, counts, ins + 1, b.counts.length - ins)
      HhBuffer(keys, counts, b.decs)
    } else {
      // Misra-Gries step: the new key and one unit of every counter cancel
      var zeros = 0
      var i = 0
      while (i < b.counts.length) {
        b.counts(i) -= 1L
        if (b.counts(i) == 0L) zeros += 1
        i += 1
      }
      if (zeros == 0) HhBuffer(b.keys, b.counts, b.decs + 1L)
      else {
        val keys = new Array[String](b.keys.length - zeros)
        val counts = new Array[Long](b.counts.length - zeros)
        var o = 0
        i = 0
        while (i < b.counts.length) {
          if (b.counts(i) > 0L) { keys(o) = b.keys(i); counts(o) = b.counts(i); o += 1 }
          i += 1
        }
        HhBuffer(keys, counts, b.decs + 1L)
      }
    }
  }

  override def merge(a: HhBuffer, b: HhBuffer): HhBuffer = {
    if (a.keys.isEmpty) return b
    if (b.keys.isEmpty) return a
    // sorted-merge the counter sets, summing counts for shared keys
    val keys = new Array[String](a.keys.length + b.keys.length)
    val counts = new Array[Long](keys.length)
    var i = 0; var j = 0; var o = 0
    while (i < a.keys.length || j < b.keys.length) {
      val cmp =
        if (i >= a.keys.length) 1
        else if (j >= b.keys.length) -1
        else a.keys(i).compareTo(b.keys(j))
      if (cmp == 0) {
        keys(o) = a.keys(i); counts(o) = a.counts(i) + b.counts(j); i += 1; j += 1
      } else if (cmp < 0) { keys(o) = a.keys(i); counts(o) = a.counts(i); i += 1 }
      else { keys(o) = b.keys(j); counts(o) = b.counts(j); j += 1 }
      o += 1
    }
    var decs = a.decs + b.decs
    if (o <= capacity) {
      HhBuffer(java.util.Arrays.copyOf(keys.asInstanceOf[Array[AnyRef]], o)
        .asInstanceOf[Array[String]], java.util.Arrays.copyOf(counts, o), decs)
    } else {
      // mergeable-summaries shrink: subtract the (capacity+1)-th largest
      // count from everyone, drop non-positive
      val sorted = java.util.Arrays.copyOf(counts, o)
      java.util.Arrays.sort(sorted)
      val d = sorted(o - capacity - 1)
      decs += d
      var keep = 0
      var t = 0
      while (t < o) { if (counts(t) - d > 0L) keep += 1; t += 1 }
      val k2 = new Array[String](keep)
      val c2 = new Array[Long](keep)
      var w = 0
      t = 0
      while (t < o) {
        if (counts(t) - d > 0L) { k2(w) = keys(t); c2(w) = counts(t) - d; w += 1 }
        t += 1
      }
      HhBuffer(k2, c2, decs)
    }
  }

  override def finish(b: HhBuffer): Array[(String, Long, Long)] =
    b.keys.indices.map(i => (b.keys(i), b.counts(i), b.decs)).toArray

  override def bufferEncoder: Encoder[HhBuffer] = Encoders.product[HhBuffer]
  override def outputEncoder: Encoder[Array[(String, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(String, Long, Long)]]()
}

object HeavyHitters {
  /** `df.agg(heavy_hitters($"token"))` → array of
    * (key, est_count, max_undercount) entries.
    */
  def heavy_hitters(c: Column, capacity: Int = 1024): Column =
    udaf(new HeavyHittersAgg(capacity)).apply(c)
}
