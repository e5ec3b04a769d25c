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
  * Buffer: preallocated capacity-sized (key, count) arrays with a `used`
  * watermark, keys kept sorted for O(log k) lookup; inserts shift in
  * place, so the hot path allocates nothing per token. Update: increment
  * if present; insert if room; otherwise decrement ALL counters by one
  * (amortized O(1) — each decrement cancels a prior increment) compacting
  * zeros in place, and add one to the global decrement total. Merge: sum
  * counters pairwise, then shrink back to capacity by subtracting the
  * (capacity+1)-th largest count. The decrement total survives EVERY
  * path, including merging with an empty-counter buffer (a buffer can
  * hold zero counters yet nonzero decs).
  *
  * Guarantees: est_count ∈ [true − decs, true], with decs ≤ n/(capacity+1);
  * every key with true count > n/(capacity+1) is retained. When the
  * distinct-key count never exceeds the capacity, no decrement ever fires
  * and the counts are EXACT (decs = 0) — the property the DuckDB oracle
  * verifies at the correctness SF.
  */
final case class HhBuffer(
    keys: Array[String], counts: Array[Long], used: Int, decs: Long)

class HeavyHittersAgg(capacity: Int)
    extends Aggregator[String, HhBuffer, Array[(String, Long, Long)]] {
  require(capacity >= 1, "capacity must be >= 1")

  override def zero: HhBuffer = HhBuffer(Array.empty, Array.emptyLongArray, 0, 0L)

  override def reduce(b0: HhBuffer, key: String): HhBuffer = {
    if (key == null) return b0
    // lazily size the arrays once; in-place mutation is the Aggregator
    // contract for reduce (Spark owns the buffer between rows)
    val b =
      if (b0.keys.length < capacity)
        HhBuffer(java.util.Arrays.copyOf(b0.keys.asInstanceOf[Array[AnyRef]],
          capacity).asInstanceOf[Array[String]],
          java.util.Arrays.copyOf(b0.counts, capacity), b0.used, b0.decs)
      else b0
    val idx = java.util.Arrays.binarySearch(
      b.keys.asInstanceOf[Array[AnyRef]], 0, b.used, key)
    if (idx >= 0) {
      b.counts(idx) += 1L
      b
    } else if (b.used < capacity) {
      val ins = -idx - 1
      System.arraycopy(b.keys, ins, b.keys, ins + 1, b.used - ins)
      System.arraycopy(b.counts, ins, b.counts, ins + 1, b.used - ins)
      b.keys(ins) = key
      b.counts(ins) = 1L
      HhBuffer(b.keys, b.counts, b.used + 1, b.decs)
    } else {
      // Misra-Gries step: the new key and one unit of every counter cancel
      var o = 0
      var i = 0
      while (i < b.used) {
        val c = b.counts(i) - 1L
        if (c > 0L) { b.keys(o) = b.keys(i); b.counts(o) = c; o += 1 }
        i += 1
      }
      HhBuffer(b.keys, b.counts, o, b.decs + 1L)
    }
  }

  override def merge(a: HhBuffer, b: HhBuffer): HhBuffer = {
    // decs must survive an empty-counter side: a partition can decrement
    // away every counter yet still carry undercount debt
    if (a.used == 0) return b.copy(decs = a.decs + b.decs)
    if (b.used == 0) return a.copy(decs = a.decs + b.decs)
    // sorted-merge the counter sets, summing counts for shared keys
    val keys = new Array[String](a.used + b.used)
    val counts = new Array[Long](keys.length)
    var i = 0; var j = 0; var o = 0
    while (i < a.used || j < b.used) {
      val cmp =
        if (i >= a.used) 1
        else if (j >= b.used) -1
        else a.keys(i).compareTo(b.keys(j))
      if (cmp == 0) {
        keys(o) = a.keys(i); counts(o) = a.counts(i) + b.counts(j); i += 1; j += 1
      } else if (cmp < 0) { keys(o) = a.keys(i); counts(o) = a.counts(i); i += 1 }
      else { keys(o) = b.keys(j); counts(o) = b.counts(j); j += 1 }
      o += 1
    }
    var decs = a.decs + b.decs
    if (o <= capacity) HhBuffer(keys, counts, o, decs)
    else {
      // mergeable-summaries shrink: subtract the (capacity+1)-th largest
      // count from everyone, drop non-positive
      val sorted = java.util.Arrays.copyOf(counts, o)
      java.util.Arrays.sort(sorted)
      val d = sorted(o - capacity - 1)
      decs += d
      var w = 0
      var t = 0
      while (t < o) {
        if (counts(t) - d > 0L) { keys(w) = keys(t); counts(w) = counts(t) - d; w += 1 }
        t += 1
      }
      HhBuffer(keys, counts, w, decs)
    }
  }

  override def finish(b: HhBuffer): Array[(String, Long, Long)] =
    (0 until b.used).map(i => (b.keys(i), b.counts(i), b.decs)).toArray

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
