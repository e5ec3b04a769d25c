package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a typed Spark
  * `Aggregator` — the custom-aggregate extension point SURVEY §2.8/§4
  * reserves for sketching (public algorithm: Bar-Yossef et al. 2002; the
  * GB-KMV line of work per PAPERS.md).
  *
  * Estimator: with the k smallest of n distinct uniform hashes mapped to
  * (0,1), the kth minimum v̂ ≈ k/(n+1), so n̂ = k/v̂ − 1. The buffer is a
  * bounded sorted array of ≤ k longs plus an AMORTIZED unsorted scratch
  * (≤ k/4 entries): candidate values append O(1) and fold into the
  * sorted half only when the scratch fills (sort + merge-dedup +
  * truncate-to-k). The compacted result depends only on the SET of
  * values seen, so the buffering is observationally invisible —
  * estimates are bit-identical to the naive insert-per-row sketch — but
  * the fill cost drops from O(k²) array copies (which made large-k
  * sketches unusable at corpus scale) to O(n + (n/k)·k log k). Merged by
  * union+truncate — associative and commutative, so Spark's partial
  * aggregation distributes it like any built-in.
  *
  * Versus HLL (`approx_count_distinct`): KMV buffers also support set
  * operations on the retained sample (union shown here; intersection /
  * Jaccard estimation is the standard extension), which HLL registers
  * cannot. That is why the dedup literature builds on KMV.
  */
final case class KmvBuffer(
    values: Array[Long], // sorted ascending (unsigned order), ≤ k entries
    scratch: Array[Long], // unsorted pending candidates
    used: Int) // live prefix of scratch

class KmvSketch(k: Int) extends Aggregator[Long, KmvBuffer, Long] {
  require(k >= 16, "k < 16 gives useless variance")

  private val scratchCap = math.max(64, k / 4)

  override def zero: KmvBuffer =
    KmvBuffer(Array.emptyLongArray, Array.emptyLongArray, 0)

  /** Map a hash to an unsigned-comparable long (flip the sign bit) so
    * "k minimum values" is over the uniform [0, 2^64) interpretation.
    */
  @inline private def toUnsignedOrder(h: Long): Long = h ^ Long.MinValue

  override def reduce(b: KmvBuffer, hash: Long): KmvBuffer = {
    val v = toUnsignedOrder(hash)
    val vals = b.values
    // once the sorted half is saturated its last entry bounds the kth
    // minimum from above — anything ≥ it can never enter the sample.
    // (Pending scratch may hold smaller values, making the true bound
    // tighter; over-accepting is harmless — compaction truncates.)
    if (vals.length >= k && v >= vals(vals.length - 1)) b
    else {
      val scr =
        if (b.scratch.length == 0) new Array[Long](scratchCap) else b.scratch
      scr(b.used) = v
      // arrays are shared with the (now-dead) input buffer — the
      // documented Aggregator mutate-and-return pattern
      val nb = KmvBuffer(vals, scr, b.used + 1)
      if (nb.used == scr.length) compact(nb) else nb
    }
  }

  /** Fold the scratch into the sorted half: sort, merge-dedup with
    * `values`, truncate to k. Set-deterministic, so WHEN compaction runs
    * never affects the final sample.
    */
  private[functions] def compact(b: KmvBuffer): KmvBuffer = {
    if (b.used == 0) {
      if (b.scratch.length == 0) b
      else KmvBuffer(b.values, Array.emptyLongArray, 0)
    } else {
      val s = java.util.Arrays.copyOf(b.scratch, b.used)
      java.util.Arrays.sort(s)
      KmvBuffer(mergeTrunc(b.values, s), Array.emptyLongArray, 0)
    }
  }

  /** Sorted union with dedup, truncated to k. `b` may carry adjacent
    * duplicates (a just-sorted scratch); `a` never does.
    */
  private def mergeTrunc(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0
    var j = 0
    var o = 0
    var last = 0L
    var hasLast = false
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val x = a(i); i += 1; x
        } else { val x = b(j); j += 1; x }
      if (!hasLast || v != last) { out(o) = v; o += 1; last = v; hasLast = true }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    val ca = compact(a)
    val cb = compact(b)
    if (ca.values.isEmpty) return cb
    if (cb.values.isEmpty) return ca
    KmvBuffer(mergeTrunc(ca.values, cb.values), Array.emptyLongArray, 0)
  }

  override def finish(b: KmvBuffer): Long = {
    val vals = compact(b).values
    val m = vals.length
    if (m < k) m.toLong // fewer than k distinct: the sample IS the set
    else {
      // v̂ = kth minimum as fraction of the unsigned 2^64 interval
      val kth = vals(m - 1)
      val frac = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      math.max(m.toLong, math.round(k / frac - 1))
    }
  }

  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Same sketch, but finishing to the raw k-minimum sample so set
  * operations can run on collected buffers (the KMV advantage over HLL).
  */
class KmvBufferAgg(k: Int) extends Aggregator[Long, KmvBuffer, Array[Long]] {
  private val inner = new KmvSketch(k)
  override def zero: KmvBuffer = inner.zero
  override def reduce(b: KmvBuffer, h: Long): KmvBuffer = inner.reduce(b, h)
  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = inner.merge(a, b)
  override def finish(b: KmvBuffer): Array[Long] = inner.compact(b).values
  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvSketch {
  /** Default k for the corpus-triage operators (`dedup_lines_approx`,
    * `dedup_spans_approx` and their streaming twins, plus the CLI
    * reports that print it): exact below 2¹⁸ ≈ 262k distinct
    * identities, rsd ≈ 1/√(k−2) ≈ 0.2 % saturated, state ≤ k longs
    * (2 MiB). One definition so the operators' defaults and the CLI
    * report strings can never drift.
    */
  val TriageK: Int = 1 << 18

  /** Default k for the PER-SOURCE triage slices
    * (`dedup_spans_approx_source` and the guard that verifies it):
    * groups are |sources|-bounded, so each group pays its own sketch —
    * 2¹⁴ (128 KiB per partial) keeps |partitions| × |sources| merge
    * traffic small while staying exact below 16k distinct identities
    * per source (both verification SFs: ≤ 9.7k). One definition so the
    * operator, its saturation guard, and any report string can never
    * drift — the same reason [[TriageK]] exists for the corpus-level k.
    */
  val SourceTriageK: Int = 1 << 14

  /** Column function: `df.agg(kmv_distinct($"hash"))`. */
  def kmv_distinct(c: Column, k: Int = 1024): Column = udaf(new KmvSketch(k)).apply(c)

  /** Column function returning the raw sorted k-minimum sample. */
  def kmv_sample(c: Column, k: Int = 1024): Column = udaf(new KmvBufferAgg(k)).apply(c)

  /** Jaccard estimate from two KMV samples built with the SAME k
    * (Bar-Yossef-style). `k` is required (no default): it must equal the k
    * the samples were built with — a mismatched k silently mis-classifies
    * saturation and biases the estimate with no error.
    * Saturation-aware: a saturated sample (length == k)
    * only has membership information below its kth minimum, so the union is
    * truncated at the smallest saturated sample's max before counting —
    * using values beyond that would count unknowable members as absent and
    * bias the estimate low. When neither sample is saturated the samples
    * ARE the sets and the result is the exact Jaccard.
    */
  def jaccardEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val setA = a.toSet
    val setB = b.toSet
    // unsigned-order threshold: min over saturated samples' last values
    val thresholds =
      (if (a.length >= k) Seq(a.last) else Seq.empty) ++
        (if (b.length >= k) Seq(b.last) else Seq.empty)
    val union0 = (setA ++ setB).toArray.sorted
    val union =
      if (thresholds.isEmpty) union0
      else union0.filter(_ <= thresholds.min).take(k)
    if (union.isEmpty) 0.0
    else union.count(v => setA.contains(v) && setB.contains(v)).toDouble / union.length
  }
}
