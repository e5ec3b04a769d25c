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
  * (0,1), the kth minimum v̂ ≈ k/(n+1), so n̂ = k/v̂ − 1. Buffers are a
  * bounded sorted array of k longs (k·8 bytes), merged by union+truncate —
  * associative and commutative, so Spark's partial aggregation
  * distributes it like any built-in.
  *
  * Versus HLL (`approx_count_distinct`): KMV buffers also support set
  * operations on the retained sample (union shown here; intersection /
  * Jaccard estimation is the standard extension), which HLL registers
  * cannot. That is why the dedup literature builds on KMV.
  */
final case class KmvBuffer(values: Array[Long]) // sorted ascending, ≤ k entries

class KmvSketch(k: Int) extends Aggregator[Long, KmvBuffer, Long] {
  require(k >= 16, "k < 16 gives useless variance")

  override def zero: KmvBuffer = KmvBuffer(Array.emptyLongArray)

  /** Map a hash to an unsigned-comparable long (flip the sign bit) so
    * "k minimum values" is over the uniform [0, 2^64) interpretation.
    */
  @inline private def toUnsignedOrder(h: Long): Long = h ^ Long.MinValue

  override def reduce(b: KmvBuffer, hash: Long): KmvBuffer = {
    val v = toUnsignedOrder(hash)
    val arr = b.values
    if (arr.length >= k && v >= arr(arr.length - 1)) b
    else {
      val idx = java.util.Arrays.binarySearch(arr, v)
      if (idx >= 0) b // duplicate hash: a set sketch ignores it
      else {
        val ins = -idx - 1
        val n = math.min(arr.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(arr, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(arr, ins, out, ins + 1, n - ins - 1)
        KmvBuffer(out)
      }
    }
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    if (a.values.isEmpty) return b
    if (b.values.isEmpty) return a
    // sorted union, dedup, truncate to k
    val out = new Array[Long](math.min(a.values.length + b.values.length, k))
    var i = 0
    var j = 0
    var o = 0
    var last = 0L
    var hasLast = false
    while (o < out.length && (i < a.values.length || j < b.values.length)) {
      val v =
        if (j >= b.values.length || (i < a.values.length && a.values(i) <= b.values(j))) {
          val x = a.values(i); i += 1; x
        } else { val x = b.values(j); j += 1; x }
      if (!hasLast || v != last) { out(o) = v; o += 1; last = v; hasLast = true }
    }
    KmvBuffer(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
  }

  override def finish(b: KmvBuffer): Long = {
    val m = b.values.length
    if (m < k) m.toLong // fewer than k distinct: the sample IS the set
    else {
      // v̂ = kth minimum as fraction of the unsigned 2^64 interval
      val kth = b.values(m - 1)
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
  override def finish(b: KmvBuffer): Array[Long] = b.values
  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvSketch {
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
