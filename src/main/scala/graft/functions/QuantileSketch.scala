package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic mergeable quantile sketch as a typed Aggregator — the
  * bounded-memory distribution profiler (doc lengths, token counts,
  * chunk sizes) for corpora where collecting a column to sort is not an
  * option. Multi-level compactor structure per KLL (Karnin, Lang,
  * Liberty FOCS'16) with the randomness replaced by deterministic
  * parity alternation: each level's compaction alternates between
  * keeping odd and even positions, cancelling the directional bias a
  * fixed selector would compound (the classical derandomized-compactor
  * argument), so results are reproducible with no RNG anywhere.
  *
  * Buffer: a weight-1 append array (`raw`, grown geometrically to
  * `capacity`) plus a list of sorted levels, where a level-l element
  * represents 2^l input ranks. When raw fills it sorts into level 0; a
  * level over `capacity` compacts — half its pairs promote to level
  * l+1 (selected by the level's parity bit, which then flips), half are
  * discarded, an unpaired last element stays put — conserving total
  * weight EXACTLY (Σ weights == n always, so rank walks never run
  * short). Merge is level-wise sorted-merge followed by the same
  * cascade: levels align by weight, nothing is ever lifted across
  * levels, so a sequential fold of many small partials (Spark's real
  * final-aggregation pattern) behaves like any other merge tree — the
  * spec pins ≤ 2% rank error for 1, 8, and 500-partial folds at 100×
  * capacity. Memory: ≤ capacity · ⌈log2(n/capacity)⌉ doubles.
  *
  * While n ≤ capacity nothing ever compacts — every value is retained
  * at weight 1 — so quantiles are EXACT and partition-invariant: the
  * window the DuckDB `quantile_disc` oracle verifies at the
  * correctness SFs. Beyond it, results are deterministic for a given
  * merge tree.
  *
  * Finish: for each probe q, the value at rank max(1, ceil(q·n)) of
  * the weighted merged order — exactly DuckDB's discrete-quantile rank
  * convention, so the exact window is cell-comparable.
  */
final case class QsBuffer(
    raw: Array[Double], rawUsed: Int,
    flat: Array[Double], lens: Array[Int], parities: Array[Int], n: Long)

class QuantileSketchAgg(capacity: Int, probes: Array[Double])
    extends Aggregator[Double, QsBuffer, Array[Double]] {
  require(capacity >= 2, "capacity must be >= 2")
  require(probes.nonEmpty && probes.forall(p => p >= 0.0 && p <= 1.0),
    "probes must be fractions in [0, 1]")

  override def zero: QsBuffer =
    QsBuffer(Array.emptyDoubleArray, 0,
      Array.emptyDoubleArray, Array.emptyIntArray, Array.emptyIntArray, 0L)

  private def levelsOf(b: QsBuffer): Array[Array[Double]] = {
    val out = new Array[Array[Double]](b.lens.length)
    var off = 0
    var l = 0
    while (l < b.lens.length) {
      out(l) = java.util.Arrays.copyOfRange(b.flat, off, off + b.lens(l))
      off += b.lens(l)
      l += 1
    }
    out
  }

  private def pack(
      raw: Array[Double], rawUsed: Int,
      levels: Array[Array[Double]], parities: Array[Int], n: Long): QsBuffer = {
    // drop empty trailing levels so buffers stay minimal
    var top = levels.length
    while (top > 0 && levels(top - 1).isEmpty) top -= 1
    val flat = new Array[Double](levels.take(top).map(_.length).sum)
    val lens = new Array[Int](top)
    var off = 0
    var l = 0
    while (l < top) {
      System.arraycopy(levels(l), 0, flat, off, levels(l).length)
      lens(l) = levels(l).length
      off += levels(l).length
      l += 1
    }
    QsBuffer(raw, rawUsed, flat, lens, java.util.Arrays.copyOf(parities, top), n)
  }

  private def mergeSorted(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Double](a.length + b.length)
    var i = 0; var j = 0; var o = 0
    while (i < a.length && j < b.length) {
      if (a(i) <= b(j)) { out(o) = a(i); i += 1 } else { out(o) = b(j); j += 1 }
      o += 1
    }
    while (i < a.length) { out(o) = a(i); i += 1; o += 1 }
    while (j < b.length) { out(o) = b(j); j += 1; o += 1 }
    out
  }

  /** Compact every over-capacity level upward in place. Weight is
    * conserved exactly: promoting pairs/2 elements one level doubles
    * their weight, cancelling the pairs/2 discarded; an unpaired last
    * element keeps its level.
    */
  private def cascade(
      levels0: Array[Array[Double]],
      parities0: Array[Int]): (Array[Array[Double]], Array[Int]) = {
    var levels = levels0
    var parities = parities0
    var l = 0
    while (l < levels.length) {
      if (levels(l).length > capacity) {
        val a = levels(l)
        val pairs = a.length & ~1
        val promoted = new Array[Double](pairs / 2)
        var i = parities(l)
        var o = 0
        while (i < pairs) { promoted(o) = a(i); o += 1; i += 2 }
        parities(l) ^= 1
        levels(l) =
          if (pairs == a.length) Array.emptyDoubleArray else Array(a.last)
        if (l + 1 == levels.length) {
          levels = java.util.Arrays.copyOf(levels, l + 2)
          levels(l + 1) = Array.emptyDoubleArray
          parities = java.util.Arrays.copyOf(parities, l + 2)
        }
        levels(l + 1) = mergeSorted(levels(l + 1), promoted)
      }
      l += 1
    }
    (levels, parities)
  }

  /** Fold the raw appendix into level 0 and cascade. */
  private def flush(b: QsBuffer): QsBuffer = {
    if (b.rawUsed == 0) return b
    val sortedRaw = java.util.Arrays.copyOf(b.raw, b.rawUsed)
    java.util.Arrays.sort(sortedRaw)
    var levels = levelsOf(b)
    var parities = java.util.Arrays.copyOf(b.parities, b.parities.length)
    if (levels.isEmpty) { levels = Array(Array.emptyDoubleArray); parities = Array(0) }
    levels(0) = mergeSorted(levels(0), sortedRaw)
    val (ls, ps) = cascade(levels, parities)
    pack(b.raw, 0, ls, ps, b.n)
  }

  override def reduce(b0: QsBuffer, v: Double): QsBuffer = {
    // geometric growth: tiny groups serialize tiny buffers instead of a
    // full capacity-sized array per group
    val b =
      if (b0.rawUsed < b0.raw.length) b0
      else b0.copy(raw = java.util.Arrays.copyOf(b0.raw,
        math.min(capacity, math.max(16, b0.raw.length * 2))))
    b.raw(b.rawUsed) = v
    val grown = QsBuffer(b.raw, b.rawUsed + 1, b.flat, b.lens, b.parities, b.n + 1L)
    if (grown.rawUsed == capacity) flush(grown) else grown
  }

  override def merge(a0: QsBuffer, b0: QsBuffer): QsBuffer = {
    if (a0.n == 0L) return b0
    if (b0.n == 0L) return a0
    val a = flush(a0)
    val b = flush(b0)
    val la = levelsOf(a)
    val lb = levelsOf(b)
    val depth = math.max(la.length, lb.length)
    val levels = Array.tabulate(depth) { l =>
      mergeSorted(
        if (l < la.length) la(l) else Array.emptyDoubleArray,
        if (l < lb.length) lb(l) else Array.emptyDoubleArray)
    }
    val parities = Array.tabulate(depth) { l =>
      (if (l < a.parities.length) a.parities(l) else 0) ^
        (if (l < b.parities.length) b.parities(l) else 0)
    }
    val (ls, ps) = cascade(levels, parities)
    pack(Array.emptyDoubleArray, 0, ls, ps, a.n + b.n)
  }

  override def finish(b0: QsBuffer): Array[Double] = {
    if (b0.n == 0L) return probes.map(_ => Double.NaN)
    // one weighted ascending walk over (raw at weight 1) ∪ (level l at
    // weight 2^l): collect, sort by value, cumulate. Buffer sizes are
    // capacity-bounded, so the allocation is small and finish-only.
    val levels = levelsOf(b0)
    val total = b0.rawUsed + levels.map(_.length).sum
    val vs = new Array[Double](total)
    val ws = new Array[Long](total)
    var o = 0
    var i = 0
    while (i < b0.rawUsed) { vs(o) = b0.raw(i); ws(o) = 1L; o += 1; i += 1 }
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      var j = 0
      while (j < levels(l).length) { vs(o) = levels(l)(j); ws(o) = w; o += 1; j += 1 }
      l += 1
    }
    // indirect sort by value (stable; equal values in any order give the
    // same cumulative answer)
    val idx = (0 until total).sortBy(vs(_)).toArray
    val ranks = probes.map(q => math.max(1L, math.ceil(q * b0.n).toLong))
    val out = new Array[Double](probes.length)
    var p = 0
    while (p < probes.length) {
      val target = ranks(p)
      var cum = 0L
      var k = 0
      var v = vs(idx(total - 1)) // weight is conserved, but stay defensive
      while (cum < target && k < total) {
        v = vs(idx(k)); cum += ws(idx(k)); k += 1
      }
      out(p) = v
      p += 1
    }
    out
  }

  override def bufferEncoder: Encoder[QsBuffer] = Encoders.product[QsBuffer]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object QuantileSketch {
  /** `df.agg(quantiles($"len", probes))` → array of discrete quantiles
    * aligned with `probes` (exact while the group has ≤ capacity rows).
    */
  def quantiles(c: Column, probes: Seq[Double], capacity: Int = 4096): Column =
    udaf(new QuantileSketchAgg(capacity, probes.toArray)).apply(c)
}
