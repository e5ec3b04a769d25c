package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact-substring dedup — [[graft.operators.Dedupe.cutDuplicateSpans]]
  * as a continuous ingestion filter ("cut the paragraphs we already
  * have"), re-architected so state is a BOUNDED CACHE rather than a
  * correctness-bearing store.
  *
  * The naive shape (state keyed by window hash, one entry per distinct
  * corpus window) is token-linear: ~10¹³ state keys at the 100 TB design
  * point, four orders of magnitude past stream_cdc's chunk-linear ~10⁹ —
  * no state backend survives that. This design splits the problem:
  *
  *  - **Exactness lives in the emitted events + the finish fold, not in
  *    state.** Each micro-batch emits, per distinct window it carries,
  *    the batch-local earliest (doc_id, pos) — UNLESS the state already
  *    holds an equal-or-smaller occurrence for that window. Every stored
  *    occurrence was itself emitted in the batch that stored it, so for
  *    any window the globally smallest occurrence is always emitted at
  *    least once, and the finish's `min(struct(f_id, f_pos))` per window
  *    recovers the exact global first occurrence — under ANY arrival
  *    order (no id-ordered ingest contract) and ANY state eviction.
  *  - **State is pure emission suppression.** Dropping an entry can only
  *    cause a redundant re-emission that the finish folds away, so the
  *    store can be capped arbitrarily without touching the answer.
  *
  * State layout: keyed by `win mod numShards` (not by window), each shard
  * holding three sorted parallel arrays (window hash → earliest id/pos
  * seen), hard-capped at `maxStateWindowsPerShard` entries. Bounds:
  * state ROWS ≤ numShards (one row per shard — StreamSpansSpec asserts
  * this against the progress metrics), state BYTES ≤
  * numShards × maxStateWindowsPerShard × 24 B + store overhead (defaults:
  * 64 × 4 Mi × 24 B ≈ 6 GiB ceiling, reached only past ~256 M distinct
  * windows). Past the cap, untracked windows re-emit their batch minimum
  * every batch they appear in — shuffle-class traffic absorbed by the
  * finish's input-sized aggregation (the batch operator's own shape),
  * not state-class growth. At 100 TB: size `numShards` to the cluster
  * (state-op parallelism = shards) and accept the saturated regime —
  * the operator degrades to per-batch dedup + exact batch finish instead
  * of dying.
  *
  * Identity width: the stream runs 64-bit window hashes; a collision
  * merges two windows' first-occurrence tracking, so 100 TB-class CUT
  * jobs should run the batch operator in `hash128 = true` mode
  * ([[graft.operators.Dedupe.cutDuplicateSpans]]) — the stream twin is
  * the ingest-time filter for bounded backfills.
  */
object StreamSpans {

  /** Per-shard suppression cache: parallel arrays sorted by `wins`,
    * holding the smallest (id, pos) stored so far per tracked window.
    * One state-store row per SHARD — never per window.
    */
  final case class ShardState(
      wins: Array[Long], ids: Array[Long], poss: Array[Long])

  /** Default shard count: state-operator parallelism and the row bound. */
  val DefaultShards: Int = 64

  /** Default per-shard tracked-window cap (entries, 24 B each). */
  val DefaultShardCap: Int = 4 << 20

  /** (win, f_id, f_pos) append stream: per micro-batch, per distinct
    * window, the batch-local earliest occurrence — suppressed only when
    * the shard cache already holds an equal-or-smaller one. Consumers
    * MUST fold `min(struct(f_id, f_pos))` per win (see [[foldFirsts]]);
    * the raw stream may carry several events per window (late smaller
    * occurrences re-emit — that is what makes the fold exact under
    * out-of-order ingest).
    */
  def firstWindows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
      numShards: Int = DefaultShards,
      maxStateWindowsPerShard: Int = DefaultShardCap): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(maxStateWindowsPerShard >= 0,
      s"negative cap: $maxStateWindowsPerShard")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = windowTokens
    val cap = maxStateWindowsPerShard
    docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        graft.operators.Dedupe.windowHashes(text, w).iterator.zipWithIndex
          .map { case (h, i) => (h, id, (i + 1).toLong) }
      }
      .groupByKey(r => math.floorMod(r._1, numShards.toLong))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[(Long, Long, Long)],
            state: GroupState[ShardState]) =>
          advanceShard(rows, state, cap))
      .toDF("win", "f_id", "f_pos")
  }

  /** One shard × one micro-batch: batch-local min per window, emit
    * unless suppressed, track new windows up to the cap. Factored out of
    * the closure for direct unit testing of the cap/suppression rules.
    */
  private[streaming] def advanceShard(
      rows: Iterator[(Long, Long, Long)],
      state: GroupState[ShardState],
      cap: Int): Iterator[(Long, Long, Long)] = {
    // batch-local earliest occurrence per distinct window in this shard
    val batchMin = new java.util.HashMap[Long, Array[Long]]()
    rows.foreach { case (win, id, pos) =>
      val cur = batchMin.get(win)
      if (cur == null) batchMin.put(win, Array(id, pos))
      else if (id < cur(0) || (id == cur(0) && pos < cur(1))) {
        cur(0) = id; cur(1) = pos
      }
    }
    val st = state.getOption.getOrElse(
      ShardState(Array.emptyLongArray, Array.emptyLongArray,
        Array.emptyLongArray))
    // sorted iteration: deterministic emissions and a deterministic
    // choice of which windows fill the last cap slots
    val winsSorted = {
      val a = new Array[Long](batchMin.size)
      val it = batchMin.keySet().iterator()
      var i = 0
      while (it.hasNext) { a(i) = it.next(); i += 1 }
      java.util.Arrays.sort(a)
      a
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val insW = scala.collection.mutable.ArrayBuffer.empty[Long]
    val insI = scala.collection.mutable.ArrayBuffer.empty[Long]
    val insP = scala.collection.mutable.ArrayBuffer.empty[Long]
    var updated = false
    // copy-on-write for in-place improvements: GroupState must not see
    // mutation before update()
    var ids = st.ids
    var poss = st.poss
    var free = cap - st.wins.length
    var k = 0
    while (k < winsSorted.length) {
      val win = winsSorted(k)
      val m = batchMin.get(win)
      val slot = java.util.Arrays.binarySearch(st.wins, win)
      if (slot >= 0) {
        val sid = ids(slot); val spos = poss(slot)
        if (m(0) < sid || (m(0) == sid && m(1) < spos)) {
          // a smaller occurrence arrived late: re-emit and improve the
          // cache (the finish fold keeps the min — ADVICE r12 closure)
          if (!updated) { ids = ids.clone(); poss = poss.clone(); updated = true }
          ids(slot) = m(0); poss(slot) = m(1)
          out += ((win, m(0), m(1)))
        } // else: cache holds an already-emitted occurrence ≤ batch min
      } else {
        out += ((win, m(0), m(1)))
        if (free > 0) { insW += win; insI += m(0); insP += m(1); free -= 1 }
        // cap reached: window stays untracked — it re-emits per batch,
        // folded away downstream; state cannot grow past the cap
      }
      k += 1
    }
    if (insW.nonEmpty) {
      // single merge of the (sorted) inserts into the sorted arrays
      val n = st.wins.length + insW.length
      val w2 = new Array[Long](n); val i2 = new Array[Long](n)
      val p2 = new Array[Long](n)
      var a = 0; var b = 0; var o = 0
      while (o < n) {
        if (b >= insW.length ||
            (a < st.wins.length && st.wins(a) < insW(b))) {
          w2(o) = st.wins(a); i2(o) = ids(a); p2(o) = poss(a); a += 1
        } else {
          w2(o) = insW(b); i2(o) = insI(b); p2(o) = insP(b); b += 1
        }
        o += 1
      }
      state.update(ShardState(w2, i2, p2))
    } else if (updated) {
      state.update(ShardState(st.wins, ids, poss))
    }
    out.iterator
  }

  /** Exact global first occurrence per window from the raw event stream:
    * the fold that makes suppression-cache eviction and out-of-order
    * ingest invisible.
    */
  def foldFirsts(events: DataFrame): DataFrame =
    events
      .groupBy(col("win"))
      .agg(min(struct(col("f_id"), col("f_pos"))).as("f"))
      .select(col("win"), col("f.f_id").as("f_id"), col("f.f_pos").as("f_pos"))

  /** Run the first-window stream over a finite parquet input, then
    * finish batch-side into the exact [[graft.operators.Dedupe.cutDuplicateSpans]]
    * relation: (doc_id, n_tokens, cut_tokens, text_cut).
    */
  def runCutOnce(
      spark: SparkSession,
      docsPath: String,
      queryName: String,
      idCol: String,
      textCol: String = "text",
      windowTokens: Int = 20,
      numShards: Int = DefaultShards,
      maxStateWindowsPerShard: Int = DefaultShardCap): DataFrame = {
    val events = EventStream.runToMemory(spark, docsPath, queryName,
      firstWindows(_, idCol, textCol, windowTokens, numShards,
        maxStateWindowsPerShard),
      OutputMode.Append())
    graft.operators.Dedupe.cutFromFirstOccurrences(
      spark.read.parquet(docsPath), idCol, textCol, windowTokens,
      foldFirsts(events))
  }
}
