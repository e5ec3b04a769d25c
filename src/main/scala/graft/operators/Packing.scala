package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — the training-data step that concatenates documents
  * into fixed-size context windows (N tokens per training sequence). The
  * core primitive is a GLOBAL ORDERED PREFIX-SUM of token counts, which
  * naive Spark writes as `Window.orderBy(id)` with no partitioning — the
  * "moving all data to a single partition" anti-pattern that serializes
  * the corpus through one task. This implementation is the two-pass
  * distributed shape that scales:
  *
  *   1. range-repartition by id + sort within partitions (one shuffle;
  *      partition i holds strictly smaller ids than partition i+1);
  *   2. per-partition token sums → driver (numPartitions longs — KB, not
  *      data) → exclusive partition offsets broadcast back;
  *   3. narrow mapPartitions pass emits each document's global token
  *      start offset (partition offset + running local sum).
  *
  * Every document is assigned pack_id = start_offset / windowSize: the
  * pack containing its first token in the concatenated stream (documents
  * straddling a window boundary belong to the pack they start in — the
  * greedy stream-split contract, stated so the SQL oracle can replay it
  * as a window cumsum).
  */
object Packing {

  /** Largest power-of-two bucket the batch-shape planner uses. */
  val MaxLenBucket = 1 << 20

  /** SQL for the smallest power-of-two ≥ n (min bucket `minBucket`,
    * clamped to [[MaxLenBucket]]) — a CASE ladder so the SAME string
    * runs in Spark (`expr`) and DuckDB (no float log2 on either side,
    * so the bucketing is integer-exact cross-engine).
    */
  def pow2BucketSql(n: String, minBucket: Int = 16): String = {
    require(Integer.bitCount(minBucket) == 1, s"minBucket must be a power of 2: $minBucket")
    val whens = Iterator.iterate(minBucket)(_ * 2)
      .takeWhile(_ < MaxLenBucket)
      .map(b => s"WHEN ($n) <= $b THEN $b")
      .mkString(" ")
    s"(CASE $whens ELSE $MaxLenBucket END)"
  }

  /** Batch-shape report: whitespace token counts bucketed to the
    * smallest power-of-two context length, with the padding each bucket
    * wastes — the length-bucketing efficiency analysis a training
    * dataloader runs before choosing batch shapes. One narrow pass +
    * one small aggregation; all integer arithmetic, oracled by the same
    * generated CASE ladder.
    */
  def lengthBuckets(docs: DataFrame, tokensCol: Column): DataFrame =
    docs
      .select(coalesce(tokensCol.cast("long"), lit(0L)).as("n_tokens"))
      .withColumn("bucket_len", expr(pow2BucketSql("n_tokens")).cast("long"))
      .groupBy(col("bucket_len"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        // docs past MaxLenBucket clamp to it (slidingWindows splits them
        // upstream in a real pipeline): their padding reads 0, not negative
        sum(greatest(col("bucket_len") - col("n_tokens"), lit(0L)))
          .as("sum_padding"))

  /** The dual of packing: split each document's token span into
    * fixed-size context windows with stride-controlled overlap (the
    * long-document chunking step for pretraining and retrieval indexing).
    * Window starts are multiples of `stride`; every token is covered; the
    * final window is clamped to the document end (so it may be shorter
    * than `windowSize`); zero-token documents emit no windows.
    *
    * Pure relational shape: one narrow pass computes the window count per
    * document in INTEGER arithmetic (`div`, never `/` — Spark's `/` on
    * longs is double division and loses exactness past 2^53), then
    * sequence+explode fans out (doc, window) rows. No shuffle at all.
    *
    * @param tokensCol token count per row (any non-negative expression;
    *                  nulls read as 0 ⇒ no windows)
    */
  def slidingWindows(
      df: DataFrame,
      idCol: String,
      tokensCol: Column,
      windowSize: Long,
      stride: Long): DataFrame = {
    require(windowSize > 0, "windowSize must be positive")
    require(stride > 0 && stride <= windowSize,
      s"stride must be in [1, windowSize], got $stride")
    df
      .select(
        col(idCol).cast("long").as("id"),
        coalesce(tokensCol.cast("long"), lit(0L)).as("n"))
      .filter(col("n") > 0)
      // nw = 1 + ceil((n - W) / S) for n > W, else 1; ceil via
      // (x + S - 1) div S on longs
      .withColumn("nw",
        when(col("n") <= windowSize, lit(1L))
          .otherwise(lit(1L) + call_function("div",
            col("n") - lit(windowSize) + lit(stride - 1L), lit(stride))))
      .withColumn("win_idx", explode(sequence(lit(0L), col("nw") - 1)))
      .select(
        col("id"),
        col("win_idx"),
        (col("win_idx") * stride).as("win_start"),
        least(col("n"), col("win_idx") * stride + windowSize).as("win_end"),
        (least(col("n"), col("win_idx") * stride + windowSize)
          - col("win_idx") * stride).as("win_len"))
  }

  /** @return (id, n_tokens, start_offset, pack_id), one row per input row,
    *         ordered semantics keyed on ascending `idCol`.
    */
  def tokenStreamPack(
      df: DataFrame,
      idCol: String,
      tokensCol: Column,
      windowSize: Long): DataFrame = {
    require(windowSize > 0, "windowSize must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // null token counts → 0 (a document with unknown length must not
    // poison every later offset); ids must be non-null by contract.
    // FIRST checkpoint: repartitionByRange runs a separate
    // boundary-sampling job over its whole input before the shuffle, so
    // an expensive tokensCol (doc_pack_bpe's learned-BPE fold over every
    // word) would otherwise be computed TWICE per pack (guide §1.2:
    // don't compute things you throw away). The projection is two longs
    // per row — checkpointing it is corpus-row-count-sized, never
    // corpus-byte-sized.
    val projected = df
      .select(col(idCol).cast("long").as("id"),
        coalesce(tokensCol.cast("long"), lit(0L)).as("n_tokens"))
      .localCheckpoint(true)
    // SECOND checkpoint PINS the range partitioning: both passes must see
    // byte-identical partitions, and recomputing the shuffle per job
    // would let AQE (or a non-deterministic upstream) re-plan it between
    // passes, silently corrupting every offset after the first divergence.
    val base = projected
      .repartitionByRange(col("id"))
      .sortWithinPartitions(col("id"))
      .as[(Long, Long)]
      .localCheckpoint(true)

    // pass 1: per-partition totals, indexed by partition id. collect() is
    // numPartitions rows — bounded by cluster width, not data size.
    val partSums = base
      .mapPartitions { it =>
        var s = 0L; var n = 0L
        it.foreach { case (_, t) => s += t; n += 1 }
        Iterator.single((org.apache.spark.TaskContext.getPartitionId(), s, n))
      }
      .collect()
      .sortBy(_._1)
    val offsets = new Array[Long](partSums.length + 1)
    partSums.foreach { case (pid, s, _) =>
      require(pid < partSums.length, s"non-contiguous partition id $pid")
      offsets(pid + 1) = s
    }
    var i = 1
    while (i < offsets.length) { offsets(i) += offsets(i - 1); i += 1 }
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    // pass 2: narrow — global start = partition offset + local running sum
    base
      .mapPartitions { it =>
        var running = bcOffsets.value(org.apache.spark.TaskContext.getPartitionId())
        it.map { case (id, t) =>
          val start = running
          running += t
          (id, t, start)
        }
      }
      .toDF("id", "n_tokens", "start_offset")
      .withColumn("pack_id",
        call_function("div", col("start_offset"), lit(windowSize)))
  }
}
