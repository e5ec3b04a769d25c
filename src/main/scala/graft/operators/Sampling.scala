package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling / splitting — the train/holdout
  * primitive of a training-data pipeline. Membership is a pure function
  * of the row KEY (first 4 hex digits of md5 compared against a
  * fraction-scaled threshold), so it is stable across runs, partitionings,
  * engines, and incremental re-runs (a document keeps its split when the
  * corpus around it changes) — none of which holds for `df.sample`.
  * md5-hex parity across engines makes the op SQL-oracle-able.
  */
object Sampling {

  /** 4-hex-digit threshold: floor(pct/100 · 16^4), zero-padded. Only
    * meaningful for pct < 100 (pct=100 would need the 5-char "10000",
    * which compares WRONGLY against 4-char prefixes — hashSplit
    * special-cases it instead).
    */
  private[operators] def thresholdHex(pct: Int): String = {
    require(pct >= 0 && pct < 100, s"thresholdHex needs pct in [0,100), got $pct")
    f"${(pct.toLong * 65536L) / 100L}%04x"
  }

  /** The shared membership machinery: first 4 hex digits of md5(key),
    * with the null guard every sampling op carries. NULL keys fail
    * loudly — the contract is "membership is a pure function of the
    * key", and md5(null) = null would otherwise fall through comparisons
    * silently: a row with no identity has no well-defined membership,
    * and at corpus scale a silent default turns an upstream extraction
    * bug into train-set leakage.
    */
  private[graft] def md5Prefix(keyCol: Column, opName: String): Column =
    substring(md5(
      when(keyCol.isNull,
          raise_error(lit(s"$opName: null sample key — membership must be " +
            "a pure function of a non-null key")))
        .otherwise(keyCol.cast("string"))
        .cast("binary")), 1, 4)

  /** CASE over `strataCol` choosing a per-name 4-hex threshold (or the
    * "g" keep-all sentinel: every md5 prefix is [0-9a-f]{4} and "g" sorts
    * after all of them, so the comparison is uniformly true without a
    * special branch shape). Deterministic fold order by name.
    */
  private def thresholdCase(
      strataCol: Column,
      byName: Map[String, String],
      default: String): Column =
    byName.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (name, thr)) => when(strataCol === name, thr).otherwise(acc)
    }

  /** Annotate rows with a deterministic split label: `holdout` with
    * probability ≈ holdoutPct/100 (exactly floor(pct·65536/100)/65536;
    * pct=100 ⇒ every row), else `train`. Null keys fail loudly (see
    * [[md5Prefix]]).
    */
  def hashSplit(
      df: DataFrame,
      keyCol: Column,
      holdoutPct: Int,
      splitCol: String = "split"): DataFrame = {
    require(holdoutPct >= 0 && holdoutPct <= 100,
      s"holdoutPct must be in [0,100], got $holdoutPct")
    val prefix = md5Prefix(keyCol, "hashSplit")
    val inHoldout =
      if (holdoutPct == 100) prefix.isNotNull // pct=100 keeps the null guard
      else prefix < lit(thresholdHex(holdoutPct))
    df.withColumn(splitCol, when(inHoldout, "holdout").otherwise("train"))
  }

  /** Per-stratum deterministic sampling — the "rebalance sources" primitive
    * of corpus curation (e.g. keep 100% of books, 10% of common-crawl).
    * Same md5-prefix membership as [[hashSplit]], with the threshold chosen
    * per stratum via a CASE over `strataCol`; membership stays a pure
    * function of (key, stratum rate), so the sample is stable across runs
    * and incremental re-runs, and the whole predicate is one codegen'd
    * column expression (no shuffle, no UDF) with an exact SQL mirror.
    *
    * Null keys fail loudly ([[md5Prefix]]); null/unlisted strata use
    * `defaultPct`; pct=100 uses the keep-all sentinel ([[thresholdCase]]).
    */
  def stratifiedHashSample(
      df: DataFrame,
      keyCol: Column,
      strataCol: Column,
      pctByStratum: Map[String, Int],
      defaultPct: Int = 0,
      keepCol: String = "kept"): DataFrame = {
    (defaultPct :: pctByStratum.values.toList).foreach(p =>
      require(p >= 0 && p <= 100, s"pct must be in [0,100], got $p"))
    def thr(pct: Int): String = if (pct == 100) "g" else thresholdHex(pct)
    df.withColumn(keepCol,
      md5Prefix(keyCol, "stratifiedHashSample") <
        thresholdCase(strataCol, pctByStratum.map { case (s, p) => s -> thr(p) },
          thr(defaultPct)))
  }

  /** Dataset mixture composition — "make the corpus 40% src0, 30% src1,
    * ..." — the pass that turns raw source counts into the training
    * mixture (the data-mixing step of every pretraining recipe; public
    * method). Downsampling only (no row duplication): the feasible total
    * is capped by the scarcest weighted source, then each source keeps a
    * deterministic md5-prefix sample sized to its target share.
    *
    * All planning is INTEGER arithmetic (weights in basis points,
    * thresholds in 65536ths) so the plan — not just the membership — has
    * an exact SQL mirror:
    *
    *   N     = min over sources of  n_s · 10000 / w_s   (integer div)
    *   t_s   = N · w_s / 10000                          (integer div)
    *   thr_s = t_s · 65536 / n_s  (capped at 65536 ⇒ keep-all sentinel)
    *
    * Sources absent from `weightsBp` are dropped (kept=false). Weighted
    * sources must exist in the corpus. One tiny count aggregation
    * (collected: one row per source) plans the thresholds; membership is
    * the same codegen'd no-shuffle predicate as [[stratifiedHashSample]].
    * Expected kept count per source is t_s ± binomial noise; weights are
    * RATIOS of the realized mixture, not exact row counts.
    */
  def composeMixture(
      df: DataFrame,
      keyCol: Column,
      sourceCol: Column,
      weightsBp: Map[String, Int],
      keepCol: String = "kept"): DataFrame = {
    require(weightsBp.nonEmpty, "at least one weighted source")
    weightsBp.foreach { case (s, w) =>
      require(w > 0, s"weight for '$s' must be positive basis points, got $w") }
    require(weightsBp.values.map(_.toLong).sum == 10000L,
      s"weights must sum to 10000 bp, got ${weightsBp.values.sum}")

    val counts = df
      .groupBy(sourceCol.as("__src")).count()
      .collect()
      .map(r => Option(r.get(0)).map(_.toString).orNull -> r.getLong(1))
      .toMap
    val missing = weightsBp.keySet.filterNot(counts.contains)
    require(missing.isEmpty,
      s"weighted source(s) absent from the corpus: ${missing.mkString(", ")}")

    val n = weightsBp.map { case (s, w) => counts(s) * 10000L / w }.min
    val thresholds = weightsBp.map { case (s, w) =>
      val target = n * w / 10000L
      val thr = math.min(65536L, target * 65536L / counts(s))
      s -> (if (thr >= 65536L) "g" else f"$thr%04x")
    }
    df.withColumn(keepCol,
      md5Prefix(keyCol, "composeMixture") <
        thresholdCase(sourceCol, thresholds, default = "0000"))
  }

  /** Deterministic global training-order shuffle: every row gets an
    * explicit position 0..n-1 in a pseudo-random permutation that is a
    * pure function of the row key — the epoch-ordering primitive of a
    * training dataloader, stable across runs, partitionings, and
    * engines (`df.orderBy(rand())` is none of those).
    *
    * Order key: md5("<salt>:<key>") hex, key as tiebreak. Positions are
    * assigned DISTRIBUTED: range-repartition on the order key, then the
    * Packing-style two-pass prefix-sum (per-partition counts →
    * broadcast offsets → narrow rank pass) — no global window, no
    * single partition anywhere. localCheckpoint pins the partitioning
    * between the two passes for the same reason tokenStreamPack does.
    *
    * Oracle: `ROW_NUMBER() OVER (ORDER BY md5(...), key) - 1`.
    */
  def globalShuffleOrder(df: DataFrame, keyCol: Column, salt: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(
        keyCol.cast("long").as("id"),
        md5SaltedKey(keyCol, salt, "globalShuffleOrder").as("sort_key"))
      .repartitionByRange(col("sort_key"), col("id"))
      .sortWithinPartitions(col("sort_key"), col("id"))
      .as[(Long, String)]
      .localCheckpoint(true)

    val partCounts = keyed.mapPartitions { it =>
      Iterator.single((org.apache.spark.TaskContext.getPartitionId(), it.size.toLong))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](partCounts.length + 1)
    partCounts.foreach { case (pid, n) =>
      require(pid < partCounts.length, s"non-contiguous partition id $pid")
      offsets(pid + 1) = n
    }
    var i = 1
    while (i < offsets.length) { offsets(i) += offsets(i - 1); i += 1 }
    val bc = spark.sparkContext.broadcast(offsets)

    keyed.mapPartitions { it =>
      var pos = bc.value(org.apache.spark.TaskContext.getPartitionId())
      it.map { case (id, sk) =>
        val p = pos; pos += 1
        (id, sk, p)
      }
    }.toDF("id", "sort_key", "position")
  }

  /** Round-robin source interleave — the curriculum-ordering dual of
    * [[globalShuffleOrder]]: within each source, docs get a
    * deterministic hash rank; globally, slot = rank · n_sources +
    * source_idx, so reading in slot order takes one document from each
    * source in turn (sources exhaust gracefully, leaving slot gaps).
    * The per-source rank is a hash-partitioned window (never global);
    * the source index is a collect bounded by the number of SOURCES,
    * broadcast as a literal map. Oracled with the same two windows.
    */
  def interleaveBySource(df: DataFrame, keyCol: Column,
      sourceCol: Column, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sources = df.select(sourceCol.cast("string").as("s"))
      .distinct().collect().map(_.getString(0))
    require(!sources.contains(null),
      "interleaveBySource: null source — every row needs a source label")
    require(sources.length <= 10000,
      s"interleaveBySource: ${sources.length} sources — the per-source " +
        "index is a literal expression; thousands of sources need a join, " +
        "not an interleave")
    // UTF-8 byte order, matching the oracle's DENSE_RANK collation —
    // Scala's default string sort is UTF-16 code-unit order and would
    // assign different indexes for supplementary-plane source names
    val ordered = sources.sortWith { (a, b) =>
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
    }
    val idx = ordered.zipWithIndex.toMap
    val idxCol = ordered.foldLeft(lit(-1L)) { (acc, s) =>
      when(col("source") === lit(s), lit(idx(s).toLong)).otherwise(acc)
    }
    df.select(
        keyCol.cast("long").as("id"),
        sourceCol.cast("string").as("source"))
      .withColumn("rank_in_source",
        row_number().over(Window.partitionBy(col("source"))
          .orderBy(md5SaltedKey(col("id"), salt, "interleaveBySource"),
            col("id").asc)).cast("long") - 1L)
      .withColumn("source_idx", idxCol)
      .withColumn("slot",
        col("rank_in_source") * lit(ordered.length.toLong) + col("source_idx"))
  }

  /** Full md5 hex of "<salt>:<key>" — the order key shared with the
    * DuckDB oracle (`md5('<salt>:' || CAST(key AS VARCHAR))`).
    */
  private def md5SaltedKey(keyCol: Column, salt: String, opName: String): Column =
    md5(concat(lit(s"$salt:"),
      when(keyCol.isNull,
          raise_error(lit(s"$opName: null key — ordering must be a pure " +
            "function of a non-null key")))
        .otherwise(keyCol.cast("string"))).cast("binary"))

  /** Keep a deterministic ≈pct% sample keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: Column, pct: Int): DataFrame = {
    require(!df.columns.contains("__graft_split"),
      "input already has a __graft_split column")
    hashSplit(df, keyCol, pct, "__graft_split")
      .filter(col("__graft_split") === "holdout")
      .drop("__graft_split")
  }
}
