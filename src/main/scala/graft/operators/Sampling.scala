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

  /** Annotate rows with a deterministic split label: `holdout` with
    * probability ≈ holdoutPct/100 (exactly floor(pct·65536/100)/65536;
    * pct=100 ⇒ every row), else `train`.
    *
    * NULL keys fail loudly. The contract is "membership is a pure function
    * of the key", and md5(null) = null would otherwise fall through
    * `when().otherwise()` into `train` silently — a row with no identity
    * has no well-defined split, and at corpus scale a silent default turns
    * an upstream extraction bug into train-set leakage.
    */
  def hashSplit(
      df: DataFrame,
      keyCol: Column,
      holdoutPct: Int,
      splitCol: String = "split"): DataFrame = {
    require(holdoutPct >= 0 && holdoutPct <= 100,
      s"holdoutPct must be in [0,100], got $holdoutPct")
    val guardedKey = when(keyCol.isNull,
        raise_error(lit("hashSplit: null split key — membership must be a " +
          "pure function of a non-null key")))
      .otherwise(keyCol.cast("string"))
    val inHoldout =
      if (holdoutPct == 100) lit(true)
      else substring(md5(guardedKey.cast("binary")), 1, 4) <
        lit(thresholdHex(holdoutPct))
    // pct=100 bypasses the hash, not the null guard
    df.withColumn(splitCol,
      when(guardedKey.isNotNull && inHoldout, "holdout").otherwise("train"))
  }

  /** Per-stratum deterministic sampling — the "rebalance sources" primitive
    * of corpus curation (e.g. keep 100% of books, 10% of common-crawl).
    * Same md5-prefix membership as [[hashSplit]], with the threshold chosen
    * per stratum via a CASE over `strataCol`; membership stays a pure
    * function of (key, stratum rate), so the sample is stable across runs
    * and incremental re-runs, and the whole predicate is one codegen'd
    * column expression (no shuffle, no UDF) with an exact SQL mirror.
    *
    * pct=100 strata use the sentinel threshold "g": every md5 prefix is
    * [0-9a-f]{4}, and "g" sorts after all of them, so the comparison is
    * uniformly true without a special-cased branch shape.
    *
    * Null keys fail loudly (same contract and rationale as [[hashSplit]]).
    * Null/unlisted strata use `defaultPct`.
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
    val guardedKey = when(keyCol.isNull,
        raise_error(lit("stratifiedHashSample: null sample key — membership " +
          "must be a pure function of a non-null key")))
      .otherwise(keyCol.cast("string"))
    val threshold = pctByStratum.toSeq.sortBy(_._1).foldLeft(lit(thr(defaultPct))) {
      case (acc, (stratum, pct)) => when(strataCol === stratum, thr(pct)).otherwise(acc)
    }
    df.withColumn(keepCol,
      substring(md5(guardedKey.cast("binary")), 1, 4) < threshold)
  }

  /** Keep a deterministic ≈pct% sample keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: Column, pct: Int): DataFrame = {
    require(!df.columns.contains("__graft_split"),
      "input already has a __graft_split column")
    hashSplit(df, keyCol, pct, "__graft_split")
      .filter(col("__graft_split") === "holdout")
      .drop("__graft_split")
  }
}
