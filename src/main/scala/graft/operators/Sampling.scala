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

  /** 4-hex-digit threshold: floor(pct/100 · 16^4), zero-padded. */
  private[operators] def thresholdHex(pct: Int): String = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    f"${(pct.toLong * 65536L) / 100L}%04x"
  }

  /** Annotate rows with a deterministic split label: `holdout` with
    * probability ≈ holdoutPct/100 (exactly floor(pct·65536/100)/65536),
    * else `train`.
    */
  def hashSplit(
      df: DataFrame,
      keyCol: Column,
      holdoutPct: Int,
      splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol,
      when(substring(md5(keyCol.cast("string").cast("binary")), 1, 4)
        < lit(thresholdHex(holdoutPct)), "holdout").otherwise("train"))

  /** Keep a deterministic ≈pct% sample keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: Column, pct: Int): DataFrame =
    hashSplit(df, keyCol, pct, "__split")
      .filter(col("__split") === "holdout")
      .drop("__split")
}
