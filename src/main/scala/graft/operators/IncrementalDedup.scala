package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental (batch-over-index) exact dedup: classify an incoming batch
  * of documents against the fingerprint index of an already-kept corpus —
  * the shape of "dedupe tonight's crawl against everything we already
  * have" that a continuously-growing training corpus runs every
  * ingestion cycle (the reference's estimator measures overlap between
  * static file sets; this is the pipeline-operational twin).
  *
  * Every row of the incoming batch is classified:
  *   - `known`     — fingerprint already present in the index
  *   - `intra_dup` — novel fingerprint, but an earlier row (lower id) of
  *                   THIS batch already carries it
  *   - `new`       — first occurrence anywhere; exactly these rows (plus
  *                   their fingerprints) should be appended to the corpus
  *                   and the index
  *
  * Scale shape: the index probe (left join on fp) and the intra-batch
  * first-occurrence (min-over-window on fp) both hash-key on the
  * fingerprint, so they share one exchange of the incoming batch; the
  * index side is a shuffle-join at 100 TB (it is the big side — billions
  * of fingerprints) or an AQE broadcast when small. Nothing keys on
  * anything but fp, and the batch is never materialized twice.
  */
object IncrementalDedup {

  /** @param incoming   the new batch
    * @param idCol      unique long id; ties in `intra_dup` break by min id
    * @param fpExpr     fingerprint expression (e.g. `md5(col("text"))`)
    * @param index      existing corpus fingerprints (need not be distinct)
    * @param indexFpCol fingerprint column name in `index`
    * @return (id, fp, status) — one row per incoming row
    */
  def classify(
      incoming: DataFrame,
      idCol: String,
      fpExpr: Column,
      index: DataFrame,
      indexFpCol: String): DataFrame = {
    val inc = incoming.select(col(idCol).cast("long").as("id"), fpExpr.as("fp"))
    val idx = index.select(col(indexFpCol).as("fp")).distinct()
    val firstInBatch = min(col("id")).over(Window.partitionBy(col("fp")))
    inc
      .join(idx.withColumn("__known", lit(1)), Seq("fp"), "left")
      .withColumn("__first", firstInBatch)
      .select(
        col("id"),
        col("fp"),
        when(col("__known").isNotNull, lit("known"))
          .when(col("id") =!= col("__first"), lit("intra_dup"))
          .otherwise(lit("new"))
          .as("status"))
  }
}
