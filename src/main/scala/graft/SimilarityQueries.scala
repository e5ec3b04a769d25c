package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedupe, Similarity}

/** Similarity-search query catalog over the `embeddings` table
  * (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).
  */
object SimilarityQueries {

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  private val QueryIds: Seq[Long] = (0L until 8L)

  private def annBrute(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.bruteForceTopK(emb(spark, sfDir), "vec_id", "embedding", QueryIds, k = 5)

  private def annIvf(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.ivfTopK(emb(spark, sfDir), "vec_id", "embedding", QueryIds, k = 5)

  private def nearDups(spark: SparkSession, sfDir: String): DataFrame =
    Dedupe.embeddingNearDups(emb(spark, sfDir), "vec_id", "embedding", dim = 64,
      planes = 8, minCosine = 0.3)

  /** Oracle-able projection of the embedding table: dimensions + label
    * counts (integer-only — DuckDB len(list) parity).
    */
  private def embDims(spark: SparkSession, sfDir: String): DataFrame =
    emb(spark, sfDir)
      .groupBy(col("label"), size(col("embedding")).cast("long").as("dim"))
      .agg(count(lit(1)).as("n_vectors"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> annBrute _,
    "ann_ivf_topk" -> annIvf _,
    "emb_neardup" -> nearDups _,
    "emb_dims" -> embDims _
  )

  val oracles: Map[String, String] = Map(
    "emb_dims" ->
      """SELECT label, CAST(len(embedding) AS BIGINT) AS dim, COUNT(*) AS n_vectors
        |FROM embeddings GROUP BY label, len(embedding)""".stripMargin
  )
}
