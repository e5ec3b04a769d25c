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

  /** Exact top-k by quantized dot product — the similarity-search operator
    * with a cell-exact DuckDB oracle: both engines quantize floats to
    * floor(x*1000 + 0.5) BIGINTs. Floor semantics (not HALF_UP round) is
    * deliberate: floats like odd/16 DO land exactly on k+0.5 after *1000,
    * and round-half-away differs between ties at negative values across
    * engines, while floor(x+0.5) is one unambiguous function everywhere.
    */
  private def annDotExact(spark: SparkSession, sfDir: String): DataFrame = {
    val base = emb(spark, sfDir)
    val q = base.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0)
    val qArr = array(q.map(f =>
      lit(math.floor(f.toDouble * 1000 + 0.5).toLong)): _*)
    base
      .filter(col("vec_id") =!= 0L)
      .withColumn("dot_scaled",
        aggregate(
          zip_with(col("embedding"), qArr,
            (x, y) => floor(x.cast("double") * 1000 + 0.5).cast("long") * y),
          lit(0L), (acc, x) => acc + x))
      .orderBy(col("dot_scaled").desc, col("vec_id").asc)
      .limit(5)
      .select(col("vec_id"), col("dot_scaled"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> annBrute _,
    "ann_ivf_topk" -> annIvf _,
    "emb_neardup" -> nearDups _,
    "emb_dims" -> embDims _,
    "ann_dot_exact" -> annDotExact _
  )

  val oracles: Map[String, String] = Map(
    "emb_dims" ->
      """SELECT label, CAST(len(embedding) AS BIGINT) AS dim, COUNT(*) AS n_vectors
        |FROM embeddings GROUP BY label, len(embedding)""".stripMargin,
    "ann_dot_exact" ->
      """SELECT b.vec_id,
        |  CAST(SUM(CAST(FLOOR(CAST(b.embedding[i.i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)
        |    * CAST(FLOOR(CAST(a.embedding[i.i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS dot_scaled
        |FROM embeddings b,
        |     (SELECT embedding FROM embeddings WHERE vec_id = 0) a,
        |     (SELECT UNNEST(range(1, 65)) AS i) i
        |WHERE b.vec_id <> 0
        |GROUP BY b.vec_id
        |ORDER BY dot_scaled DESC, b.vec_id ASC LIMIT 5""".stripMargin
  )
}
