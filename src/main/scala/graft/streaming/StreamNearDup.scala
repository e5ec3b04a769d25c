package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Dedupe

/** Streaming MinHash near-duplicate detection: the dedup family's LSH
  * banding as a Structured Streaming operator (the reference is
  * batch-only — SURVEY §2.8 — so this is pipeline-extension surface,
  * like EventStream).
  *
  * Each arriving document maps to its `bands` (band, bucket) keys using
  * the EXACT banding functions of the batch path
  * ([[Dedupe.minhashSignature]] / [[Dedupe.bandBucket]]), and a state
  * store keyed by (band, bucket) tracks the minimum doc id ever seen in
  * that bucket. A document whose bucket already holds a lower id emits a
  * match; the post-stream finish keeps the smallest match across bands.
  * Semantics are the pure relation "match_id = MIN(id') over same-bucket
  * docs with id' < id" — deterministic and batch-recomputable, which is
  * what the DuckDB oracle checks (`stream_neardup`).
  *
  * Ordering contract: within a micro-batch each bucket group processes
  * in ascending id; across micro-batches the contract is id-ordered
  * arrival (one file, or files in id order) — the same finite-backfill
  * shape as [[EventStream.dedupKeys]]. Unlike the first-occurrence
  * families (StreamNovelty / StreamSpans, which re-emit improvements
  * and min-fold at the finish, so they need no contract), a late lower
  * id here would owe match events to ALREADY-EMITTED higher ids —
  * repairing that exactly would require per-bucket id SETS in state.
  * Instead the matcher ENFORCES the contract: a batch whose minimum id
  * undercuts a bucket's stored minimum fails loudly
  * (IllegalStateException) rather than silently omitting matches
  * (spec-pinned). Like dedupKeys, state is
  * deliberately unbounded (one long per occupied bucket, ~bands longs
  * per distinct doc): near-dup keys carry no event time, so a watermark
  * would only drop late data, not bound state. At 100 TB-stream scale
  * the state store shards by (band, bucket) across executors — the same
  * key the batch path shuffles on.
  */
object StreamNearDup {

  final case class BandRow(band: Int, bucket: Long, id: Long)

  private def toBandRows(
      id: Long, text: String,
      shingleK: Int, numHashes: Int, bands: Int): Iterator[BandRow] = {
    val rowsPerBand = numHashes / bands
    val sig = Dedupe.minhashSignature(Dedupe.wordShingles(text, shingleK), numHashes)
    (0 until bands).iterator
      .map(b => BandRow(b, Dedupe.bandBucket(sig, b, rowsPerBand), id))
  }

  /** Batch twin of the stream's banding stage — the catalog persists it
    * as the oracle side table, so the expected output (min lower id per
    * shared bucket) is recomputable relationally in SQL. Lazy: never
    * executed unless consumed.
    */
  def bandRelation(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(numHashes % bands == 0, "bands must divide numHashes")
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) => toBandRows(id, text, shingleK, numHashes, bands) }
      .toDF("band", "bucket", "id")
  }

  /** (id, match_id) stream: one row per (doc, band) whose bucket held a
    * lower id at processing time. Append-mode stateful flatMap.
    */
  def bandMatches(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int,
      numHashes: Int,
      bands: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(numHashes % bands == 0, "bands must divide numHashes")
    bandMatchesFromRows(docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) => toBandRows(id, text, shingleK, numHashes, bands) }
      .toDF("band", "bucket", "id"))
  }

  /** The stateful min-id bucket matcher over ANY (band, bucket, id)
    * stream — the state machine behind [[bandMatches]], factored so
    * other fingerprint families (the video keyframe pigeonhole,
    * [[graft.operators.Dedupe.hammingBandRows]]) share one
    * implementation. State: one long (min id ever seen) per occupied
    * (band, bucket), sharded on the same key the batch band join
    * shuffles on.
    */
  def bandMatchesFromRows(bandRows: DataFrame): DataFrame = {
    val spark = bandRows.sparkSession
    import spark.implicits._
    bandRows
      .select(col("band").cast("int").as("band"),
        col("bucket").cast("long").as("bucket"), col("id").cast("long").as("id"))
      .as[BandRow]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Int, Long), rows: Iterator[BandRow], state: GroupState[Long]) => {
          // ascending id within the group: each doc sees exactly the min
          // of all lower ids (state = earlier batches, prefix = this one)
          val sorted = rows.map(_.id).toArray.sorted
          var minSeen = state.getOption.getOrElse(Long.MaxValue)
          // id-ordered-ingest enforcement (see object doc): a late id
          // BELOW the stored minimum means earlier batches' higher ids
          // were already emitted without their match to this doc — fail
          // loudly instead of silently corrupting the relation. Equal is
          // fine (a re-upload matches nothing under the strict id' < id
          // rule, in stream and batch alike).
          if (state.exists && sorted.head < minSeen)
            throw new IllegalStateException(
              s"out-of-order ingest at band bucket $key: id ${sorted.head} " +
                s"arrived after bucket minimum $minSeen — id-ordered " +
                "arrival is the stream near-dup contract")
          val out = Seq.newBuilder[(Long, Long)]
          sorted.foreach { id =>
            if (minSeen < id) out += ((id, minSeen))
            minSeen = math.min(minSeen, id)
          }
          state.update(minSeen)
          out.result().iterator
        })
      .toDF("id", "match_id")
  }

  /** Run [[bandMatchesFromRows]] over a finite parquet input, with
    * `bandRowsOf` building the (band, bucket, id) relation in-stream
    * (fingerprint + band split — any family). Returns the raw
    * (id, match_id) match events; the caller owns the batch finish.
    */
  def runBandMatchesOnce(
      spark: SparkSession,
      path: String,
      queryName: String,
      bandRowsOf: DataFrame => DataFrame): DataFrame =
    EventStream.runToMemory(spark, path, queryName,
      s => bandMatchesFromRows(bandRowsOf(s)), OutputMode.Append())

  /** Run the band-match stream over a finite parquet input (single file
    * or id-ordered directory) through a real state store + memory sink,
    * then finish batch-side: smallest match across bands per doc,
    * left-joined back to every input doc.
    *
    * @return (doc_id, match_id, is_neardup) — match_id null for firsts
    */
  def runNearDupOnce(
      spark: SparkSession,
      docsPath: String,
      queryName: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    val matches = EventStream.runToMemory(spark, docsPath, queryName,
      bandMatches(_, "doc_id", "text", shingleK, numHashes, bands),
      OutputMode.Append())
    val best = matches.groupBy(col("id").as("doc_id"))
      .agg(min(col("match_id")).as("match_id"))
    spark.read.parquet(docsPath)
      .select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("match_id"),
        col("match_id").isNotNull.as("is_neardup"))
  }
}
