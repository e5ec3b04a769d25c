package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the maintenance operator every long-lived
  * 100 TB table needs (streaming sinks and incremental ingests leave
  * thousands of KB-scale files; scan cost is then dominated by per-file
  * open/footer overhead, not bytes).
  *
  * Split in two the same way Spark itself splits scan planning:
  *
  *  - [[plan]]: greedy ordered bin-packing of (file, bytes) metadata into
  *    target-size output groups. This is file METADATA — one row per
  *    file, bounded by file count, folded on the driver exactly like
  *    Spark's own `FilePartition.getFilePartitions` packs splits (1e6
  *    files ≈ 100 MB of driver metadata at the design point; the data
  *    itself is never touched). Deterministic: files ordered by name,
  *    first-fit-in-order, a bin closes when the next file would overflow
  *    `targetBytes` (oversized files get a bin of their own).
  *  - [[compact]]: execute a plan over same-schema parquet files — each
  *    bin's files are read and rewritten as one output file. Bins are
  *    independent (embarrassingly parallel across executors); rows never
  *    shuffle, they stream scan→write.
  *
  * The plan arithmetic is integer and sequential-by-name, so a DuckDB
  * recursive CTE replays it file-for-file (`compact_plan` in the
  * catalog).
  */
object Compaction {

  final case class PlannedFile(file_name: String, n_bytes: Long, bin: Long)

  /** Greedy ordered bin-pack. Pure function of the (name → bytes) map —
    * unit-testable without Spark.
    */
  def packGreedy(files: Seq[(String, Long)], targetBytes: Long): Seq[PlannedFile] = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    var bin = 0L
    var acc = 0L
    var first = true
    files.sortBy(_._1).map { case (name, bytes) =>
      if (first) { first = false; acc = bytes }
      else if (acc + bytes <= targetBytes) acc += bytes
      else { bin += 1; acc = bytes }
      PlannedFile(name, bytes, bin)
    }
  }

  /** Compaction plan for the depth-1 `*.parquet` files of `dir` (same
    * file contract as `glob_expand`: regular files whose parent is `dir`
    * itself, Spark's hidden-file convention applied by the source).
    * Output: (file_name, n_bytes, bin).
    */
  def plan(spark: SparkSession, dir: String, targetBytes: Long): DataFrame = {
    import spark.implicits._
    val parent = new java.io.File(dir).getName
    // binaryFile prunes `content` when unselected: this lists metadata,
    // it does not read file bytes
    val listed = spark.read.format("binaryFile").load(s"$dir/*.parquet")
      .filter(element_at(split(col("path"), "/"), -2) === lit(parent))
      .select(element_at(split(col("path"), "/"), -1).as("file_name"),
        col("length").as("n_bytes"))
      .as[(String, Long)]
      .collect()
    spark.createDataset(packGreedy(listed.toSeq, targetBytes)).toDF()
  }

  /** Execute a compaction plan over same-schema parquet files: one output
    * file per bin under `outDir`, written by independent per-bin jobs.
    * Returns (bin, n_files_in, n_rows) per output file.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
      outDir: String): DataFrame = {
    import spark.implicits._
    val planned = plan(spark, dir, targetBytes).as[PlannedFile].collect()
    // bins are independent: submit their jobs CONCURRENTLY (each is one
    // scan→write task after coalesce(1)); Spark's scheduler runs them in
    // parallel across executor slots
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val futures = planned.groupBy(_.bin).toSeq.sortBy(_._1).map {
      case (bin, fs) => Future {
        val paths = fs.map(f => s"$dir/${f.file_name}")
        val df = spark.read.parquet(paths: _*)
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/bin=$bin")
        (bin, fs.length.toLong, df.count())
      }
    }
    val stats = futures.map(f => Await.result(f, Duration.Inf))
    spark.createDataset(stats).toDF("bin", "n_files_in", "n_rows")
  }

  /** The DuckDB oracle body for [[plan]]: the same greedy fold as a
    * recursive CTE over the same file listing. Caller supplies the
    * listing CTE `__files(file_name, n_bytes)`; rows must be unique by
    * name (they are: depth-1 listing).
    */
  def planOracleSql(targetBytes: Long): String =
    s"""__ordered AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY file_name) AS rn,
       |         file_name, n_bytes
       |  FROM __files),
       |__packed AS (
       |  SELECT rn, file_name, n_bytes,
       |         CAST(0 AS BIGINT) AS bin, n_bytes AS acc
       |  FROM __ordered WHERE rn = 1
       |  UNION ALL
       |  SELECT f.rn, f.file_name, f.n_bytes,
       |         CASE WHEN p.acc + f.n_bytes <= $targetBytes
       |              THEN p.bin ELSE p.bin + 1 END,
       |         CASE WHEN p.acc + f.n_bytes <= $targetBytes
       |              THEN p.acc + f.n_bytes ELSE f.n_bytes END
       |  FROM __ordered f JOIN __packed p ON f.rn = p.rn + 1)
       |SELECT file_name, n_bytes, bin FROM __packed""".stripMargin
}
