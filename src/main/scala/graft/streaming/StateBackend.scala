package graft.streaming

/** Opt-in state-store backend for the streaming harnesses, selected by
  * `SPARK_GRAFT_STATE_BACKEND`:
  *
  *  - unset / `hdfs`: Spark's default `HDFSBackedStateStoreProvider` —
  *    every state row lives IN-HEAP on its executor (checkpoint files
  *    are only the durability copy). Right for bounded state (the KMV
  *    sketch twins, shard-capped suppression caches), but exact
  *    per-key state grows with distinct keys: `stream_cdc`'s per-hash
  *    store measured 4.5M rows / 808 MiB heap at the 100× tier, which
  *    at 1000× alone exceeds an 8 GiB executor heap.
  *  - `rocksdb`: `RocksDBStateStoreProvider` — state lives in RocksDB
  *    (off-heap block cache + memtables, on-disk SSTs under the
  *    executor's local dir), so exact-state streaming stops being
  *    heap-bound: the state working set pages to local disk and the
  *    JVM heap stays flat as keys grow. This is the 100 TB deployment
  *    setting for the exact twins; the `rocksdbjni` library ships with
  *    the Spark distribution, so flipping the env var is the whole
  *    migration (checkpoint formats differ — a query must keep the
  *    provider it started with, which is why this is a harness-level
  *    knob and not a per-query default).
  *
  * Resolution happens once per JVM; an unknown value fails rather than
  * silently running on the default provider. `providerClass` is lazy,
  * so the harness mains call [[forceResolve]] FIRST — without it a
  * typo'd env var would only throw at the first streaming run,
  * mid-harness, after batch work already completed.
  */
object StateBackend {

  /** Force env-var resolution NOW. Harness mains (Bench, ScaleRun,
    * StreamRestartRun) call this before any timed or batch work so a
    * typo'd SPARK_GRAFT_STATE_BACKEND aborts at startup instead of at
    * the first streaming run.
    */
  def forceResolve(): Unit = { providerClass; () }

  val RocksDbProviderClass: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Provider class to set on the streaming session, or None to leave
    * Spark's default (HDFSBacked) in place.
    */
  lazy val providerClass: Option[String] =
    resolve(sys.env.get("SPARK_GRAFT_STATE_BACKEND"))

  /** Human-readable backend name for harness tables/JSON. */
  def name: String = if (providerClass.isDefined) "rocksdb" else "hdfs"

  // factored for StateBackendSpec: the env-var parse without the env
  private[streaming] def resolve(setting: Option[String]): Option[String] =
    setting.map(_.trim.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty) match {
      case None => None
      case Some("hdfs") => None
      case Some("rocksdb") => Some(RocksDbProviderClass)
      case Some(other) => throw new IllegalArgumentException(
        s"SPARK_GRAFT_STATE_BACKEND must be 'hdfs' (default) or " +
          s"'rocksdb', got '$other'")
    }
}
