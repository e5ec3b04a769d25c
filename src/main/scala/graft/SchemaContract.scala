package graft

import org.apache.spark.sql.SparkSession

/** Testdata schema contract + drift detector.
  *
  * The driver regenerates `/root/testdata` between rounds, and a silent
  * physical-type change (events.ts: epoch-nanos INT64 → TIMESTAMP(MICROS))
  * once broke eight queries with nothing surfacing the drift. This is the
  * tripwire: the expected per-table column/type contract, checked by a test
  * at sf0.001 and WARNed by Verify at whatever SF the driver runs, so the
  * next regeneration fails loudly and names the drifted column.
  *
  * Types are Spark `DataType.simpleString`s as read by a session with
  * `nanosAsLong=true` + UTC. Columns with a known-good multi-type history
  * (events.ts) list every accepted reading; the adaptive accessors in
  * [[Events]] must keep covering exactly that set.
  */
object SchemaContract {

  private val Ts = Set("timestamp_ntz", "timestamp")
  // events.ts across testdata generations: TIMESTAMP(NANOS)-as-long, then
  // TIMESTAMP(MICROS); all readings Events.microsExpr adapts to are legal
  private val EventTs = Ts + "bigint"

  /** table → ordered (column → accepted simpleString types). */
  val Expected: Seq[(String, Seq[(String, Set[String])])] = Seq(
    "region" -> Seq(
      "r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq(
      "n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq(
      "c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq(
      "s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq(
      "p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq(
      "o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> Ts, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq(
      "l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Ts),
    "events" -> Seq(
      "event_id" -> Set("bigint"), "ts" -> EventTs,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq(
      "doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq(
      "vec_id" -> Set("bigint"), "embedding" -> Set("array<float>"),
      "label" -> Set("int")))

  /** Human-readable drift lines ("table.column: got X, contract allows Y"),
    * empty when the sfDir matches the contract. Extra columns AND extra
    * tables are reported too — new driver surfaces are a (benign) contract
    * update signal, not an error the queries would hit, but they should
    * never pass silently.
    */
  def diff(spark: SparkSession, sfDir: String): Seq[String] = {
    val tableDrift = Expected.flatMap { case (table, cols) =>
      val path = s"$sfDir/$table.parquet"
      try {
        val actual = spark.read.parquet(path).schema
        val actualTypes =
          actual.fields.map(f => f.name -> f.dataType.simpleString).toMap
        val expectedNames = cols.map(_._1).toSet
        val drifted = cols.flatMap { case (name, accepted) =>
          actualTypes.get(name) match {
            case None =>
              Some(s"$table.$name: MISSING (contract: ${accepted.mkString("|")})")
            case Some(t) if !accepted(t) =>
              Some(s"$table.$name: got $t, contract allows ${accepted.mkString("|")}")
            case _ => None
          }
        }
        val extra = actual.fieldNames.filterNot(expectedNames)
          .map(n => s"$table.$n: EXTRA column (${actualTypes(n)}) not in contract")
        drifted ++ extra
      } catch {
        case e: Throwable => Seq(s"$table: unreadable at $path: ${e.getMessage}")
      }
    }
    val knownTables = Expected.map(_._1 + ".parquet").toSet
    val extraTables =
      try {
        val dir = new java.io.File(sfDir)
        Option(dir.list()).getOrElse(Array.empty[String]).toSeq.sorted
          .filter(f => f.endsWith(".parquet") && !knownTables(f))
          .map(f => s"$f: EXTRA table not in contract")
      } catch { case _: Throwable => Nil }
    tableDrift ++ extraTables
  }
}
