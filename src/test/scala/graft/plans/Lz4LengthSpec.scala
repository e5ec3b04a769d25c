package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Lz4LengthSpec extends SparkSpec {

  test("codegen result equals the kernel; null propagates; types checked") {
    import spark.implicits._
    val payloads = Seq(
      Array.fill[Byte](4096)(7),               // repetitive -> small
      (0 until 4096).map(_.toByte).toArray,    // cycling
      Array.emptyByteArray,
      null.asInstanceOf[Array[Byte]])
    val got = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "content")
      .select(col("id"), Lz4Length.lz4_len(col("content")).as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(0L).contains(graft.cdc.Lz4Len(payloads(0)).toLong))
    assert(got(0L).get < 200L, s"repetition must compress: ${got(0L)}")
    assert(got(1L).contains(graft.cdc.Lz4Len(payloads(1)).toLong))
    assert(got(2L).contains(0L))
    assert(got(3L).isEmpty, "null blob must stay null (unary null semantics)")
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, "nope")).toDF("id", "content")
        .select(Lz4Length.lz4_len(col("content"))).collect()
    }
  }

  test("the projection stays inside whole-stage codegen") {
    // a file source, not a local Seq: ConvertToLocalRelation folds local
    // rows at plan time (itself proof eval works), hiding the codegen path
    val df = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(Lz4Length.lz4_len(encode(col("text"), "UTF-8")).as("n"))
    df.collect()
    val hasWsc = df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.WholeStageCodegenExec => true
      case _ => false
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(hasWsc, s"lz4_len must not break codegen:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"no UDF bridge expected:\n$plan")
  }
}
