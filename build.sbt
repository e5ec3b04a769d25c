ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datasetdedupeestimatorspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output passes straight through to stdout (no [info] logger
// prefix): the per-round driver parses the bench's final stdout line as
// JSON, and logger decoration is one of the ways that parse can break.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Per-suite wall-clock durations in the test report (-oD): the driver's
// verify window is finite, and knowing which suite eats it must not
// require a rerun.
Test / testOptions += Tests.Argument("-oD")

// ---- Parallel forked test groups -------------------------------------
// One sequential forked JVM took ~38 min (killed by the verification
// driver's window); suites are independent, so run them in N forked
// JVMs concurrently. Each group gets its OWN JVM and therefore its own
// shared SparkSession — no cross-suite session/conf races by
// construction. Groups are balanced by measured suite durations
// (longest-processing-time greedy); unknown/new suites get a small
// default and hash wherever the load is lowest.
val testGroupCount = 6
// measured single-run durations (seconds) from the r21 baseline log;
// only the heavy hitters matter for balance
val suiteSecondsEstimate: Map[String, Int] = Map(
  "QueriesSpec" -> 300, // post-merge estimate (was 1052 s for two sweeps)
  "DedupeSpec" -> 229,
  "DedupeCacheLifecycleSpec" -> 60,
  "LinesIncrementalGuardSpec" -> 60,
  "DecontaminateSpec" -> 51,
  "ConfSpec" -> 51,
  "QueriesPlanSpec" -> 46,
  "StreamCdcRestartSpec" -> 36,
  "SpansIncrementalGuardSpec" -> 35,
  "PackingSpec" -> 33,
  "ToolsSpec" -> 31,
  "StreamNoveltySpec" -> 25,
  "BpeTrainSpec" -> 23,
  "StreamTopTermsSpec" -> 20,
  "SpansPropertySpec" -> 20,
  "StreamLinesSpec" -> 20,
  "ZOrderWriteSpec" -> 19,
  "StreamSpansSpec" -> 18,
  "SpanGuardSpec" -> 17,
  "StreamNearDupSpec" -> 16,
  "StateBackendSpec" -> 15,
  "LineDedupeSpec" -> 15,
  "LinesPropertySpec" -> 14,
  "StreamSinkModeSpec" -> 13,
  "StreamDriftSpec" -> 12,
  "EventStreamSpec" -> 11,
  "MultimodalSpec" -> 10,
  "EstimatorSpec" -> 10,
  "SimilaritySpec" -> 9,
  "StreamMergeSpec" -> 9,
  "KmvGuardSpec" -> 9,
  "KeySkewSpec" -> 9,
  "FormatsSpec" -> 7,
  "EdgeInputSpec" -> 6,
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  // cap each test JVM's VISIBLE processor count: without it every one of
  // the 6 concurrent JVMs sizes its GC/JIT/netty/ForkJoin pools for all
  // 32 cores (6 × 32 runnable threads), and the first grouped run showed
  // the contention — every group dragged to the same 20:47 finish.
  // local[4] Spark + 2 spare fits in 6.
  val jvmOpts = ((Test / javaOptions).value :+
    "-XX:ActiveProcessorCount=6").toVector
  val est = tests
    .map(t => t -> suiteSecondsEstimate.getOrElse(t.name.split('.').last, 5))
    .sortBy { case (t, d) => (-d, t.name) } // deterministic LPT
  val loads = Array.fill(testGroupCount)(0)
  val buckets = Array.fill(testGroupCount)(Vector.empty[TestDefinition])
  for ((t, d) <- est) {
    val g = loads.indices.minBy(loads(_))
    loads(g) += d
    buckets(g) = buckets(g) :+ t
  }
  buckets.toSeq.zipWithIndex.map { case (ts, i) =>
    Tests.Group(s"group$i", ts,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(jvmOpts)))
  }
}
// sbt caps concurrent forked test groups at 1 by default; lift it to the
// group count (each group is a 4-core local Spark — 6×4 fits the box)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(math.max(testGroupCount + 2, 8)),
)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
