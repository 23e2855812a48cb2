ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "consentbasedconversionadjustmentsspark"
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
// The bench/verify harness tails captured stdout and parses the LAST line
// as JSON. Two sbt behaviors break that when Bench runs via `sbt runMain`:
// the forked process's output is re-logged with an "[info] " prefix, and a
// "[success] Total time: …" epilogue trails the JSON line. Inherit stdout
// directly and drop the epilogue so the report line is the genuine last
// output of the captured stream.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess/outputStrategy are consumed by sbt's command layer, not by
// other settings — exclude them from the unused-key lint so the warning
// doesn't precede the bench output.
Global / excludeLintKeys ++= Set(showSuccess, run / outputStrategy)
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
  // Throughput collector: this host's G1 young pauses run ~800 ms on the
  // sort/window stages (survivor space pinned full by sorter buffers);
  // ParallelGC measures ~25% faster on the heavy bench queries.
  "-XX:+UseParallelGC",
)
