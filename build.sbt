ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadoopformatsspark"
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
// The bench/verify harness parses the LAST stdout line as JSON. Two sbt
// behaviors break that: forked-run output gets an "[info] " prefix, and
// "[success] Total time..." prints after the metric line. Pass the child's
// stdout through raw and drop the success banner so the metric JSON is the
// final, unprefixed line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude it
// from the unused-key lint so every build doesn't print a spurious warning.
Global / excludeLintKeys += showSuccess
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
  // Without this module, dev.ludovic.netlib falls back from the SIMD
  // Vector-API BLAS to pure-Java F2j — MLlib k-means (IVF-PQ training)
  // and L-BFGS gradients run several times slower.
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
  // Spark's whole-stage-codegen methods routinely exceed HotSpot's
  // 8000-bytecode-byte "huge method" JIT cutoff; without this flag the
  // hottest generated pipelines run INTERPRETED until (sometimes never)
  // OSR rescues them — q_dedup_embedding_lsh's collision-verify loop
  // measured 61 s interpreted vs 19 s compiled on identical plans. The
  // standard production-Spark JVM flag pair for exactly this.
  "-XX:-DontCompileHugeMethods",
)
