ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fhir2sqlspark"
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
// The round driver parses the one-line JSON summary out of the LAST 2000
// characters of `sbt runMain` output. Two things defeated that for four
// straight rounds: sbt's logger wrapped the forked app's stdout as
// "[info] {...}" (not raw JSON), and sbt's own "[success] Total time ..."
// status line trailed it. StdoutOutput passes the forked process's streams
// through verbatim; showSuccess drops the trailing status line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not another setting —
// the unused-key lint is a false positive.
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Spark whole-stage-codegen methods routinely exceed HotSpot's 8000-byte
  // JIT limit; without this flag they run INTERPRETED (50-100x slower,
  // non-deterministically as inlining flips). Standard Spark deployment flag.
  "-XX:-DontCompileHugeMethods",
  // Dozens of generated classes per query × ~40 queries per run overflow
  // the default 240 MB code cache; eviction then triggers recompile storms
  // (queries that run in 2 s isolated take 80 s mid-suite). Size it so
  // compiled codegen stays compiled.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:CICompilerCount=8",
  // Split generated functions well below the JVM's 8000-byte JIT ceiling:
  // one random query per suite run was stalling 30-80 s while C2 chewed on
  // a monolithic generated method (the stage ran interpreted meanwhile).
  // Smaller methods compile in ms and inline fine.
  "-Dspark.sql.codegen.methodSplitThreshold=256",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_OPTS").toSeq.flatMap(_.split("\\s+"))
