ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataflowtemplatesspark"
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
// The driver's `sbt test` gate must finish deterministically inside its
// window (r16's full 52-minute suite was killed mid-run — VERDICT r16
// item 2). The long randomized fuzz suites are tagged @graft.SlowFuzz and
// EXCLUDED from the default gate; GRAFT_FULL_SUITE=1 restores the full
// suite for builder-side runs. Fuzz coverage still lands each round via
// the dedicated graft.Fuzz* mains (FUZZ_r*.json records).
Test / testOptions ++= (
  if (sys.env.get("GRAFT_FULL_SUITE").contains("1")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.SlowFuzz")))
// Pass the forked JVM's stdout straight through (no [info] prefix) so the
// driver can json-parse graft.Bench's single output line.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A 126-query pass generates thousands of whole-stage-codegen classes;
  // the JDK default 240 MB code cache fills mid-suite, silently disabling
  // the JIT for whichever queries run last (measured: late-alphabet
  // queries 2-4x slower in-suite than isolated, same plans — t_surprise
  // 4.6 s in-suite vs 1.3 s isolated). A long-lived cluster JVM sizes
  // its code cache for exactly this reason. (Enlarging Spark's 100-entry
  // generated-class cache was also tried and REVERTED: pinning thousands
  // of generated classes traded the Janino recompiles for GC/metaspace
  // pressure that cost more than it saved.)
  "-XX:ReservedCodeCacheSize=1g",
  "-Dfile.encoding=UTF-8",
)
// The container locale is POSIX, which makes the JVM's FILENAME encoding
// (sun.jnu.encoding) ASCII — a unicode split key then cannot name its
// partition directory (InvalidPathException: unmappable characters; found
// by the r13 sink fuzz). sun.jnu.encoding is derived from the LOCALE at
// JVM startup (a -D override is ignored on this JDK), so pin the forked
// JVMs' locale instead — real clusters run UTF-8 locales, this makes
// file-naming behavior the deployment behavior.
Test / envVars += ("LC_ALL" -> "C.utf8")
run / envVars += ("LC_ALL" -> "C.utf8")
