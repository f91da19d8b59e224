ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "loan_default_prediction_app_big_dataspark"
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
// Pass the forked JVM's stdout straight through instead of routing it
// via sbt's logger: Bench/Verify print machine-parsed JSON lines, and
// the logger's "[info] " prefix breaks the driver's JSON extraction.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
// ...and suppress sbt's trailing "[success] Total time: ..." line: the
// driver parses the LAST stdout line as JSON, and that line landed
// after Bench's JSON (round-2 BENCH had parsed:null because of it).
Global / showSuccess := false
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
  // local[32] packs 32 executor threads into ONE G1 JVM (a real
  // cluster runs 4-8 cores per executor JVM): Tungsten's doubling
  // pointer-array allocations are humongous objects, and G1's default
  // GCLockerRetryAllocationCount=2 aborts them under concurrent
  // JNI-critical sections — turning a graceful hash-agg spill into
  // SparkOutOfMemoryError (the q197 100x failure mode, round 15). A
  // deeper retry budget makes the allocation wait out the locker
  // instead of dying; it costs nothing when memory is roomy.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
)
