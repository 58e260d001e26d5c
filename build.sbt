ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ophidiaserverspark"
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
// The bench's one-line JSON summary must reach the driver's stdout
// capture RAW: the default LoggedOutput strategy prefixes every child
// line with [info]/[error] and routes both streams through sbt's
// logger, which is exactly why every BENCH_rNN.json driver artifact
// from r01-r18 has parsed:null (VERDICT r18 #1). StdoutOutput inherits
// the forked JVM's stdout/stderr unprefixed.
run / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // a 119-query sweep generates hundreds of whole-stage-codegen
  // classes; the 240m default code cache silently sweeps compiled
  // methods mid-sweep, forcing recompiles that show as wall>>cpu
  // single-query spikes with zero GC/spill
  "-XX:ReservedCodeCacheSize=1g",
)
