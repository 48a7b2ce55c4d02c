ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "benchvizspark"
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
// Pass the forked process's stdout straight through: sbt's default
// logger prefixes every line with "[info] ", which breaks machine
// parsing of Bench/Verify's single-line JSON output.
outputStrategy := Some(OutputStrategy.StdoutOutput)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // A ~400-query bench suite compiles ~750 codegen classes; the JVM's
  // 240 MB default code cache can fill and silently leave late
  // compilations interpreted (the q12-class tight-spread in-suite
  // flags). tools/gate.sh already raises it; raising it here too means
  // any forked run of graft.Bench — including the round driver's —
  // inherits the same headroom (bench_last.json's jvm block records
  // the resulting max so a draw self-attributes either way).
  "-XX:ReservedCodeCacheSize=512m",
)
