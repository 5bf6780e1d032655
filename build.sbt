ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "solarloggerspark"
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
// Pass the forked process's stdout through raw (no "[info] " prefix):
// Bench/Verify print machine-parsed JSON lines that must stay valid JSON.
// Unscoped so both `run` and `runMain` pick it up.
outputStrategy := Some(OutputStrategy.StdoutOutput)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // A 200-query battery JIT-compiles ~170 MB of nmethods (measured: the
  // full registry climbs monotonically to 172 MB by battery end) — within
  // 30% of the JVM's 240 MB default ReservedCodeCacheSize. Crossing it
  // turns on code-cache flushing: hot compiled methods are discarded and
  // endlessly re-JIT'd, a high-cpu/zero-gc churn that lands exactly on
  // the codegen-heaviest queries and worsens as the battery proceeds.
  // Reserve is virtual address space, not RSS — 512m costs nothing idle.
  "-XX:ReservedCodeCacheSize=512m",
)
