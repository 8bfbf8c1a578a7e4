ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "luamapreducespark"
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
// Stream the forked program's stdout straight through instead of wrapping
// every line in the sbt logger's "[info] " prefix — Bench/Verify emit
// machine-parsed JSON lines that must arrive unprefixed.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and suppress sbt's own "[success] Total time: ..." trailer, which
// otherwise lands AFTER Bench's final JSON line and breaks a
// read-the-last-stdout-line parser. With both settings, the JSON line
// Bench prints (post spark.stop()) is the true last line of stdout.
// target/bench.json carries the same payload as a file artifact.
showSuccess := false
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
)
// ClusterSmokeSpec boots a local-cluster[2,2,1024] SparkContext (two real
// executor JVMs). A JVM holds ONE SparkContext, and every other suite
// shares the singleton local[4] session — so that spec runs in its own
// forked JVM. SPARK_HOME points the standalone Worker's executor
// launcher at the full distribution shipped with the image.
// SPARK_SCALA_VERSION short-circuits the launcher's getScalaVersion(),
// which otherwise probes source-tree build directories a binary
// distribution doesn't have.
Test / envVars ++= Map("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13")
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = ForkOptions()
    .withEnvVars(Map("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13"))
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  val (cluster, rest) = tests.partition(_.name.contains("ClusterSmokeSpec"))
  Seq(
    Tests.Group("main", rest, Tests.SubProcess(forkOpts)),
    Tests.Group("cluster", cluster, Tests.SubProcess(forkOpts)),
  ).filter(_.tests.nonEmpty)
}
