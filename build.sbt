ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "postfixlogparserspark"
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
// Forked run output must bypass sbt's logger: the logger prefixes every
// line with "[info] ", which defeats a tail JSON-parse of the bench's
// final stdout line. StdoutOutput inherits the parent process streams.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and drop the trailing "[success] Total time ..." line so the bench's
// bare JSON line stays the last thing on stdout.
Global / showSuccess := false
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
scalacOptions += "-deprecation"
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // The target environment is local[32] with 128 GiB (see SURVEY §6);
  // an 8g heap made every >100M-row exchange spill-or-not bimodal at
  // the 100x-rows probe (32 concurrent aggregation hash maps share the
  // heap in local mode — a real cluster gives each executor its own).
  // 32g sizes the shared heap to the documented machine while leaving
  // plenty for the OS page cache over the corpus.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++ sys.env.get("SPARK_DRIVER_JVM_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
