ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "muopdbspark"
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
// Driver tail-capture contract (round-16 verdict #1): the driver keeps
// only the last ~2000 bytes of sbt stdout and json-parses the final
// line(s); two sbt behaviors kept that parse failing in all 17 BENCH
// captures — the forked run's output was re-logged with an "[info] "
// prefix (not valid JSON), and sbt appended a "[success] Total time…"
// trailer after it. Raw pass-through output for forked JVMs plus a
// suppressed success banner make Bench's compact JSON line the
// physically last line of stdout. (Test results still arrive through
// sbt's test interface and keep their "[info]" reporting; pass/fail is
// the exit code either way.)
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — exclude
// it from the unused-key lint so every sbt invocation isn't noisy
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
  // start at full heap: growing a multi-GB heap under a 32-thread
  // allocation storm costs minutes of full GCs on the first heavy
  // operator (measured 221 s -> 30 s on the 1M-doc tf-idf pass)
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Ad-hoc Spark conf injection for robustness sweeps (forked mains pick
// spark.* up from system properties), e.g.
//   GRAFT_SPARK_CONF="-Dspark.sql.adaptive.enabled=false" python3 tools/verify_local.py
javaOptions ++= sys.env.get("GRAFT_SPARK_CONF").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
