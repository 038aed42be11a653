ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vlmedendatasetetlspark"
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
// Pass the forked run JVM's stdout/stderr straight through instead of
// routing them line-by-line through sbt's logger: the logger stamps EVERY
// line with "[info] "/"[error] " (stderr included), which breaks any
// machine consumer of Bench's one-line JSON record. With StdoutOutput the
// JSON line reaches the terminal raw, starting at column 0.
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
  // ParallelGC beats G1 for this batch-throughput workload (full_merge
  // 8M events: 21.6s -> 18.6s at 8 threads, 35s -> 24s at 32)
  sys.env.getOrElse("SPARK_GRAFT_GC", "-XX:+UseParallelGC"),
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Pre-size the heap (-Xms = -Xmx): the forked JVM is a Spark driver +
  // executor; growing the heap under load costs avoidable full GCs.
  s"-Xms${sys.env.getOrElse("SPARK_GRAFT_XMS",
    sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))}",
)
