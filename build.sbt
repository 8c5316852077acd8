ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hbasemapreducespark"
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
// local-cluster mode (ClusterSpec): the in-JVM standalone Worker launches
// executor JVMs through the launcher library, which needs the Scala
// version that spark-submit normally gets from load-spark-env.sh.
Test / envVars += "SPARK_SCALA_VERSION" -> "2.13"
run / envVars += "SPARK_SCALA_VERSION" -> "2.13"
// Pass program stdout through unprefixed: Bench prints one JSON line the
// driver must parse; sbt's default logger wraps it in "[info] " which broke
// round 1's bench parse (BENCH_r01.json "parsed": null).
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
  // events.parquet is TIMESTAMP(NANOS), which Spark 4 rejects by default;
  // set once for every session created in this JVM (keeps Tables pure —
  // no per-read session-conf mutation).
  "-Dspark.sql.legacy.parquet.nanosAsLong=true",
  // 24g default (was 8g): local[32] runs 32 concurrent tasks, each
  // allocating execution-memory pages (64 MB TaskMemoryManager pages per
  // hash/sort operator) — at 8g the resulting GC pressure showed up as
  // 0.2-0.8s of non-CPU runtime on EVERY task of every 32-task stage
  // (x_bitext_mine 22 -> 1.1 summed task-sec, x_perplexity_bi 13 -> 0.6
  // at 24g, same queries same data). The box holds 128 GiB; override
  // with SPARK_DRIVER_MEM where it doesn't.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
