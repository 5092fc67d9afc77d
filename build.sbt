ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "timeseriesfuserspark"
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
  // JVM default TZ too: java.sql.Timestamp.valueOf and friends parse in it
  "-Duser.timezone=UTC",
  // 24g default on the 128 GiB box: the 62-query bench/verify passes run
  // exact percentiles and banded dedup joins over 20M-row inputs in one
  // long-lived local[32] JVM — at 8g the tail of the pass GC-thrashes
  // (measured: q_percentiles 2.3s -> 34s run-over-run escalation).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Xms = Xmx: this box (a lazily-materialized VM) serves FIRST-TOUCH page
  // faults at a GLOBAL ~350k pages/s (~1.4 GB/s) that COLLAPSES under
  // parallelism (measured: 24 separate processes -> 172k/s aggregate, 60x
  // per-process slowdown; 30+ task threads pinned in SYSTEM time). Any
  // heap-capacity churn therefore storms: G1 shrinks after System.gc
  // (observed 4.6g -> 2.4g) and the next 10M-row query regrows page by
  // page — the box's "phantom load" (3-15x run-time bands with no
  // runnable external process) was our own fresh-memory faulting. A
  // pinned heap makes G1 REUSE the same already-touched pages instead of
  // round-robining into untouched ones, so steady state faults nothing.
  // Keep the heap SIZED TO THE WORKLOAD, not generous: every fresh
  // gigabyte costs ~0.7-3 s of serialized kernel time, once.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
