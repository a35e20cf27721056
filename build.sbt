ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkmsspark"
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
// The driver harvests the last ~2 KB of `sbt "runMain graft.Bench"` stdout
// and tries to parse the bench's JSON line out of it. With the default
// LoggedOutput strategy sbt prefixes every forked-process line with
// "[info] ", which defeated that parse in every round to date
// (BENCH_r01..r19 all carry "parsed": null even when the complete line sat
// inside the tail window). StdoutOutput passes the program's own
// stdout/stderr through untouched, so the bench's bare JSON lines reach the
// driver unprefixed. Run-scoped: test/compile logging is unchanged.
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
  // dev.ludovic.netlib (ships with Spark) picks its VectorBLAS SIMD
  // implementation only when the Vector API incubator module is present;
  // without it spark.ml fits (ALS/LinearSVC/KMeans) fall back to pure-JVM
  // F2J BLAS (the driver's round-1 bench log showed exactly that warning)
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32 shuffle threads at sf0.1 churn ~2-4 GiB of live execution memory;
  // 8g forced spill + GC pauses that showed up as multi-second jitter on
  // the heavy aggregation queries (host has 128 GiB — 24g is still modest)
  // no -Xms floor: a hard initial heap would fail JVM startup on hosts
  // with less free RAM than this 128 GiB bench box; -Xmx alone reserves
  // only virtual address space
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++
  // extra forked-JVM flags for diagnosis runs (e.g. GC logging:
  // SPARK_GRAFT_JVMFLAGS="-Xlog:gc*:file=/tmp/gc.log:time,uptime");
  // unset in normal and driver runs
  sys.env.get("SPARK_GRAFT_JVMFLAGS").toSeq.flatMap(_.split("\\s+").toSeq)
