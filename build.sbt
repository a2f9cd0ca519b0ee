ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "imopsspark"
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
// The bench driver parses the LAST stdout line as JSON; sbt's
// "[success] Total time..." epilogue after the bench output broke that
// (round-1 `parsed: null`). Suppress it so the JSON line stays last, and
// stream the forked JVM's stdout raw (no "[info] " prefix tagging).
Global / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // VolumeZoom's 512-class output slices are 8 MB rows — HUMONGOUS at
  // G1's default region size, and a suite-polluted old gen intermittently
  // drove the vz512 bench into a full-GC spiral (measured 1.5 s vs 18.5 s
  // on identical code). 32 MB regions make the slice rows ordinary
  // allocations; a real deployment running volume ops would set the same.
  "-XX:G1HeapRegionSize=32m",
  // The 244-query sweep generates thousands of codegen classes; at the
  // default 240m ReservedCodeCacheSize the 'profiled nmethods' segment
  // saturates (r11 measured 74/116 MB used after only 30 queries) and C2
  // promotion stalls — the r10 pointwise_add bimodality (reps ~1.0 s then
  // ~0.14 s on identical plans, ONLY inside the polluted suite; isolated
  // runs are flat at ~0.15 s) is hot codegen stuck at C1/profiled tier
  // until the sweeper frees room. Standard sizing for any long-lived
  // Spark JVM that runs hundreds of distinct queries.
  "-XX:ReservedCodeCacheSize=512m",
)
