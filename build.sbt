ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbmigrationspark"
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
// forward the forked child's stdout/stderr verbatim — no "[info] " prefix
// on the one JSON line the bench/verify drivers parse out of stdout
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
// local mode = driver-only JVM. Default heap derives from the host's
// physical RAM (~40%, clamped to [2g, 48g]) so sbt still starts on small
// boxes; override explicitly with SPARK_DRIVER_MEM=48g for bench runs.
val driverHeap: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val physGb =
    try {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    (os.getTotalMemorySize / (1L << 30)).toInt
    } catch { case _: Throwable => 8 }
  s"${math.max(2, math.min(48, physGb * 2 / 5))}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverHeap",
  // This container's platform default charset is US-ASCII
  // (native.encoding=ANSI_X3.4-1968), and Spark's VARIANT string decode
  // uses the platform default — parse_json silently turns every
  // non-ASCII char into U+FFFD replacement chars (one per UTF-8 byte)
  // unless the JVM runs UTF-8. IngestFuzzSpec pins the byte-exact
  // round-trip; Graft.session warns when a JVM is launched without this.
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
)
