ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "taxidatadatapipelinespark"
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
// Forked run output must reach stdout UNPREFIXED ([info]/[error] would
// break the driver's JSON-line parse of the bench output).
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
// Heap sizing for forked JVMs. Two measured failure modes bound this:
//  - demand-faulting a growing heap inside the first heavy query costs
//    10-15x (338 s vs 22 s for the same pipeline — SCALE_NOTES), so a
//    pre-touched -Xms floor helps...
//  - ...but pre-touch cost is SUPER-LINEAR on this virtualized box:
//    3.3 s at 8g vs >240 s (rc=124, 89 CPU-min of system time) at 64g —
//    an -Xms tied to a large SPARK_DRIVER_MEM stalls the JVM before
//    main() (the round-4 bench produced zero output because of this).
// So: clamp the pre-touched floor at 8g. When the requested heap IS the
// floor, pre-touch it all (cheap, keeps faults out of query timings);
// when the heap is larger, pre-touch only the 8g floor and let the rest
// fault on demand — sf0.1 working sets rarely grow past the floor.
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
def heapMiB(s: String): Long = {
  val t = s.trim.toLowerCase
  try {
    if (t.endsWith("g")) t.dropRight(1).toLong * 1024L
    else if (t.endsWith("m")) t.dropRight(1).toLong
    else if (t.endsWith("k")) t.dropRight(1).toLong / 1024L
    else t.toLong / (1024L * 1024L) // raw bytes
  } catch { case _: NumberFormatException => 8192L }
}
val heapFloorMiB = math.min(heapMiB(driverMem), 8192L)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
  s"-Xms${heapFloorMiB}m",
  // AlwaysPreTouch touches pages at COMMIT time: with the floor clamped
  // to 8g this costs ~3.3 s at startup (measured), and any later G1
  // expansion pre-touches incrementally, in proportion to memory the
  // job actually needs — never the catastrophic whole-64g startup
  // pre-touch that killed the round-4 bench (-Xms64g: >240 s, rc=124).
  "-XX:+AlwaysPreTouch",
) ++ (if (heapFloorMiB >= heapMiB(driverMem)) Seq.empty
      // When -Xmx exceeds the pre-touched floor, ALSO bound the young
      // gen: with a huge heap G1 grows eden to tens of GB, so the
      // allocator sweeps never-touched pages (each faulting at host
      // round-trip cost on this virtualized box) instead of recycling
      // warm ones — measured q1 at 64g: [8.9 13.3 2.7 8.6 22.3] s vs
      // a stable 1.1 s at a fully-pre-touched 8g. A 2g young-gen cap
      // keeps allocation inside recycled (touched) pages; the full
      // -Xmx stays available to old gen for genuinely large working
      // sets.
      else Seq(s"-XX:MaxNewSize=${math.min(heapFloorMiB / 4, 2048L)}m"))
