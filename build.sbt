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
// Round-5 A/B matrix (TaxiBench 100M rows, reused input, this box):
//   -Xms8g  -Xmx8g  +AlwaysPreTouch              16.5 s   <- stable
//   -Xms16g -Xmx16g +AlwaysPreTouch              15.6 s   (53 s startup!)
//   -Xms8g  -Xmx64g +AlwaysPreTouch +2g NewSize  130 s    <- G1 expanded
//       8g->58g mid-run; expansion regions pre-touch inside GC pauses
//       (young pauses of 8-38 SECONDS, gc log), so a large -Xmx is
//       catastrophic even with a pre-touched floor...
//   -Xmx64g, default -Xms (round-4 shipped)      338 s    <- ...and
//       without pre-touch the same growth demand-faults all over the
//       query path instead. Page population cost on this virtualized
//       box is also SUPER-linear in size (8g: 3.3 s, 16g: 53 s,
//       64g: >240 s rc=124 = the round-4 bench failure).
// The only stable region is a FIXED heap, fully touched at startup,
// never expanding — and 8g is the sweet spot: every workload observed
// (heaviest: TaxiBench 100M, peak live ~6.1g in the gc log) fits with
// headroom, and its pre-touch costs 3.3 s. So forked JVMs run
// -Xms = -Xmx = min(SPARK_DRIVER_MEM, 8g). A genuinely larger working
// set can override via SPARK_GRAFT_HEAP (used verbatim, still fixed
// and pre-touched — expansion, not size, is what kills).
def heapMiB(s: String): Long = {
  val t = s.trim.toLowerCase
  try {
    if (t.endsWith("g")) t.dropRight(1).toLong * 1024L
    else if (t.endsWith("m")) t.dropRight(1).toLong
    else if (t.endsWith("k")) t.dropRight(1).toLong / 1024L
    else t.toLong / (1024L * 1024L) // raw bytes
  } catch { case _: NumberFormatException => 8192L }
}
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
val fixedHeapMiB = sys.env.get("SPARK_GRAFT_HEAP").map(heapMiB)
  .getOrElse(math.min(heapMiB(driverMem), 8192L))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xms${fixedHeapMiB}m",
  s"-Xmx${fixedHeapMiB}m",
  "-XX:+AlwaysPreTouch",
)
