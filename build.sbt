ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ocrspark"
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
  // local[32] shuffling multi-GB text needs real heap; box has 128 GiB.
  // 32g, not more: oversizing the heap lengthened ParallelGC young pauses
  // at high thread counts (measured ~15% slower extraction at 16 threads
  // with 48g). ParallelGC: ~15% faster than G1 on this batch profile.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Fixed young gen at half the heap + GC threads capped at the physical
  // core count. ParallelGC's adaptive sizing kept the young gen far too
  // small for this allocation profile (scan+kernel garbage dies young):
  // measured per-stage at 16 threads, GC fell 66s→6s of task time and the
  // full job went ~35s→~21s; the 4-core level gained similarly (81s→52s).
  // Default GC threads on this 32-logical-cpu box is 23 — oversubscribes
  // the ~16 physical cores during a stop-the-world young collection.
  // SPARK_DRIVER_MEM accepts any JVM size suffix (g/G/m/M): young gen is
  // half the heap in MB regardless of unit.
  s"-Xmn${(sys.env.getOrElse("SPARK_DRIVER_MEM", "32g") match {
    case s if s.toLowerCase.endsWith("g") => s.dropRight(1).toLong * 1024
    case s if s.toLowerCase.endsWith("m") => s.dropRight(1).toLong
    case s                                => s.toLong / (1024 * 1024) // bytes
  }) / 2}m",
  // GC threads = min(16, host cores): matches the physical core count on
  // the tuned box, degrades gracefully on smaller hosts; override with
  // SPARK_GRAFT_GC_THREADS.
  s"-XX:ParallelGCThreads=${sys.env.get("SPARK_GRAFT_GC_THREADS").map(_.toInt)
    .getOrElse(math.min(16, java.lang.Runtime.getRuntime.availableProcessors))}",
  sys.env.getOrElse("SPARK_GRAFT_GC", "parallel") match {
    case "g1" => "-XX:+UseG1GC"
    case _    => "-XX:+UseParallelGC"
  },
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").map(_.split(" ").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
