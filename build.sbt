ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datasketcheshaskellspark"
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
  // 16g default: local[16-32] runs need ~0.5-1g per executor thread before
  // shuffle/aggregate stages start spilling (box has 128g)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // batch-throughput GC: G1's concurrent cycles thrashed on the
  // allocation-heavy text kernels at local[16+] (tiny follow-up jobs
  // stalling 20s+); parallel scavenge is steadier for this profile
  "-XX:+UseParallelGC",
  // pre-fault the heap at JVM start: on the sandbox VM, first-touch page
  // faults during GC expansion dominate (bigger heaps measured MORE GC
  // wall time); pre-touching makes GC cost stable and thread-scalable
  "-XX:+AlwaysPreTouch",
)
