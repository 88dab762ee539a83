ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "agent_data_wranglerspark"
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
  // 24g default (overridable via SPARK_DRIVER_MEM): local[32] runs 32
  // concurrent tasks in ONE JVM, so execution memory per task slot is
  // heap*fraction/32 — at 8g that is ~150 MB/slot, and the persist-heavy
  // operators (LSH banding, k-means point caches, CC edge caches) evict
  // and re-derive under storage/execution competition (optimization guide
  // §5; measured: nd4 degraded 11.7→21.3 s across 3 back-to-back runs at
  // 8g from accumulated block eviction+GC pressure, flat at 24g). On a
  // cluster this is the executor-memory sizing knob, not a constant.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// the forked TEST JVM runs every suite against one shared SparkContext
// in parallel; 8g OOMs as the suite count grows — last -Xmx wins
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_TEST_MEM", "16g")}"
