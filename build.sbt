ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "letsearchspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one forked JVM and some (ProviderSpec, AnnIndexSpec)
// scope JVM-global system properties to a test window — keep forked
// execution sequential so a property window can never hijack another
// suite's registry/budget reads. This is sbt's default for forked
// tests; pinned explicitly because correctness depends on it.
Test / testForkedParallel := false
run / fork := true
// Forked run output must pass through UNPREFIXED: the bench driver
// parses the JSON line from stdout, and sbt's default LoggedOutput
// strategy wraps every line in "[info] " (BENCH_r01 parsed=null).
Compile / run / outputStrategy := Some(StdoutOutput)
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
)

// Out-of-tree example EmbedderProvider: a separate module whose only
// link to the engine is the public graft.embed.EmbedderProvider trait.
// It is NOT on the main runtime classpath — Drive packages its classes
// into a jar and loads it in a forked JVM purely via -cp plus the
// graft.embedder.provider property, proving a real ONNX/REST backend is
// a drop-in packaging exercise. (sbt's auto-generated root aggregates
// this project, so plain `compile` builds it; run tasks never
// aggregate, so the driver's runMain invocations are unaffected.)
lazy val exampleProvider = (project in file("example-provider"))
  .dependsOn(LocalRootProject)
  .settings(
    name := "graft-example-provider",
    unmanagedBase := file("/opt/spark/jars"),
  )
