ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "clickhousecorespark"
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
// Pass forked-run output straight through (no "[info] " logger prefix):
// the driver tail-parses Bench's one-line JSON from stdout, and the sbt
// log decoration broke that parse in BENCH_r01..r03 ("parsed": null).
// Scoped to `run` only so forked tests keep sbt's buffered logging.
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
)

// The test fork runs 500+ Spark queries across 28 suites in ONE JVM
// (anchor suite + dialect suites); 8g leaves no headroom for the
// accumulated session state on this 128 GiB host. Last -Xmx wins.
Test / javaOptions += "-Xmx24g"

// The 1,150+-test reference-anchor corpus dominates suite wall-clock
// (~15 min serially). ReferenceAnchorSpecA–F each hold 1/6 of it; fork
// each into its OWN JVM (own SparkSession) and run the seven groups
// concurrently — full `sbt test` coverage at ~1/4 the wall-clock.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val baseOpts = (Test / javaOptions).value.toVector
  // 8g OOM-killed part B at ~160 anchors in (exit 52): per-test session
  // state accumulates across a fork's ~190 anchors, so the cap must
  // cover END-of-fork footprint, not a single test. 24g(main)+6×12g
  // peaks ≤ 96g of a 128 GiB host. Last -Xmx wins.
  val anchorOpts = baseOpts :+ "-Xmx12g"
  val (anchors, rest) = tests.partition(_.name.matches("graft\\.ReferenceAnchorSpec[A-F]"))
  anchors.map(t => Tests.Group(t.name, Seq(t),
    Tests.SubProcess(ForkOptions().withRunJVMOptions(anchorOpts)))) :+
    Tests.Group("main", rest,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(baseOpts)))
}
Global / concurrentRestrictions := Seq(Tags.limit(Tags.ForkedTestGroup, 7))
