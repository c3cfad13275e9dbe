ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hbasetoolsspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// Per-suite wall-clock in test output (-oD): the suite must fit the
// driver's test budget, so slow suites need to be visible as numbers.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")

// Parallel test groups: the serial suite (~31 min wall before r14; ~18 min
// after the SqlSurfaceSpec fix) exceeded the verification budget
// (VERIFY tests_ok=false — the run was cut mid-suite, no failing test).
// Suites are grouped by measured duration (plans/r14 notes) into forked
// JVMs — full isolation, each group gets its own SparkSession at
// local[4]; 5 groups × 4 cores fit the 32-core sandbox with headroom.
Test / testGrouping := {
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val groupOf = Map(
    "graft.StreamingSpec" -> 0,
    "graft.operators.DedupGuardsSpec" -> 0,
    "graft.CurationSpec" -> 0,
    "graft.PlanQualitySpec" -> 1,
    "graft.SinksAndSourcesSpec" -> 1,
    "graft.EmptyInputSpec" -> 1,
    "graft.operators.AnnIndexSpec" -> 2,
    "graft.operators.DedupIndexSpec" -> 2,
    "graft.operators.IndexLifecycleSpec" -> 2,
    "graft.GraphOpsSpec" -> 3,
    "graft.SqlSurfaceSpec" -> 3,
    "graft.TrainingDataSpec" -> 3,
  )
  (Test / definedTests).value
    .groupBy(t => groupOf.getOrElse(t.name, 4))
    .toSeq.sortBy(_._1)
    .map { case (i, ts) => Tests.Group(s"g$i", ts, Tests.SubProcess(opts)) }
}
// forked test groups run sequentially unless the tag limit is raised
Global / concurrentRestrictions := Seq(Tags.limit(Tags.ForkedTestGroup, 5))
