ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "airqualitydatapipelinespark"
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
  // 24g default: the heavy LSH/verification joins churn ~GBs of array
  // garbage per bench query; an 8g heap at local[32] GC-thrashes and
  // adds +-2.5x noise to q27-class timings (the host has 128 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
// Scoped to `run` (Bench/Verify/TimeQuery/JitProbe — every JVM that
// MEASURES): the test suite doesn't time anything, and a 24 GiB
// pre-touch per test JVM is wall spent on pages the suite never uses.
// SPARK_GRAFT_JVM_EXTRA is re-appended after the pin so an A/B probe
// can still override it (the JVM honors the LAST occurrence of a flag);
// SPARK_DRIVER_MEM moves Xmx and Xms together, keeping the pin.
run / javaOptions ++= Seq(
  // Xms = Xmx + pre-touch (r14 — the q96_pagerank inflation mechanism):
  // this box services first-touch anonymous page faults through a
  // host-side lazy-backing path (Firecracker + virtio_balloon) that
  // serializes under concurrency to ~300 µs/page — sysrq-l sampling
  // during inflated reps showed 17 of 32 CPUs in clear_page_erms at an
  // aggregate 50k faults/s (~200 MB/s of zeroing occupying half the
  // box). Without -Xms, every harness System.gc() settle lets G1
  // shrink/uncommit the heap and the next measured rep re-commits
  // GBs at that fault cost — a 2-4x wall inflation that is sustained
  // within one JVM (the shrink-regrow repeats per rep) and invisible
  // to GC/JIT/steal counters. Pinning the heap removes the uncommit
  // path entirely and pre-touch pays all first-touch at JVM start,
  // outside any measurement. This is also the production posture:
  // spark-submit launches executors with -Xms = -Xmx for the same
  // reason. A/B on graft.JitProbe q96_pagerank (8 reps, local[32],
  // sf0.1, same hour): default heap 6.6-54 s per rep; pinned 3.9-7 s
  // steady state with task GC time at zero.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
// `runMain` resolves javaOptions in its OWN task scope, not run's
// (verified: `show Compile/runMain/javaOptions` misses run-scoped
// appends) — and the driver contract invokes everything via runMain.
runMain / javaOptions := (run / javaOptions).value
