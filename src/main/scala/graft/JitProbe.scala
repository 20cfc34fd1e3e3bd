package graft

/** Per-rep JIT/codegen diagnostic for the q96-class single-JVM
  * inflation (r14 — VERDICT r13 task #1). Runs ONE registry query for
  * N settled reps in a fresh JVM configured exactly like Bench
  * (local[SPARK_GRAFT_CPUS], same session builder, same sf0.01 warm)
  * and prints one line per rep:
  *
  *   rep wall tasks_d jobs_d task_ms_d task_gc_ms_d spill_d sh_rw_mb
  *   janino_d jit_ms_d gc_ms_d proc_sys_ms_d minflt_d classes_d
  *   <per-CodeHeap-segment used MB>
  *
  * What each column adjudicates:
  *  - `janino_d` per rep: a repeat execution of an identical query
  *    SHOULD hit Spark's generated-class cache
  *    (spark.sql.codegen.cache.maxEntries, default 100 sources) and
  *    read ~0. A steady per-rep count means every execution compiles
  *    fresh generated classes — either the cache is too small for the
  *    query's own source count (fixable: raise the static conf via
  *    SPARK_GRAFT_CODEGEN_CACHE) or the generated SOURCE differs per
  *    execution (cache can never help; the per-rep JIT ramp is then
  *    inherent and the inflation suspect moves to late-session JIT
  *    responsiveness).
  *  - `jit_ms_d`: HotSpot compile time spent during the rep — fresh
  *    classes each rep mean the measured wall always contains an
  *    interpret→C1→C2 ramp, which is exactly the cost that degrades
  *    when the code cache churns late in a 324-query session.
  *  - per-segment CodeHeap: the 240 MB default splits into
  *    non-nmethods / profiled / non-profiled segments; 'profiled'
  *    saturating alone is invisible in a summed reading.
  *
  * Usage:
  *   sbt "runMain graft.JitProbe q96_pagerank 8"
  *   SPARK_GRAFT_CODEGEN_CACHE=5000 sbt "runMain graft.JitProbe q96_pagerank 8"
  */
object JitProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q96_pagerank")
    val reps = if (args.length > 1) args(1).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val builder0 = Sessions.builder(s"local[$cpus]", cpus)
    val builder = sys.env.get("SPARK_GRAFT_CODEGEN_CACHE") match {
      case Some(n) => builder0.config("spark.sql.codegen.cache.maxEntries", n)
      case None => builder0
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    def segs(): String = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(p => p.getName.startsWith("CodeHeap") || p.getName == "Code Cache")
        .map(p => f"${p.getName.replaceAll("CodeHeap '| nmethods'|'", "")}=${p.getUsage.getUsed / 1048576.0}%.1f")
        .mkString(" ")
    }
    val warmDir = {
      val d = "/root/testdata/sf0.01"
      if (new java.io.File(d).isDirectory) d else sfDir
    }
    println(s"probe $name reps=$reps cpus=$cpus codegenCache=" +
      spark.conf.get("spark.sql.codegen.cache.maxEntries"))
    // self-report the heap posture: the r14 mechanism fix (-Xms pin +
    // pre-touch) lives in build.sbt fork options, and whether a given
    // probe JVM actually received it must be readable from its log,
    // not from racing /proc during the fork's lifetime
    println("jvm_flags=" + {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
        .filter(a => a.startsWith("-Xm") || a.contains("PreTouch") || a.contains("CodeCache"))
        .mkString(" ")
    })
    val tally = new BenchRules.TaskTally
    spark.sparkContext.addSparkListener(tally)
    fn(spark, warmDir).count() // class-load + codegen warm, like Bench
    spark.catalog.clearCache()
    for (rep <- 1 to reps) {
      System.gc(); Thread.sleep(600)
      val before = BenchRules.sample()
      val tBefore = tally.snap()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      spark.catalog.clearCache()
      val wall = (System.nanoTime() - t0) / 1e9
      val after = BenchRules.sample()
      val d = tally.snap().zip(tBefore).map { case (a, b) => a - b }
      // task_ms = Σ executorRunTime over the rep's tasks; task_ms/cpus
      // ≈ the wall the executor pool actually worked — the remainder of
      // `wall` is driver/scheduler/settle gap. tasks_d/jobs_d flag plan
      // changes; task_gc/spill flag memory pressure inside tasks.
      println(f"rep=$rep%2d wall=$wall%6.2f tasks_d=${d(0)}%5d jobs_d=${d(1)}%3d " +
        f"task_ms_d=${d(2)}%7d task_gc_ms_d=${d(3)}%5d spill_d=${d(5)}%d " +
        f"sh_rw_mb=${(d(6) + d(7)) / 1048576.0}%6.1f " +
        f"janino_d=${after.janinoCount - before.janinoCount}%4d " +
        f"jit_ms_d=${after.jitMs - before.jitMs}%6d gc_ms_d=${after.gcMs - before.gcMs}%5d " +
        // kernel-time + fault deltas: the r14 q96 signature (host-side
        // first-touch fault service) reads proc_sys_ms_d ≈ wall-scale
        // with minflt_d in the millions while gc/jit stay flat
        f"proc_sys_ms_d=${after.procSysMs - before.procSysMs}%6d " +
        f"minflt_d=${after.minorFaults - before.minorFaults}%8d " +
        f"classes_d=${after.classes - before.classes}%5d ${segs()}")
    }
    spark.stop()
  }
}
