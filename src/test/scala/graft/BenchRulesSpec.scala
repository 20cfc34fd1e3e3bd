package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench spike-adjudication predicates (BenchRules) — in
  * particular the r14 driver-history trigger, whose reason to exist is
  * the exact r13 shape this spec replays: q96_pagerank read 10.29 s in
  * the binding record while its crept expectation (6.22) kept the
  * 2×expect rule silent and the prior driver record (4.23) said the
  * reading was 2.4× round-over-round.
  */
class BenchRulesSpec extends AnyFunSuite {

  private val K = 2.0      // SPARK_GRAFT_BENCH_SPIKE_K default
  private val CROSS = 1.5  // SPARK_GRAFT_BENCH_CROSS_K default
  private val ABS = 0.75   // SPARK_GRAFT_BENCH_SPIKE_ABS default

  test("expectSpike fires on a clean 2x-with-margin breach") {
    assert(BenchRules.expectSpike(10.0, Some(4.0), K, ABS))
  }

  test("expectSpike needs BOTH the ratio and the absolute margin") {
    assert(!BenchRules.expectSpike(0.9, Some(0.4), K, ABS))   // 2.25x but +0.5 s only
    assert(!BenchRules.expectSpike(7.0, Some(4.0), K, ABS))   // +3 s but 1.75x only
    assert(!BenchRules.expectSpike(10.0, None, K, ABS))       // no expectation, no fire
  }

  test("the r13 q96 shape: expect-creep disarms the r12 rule — demonstrated") {
    // reading 10.287, expect 6.2239 (BENCH_EXPECT as of r13): 1.65x,
    // below 2x — this is the hazard, pinned as a negative assertion
    assert(!BenchRules.expectSpike(10.287, Some(6.2239), K, ABS))
  }

  test("the r13 q96 shape: the r14 driver-history trigger fires") {
    // prior driver record (92dd4b7, r12): q96 = 4.23 settled
    assert(BenchRules.driverHistorySpike(10.287, Some(4.23), CROSS, ABS))
    // and therefore the combined rule re-measures it
    assert(BenchRules.spike(10.287, Some(6.2239), Some(4.23), K, CROSS, ABS))
  }

  test("driverHistorySpike needs BOTH ratio and absolute margin") {
    assert(!BenchRules.driverHistorySpike(1.2, Some(0.7), CROSS, ABS))  // 1.7x, +0.5 s
    assert(!BenchRules.driverHistorySpike(5.5, Some(4.23), CROSS, ABS)) // +1.3 s, 1.3x
    assert(!BenchRules.driverHistorySpike(10.0, None, CROSS, ABS))      // no history
  }

  test("a normal settled reading fires neither trigger") {
    // q96 fresh-JVM consensus vs its own history: quiet
    assert(!BenchRules.spike(5.5, Some(6.2239), Some(4.23), K, CROSS, ABS))
  }

  // ---------------------------------------------------------- parsing

  private def rec(source: String, nq: Int, subset: Boolean,
                  qs: Map[String, Double],
                  degraded: Seq[String] = Nil, rerun: Seq[String] = Nil): String = {
    val qsj = qs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val dj = degraded.map("\"" + _ + "\"").mkString("[", ",", "]")
    val rj = rerun.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metric":"total","value":1.0,"unit":"sec","queries":$qsj,"sf":"x","source":"$source","nq":$nq,"subset":$subset,"degraded":$dj,"rerun":$rj}"""
  }

  test("parseRecordQueries drops degraded-without-rerun, keeps rerun-adjudicated") {
    val line = rec("driver", 300, subset = false,
      Map("q1_a" -> 1.5, "q2_b" -> 2.5, "q3_c" -> 3.5),
      degraded = Seq("q2_b", "q3_c"), rerun = Seq("q3_c"))
    val m = BenchRules.parseRecordQueries(line)
    assert(m == Map("q1_a" -> 1.5, "q3_c" -> 3.5)) // q2_b one-shot under load: out
  }

  test("loadPriorDriver picks the LAST full driver record; skips subset/small/local") {
    val f = java.nio.file.Files.createTempFile("bench_records", ".jsonl")
    val lines = Seq(
      rec("driver", 300, subset = false, Map("q1_a" -> 9.0)),  // older driver
      rec("local", 300, subset = false, Map("q1_a" -> 1.0)),   // local: never binding
      rec("driver", 300, subset = true, Map("q1_a" -> 1.0)),   // subset: skip
      rec("driver", 10, subset = false, Map("q1_a" -> 1.0)),   // tiny: skip
      rec("driver", 324, subset = false, Map("q1_a" -> 4.23, "q2_b" -> 0.5))
    )
    java.nio.file.Files.writeString(f, lines.mkString("\n") + "\n")
    val m = BenchRules.loadPriorDriver(f.toString)
    assert(m == Map("q1_a" -> 4.23, "q2_b" -> 0.5))
    java.nio.file.Files.delete(f)
  }

  test("loadPriorDriver on a missing file is empty (trigger disarms safely)") {
    assert(BenchRules.loadPriorDriver("/nonexistent/nowhere.jsonl").isEmpty)
  }

  test("the shipped bench_records.jsonl yields the r13 binding record") {
    // Guards the parser against drift in the real record format: the
    // prior driver record must contain q96 at a plausible settled value.
    val m = BenchRules.loadPriorDriver("/root/repo/bench_records.jsonl")
    assert(m.contains("q96_pagerank"))
    assert(m.size > 300)
  }

  // ------------------------------------------------------ jit sampler

  test("JIT sample reads sane absolute values") {
    val s = BenchRules.sample()
    assert(s.classes > 1000)             // a JVM running scalatest
    assert(s.codeCacheUsedMb > 1.0)      // something is compiled
    assert(s.codeCacheMaxMb >= s.codeCacheUsedMb)
    assert(s.metaspaceMb > 1.0)
    assert(s.gcMs >= 0)
    val line = BenchRules.jitLine("q0_x", 1.23, s, BenchRules.sample())
    assert(line.startsWith("""{"q":"q0_x","sec":1.23,"""))
    assert(line.contains("\"codecache_mb\":"))
  }

  test("process-level kernel-time/fault counters read and move (Linux)") {
    // The r14 q96 signature lives in these three fields: proc_sys_ms_d
    // rivaling proc_user_ms_d with minflt_d in the millions while
    // gc/jit/janino stay flat. Pin that they are real counters, not -1
    // fallbacks, and that a page-faulting workload moves minflt.
    val before = BenchRules.sample()
    assume(before.procSysMs >= 0, "no /proc/self/stat on this platform")
    assert(before.procUserMs > 0)   // this JVM has burned user CPU
    assert(before.minorFaults > 0)
    // touch ~64 MB of fresh pages via a direct buffer (its own mmap —
    // heap allocations could land on already-faulted pages and show no
    // minflt movement): minflt must advance by ~16k
    val pages = 16384
    val buf = java.nio.ByteBuffer.allocateDirect(pages * 4096)
    var i = 0
    while (i < pages) { buf.put(i * 4096, 1.toByte); i += 1 }
    val after = BenchRules.sample()
    assert(after.minorFaults - before.minorFaults > pages / 2,
      s"minflt_d=${after.minorFaults - before.minorFaults}")
    assert(after.procUserMs >= before.procUserMs)
    val line = BenchRules.jitLine("q0_x", 0.1, before, after)
    assert(line.contains("\"proc_sys_ms_d\":"))
    assert(line.contains("\"proc_user_ms_d\":"))
    assert(line.contains("\"minflt_d\":"))
  }
}
