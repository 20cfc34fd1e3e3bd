#!/usr/bin/env python3
"""Triage jitstats.jsonl — classify each bench run's slow/suspicious
queries by inflation mechanism from the side-channel deltas.

Usage: jitstats_triage.py [path] [--sec-min S]

jitstats.jsonl (gitignored, appended by Bench; one `run_header` line
per run, then one line per measured query plus `#rerun` lines for
spike adjudications) carries per-query deltas that separate the
mechanisms a wall-clock reading cannot (docs/BENCH_NOTES.md round 14):

  fault-churn   proc_sys_ms_d rivals proc_user_ms_d AND minflt_d is
                large (>= ~250k) — the query paid first-touch page
                faults (self-inflicted heap churn would mean the heap
                pin regressed; check the run_header's jvm_flags first)
  gc            gc_ms_d (or task_gc_ms_d) is a large share of the wall
  jit-ramp      jit_ms_d is a large share of the wall (first-of-shape
                executions; benign when confined to a warm rep)
  plan-change   tasks_d/jobs_d differ from the same query's other runs
                (AQE flip or code change — compare across records)
  external      wall is high but every counter above is flat: the box
                was slow AROUND us (kernel windows from other tenants);
                adjudicate with fresh-JVM TimeQuery reps
"""
import json
import sys

def classify(r):
    sec = r.get("sec", 0.0)
    wall_ms = sec * 1000
    tags = []
    minflt = r.get("minflt_d", -1)
    psys = r.get("proc_sys_ms_d", -1)
    puser = r.get("proc_user_ms_d", -1)
    if psys >= 0 and minflt >= 250_000 and psys > 0.5 * max(puser, 1):
        tags.append("fault-churn")
    # the harness's own settle System.gc() contributes ~0.6 s of gc_ms_d
    # to EVERY bracketed window — only tag gc when the query is big
    # enough that the share can't be the settle
    if r.get("gc_ms_d", 0) > 0.4 * wall_ms and sec >= 1.5:
        tags.append("gc")
    if r.get("jit_ms_d", 0) > 1.5 * wall_ms and sec > 1.0:
        tags.append("jit-ramp")
    if not tags:
        tags.append("external-or-plain")
    return tags

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    path = args[0] if args else "jitstats.jsonl"
    sec_min = 3.0
    for i, a in enumerate(sys.argv):
        if a == "--sec-min":
            sec_min = float(sys.argv[i + 1])
    run = 0
    for line in open(path):
        if not line.strip():
            continue
        r = json.loads(line)
        if r.get("run_header"):
            run += 1
            print(f"--- run {run}: {r.get('jvm_flags')} sf={r.get('sf')} cpus={r.get('cpus')}")
            continue
        if r.get("sec", 0) < sec_min and "#rerun" not in r.get("q", ""):
            continue
        tags = ",".join(classify(r))
        print(f"{r['q']:34s} {r['sec']:7.2f}s [{tags}] "
              f"task_ms={r.get('task_ms_d', -1):>7} gc={r.get('gc_ms_d', -1):>5} "
              f"jit={r.get('jit_ms_d', -1):>6} psys={r.get('proc_sys_ms_d', -1):>6} "
              f"minflt={r.get('minflt_d', -1):>8} cc_mb={r.get('codecache_mb', -1)}")

if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` is the normal way to read this
        pass
