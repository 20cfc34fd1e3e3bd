#!/usr/bin/env python3
"""Derive docs/BENCH_EXPECT.json — per-query EXPECTED median seconds at
sf0.1 — for the adaptive bench harness (Bench.scala) and the pre-seal
wall-budget gate (scripts/bench_budget_check.py).

Sources, in precedence order:
  1. the most recent FULL record in bench_records.jsonl (subset:false,
     nq ≥ 100; latest ts wins, ties broken by larger nq) — measured
     medians. A later full record wins over an earlier larger one by
     design: rebasing is about freshness, and nq only moves when the
     registry itself changed. Values whose names appear in the record's
     `degraded` array are EXCLUDED unless also in its `rerun` array
     (degraded = wall-guard one-shot under load, explicitly recorded so
     adjudication won't treat them as settled medians — baking them in
     would skew the cheap/heavy classification and the wall-budget
     gate; rerun = re-measured settled median, trusted);
  2. for names excluded in (1): the most recent EARLIER full record
     where the name is not degraded-without-rerun;
  3. pre-stated band rows in docs/BENCH_NOTES.md of the form
     `| qNNN_name | a–b s |` — band midpoint, for queries added after
     the last full record (and degraded names with no clean history);
  4. queries in no source are OMITTED — Bench treats missing as
     heavy (full median-of-3 discipline), the safe default.

Cross-record outlier guard (r12): a load window that hits a query
BEFORE the wall guard trips leaves an inflated value that is neither
degraded nor rerun — the r11 driver record baked q29 at 17.55 s
(clean-record consensus 3.5–4.2) and q207 at 11.69 (consensus
3.8–4.2) into BENCH_EXPECT this way, which disables the in-harness
spike rule for exactly the queries it should protect (the rule fires
at 2× EXPECT — an expect that IS the spike never fires). So: any
base-record value exceeding SPIKE_K× the median of the same query's
trusted values across the OTHER full records (by ≥ SPIKE_ABS s, ≥ 2
observations required) is replaced by that cross-record median. Same
constants as Bench.scala's spike rule, deliberately. A real code
regression is also "caught" by this guard — and that is the safe
direction: the lower expect makes the next run's spike rule fire and
re-measure, rather than silently accepting the regression as the new
baseline.

Regenerate after every full driver run:  python3 scripts/derive_expect.py
"""
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def full_records():
    """All full-suite records, newest first."""
    recs = []
    with open(REPO / "bench_records.jsonl") as f:
        for line in f:
            if not line.strip():
                continue
            r = json.loads(line)
            if r.get("subset") or r.get("nq", 0) < 100:
                continue
            recs.append(r)
    if not recs:
        sys.exit("no full-suite record in bench_records.jsonl")
    recs.sort(key=lambda r: (r.get("ts", ""), r.get("nq", 0)), reverse=True)
    return recs


def untrusted_names(rec):
    """Names whose values in `rec` are wall-guard one-shots under load
    (degraded) that were NOT subsequently re-measured (rerun)."""
    return set(rec.get("degraded", [])) - set(rec.get("rerun", []))


def band_midpoints():
    """Parse `| qNNN_xxx | a–b s |` pre-stated band rows from BENCH_NOTES."""
    mids = {}
    pat = re.compile(
        r"^\|\s*(q\d+_\w+)\s*\|\s*([0-9.]+)\s*[–-]\s*([0-9.]+)\s*s\s*\|")
    for line in (REPO / "docs" / "BENCH_NOTES.md").read_text().splitlines():
        m = pat.match(line)
        if m:
            name, lo, hi = m.group(1), float(m.group(2)), float(m.group(3))
            mids[name] = round((lo + hi) / 2, 3)
    return mids


def main():
    recs = full_records()
    rec = recs[0]
    skip = untrusted_names(rec)
    if skip:
        print(f"WARNING: base record sha={rec.get('sha')} has "
              f"{len(skip)} degraded-without-rerun values — excluded, "
              f"falling back to earlier clean records / band midpoints",
              file=sys.stderr)
    expect = {k: round(v, 4) for k, v in rec["queries"].items()
              if k not in skip}
    measured_n = len(expect)
    fallback_n = 0
    for older in recs[1:]:
        missing = skip - expect.keys()
        if not missing:
            break
        older_skip = untrusted_names(older)
        for name in missing:
            if name in older["queries"] and name not in older_skip:
                expect[name] = round(older["queries"][name], 4)
                fallback_n += 1
    for name, mid in band_midpoints().items():
        if name not in expect:
            expect[name] = mid
    # cross-record outlier guard — see module docstring
    SPIKE_K, SPIKE_ABS = 2.0, 0.75
    replaced = []
    for name in list(rec["queries"].keys()):
        if name not in expect or name in skip:
            continue
        vals = sorted(
            r["queries"][name] for r in recs[1:]
            if name in r.get("queries", {}) and name not in untrusted_names(r))
        if len(vals) >= 2:
            med = vals[len(vals) // 2]
            v = expect[name]
            if v > SPIKE_K * med and v - med > SPIKE_ABS:
                expect[name] = round(med, 4)
                replaced.append(name)
                print(f"WARNING: {name} base value {v} > {SPIKE_K}x "
                      f"cross-record median {med:.3f} — replaced "
                      f"(load-window value, not a settled median)",
                      file=sys.stderr)
    out = REPO / "docs" / "BENCH_EXPECT.json"
    out.write_text(json.dumps(
        {"_derived_from": {"sha": rec.get("sha"), "ts": rec.get("ts"),
                           "nq": rec.get("nq"),
                           "degraded_excluded": len(skip),
                           "fallback_from_older": fallback_n,
                           "outlier_replaced": replaced},
         "expect": dict(sorted(expect.items()))}, indent=1) + "\n")
    print(f"wrote {out}: {measured_n} from base record + "
          f"{fallback_n} from older clean records + "
          f"{len(expect) - measured_n - fallback_n} band-midpoint entries "
          f"(base record sha={rec.get('sha')} nq={rec.get('nq')})")


if __name__ == "__main__":
    main()
