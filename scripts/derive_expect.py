#!/usr/bin/env python3
"""Derive docs/BENCH_EXPECT.json — per-query EXPECTED median seconds at
sf0.1 — for the adaptive bench harness (Bench.scala) and the pre-seal
wall-budget gate (scripts/bench_budget_check.py).

Sources, in precedence order:
  1. the most recent FULL record in bench_records.jsonl (subset:false,
     nq ≥ 100; latest ts wins, ties broken by larger nq) — measured
     medians. A later full record wins over an earlier larger one by
     design: rebasing is about freshness, and nq only moves when the
     registry itself changed;
  2. pre-stated band rows in docs/BENCH_NOTES.md of the form
     `| qNNN_name | a–b s |` — band midpoint, for queries added after
     the last full record;
  3. queries in neither source are OMITTED — Bench treats missing as
     heavy (full median-of-3 discipline), the safe default.

Regenerate after every full driver run:  python3 scripts/derive_expect.py
"""
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def latest_full_record():
    best = None
    with open(REPO / "bench_records.jsonl") as f:
        for line in f:
            if not line.strip():
                continue
            r = json.loads(line)
            if r.get("subset") or r.get("nq", 0) < 100:
                continue
            key = (r.get("ts", ""), r.get("nq", 0))
            if best is None or key > (best.get("ts", ""), best.get("nq", 0)):
                best = r
    if best is None:
        sys.exit("no full-suite record in bench_records.jsonl")
    return best


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
    rec = latest_full_record()
    expect = {k: round(v, 4) for k, v in rec["queries"].items()}
    measured_n = len(expect)
    for name, mid in band_midpoints().items():
        if name not in expect:
            expect[name] = mid
    out = REPO / "docs" / "BENCH_EXPECT.json"
    out.write_text(json.dumps(
        {"_derived_from": {"sha": rec.get("sha"), "ts": rec.get("ts"),
                           "nq": rec.get("nq")},
         "expect": dict(sorted(expect.items()))}, indent=1) + "\n")
    print(f"wrote {out}: {measured_n} measured + "
          f"{len(expect) - measured_n} band-midpoint entries "
          f"(base record sha={rec.get('sha')} nq={rec.get('nq')})")


if __name__ == "__main__":
    main()
