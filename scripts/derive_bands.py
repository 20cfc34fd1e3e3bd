#!/usr/bin/env python3
"""Derive per-query bench bands from >=2 agreeing same-code records.

Usage: derive_bands.py <sha> [<extra_sha_for_context>]

Reads bench_records.jsonl, takes every full-suite record at <sha>
(the band-derivation runs), checks per-query agreement, and prints a
markdown band table:

  - agreement = max/min of the per-run medians <= 1.30 -> band from the
    run mean x [0.55, 1.6] (the r5 rule);
  - disagreement -> a VARIANCE band [min x 0.7, max x 1.3] explicitly
    labeled, never a fake-stable median.

Queries under 0.5 s in every run fall under the "< 1.0 s" bulk rule
and are omitted from the explicit table.
"""
import json
import sys


def main() -> None:
    sha = sys.argv[1]
    context_shas = set(sys.argv[2:])
    runs, context = [], []
    with open("bench_records.jsonl") as f:
        for line in f:
            if not line.strip():
                continue
            r = json.loads(line)
            if r.get("subset"):
                continue
            if r.get("sha") == sha:
                runs.append(r)
            elif r.get("sha") in context_shas:
                context.append(r)
    if len(runs) < 2:
        sys.exit(f"need >=2 full-suite records at {sha}, found {len(runs)}")
    names = sorted(set().union(*[r["queries"].keys() for r in runs]))
    totals = ", ".join(format(r["value"], ".1f") for r in runs)
    print(f"derived from {len(runs)} records at {sha} (totals: {totals})")
    print()
    print("| query | runs | band | kind |")
    print("|---|---|---|---|")
    bulk = []
    for name in names:
        vals = [r["queries"][name] for r in runs if name in r["queries"]]
        lo, hi = min(vals), max(vals)
        ctx = [r["queries"][name] for r in context if name in r["queries"]]
        ctxs = (" ctx:" + "/".join(format(v, ".2f") for v in ctx)) if ctx else ""
        if hi < 0.5 and all(v < 0.5 for v in ctx or [0]):
            bulk.append(name)
            continue
        if lo > 0 and hi / lo <= 1.30:
            mean = sum(vals) / len(vals)
            band = f"{mean * 0.55:.2f}-{mean * 1.6:.2f}"
            kind = "stable"
        else:
            band = f"{lo * 0.7:.2f}-{hi * 1.3:.2f}"
            kind = "VARIANCE"
        print(f"| {name} | {'/'.join(format(v, '.2f') for v in vals)}{ctxs} | {band} | {kind} |")
    print()
    print(f"bulk (<0.5 s in every run, band rule '< 1.0 s'): {len(bulk)} queries")


if __name__ == "__main__":
    main()
