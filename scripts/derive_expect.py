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

Driver-history guard (r14): mirrors Bench.scala's cross-round spike
trigger (>1.5x the prior driver record's settled value by >=0.75 s) —
the 2x cross-record-median guard above provably cannot see a 1.5-1.9x
inflation once a few inflated readings have entered the record pool
(q96 r13). Flagged values are replaced by the 25th percentile of all
trusted observations; see q25() for why a low quantile and not the
median.

Regenerate after every full driver run:  python3 scripts/derive_expect.py
Pin the base record to a specific sha:   python3 scripts/derive_expect.py --base <sha>
(the guards still see ALL full records, including ones newer than the
pinned base — fresh clean local measurements sharpen the replacement)
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


def q25(vals):
    """Interpolated 25th percentile. Timing contamination is ONE-SIDED
    (interference/JIT pathology only ever inflates a reading), so a low
    quantile of the trusted observations estimates the clean mode where
    the median cannot: by r13 q96's inflated readings were 3 of 8
    observations, dragging the cross-record median to 6.9-7.3 while the
    fresh-JVM consensus sat at 5.0-6.2."""
    s = sorted(vals)
    if len(s) == 1:
        return s[0]
    pos = 0.25 * (len(s) - 1)
    lo = int(pos)
    frac = pos - lo
    return s[lo] + frac * (s[lo + 1] - s[lo])


def prior_driver_record(recs, base):
    """Most recent full DRIVER record strictly older than `base`."""
    for r in recs:
        if r is base or r.get("ts", "") >= base.get("ts", ""):
            continue
        if r.get("source") == "driver":
            return r
    return None


def main():
    recs = full_records()
    base_sha = None
    argv = sys.argv[1:]
    if argv[:1] == ["--base"] and len(argv) >= 2:
        base_sha = argv[1]
    rec = recs[0]
    if base_sha is not None:
        matches = [r for r in recs if r.get("sha") == base_sha]
        if not matches:
            sys.exit(f"--base {base_sha}: no full record with that sha")
        rec = matches[0]  # recs is newest-first; latest record at that sha
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
    # "other" records: everything except the base — with --base pinned
    # to a driver sha this includes NEWER local records, deliberately
    # (post-fix clean measurements inform the guards below)
    others = [r for r in recs if r is not rec]
    for older in others:
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
            r["queries"][name] for r in others
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
    # driver-history guard (r14 — mirrors Bench.scala's cross-round
    # spike trigger, same constants): a base value that jumped >1.5×
    # (+0.75 s) over the PRIOR DRIVER record's settled value is an
    # inflation signature even when the 2× cross-record-median guard
    # can't see it (q96 r13: base 10.29, cross median 6.93 → 1.49×,
    # silent; prior driver 4.23 → 2.4×, fires). Replacement is the 25th
    # percentile of ALL trusted observations (see q25's docstring) —
    # protective-low by design: if the low figure is wrong, the next
    # run's spike rule re-measures; if the high figure were baked in,
    # nothing ever would.
    CROSS_K = 1.5
    prior = prior_driver_record(recs, rec)
    driver_replaced = []
    if prior is not None:
        prior_skip = untrusted_names(prior)
        for name in list(rec["queries"].keys()):
            if name not in expect or name in skip or name in replaced:
                continue
            p = prior.get("queries", {}).get(name)
            if p is None or name in prior_skip:
                continue
            v = expect[name]
            if v > CROSS_K * p and v - p > SPIKE_ABS:
                trusted = [r["queries"][name] for r in recs
                           if name in r.get("queries", {})
                           and name not in untrusted_names(r)]
                expect[name] = round(q25(trusted), 4)
                driver_replaced.append(name)
                print(f"WARNING: {name} base value {v} > {CROSS_K}x prior "
                      f"driver record ({p}) — replaced by q25 of trusted "
                      f"observations ({expect[name]})", file=sys.stderr)
    out = REPO / "docs" / "BENCH_EXPECT.json"
    out.write_text(json.dumps(
        {"_derived_from": {"sha": rec.get("sha"), "ts": rec.get("ts"),
                           "nq": rec.get("nq"),
                           "degraded_excluded": len(skip),
                           "fallback_from_older": fallback_n,
                           "outlier_replaced": replaced,
                           "driver_history_replaced": driver_replaced},
         "expect": dict(sorted(expect.items()))}, indent=1) + "\n")
    print(f"wrote {out}: {measured_n} from base record + "
          f"{fallback_n} from older clean records + "
          f"{len(expect) - measured_n - fallback_n} band-midpoint entries "
          f"(base record sha={rec.get('sha')} nq={rec.get('nq')})")


if __name__ == "__main__":
    main()
