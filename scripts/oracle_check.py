#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 scripts/oracle_check.py <verify_out_dir> <sf_dir>

For each query dir under <verify_out_dir>: read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB against the
parquet tables in <sf_dir>, sort columns by name, and compare row count,
schema shape, and a value hash.  (Local pre-flight only — the driver runs
its own equivalent.)
"""
import json
import os
import sys
import glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df


def hash_df(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        for v in s:
            if isinstance(v, float):
                h.update(repr(v).encode())
            else:
                h.update(str(v).encode())
        h.update(b"|")
    return h.hexdigest()[:16]


def dtype_parity(got: pd.DataFrame, want: pd.DataFrame):
    """Columns whose pandas dtypes differ in a way that can change the
    driver's str/repr hash.  Integer-width differences (int32 vs int64)
    stringify identically and are allowed; anything else (float64 vs
    int64 — the q113/q116/q120 HUGEINT bug class — or float32 vs
    float64, whose reprs differ) is a mismatch even when values compare
    equal."""
    bad = []
    for c in got.columns:
        a, b = got[c].dtype, want[c].dtype
        if a == b:
            continue
        if a.kind in "iu" and b.kind in "iu":
            continue
        bad.append((c, str(a), str(b)))
    return bad


def main(outdir: str, sfdir: str) -> int:
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            if os.environ.get("ORACLE_CHECK_PARTIAL"):
                continue  # partial dev-loop dump (Verify <sf> <out> <names>)
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        want = norm(con.execute(oracle[name]).fetchdf())
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        # compare values cell-by-cell with tolerance-free equality
        ok_vals = False
        ok_hash = False
        bad_dtypes = []
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    got.reset_index(drop=True), want.reset_index(drop=True),
                    check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                ok_vals = False
                err = str(e).split("\n")[0:3]
            # the driver's actual compare: str/repr hash + dtype parity
            ok_hash = hash_df(got) == hash_df(want)
            bad_dtypes = dtype_parity(got, want)
        ok = ok_rows and ok_cols and ok_vals and ok_hash and not bad_dtypes
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"{status} {name}: rows {len(got)}/{len(want)} cols_match={ok_cols}"
              f" vals={ok_vals} hash={ok_hash} dtypes={'ok' if not bad_dtypes else bad_dtypes}")
        if not ok_cols:
            print(f"     spark cols: {list(got.columns)}")
            print(f"     duck  cols: {list(want.columns)}")
        elif ok_rows and not ok_vals:
            for line in err:
                print("    ", line)
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
