#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads each query's
parquet dump (written by graft.Verify), runs the matching oracle SQL in
DuckDB over the same testdata, and compares as order-insensitive
multisets with columns sorted by name. Usage:

    python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(v)
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = n_weak = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ok" if len(got_rows) > 0 else "EMPTY"
            print(f"weak {name}: rows-only ({len(got_rows)} rows) {status}")
            n_weak += 1
            continue
        try:
            want = con.execute(oracles[name])
            want_rows = want.fetchall()
            want_cols = [d[0] for d in want.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: schema {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
            continue
        g, w = canon(got_rows, got_cols), canon(want_rows, want_cols)
        if g == w:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            # hoist the sets: building them per-row is O(n^2) and hangs
            # on a 100k-row mismatch
            w_set, g_set = set(map(tuple, w)), set(map(tuple, g))
            diff_g = [r for r in g if r not in w_set][:3]
            diff_w = [r for r in w if r not in g_set][:3]
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            print(f"  spark-only: {diff_g}")
            print(f"  oracle-only: {diff_w}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
