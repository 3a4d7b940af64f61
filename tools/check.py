#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sf_dir] [out_dir]

1. Assumes `sbt "runMain graft.Verify <sf_dir> <out_dir>"` already ran
   (or runs it with --run).
2. Loads <out_dir>/oracle_sql.json, runs each SQL in DuckDB against views
   named after the parquet tables in sf_dir.
3. Compares against <out_dir>/<name>/ parquet: schema (sorted column
   names), row count, and cell-exact values after sorting columns by name
   and rows lexicographically — i.e. a strict stand-in for the driver's
   hash compare.
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    rr.append("NaN")
                elif math.isinf(v):
                    rr.append("Inf" if v > 0 else "-Inf")
                elif v == int(v) and abs(v) < 1e15:
                    rr.append(str(int(v)))  # 3.0 == 3 across engines
                else:
                    rr.append(repr(v))
            elif v is None:
                rr.append("NULL")
            else:
                rr.append(str(v))
        out.append(tuple(rr))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    if "--run" in sys.argv:
        subprocess.run(
            ["sbt", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", check=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = out_dir / name
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: schema {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
            continue
        # reorder both to sorted column order
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        g = canon([[r[i] for i in gi] for r in got_rows])
        w = canon([[r[i] for i in wi] for r in want_rows])
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
        elif g != w:
            diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    # queries with no oracle get a rows-only note
    for d in sorted(out_dir.iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"NOTE {d.name}: rows-only ({n} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
