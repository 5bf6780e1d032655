#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet dumps produced by `graft.Verify` plus oracle_sql.json,
runs each oracle in DuckDB against the same sf directory, and compares
row count, column names (sorted), and values row-by-row (driver-style:
sort columns by name, hash values in row order).

Usage: python3 tools/selfcheck.py <verifyOutDir> <sfDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format stably
        if v == 0:
            return "0"
        return repr(round(v, 9))
    return repr(v)


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracles):
        spark_dir = out_dir / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        got, want = got[gc], want[wc]
        mismatch = None
        for i in range(len(got)):
            for c in gc:
                a, b = norm(got[c].iloc[i]), norm(want[c].iloc[i])
                if a != b:
                    mismatch = (i, c, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            i, c, a, b = mismatch
            print(f"FAIL {name}: row {i} col {c}: spark={a} oracle={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1

    # rows-only queries (no oracle)
    for p in sorted(out_dir.iterdir()):
        if p.is_dir() and p.name not in oracles:
            try:
                n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                print(f"ROWS {p.name}: {n} rows {'(EMPTY!)' if n == 0 else ''}")
            except Exception as e:
                print(f"ROWS {p.name}: unreadable: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
