#!/usr/bin/env python3
"""Local correctness self-check, mimicking the driver's DuckDB-oracle gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads every <name>/ parquet dir under verify_out_dir, runs the matching SQL
from oracle_sql.json in DuckDB (tables = parquet files in sf_dir), and
compares: row count, sorted-by-name column set, and the full multiset of
values (rows sorted canonically). Exact equality — no tolerance — so any
pass here should survive the driver's hash compare.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
            g_cols = sorted(got.column_names)
            w_cols = sorted(want.column_names)
            if g_cols != w_cols:
                print(f"FAIL {name}: columns {g_cols} vs oracle {w_cols}")
                n_fail += 1
                continue
            if got.num_rows != want.num_rows:
                print(f"FAIL {name}: rows {got.num_rows} vs oracle {want.num_rows}")
                n_fail += 1
                continue
            g_rows = sorted(
                tuple(canon(r[c]) for c in g_cols) for r in got.to_pylist())
            w_rows = sorted(
                tuple(canon(r[c]) for c in w_cols) for r in want.to_pylist())
            if g_rows != w_rows:
                bad = next(i for i, (a, b) in enumerate(zip(g_rows, w_rows)) if a != b)
                print(f"FAIL {name}: values differ, e.g. row {bad}:")
                print(f"  spark:  {g_rows[bad]}")
                print(f"  oracle: {w_rows[bad]}")
                n_fail += 1
                continue
            print(f"PASS {name} ({got.num_rows} rows)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
