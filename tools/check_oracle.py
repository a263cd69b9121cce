#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

Loads each <name>/ parquet dump produced by graft.Verify, runs the paired
oracle SQL from oracle_sql.json in DuckDB over the same fixture tables,
sorts columns by name (the driver does this before hashing), and compares
row count, schema, and values.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir) if not d.endswith(".json"))
    n_pass = n_fail = 0
    for name in names:
        spark_rel = con.sql(
            f"SELECT * FROM '{os.path.join(out_dir, name)}/*.parquet'")
        s_cols = sorted(spark_rel.columns)
        s_rows = spark_rel.select(", ".join(f'"{c}"' for c in s_cols)).fetchall()
        if name not in oracle:
            # mirror the driver's rows>0 smoke check: an empty rows-only
            # dump is a silent regression, not a pass
            if len(s_rows) == 0:
                print(f"FAIL {name}: rows-only dump has 0 rows")
                n_fail += 1
            else:
                print(f"  OK(rows-only) {name}: {len(s_rows)} rows")
                n_pass += 1
            continue
        try:
            o_rel = con.sql(oracle[name])
            o_cols = sorted(o_rel.columns)
            o_rows = o_rel.select(", ".join(f'"{c}"' for c in o_cols)).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(s_rows, o_rows)):
            ca, cb = tuple(map(canon, a)), tuple(map(canon, b))
            if ca != cb:
                bad = (i, ca, cb)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} spark={bad[1]} oracle={bad[2]}")
            n_fail += 1
        else:
            print(f"  OK {name}: {len(s_rows)} rows hash-match")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
