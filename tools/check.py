#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate.

NOT part of the shipped library (the engine is pure Scala/Spark); this is
tooling to iterate on oracle parity before the driver runs its own compare.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run  `python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out`.

Compares, per query: schema (column names), row count, and an order-
insensitive hash of values (columns sorted by name, rows sorted).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types: floats to repr, timestamps to iso strings
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(lambda v: repr(float(v)))
    rows = sorted(map(tuple, df.astype(str).values.tolist()))
    return rows


def main(sf_dir: str, out_dir: str, only=()) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: schema {sorted(got.columns)} vs oracle {sorted(exp.columns)}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(e)}")
            n_fail += 1
        elif g != e:
            bad = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {bad}")
            for i in bad[:2]:
                print(f"   spark : {g[i]}\n   oracle: {e[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
    print(f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
