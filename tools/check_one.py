#!/usr/bin/env python3
"""Targeted single-query twin of check_oracle.py — same canonicalization
and dtype-strict compare, restricted to the named queries. For gating a
late-registered query at sf1.0 without re-running the full-registry
compare.

Usage: python3 tools/check_one.py <sfDir> <verifyOutDir> <query> [query...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str, names: list) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name in names:
        if name not in oracles:
            print(f"FAIL {name}: not in oracle_sql.json")
            n_bad += 1
            continue
        got = canon(duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        want = canon(con.sql(oracles[name]).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
        elif any(got[c].dtype != want[c].dtype for c in got.columns):
            print(f"FAIL {name}: dtype mismatch")
            n_bad += 1
        elif not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            cell = [(c, i) for c in got.columns for i in got.index[neq[c]]][:1]
            print(f"FAIL {name}: first diff at {cell}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"{len(names) - n_bad}/{len(names)} match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
