#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's output
against DuckDB executing oracle_sql.json on the same parquet tables,
sort columns by name + rows, and compare values exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
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


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_bad += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_bad += 1
            continue
        # dtype-strict, like the driver's hash gate: a DuckDB HUGEINT/DECIMAL
        # that lands in pandas as float64/object while Spark emits int64 is a
        # RED row even when every value compares equal.  Report the coercion
        # explicitly so the offending oracle cast is obvious.
        dtype_diff = [c for c in g.columns if g[c].dtype != w[c].dtype]
        if dtype_diff:
            for c in dtype_diff:
                print(f"FAIL {name}: dtype mismatch col={c}: "
                      f"spark={g[c].dtype} duckdb={w[c].dtype}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=True, check_exact=True)
            print(f"OK   {name}: {len(g)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:600]}")
            # show first differing cells
            for c in g.columns:
                neq = (g[c] != w[c]) & ~(g[c].isna() & w[c].isna())
                if neq.any():
                    i = neq.idxmax()
                    print(f"  col={c} row={i}: spark={g[c][i]!r} duckdb={w[c][i]!r}")
            n_bad += 1
    print(f"\n{len(oracles) - n_bad}/{len(oracles)} oracle queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
