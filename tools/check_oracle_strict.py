#!/usr/bin/env python3
"""Strict replica of the driver's t2 correctness gate: spark result read via
pyarrow (exact parquet values, no duckdb coercion), oracle via duckdb;
columns sorted by name, rows sorted, values hashed from full-precision
string rendering (repr for floats, str for Decimal). Prints per-query diffs.
Usage: check_oracle_strict.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def render_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)  # shortest round-trip repr, exposes ulp diffs
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canon_rows(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(render_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return list(df.columns), rows


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"MISSING-RESULT {name}")
            n_bad += 1
            continue
        got_df = pq.ParquetDataset(files).read().to_pandas()
        exp_df = con.sql(sql).df()
        gcols, grows = canon_rows(got_df)
        ecols, erows = canon_rows(exp_df)
        if gcols != ecols:
            print(f"SCHEMA-MISMATCH {name}: spark={gcols} duck={ecols}")
            n_bad += 1
            continue
        if len(grows) != len(erows):
            print(f"ROWCOUNT-MISMATCH {name}: spark={len(grows)} duck={len(erows)}")
            n_bad += 1
            continue
        if grows == erows:
            n_ok += 1
            print(f"OK {name} ({len(grows)} rows)")
        else:
            bad = [i for i, (g, e) in enumerate(zip(grows, erows)) if g != e]
            print(f"VALUE-MISMATCH {name}: {len(bad)}/{len(grows)} rows differ; first:")
            for i in bad[:4]:
                print(f"  cols : {gcols}")
                print(f"  spark: {grows[i]}")
                print(f"  duck : {erows[i]}")
            n_bad += 1
    print(f"\n{n_ok} OK, {n_bad} BAD")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
