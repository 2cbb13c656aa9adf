#!/usr/bin/env python3
"""Dev-loop replica of the driver's t2 correctness gate: run each oracle SQL
in DuckDB over the testdata parquet and compare with the Spark result parquet
written by graft.Verify (columns sorted by name, rows sorted, values compared).
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb, pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            # decimals -> float for tolerant-compare fallback; keep exact str too
            pass
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING-RESULT {name}")
            n_bad += 1
            continue
        try:
            got = canon(duckdb.sql(f"SELECT * FROM read_parquet({files!r})").df())
        except Exception as e:
            print(f"READ-FAIL {name}: {e}")
            n_bad += 1
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"ORACLE-FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"SCHEMA-MISMATCH {name}: spark={list(got.columns)} duck={list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"ROWCOUNT-MISMATCH {name}: spark={len(got)} duck={len(exp)}")
            n_bad += 1
            continue
        # exact compare on string rendering (mirrors hash-of-sorted-csv)
        gs = got.astype(str)
        es = exp.astype(str)
        if gs.equals(es):
            n_ok += 1
            print(f"OK {name} ({len(got)} rows)")
        else:
            diff = (gs != es).any(axis=1)
            idx = diff[diff].index[:5]
            print(f"VALUE-MISMATCH {name}: {int(diff.sum())}/{len(got)} rows differ; first:")
            for i in idx:
                print(f"  spark: {gs.loc[i].to_dict()}")
                print(f"  duck : {es.loc[i].to_dict()}")
            n_bad += 1
    # queries without oracle
    import os
    all_q = [d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}")]
    no_oracle = sorted(set(all_q) - set(oracle))
    if no_oracle:
        print(f"NO-ORACLE (rows-only check): {no_oracle}")
    print(f"\n{n_ok} OK, {n_bad} BAD, {len(oracle)} total oracled")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
