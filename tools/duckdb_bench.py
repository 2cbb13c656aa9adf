#!/usr/bin/env python3
"""DuckDB baseline timings: run every oracle SQL from a Verify dump's
oracle_sql.json over the given sf dir, warm best-of-N wall-clock per
query, one JSON result file (same protocol as BASELINE.md).
Usage: duckdb_bench.py <sfDir> <oracleSqlJson> <outJson> [runs=2]
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_json, out_json, runs=2):
    con = duckdb.connect()
    con.sql(f"SET threads TO 32")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    out = {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            con.sql(sql).fetchall()  # cold warmup
            best = None
            for _ in range(runs):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
            print(f"{name}: {best:.3f}s", file=sys.stderr)
        except Exception as e:
            out[name] = None
            print(f"{name}: FAIL {e}", file=sys.stderr)
    total = sum(v for v in out.values() if v is not None)
    doc = {"total": round(total, 3), "sf": sf_dir, "queries": out}
    json.dump(doc, open(out_json, "w"), indent=1)
    print(json.dumps({"total": doc["total"], "n": len(out)}))


if __name__ == "__main__":
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    main(sys.argv[1], sys.argv[2], sys.argv[3], runs)
