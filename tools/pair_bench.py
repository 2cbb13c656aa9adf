#!/usr/bin/env python3
"""Merge an engine bench JSON (graft.Bench output) and a DuckDB baseline
JSON (duckdb_bench.py output) into ONE matched-pair artifact with
per-query ratios, so a judge can adjudicate per-query performance without
re-running either side.
Usage: pair_bench.py <engineJson> <duckdbJson> <outJson>
"""
import json, sys


def main(engine_path, duckdb_path, out_path):
    e = json.load(open(engine_path))
    d = json.load(open(duckdb_path))
    eq, dq = e["queries"], d["queries"]
    ratio = {}
    for name in sorted(set(eq) | set(dq)):
        ev, dv = eq.get(name), dq.get(name)
        ratio[name] = (round(ev / dv, 3)
                       if ev is not None and dv and ev >= 0 else None)
    common = [q for q in eq if q in dq and eq[q] is not None and eq[q] >= 0
              and dq[q] is not None]
    e_tot = round(sum(eq[q] for q in common), 3)
    d_tot = round(sum(dq[q] for q in common), 3)
    doc = {
        "sf": e.get("sf"),
        "n_queries_paired": len(common),
        "engine_total": e_tot,
        "duckdb_total": d_tot,
        "ratio_total": round(e_tot / d_tot, 3) if d_tot else None,
        "engine_load_avg_before": e.get("load_avg_before"),
        "engine_contended": e.get("contended"),
        "elapsed_landing_sec": e.get("elapsed_landing_sec"),
        "elapsed_compact_sec": e.get("elapsed_compact_sec"),
        "elapsed_bpe_train_sec": e.get("elapsed_bpe_train_sec"),
        "ratio": ratio,
        "engine": eq,
        "duckdb": dq,
    }
    json.dump(doc, open(out_path, "w"), indent=1)
    worst = sorted((r, q) for q, r in ratio.items() if r is not None)[-8:]
    print(f"paired {len(common)} queries: engine {e_tot}s vs duckdb {d_tot}s "
          f"-> {doc['ratio_total']}x")
    for r, q in reversed(worst):
        print(f"  {q:30s} {r:6.2f}x  ({eq.get(q)}s vs {dq.get(q)}s)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
