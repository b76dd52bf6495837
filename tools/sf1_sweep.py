#!/usr/bin/env python3
"""Full-surface 10x correctness sweep → CORRECTNESS_SF1_r{N}.json.

Judges every oracle-checked query at the synthetic sf1 scale, consuming
graft.Verify dumps INCREMENTALLY (as each query's parquet lands) so the
DuckDB side overlaps the still-running Spark side. Resumable: results
accumulate in a state file; already-judged queries are skipped.

Usage:
  sf1_sweep.py <sfDir> <verifyOutDir> <oracleSqlJson> <round> [--final]

With --final, waits for nothing: judges what's available, then writes
the repo artifact CORRECTNESS_SF1_r<round>.json from the state file.
Dev tool only — NOT part of the Scala library.
"""
import json
import os
import sys
import time

import duckdb
import pyarrow.dataset as ds

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from selfcheck import ITERATIVE, table_rows  # noqa: E402

STATE = "/tmp/sf1_sweep_state.json"


def judge(con, name, sql, out_dir, sf_dir):
    t0 = time.time()
    spark_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
    if name in ITERATIVE:
        duck = ITERATIVE[name](con)
        if "sf1" not in sf_dir:
            unrolled = con.execute(sql).fetch_arrow_table()
            if not duck.equals(unrolled):
                return {"status": "fail",
                        "reason": "iterative hook != unrolled SQL"}
    else:
        duck = con.execute(sql).fetch_arrow_table()
    s_cols = sorted(spark_tbl.column_names)
    d_cols = sorted(duck.column_names)
    if s_cols != d_cols:
        return {"status": "fail",
                "reason": f"schema spark={s_cols} duck={d_cols}"}
    s_rows = table_rows(spark_tbl, s_cols)
    d_rows = table_rows(duck, s_cols)
    if s_rows != d_rows:
        diff = next((i for i, (a, b) in enumerate(zip(s_rows, d_rows))
                     if a != b), min(len(s_rows), len(d_rows)))
        return {"status": "fail",
                "reason": f"rows spark={len(s_rows)} duck={len(d_rows)} "
                          f"first_diff_at={diff}"}
    return {"status": "ok", "rows": len(s_rows),
            "oracle_sec": round(time.time() - t0, 1)}


def main():
    sf_dir, out_dir, oracle_json, rnd = sys.argv[1:5]
    final = "--final" in sys.argv
    oracle = json.load(open(oracle_json))
    state = json.load(open(STATE)) if os.path.exists(STATE) else {}
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    con.execute("SET memory_limit='24GB'")
    os.makedirs("/tmp/duck_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    pending = [n for n in sorted(oracle) if n not in state]
    n_round = 0
    for name in pending:
        if not os.path.exists(f"{out_dir}/{name}/_SUCCESS"):
            continue
        try:
            state[name] = judge(con, name, oracle[name], out_dir, sf_dir)
        except Exception as e:
            state[name] = {"status": "fail",
                           "reason": f"error: {str(e)[:300]}"}
        n_round += 1
        print(f"{state[name]['status'].upper():4s} {name}: "
              f"{state[name].get('rows', state[name].get('reason'))}",
              flush=True)
        json.dump(state, open(STATE, "w"), indent=1, sort_keys=True)
    remaining = [n for n in sorted(oracle) if n not in state]
    print(f"[sweep] judged {n_round} this pass; "
          f"{len(remaining)} still pending: {remaining[:8]}", flush=True)
    if final:
        fails = {n: r for n, r in state.items() if r["status"] != "ok"}
        art = {
            "sf": ("1.0-synthetic (10x sf0.1 via graft.SynthScale: "
                   "key-shifted replicas, disjoint-token documents, "
                   "jittered embeddings; single-file tables matching the "
                   "driver fixture layout)"),
            "round": int(rnd),
            "note": ("FULL-surface sweep one decade past the largest "
                     "driver fixture: every oracle-checked query (round-10 "
                     "ran a 23-query expensive tail only). q_pagerank now "
                     "INCLUDED via the resource-feasible iterative oracle "
                     "(temp-table rounds in tools/selfcheck.py, "
                     "cross-checked equal to the unrolled contract SQL at "
                     "driver-fixture scales)."),
            "n_ok": sum(1 for r in state.values() if r["status"] == "ok"),
            "n_fail": len(fails),
            "failures": sorted(fails),
            "queries": {n: state[n] for n in sorted(state)},
        }
        path = f"CORRECTNESS_SF1_r{rnd}.json"
        json.dump(art, open(path, "w"), indent=1)
        print(f"[sweep] wrote {path}: n_ok={art['n_ok']} "
              f"n_fail={art['n_fail']}")
        sys.exit(1 if fails or remaining else 0)


if __name__ == "__main__":
    main()
