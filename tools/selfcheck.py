#!/usr/bin/env python3
"""Local replica of the driver's correctness compare.

Usage: selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB over <sfDir>/*.parquet
views, then compares schema (column names sorted) and cell values.
This is a dev tool only — NOT part of the Scala library.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_rows(tbl, cols):
    data = [tbl.column(c).to_pylist() for c in cols]
    return [tuple(norm(x) for x in row) for row in zip(*data)]


def pagerank_iterative(con):
    """Resource-feasible q_pagerank oracle: the SAME integer fixed-point
    recurrence as SparkEntry's unrolled 10-round CTE chain (PagerankSql),
    but materialized one round at a time in temp tables so DuckDB's
    spill stays one-round-sized (the unrolled chain exceeds local spill
    disk at sf1.0). Faithfulness is pinned by selfcheck itself: at
    sf0.01/sf0.1 this hook and the unrolled oracle_sql.json SQL are both
    run and must agree (see main's cross-check).
    """
    con.execute("""
        CREATE OR REPLACE TEMP TABLE pr_edges AS
        WITH pairs AS (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
          JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)
        SELECT src, dst FROM pairs GROUP BY src, dst HAVING count(*) >= 2""")
    con.execute("CREATE OR REPLACE TEMP TABLE pr_nodes AS "
                "SELECT DISTINCT src AS node FROM pr_edges")
    con.execute("CREATE OR REPLACE TEMP TABLE pr_deg AS "
                "SELECT src, count(*) AS outdeg FROM pr_edges GROUP BY src")
    con.execute("CREATE OR REPLACE TEMP TABLE pr_nn AS "
                "SELECT count(*) AS n FROM pr_nodes")
    con.execute("CREATE OR REPLACE TEMP TABLE pr_rank AS "
                "SELECT node, 1000000000000 // n AS rank "
                "FROM pr_nodes CROSS JOIN pr_nn")
    for _ in range(10):
        con.execute("""
            CREATE OR REPLACE TEMP TABLE pr_next AS
            SELECT n.node,
              (1000000000000 * 15) // (100 * pr_nn.n) +
              (85 * coalesce(c.contrib, 0)) // 100 AS rank
            FROM pr_nodes n
            CROSS JOIN pr_nn
            LEFT JOIN (
              SELECT e.dst AS node, sum(p.rank // d.outdeg) AS contrib
              FROM pr_rank p
              JOIN pr_edges e ON p.node = e.src
              JOIN pr_deg d ON d.src = e.src
              GROUP BY e.dst) c ON c.node = n.node""")
        con.execute("DROP TABLE pr_rank")
        con.execute("ALTER TABLE pr_next RENAME TO pr_rank")
    tbl = con.execute(
        "SELECT node, CAST(rank AS BIGINT) AS rank FROM pr_rank "
        "ORDER BY rank DESC, node NULLS FIRST").fetch_arrow_table()
    for t in ("pr_rank", "pr_edges", "pr_nodes", "pr_deg", "pr_nn"):
        con.execute(f"DROP TABLE IF EXISTS {t}")
    return tbl


# Per-query oracle hooks that replace the single-statement SQL with a
# resource-bounded multi-statement program (identical math).
ITERATIVE = {"q_pagerank": pagerank_iterative}


# The six dedup-cluster oracles share one connected-components core —
# literally the same CTE text (asserted below before any rewrite):
#   edges AS (<pairs> UNION <flipped pairs>)   -- symmetric by text
#   verts AS (SELECT DISTINCT src AS id FROM edges)
#   reach(id, comp) AS (SELECT id, id FROM verts
#     UNION SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id)
#   comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
# `reach` is the FULL transitive closure: Θ(Σ s²) rows per component of
# size s, re-joined every fixpoint round — it blew DuckDB's spill past
# the local disk at the 100x synthetic decade (q_cluster_sizes,
# 78 GB+). min-label propagation with path compression computes the
# identical `comp` relation — for SYMMETRIC edges, min over the seeds
# that reach a vertex IS the component-minimum id — in O(E) rows per
# round and O(log diameter) rounds.
CC_ITERATIVE = {"q_cluster_sizes", "q_dedup_clusters", "q_dedup_keep_best",
                "q_dedup_survivorship", "q_dup_by_source",
                "q_dedup_incr_clusters"}

CC_COMP_CTE = "comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)"


def _cc_core_shape_ok(sql):
    import re
    return (sql.count("edges AS (") == 1 and sql.count(CC_COMP_CTE) == 1 and
            re.search(r"edges AS \(\s*SELECT (\w+) AS src, (\w+) AS dst"
                      r" FROM (\w+)\s*UNION\s*"
                      r"SELECT \2 AS src, \1 AS dst FROM \3", sql) is not None
            and "verts AS (SELECT DISTINCT src AS id FROM edges)" in sql)


def cc_iterative(con, sql):
    """Resource-feasible stand-in for the recursive-closure CC oracles:
    (1) materialize `edges` by running the oracle's own prefix CTEs
    with the final statement swapped to `SELECT src, dst FROM edges`
    (the reach/comp/suffix CTEs become unreferenced and are never
    executed); (2) min-label propagation + path compression in temp
    tables until fixpoint; (3) re-run the ORIGINAL oracle SQL with only
    the `comp` CTE redirected at the precomputed table, so every
    pre/post-processing clause — and the output schema and ORDER BY —
    stays the contract's own text. Faithfulness is pinned the same way
    as the pagerank hook: at driver-fixture scales selfcheck runs BOTH
    this and the untouched recursive SQL and requires equality.
    """
    assert _cc_core_shape_ok(sql), "CC oracle shape drifted; refusing rewrite"
    i = sql.index("edges AS (")
    depth, k = 0, sql.index("(", i)
    while True:
        if sql[k] == "(":
            depth += 1
        elif sql[k] == ")":
            depth -= 1
            if depth == 0:
                break
        k += 1
    con.execute("CREATE OR REPLACE TEMP TABLE cc_edges AS " +
                sql[:k + 1] + "\nSELECT src, dst FROM edges")
    con.execute("CREATE OR REPLACE TEMP TABLE cc_comp AS "
                "SELECT DISTINCT src AS id, src AS component FROM cc_edges")
    for _ in range(64):
        # neighbor-min: component(v) := min(component(v), component(nbr))
        con.execute("""
            CREATE OR REPLACE TEMP TABLE cc_next AS
            SELECT id, min(component) AS component FROM (
              SELECT id, component FROM cc_comp
              UNION ALL
              SELECT e.src AS id, c.component
              FROM cc_edges e JOIN cc_comp c ON c.id = e.dst)
            GROUP BY id""")
        # path compression: component(v) := component(component(v)) —
        # component ids are vertex ids, so the inner lookup always hits
        con.execute("""
            CREATE OR REPLACE TEMP TABLE cc_comp2 AS
            SELECT c.id, p.component
            FROM cc_next c JOIN cc_next p ON c.component = p.id""")
        changed = con.execute(
            "SELECT count(*) FROM cc_comp2 n JOIN cc_comp o ON n.id = o.id "
            "AND n.component <> o.component").fetchone()[0]
        con.execute("DROP TABLE cc_comp")
        con.execute("ALTER TABLE cc_comp2 RENAME TO cc_comp")
        con.execute("DROP TABLE cc_next")
        if changed == 0:
            break
    else:
        raise RuntimeError("cc_iterative: no fixpoint in 64 rounds")
    final = sql.replace(CC_COMP_CTE,
                        "comp AS (SELECT id, component FROM cc_comp)")
    tbl = con.execute(final).fetch_arrow_table()
    for t in ("cc_edges", "cc_comp"):
        con.execute(f"DROP TABLE IF EXISTS {t}")
    return tbl


def main():
    # --skip-unrolled: skip the iterative-pagerank faithfulness
    # cross-check (the unrolled 10-round CTE SQL) — pass it EXPLICITLY
    # when the data is too large for the unrolled form to spill-fit
    # (the synthetic 10x/100x sweeps). An explicit flag, not path
    # sniffing: "sf1" as a substring also matched sf10 and any
    # directory containing it, silently skipping the check.
    argv = [a for a in sys.argv[1:] if a != "--skip-unrolled"]
    skip_unrolled = "--skip-unrolled" in sys.argv[1:]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            if name in ITERATIVE or name in CC_ITERATIVE:
                duck = (ITERATIVE[name](con) if name in ITERATIVE
                        else cc_iterative(con, sql))
                # faithfulness cross-check: at driver-fixture scales the
                # unrolled oracle_sql.json SQL is also feasible — run it
                # and require the hook to agree, so the iterative form
                # can never drift from the contract SQL it stands in for
                if not skip_unrolled:
                    unrolled = con.execute(sql).fetch_arrow_table()
                    if not duck.equals(unrolled):
                        print(f"FAIL {name}: iterative hook diverges "
                              "from the unrolled oracle SQL")
                        failures += 1
                        continue
            else:
                duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: schema spark={s_cols} duck={d_cols}")
            failures += 1
            continue
        s_rows = table_rows(spark_tbl, s_cols)
        d_rows = table_rows(duck, s_cols)
        if s_rows == d_rows:
            print(f"OK   {name}: {len(s_rows)} rows")
        else:
            failures += 1
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                    break
            else:
                n = min(len(s_rows), len(d_rows))
                print(f"  common prefix equal; extra rows from {n}:")
                print(f"    spark={s_rows[n:n+2]}\n    duck ={d_rows[n:n+2]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
