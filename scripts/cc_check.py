#!/usr/bin/env python3
"""sf1-feasible oracle for q70/q87 (the cluster queries).

The shipped q70/q87 oracles compute transitive closure with a recursive
CTE whose intermediate `reach` set is Sigma |cluster|^2 rows — fine at
sf0.01/sf0.1 (the driver's gate), infeasible at sf1 (killed after 70+
CPU-minutes in the round-4 sweep). This script replaces ONLY the
closure with the same iterative min-label + pointer-jumping loop the
Spark side runs (graft.operators.Components), each round one bounded
DuckDB join over the edge list, and reuses everything else verbatim
from oracle_sql.json: the pair list comes from the q51 oracle SQL, and
q87's doc universe/representative fallback is the statement's own
`univ AS (` suffix run against the materialized clusters table.

Usage: python3 scripts/cc_check.py <sf_dir> <verify_out_dir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> bool:
    got, want = canon(got), canon(want)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        return False
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        return False
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)
        print(f"PASS {name} ({len(got)} rows)")
        return True
    except AssertionError as e:
        print(f"FAIL {name}: {str(e)[:400]}")
        return False


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    # 1. the verified pair list (q51's own oracle — hash-matched
    #    separately by check.py at every SF including sf1)
    con.execute("CREATE TABLE pairs AS " + oracle["q51_minhash_lsh"])
    con.execute("""CREATE TABLE edges AS
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b AS src, doc_a AS dst FROM pairs""")

    # 2. min-label propagation + pointer jumping, exactly the Components
    #    loop: rounds ~ log2(diameter), each one edge-list join + one
    #    |nodes|-row self-join — linear work per round, no closure blowup
    con.execute("CREATE TABLE labels AS "
                "SELECT DISTINCT src AS node, src AS label FROM edges")
    rounds = 0
    while True:
        rounds += 1
        con.execute("""CREATE OR REPLACE TABLE stepped AS
            SELECT l.node, l.label AS old_label,
                   least(l.label, coalesce(n.nmin, l.label)) AS label
            FROM labels l LEFT JOIN (
                SELECT e.dst AS node, min(l2.label) AS nmin
                FROM edges e JOIN labels l2 ON l2.node = e.src
                GROUP BY e.dst) n USING (node)""")
        con.execute("""CREATE OR REPLACE TABLE jumped AS
            SELECT s.node, s.old_label, coalesce(p.label, s.label) AS label
            FROM stepped s LEFT JOIN stepped p ON s.label = p.node""")
        changed = con.sql(
            "SELECT count(*) FROM jumped WHERE label <> old_label").fetchone()[0]
        con.execute("CREATE OR REPLACE TABLE labels AS "
                    "SELECT node, label FROM jumped")
        if changed == 0:
            break
        if rounds > 60:
            raise RuntimeError("components did not converge in 60 rounds")
    print(f"components converged in {rounds} rounds")
    con.execute("CREATE TABLE clusters AS "
                "SELECT node AS doc_id, label AS cluster FROM labels")

    ok = True
    # 3. q70: the cluster table IS the expected frame
    got70 = con.sql(f"SELECT * FROM '{out_dir}/q70_dup_clusters/*.parquet'").df()
    want70 = con.sql("SELECT doc_id, cluster FROM clusters ORDER BY doc_id").df()
    ok &= compare("q70_dup_clusters", got70, want70)

    # 4. q87: run the statement's own universe/projection suffix against
    #    the materialized clusters table (CTE-less `clusters` resolves
    #    to it) — zero re-derivation of the fallback semantics here
    q87 = oracle["q87_dedup_representatives"]
    marker = "univ AS ("
    got87 = con.sql(
        f"SELECT * FROM '{out_dir}/q87_dedup_representatives/*.parquet'").df()
    want87 = con.sql("WITH " + q87[q87.index(marker):]).df()
    ok &= compare("q87_dedup_representatives", got87, want87)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
