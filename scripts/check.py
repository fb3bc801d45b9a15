#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same fixture tables, compare value-by-value
with columns sorted by name (the driver's hashing convention).

Usage: python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out [skip_csv]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first; skip_csv names
queries to leave out, e.g. oracle-side quadratic pair expansions at sf1)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

# DuckDB logical types the driver's canonical-string hasher renders
# differently from (or cannot sort against) their double/bigint/string
# twins. Checked on the RELATION type, before .df() silently converts
# hugeint/decimal to float64 and hides the mismatch (round-1 lesson:
# the local instrument must never be laxer than the driver).
def check_types(rel, side: str, name: str):
    for col, t in zip(rel.columns, rel.types):
        tid = str(t).upper()
        if tid.startswith("DECIMAL") or "HUGEINT" in tid:
            raise AssertionError(
                f"{name}: {side}.{col} is {tid} — cast to DOUBLE/BIGINT in "
                f"the dumped projection (driver hash differs)")
        if tid.endswith("[]") or tid.startswith(("LIST", "STRUCT", "MAP")):
            raise AssertionError(
                f"{name}: {side}.{col} is {tid} — serialize with "
                f"array_join/array_to_string (driver cannot sort it)")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)

def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    # allow larger-than-memory oracle plans (the sf1 unrolled-iteration
    # oracles) to spill instead of dying on an allocation failure; the
    # comparison itself is unchanged
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if name in skip:
            print(f"SKIP {name}")
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result"); n_fail += 1; continue
        try:
            got_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            check_types(got_rel, "spark", name)
            got = canon(got_rel.df())
        except Exception as e:
            print(f"FAIL {name}: spark-side error: {e}"); n_fail += 1; continue
        try:
            want_rel = con.sql(oracle[name])
            check_types(want_rel, "oracle", name)
            want = canon(want_rel.df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:400]}"); n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    sys.exit(main(sys.argv[1], sys.argv[2], skip))
