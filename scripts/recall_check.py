#!/usr/bin/env python3
"""LSH recall measurement for the embedding near-dup queries.

Ground truth = exact all-pairs cosine >= 0.4 in numpy float64 over the
normalized embedding matrix (feasible at fixture scale; that
infeasibility at corpus scale is the whole reason q54/q88 exist).
Reports, for q54 (single-table, Hamming-1 multiprobe) and q88 (3
independent tables, unioned):
  - total recall at the 0.4 threshold,
  - recall on the near-duplicate band (cos >= 0.9 — the production
    dedup regime) and on the weak tail (0.4 <= cos < 0.9),
  - false positives vs ground truth (must be 0: the exact-cosine
    verify makes LSH lossy on recall, never on precision).

Usage: python3 scripts/recall_check.py <sf_dir> <verify_out_dir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys

import duckdb
import numpy as np


def band_recall(got: set, truth: set) -> float:
    return len(got & truth) / len(truth) if truth else float("nan")


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    rows = con.sql(f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
                   "ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows])
    v = np.array([r[1] for r in rows], dtype=np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    sim = v @ v.T
    iu = np.triu_indices(len(ids), 1)
    cos = sim[iu]

    def pair_set(mask):
        return set(zip(ids[iu[0][mask]].tolist(), ids[iu[1][mask]].tolist()))

    truth = pair_set(cos >= 0.4)
    strong = pair_set(cos >= 0.9)
    weak = truth - strong
    print(f"ground truth @0.4: {len(truth)} pairs "
          f"({len(strong)} at cos>=0.9, {len(weak)} in the 0.4-0.9 tail); "
          f"all-pairs space {len(cos)}")

    for q in ("q54_embedding_dup", "q88_embedding_dup_multitable"):
        got = set(map(tuple, con.sql(
            f"SELECT vec_a, vec_b FROM '{out_dir}/{q}/*.parquet'").fetchall()))
        print(f"{q}: {len(got)} pairs, recall@0.4 = {band_recall(got, truth):.3f} "
              f"(strong>=0.9: {band_recall(got, strong):.3f}, "
              f"tail 0.4-0.9: {band_recall(got, weak):.3f}), "
              f"false-pos = {len(got - truth)}")

    # q90: asymmetric ground truth — (batch, history) pairs at cos >= 0.4
    # over the vec_id < 250 split. Its output is per-batch-row
    # (dup_of, n_matches); recall here = matched batch rows over batch
    # rows with ANY true history near-dup (the admit/drop decision the
    # operator exists to make), and precision must again be exact.
    hist_mask, batch_mask = ids < 250, ids >= 250
    bh = v[batch_mask] @ v[hist_mask].T
    bt = {int(b): set(ids[hist_mask][bh[i] >= 0.4].tolist())
          for i, b in enumerate(ids[batch_mask]) if (bh[i] >= 0.4).any()}
    for q in ("q90_incremental_embedding_dedup",
              "q92_incremental_embedding_dedup_multitable"):
        rows = con.sql(f"SELECT vec_id, dup_of, n_matches FROM "
                       f"'{out_dir}/{q}/*.parquet'").fetchall()
        flagged = {int(b) for b, d, _ in rows if d is not None}
        fp = [(b, d) for b, d, _ in rows
              if d is not None and d not in bt.get(b, set())]
        print(f"{q}: {len(flagged)} flagged of "
              f"{len(bt)} true-dup batch rows, decision recall = "
              f"{band_recall(flagged, set(bt)):.3f}, false-pos = {len(fp)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
