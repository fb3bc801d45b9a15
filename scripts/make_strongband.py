#!/usr/bin/env python3
"""Strong-band recall fixture (round 14): sf0.1 with PLANTED near-dup
embedding pairs at cos 0.90-0.99.

Why: BASELINE.md's own measurement shows the sf0.1 embedding space has
NO pairs at cos >= 0.9, so the committed recall floors (0.15-0.44) gate
only the weak tail (0.4 <= cos < 0.9) — the regime where random-
hyperplane LSH is *expected* to be lossy. The regime a production
ingest gate actually exists for (true near-duplicates, cos >= 0.9) was
covered only by the structural equal-bucket argument. This fixture
plants it so recall_check.py can measure and floor-gate it.

Construction: every base vector with vec_id % 5 == 0 (400 of 2000; 50
of them in the vec_id < 250 history split, so q90/q249's asymmetric
decision ground truth gains strong rows too) gets a planted twin
  v' = c * v_hat + sqrt(1 - c^2) * w_hat,  scaled to |v|
where c is drawn deterministically from [0.905, 0.985] by a hash of
vec_id and w_hat is a deterministic pseudo-random direction
orthogonalized against v_hat — so cos(v', v) = c exactly in float64
(float32 storage moves it by <1e-6, the 0.005 margins absorb that and
keep every planted pair strictly inside the 0.9 band). Planted ids are
base + 2000 (all >= 250: batch side). All other tables copy verbatim.

Usage: python3 scripts/make_strongband.py [out_dir (default target/sfsb)]
"""
import hashlib
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def unit(x):
    return x / np.linalg.norm(x)


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        if t != "embeddings":
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    ids = emb.column("vec_id").to_numpy()
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    labels = emb.column("label").to_numpy()
    stride = int(ids.max()) + 1  # 2000: planted ids land on batch side

    p_ids, p_vecs, p_labels = [], [], []
    for i in np.where(ids % 5 == 0)[0]:
        vid = int(ids[i])
        v = vecs[i]
        vhat = unit(v)
        # deterministic target cosine in [0.905, 0.985]
        h = int.from_bytes(hashlib.md5(f"sb:{vid}".encode()).digest()[:8],
                           "big")
        c = 0.905 + (h % 10_000) / 10_000 * 0.080
        # deterministic direction, orthogonalized against v
        rng = np.random.default_rng(h)
        w = rng.standard_normal(v.shape[0])
        w -= w @ vhat * vhat
        what = unit(w)
        v_new = (c * vhat + np.sqrt(1 - c * c) * what) * np.linalg.norm(v)
        p_ids.append(vid + stride)
        p_vecs.append(v_new.astype(np.float32))
        p_labels.append(int(labels[i]))

    out_ids = np.concatenate([ids, np.array(p_ids, dtype=np.int64)])
    out_vecs = [np.asarray(r, dtype=np.float32) for r in vecs] + p_vecs
    out_labels = np.concatenate([labels, np.array(p_labels, dtype=labels.dtype)])
    table = pa.table({
        "vec_id": pa.array(out_ids, pa.int64()),
        "embedding": pa.array([r.tolist() for r in out_vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(out_labels, pa.int32()),
    })
    pq.write_table(table, f"{out_dir}/embeddings.parquet")

    # report the planted band for the record
    vs = np.array([np.asarray(x, np.float64) for x in out_vecs])
    vs /= np.linalg.norm(vs, axis=1, keepdims=True)
    base_idx = {int(v): k for k, v in enumerate(out_ids)}
    cs = [float(vs[base_idx[p]] @ vs[base_idx[p - stride]]) for p in p_ids]
    print(f"planted {len(p_ids)} strong pairs, cos in "
          f"[{min(cs):.4f}, {max(cs):.4f}] -> {out_dir}/embeddings.parquet "
          f"({len(out_ids)} vectors)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "target/sfsb")
