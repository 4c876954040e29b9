"""Clustered embeddings corpus generator (r13 verdict #4).

The fixture's `embeddings` table is near-ISOTROPIC (unit-norm, per-dim
std ≈ 1/√64, no cluster structure) — on that shape residual (IVF-
centered) PQ is measurably recall-neutral (SCALING.md r11: 0.600
residual vs 0.612 raw), which is the documented FAISS expectation for
unclustered data. Real embedding corpora are NOT isotropic: encoder
outputs cluster by topic/language/source, the coarse IVF centroids
absorb most of the variance, and residual PQ is supposed to win. This
tool generates that realistic shape so raw-vs-residual becomes a
MEASURED decision (tools/residual_recall_eval.py) instead of a
fixture-shaped guess:

- C cluster centers drawn uniformly on the unit sphere (PCG64 keyed
  (SEED, "center", c) — deterministic, order-independent);
- cluster sizes Zipf(s=1.1) over C (head topics big, long tail —
  same rationale as organic_scale.py's vocabulary);
- per-cluster spread sigma_c drawn in [0.3, 0.9] — sigma is the
  EXPECTED NOISE NORM relative to the unit center (noise =
  sigma * g/sqrt(D), so E|noise| ~ sigma): tight clusters
  (within-cluster cosine ~0.95) and loose chatter clusters (~0.6)
  coexist, so the IVF cells see mixed within-cell variance;
- vector = normalize(center_c + sigma_c * gauss/sqrt(D)), keyed
  (SEED, vec_id) — unit-norm like the base fixture, same
  list<float> schema, label = cluster % 10 (int32 parity).

Generation is driver-side numpy (F×2000 64-dim vectors is
milliseconds); at 100 TB the identical per-vector logic runs inside
mapInPandas keyed the same way — the per-id RNG discipline makes that
a pure repartition of this output. Non-embedding tables are symlinked
from the base dir so the full registry can run against the corpus.

Usage: python tools/clustered_embeddings.py [factor] [base_dir] [out]
                                            [--clusters C]
Default: 10x of /root/testdata/sf0.1 -> /tmp/bcs_scale/clustered_x{f},
C=50 clusters.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
DIMS = 64
ZIPF_S = 1.1
SPREAD_LO, SPREAD_HI = 0.30, 0.90


def main() -> int:
    argv = list(sys.argv[1:])
    n_clusters = 50
    if "--clusters" in argv:
        i = argv.index("--clusters")
        n_clusters = int(argv[i + 1])
        del argv[i : i + 2]
    factor = int(argv[0]) if len(argv) > 0 else 10
    base_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    out_dir = (
        argv[2] if len(argv) > 2 else f"/tmp/bcs_scale/clustered_x{factor}"
    )
    base = pq.read_table(os.path.join(base_dir, "embeddings.parquet"))
    n = base.num_rows * factor

    # cluster centers + per-cluster spread, each keyed independently
    centers = np.empty((n_clusters, DIMS))
    spreads = np.empty(n_clusters)
    for c in range(n_clusters):
        # constant namespace key (NOT hash(str): PYTHONHASHSEED varies)
        rng = np.random.default_rng((SEED, 7001, c))
        v = rng.standard_normal(DIMS)
        centers[c] = v / np.linalg.norm(v)
        spreads[c] = SPREAD_LO + (SPREAD_HI - SPREAD_LO) * rng.random()
    # Zipf cluster-size CDF: cluster of vec i = inverse-CDF of a
    # per-id uniform draw (deterministic, order-independent)
    w = 1.0 / np.arange(1, n_clusters + 1) ** ZIPF_S
    cdf = np.cumsum(w) / w.sum()

    vecs = np.empty((n, DIMS), dtype=np.float32)
    labels = np.empty(n, dtype=np.int32)
    for i in range(n):
        rng = np.random.default_rng((SEED, i))
        c = int(np.searchsorted(cdf, rng.random()))
        x = centers[c] + spreads[c] * rng.standard_normal(DIMS) / np.sqrt(DIMS)
        vecs[i] = (x / np.linalg.norm(x)).astype(np.float32)
        labels[i] = c % 10

    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=base.schema.field("embedding").type),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))
    for f in sorted(os.listdir(base_dir)):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            dst = os.path.join(out_dir, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(base_dir, f), dst)
    print(
        f"wrote {n} clustered vectors ({n_clusters} Zipf-sized clusters, "
        f"noise-norm {SPREAD_LO}-{SPREAD_HI}) -> {out_dir}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
