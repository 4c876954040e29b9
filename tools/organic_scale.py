"""Organically-grown scale-up of the `documents` table (r11 verdict #4).

`tools/scale_probe.py` scales facts by VERBATIM replication (keys
offset per copy). For key-joined relational ops that is exactly how a
bigger SF behaves — but for CONTENT-similarity ops it is a worst-case
adversarial corpus: every document gains N-1 exact twins, so MinHash
band collisions and shared winnowing fingerprints grow quadratically
in the replication factor, a shape no real 10x crawl has. This tool
grows `documents` the way a real corpus grows — new documents with
FRESH text — so the measured growth curve is the real one:

- per-language empirical unigram stream from the base corpus (token
  sampled = token at a random position of the concatenated base
  stream, i.e. Zipf-preserving without modeling anything);
- per-document length drawn from the base corpus's own length
  distribution (each new doc inherits its seed doc's length);
- a controlled NEAR_DUP_RATE of new docs are instead light mutations
  (10% token replacement, 2% deletion) of their seed doc — the
  re-scrape / boilerplate-variant rate a crawl really contains, so
  dedup still has work to do;
- deterministic: every choice keyed on (SEED, new_doc_id) through
  numpy's PCG64, independent of iteration order.

Generation runs driver-side with numpy (50k docs x ~50 tokens is
seconds; a 100 TB deployment would run the identical per-doc logic
inside mapInPandas keyed the same way — the per-doc RNG discipline is
what makes that a pure repartition of this output).

Usage: python tools/organic_scale.py [factor] [base_dir] [out_dir]
Default: 10x of /root/testdata/sf0.1 -> /tmp/bcs_scale/organic_x10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
NEAR_DUP_RATE = 0.05
MUT_REPLACE = 0.10
MUT_DROP = 0.02


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else f"/tmp/bcs_scale/organic_x{factor}"
    )
    tbl = pq.read_table(os.path.join(base_dir, "documents.parquet"))
    base = tbl.to_pydict()
    n_base = len(base["doc_id"])
    id_stride = max(base["doc_id"]) + 1

    toks = [t.split(" ") for t in base["text"]]
    stream: dict[str, np.ndarray] = {}
    for lang in sorted(set(base["lang"])):
        stream[lang] = np.array(
            [
                w
                for t, la in zip(toks, base["lang"])
                if la == lang
                for w in t
            ],
            dtype=object,
        )

    out = {k: list(v) for k, v in base.items()}
    for copy in range(1, factor):
        for i in range(n_base):
            new_id = base["doc_id"][i] + id_stride * copy
            rng = np.random.default_rng((SEED, new_id))
            lang = base["lang"][i]
            pool = stream[lang]
            seed_toks = toks[i]
            if rng.random() < NEAR_DUP_RATE:
                kept = [
                    (
                        str(pool[rng.integers(len(pool))])
                        if rng.random() < MUT_REPLACE
                        else w
                    )
                    for w in seed_toks
                    if rng.random() >= MUT_DROP
                ]
                words = kept if kept else list(seed_toks)
            else:
                idx = rng.integers(0, len(pool), size=len(seed_toks))
                words = [str(pool[j]) for j in idx]
            text = " ".join(words)
            out["doc_id"].append(new_id)
            out["text"].append(text)
            out["lang"].append(lang)
            out["source"].append(base["source"][i])
            out["n_chars"].append(len(text))

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(out, schema=tbl.schema),
        os.path.join(out_dir, "documents.parquet"),
    )
    print(
        f"wrote {len(out['doc_id'])} docs ({n_base} base + "
        f"{len(out['doc_id']) - n_base} organic) -> {out_dir}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
