"""Organically-grown scale-up of the `documents` table (r11 verdict #4).

`tools/scale_probe.py` scales facts by VERBATIM replication (keys
offset per copy). For key-joined relational ops that is exactly how a
bigger SF behaves — but for CONTENT-similarity ops it is a worst-case
adversarial corpus: every document gains N-1 exact twins, so MinHash
band collisions and shared winnowing fingerprints grow quadratically
in the replication factor, a shape no real 10x crawl has. This tool
grows `documents` the way a real corpus grows — new documents with
FRESH text — so the measured growth curve is the real one:

- per-language token model, one of two (``--vocab``):
  * ``base`` — empirical unigram stream from the base corpus (token
    sampled = token at a random position of the concatenated base
    stream, i.e. base-frequency-preserving without modeling anything).
    The base fixture has only 31 distinct tokens CORPUS-WIDE, so this
    mode inherits that degeneracy: every content-derived key (head
    token, shingle, prefix) stays stopword-frequent — useful for
    worst-case stress, useless for measuring content-keyed plans
    (r12 verdict: three ×30 exclusions traced to exactly this).
  * ``zipf`` (default) — a SYNTHETIC Zipf(s=1.1) vocabulary of
    ``--types`` types per language (default 30000), the shape a real
    crawl has: a boilerplate-hot head (rank-1 mass ~8%, so hot
    blocks still exist and cap/skew paths still get exercised) and a
    long rare tail (so rare-token blocking/prefix-filtering finally
    has rare tokens to use). Sampling is inverse-CDF over the
    precomputed Zipf CDF — deterministic given (SEED, new_doc_id).
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
                                     [--vocab zipf|base] [--types N]
Default: 10x of /root/testdata/sf0.1 -> /tmp/bcs_scale/organic_x{f}
(base vocab) or /tmp/bcs_scale/organic_zipf_x{f} (zipf vocab).
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
ZIPF_S = 1.1


def zipf_sampler(lang: str, n_types: int):
    """Inverse-CDF sampler over a Zipf(s) vocabulary of ``n_types``
    per-language token strings (``{lang}w{rank}``; rank 0 = hottest).
    Returns (vocab array, cdf array); draw with
    ``vocab[np.searchsorted(cdf, rng.random(k))]``."""
    ranks = np.arange(1, n_types + 1, dtype=np.float64)
    mass = ranks ** -ZIPF_S
    cdf = np.cumsum(mass / mass.sum())
    vocab = np.array([f"{lang}w{r}" for r in range(n_types)], dtype=object)
    return vocab, cdf


def main() -> int:
    argv = list(sys.argv[1:])
    vocab_mode, n_types = "zipf", 30_000
    if "--vocab" in argv:
        i = argv.index("--vocab")
        vocab_mode = argv[i + 1]
        del argv[i : i + 2]
    if "--types" in argv:
        i = argv.index("--types")
        n_types = int(argv[i + 1])
        del argv[i : i + 2]
    if vocab_mode not in ("zipf", "base"):
        raise SystemExit(f"unknown --vocab {vocab_mode!r} (zipf|base)")
    factor = int(argv[0]) if len(argv) > 0 else 10
    base_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    tag = "organic_zipf" if vocab_mode == "zipf" else "organic"
    out_dir = (
        argv[2] if len(argv) > 2 else f"/tmp/bcs_scale/{tag}_x{factor}"
    )
    tbl = pq.read_table(os.path.join(base_dir, "documents.parquet"))
    base = tbl.to_pydict()
    n_base = len(base["doc_id"])
    id_stride = max(base["doc_id"]) + 1

    toks = [t.split(" ") for t in base["text"]]
    langs = sorted(set(base["lang"]))
    stream: dict[str, np.ndarray] = {}
    zipf: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for lang in langs:
        if vocab_mode == "base":
            stream[lang] = np.array(
                [
                    w
                    for t, la in zip(toks, base["lang"])
                    if la == lang
                    for w in t
                ],
                dtype=object,
            )
        else:
            zipf[lang] = zipf_sampler(lang, n_types)

    def draw(lang: str, rng, k: int) -> list[str]:
        if vocab_mode == "base":
            pool = stream[lang]
            return [str(pool[j]) for j in rng.integers(0, len(pool), k)]
        vocab, cdf = zipf[lang]
        return [str(w) for w in vocab[np.searchsorted(cdf, rng.random(k))]]

    out = {k: list(v) for k, v in base.items()}
    for copy in range(1, factor):
        for i in range(n_base):
            new_id = base["doc_id"][i] + id_stride * copy
            rng = np.random.default_rng((SEED, new_id))
            lang = base["lang"][i]
            seed_toks = toks[i]
            if rng.random() < NEAR_DUP_RATE:
                # Near-dups mutate their SEED doc (fresh-text seeds
                # come from the previous copy in zipf mode so dups are
                # realistic-vocabulary too, base docs otherwise).
                if vocab_mode == "zipf" and copy > 1:
                    seed_toks = out["text"][
                        len(out["text"]) - n_base
                    ].split(" ")
                repl = draw(lang, rng, len(seed_toks))
                kept = [
                    (repl[j] if rng.random() < MUT_REPLACE else w)
                    for j, w in enumerate(seed_toks)
                    if rng.random() >= MUT_DROP
                ]
                words = kept if kept else list(seed_toks)
            else:
                words = draw(lang, rng, len(seed_toks))
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
