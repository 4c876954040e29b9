"""Property tests for the round-6 pair-detection operators.

1. Substring-run dedup: on random corpora with PLANTED verbatim spans,
   the operator's (pair -> longest span, run count) output must equal a
   Python brute-force reference implementing the same contract
   (5-gram shingles, DF cap, min-run 3) — the diagonal/islands
   machinery must not lose or merge runs.
2. Perceptual-hash dedup: the banded candidate set + exact hamming
   must equal brute force over md5 fingerprints; exact-duplicate
   payloads must surface as hamming-0 pairs.
"""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

from boltzmannclean_spark.operators.dedup import (
    SUBSTR_DF_CAP,
    SUBSTR_MIN_RUN,
    SUBSTR_NGRAM,
)
from boltzmannclean_spark.operators.multimodal import PHASH_BANDS
from boltzmannclean_spark.plans.registry import all_queries

QUERIES = all_queries()


def _write_docs(spark, path, docs):
    spark.createDataFrame(
        [
            (d, text, "en", "synthetic", len(text))
            for d, text in sorted(docs.items())
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(path / "documents.parquet"))
    return str(path)


def _brute_substring_runs(docs):
    sh = {}  # doc -> {pos: shingle}
    for d, text in docs.items():
        toks = text.split(" ")
        sh[d] = {
            i + 1: " ".join(toks[i : i + SUBSTR_NGRAM])
            for i in range(len(toks) - SUBSTR_NGRAM + 1)
        }
    df = defaultdict(set)
    for d, m in sh.items():
        for s in m.values():
            df[s].add(d)
    kept = {s for s, ds in df.items() if len(ds) <= SUBSTR_DF_CAP}
    out = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            diag_pas = defaultdict(set)
            inv_b = defaultdict(list)
            for pb, s in sh[b].items():
                if s in kept:
                    inv_b[s].append(pb)
            for pa, s in sh[a].items():
                if s in kept:
                    for pb in inv_b.get(s, ()):
                        diag_pas[pa - pb].add(pa)
            runs = []
            for diag, pas in diag_pas.items():
                pas = sorted(pas)
                run = 1
                for prev, cur in zip(pas, pas[1:]):
                    if cur == prev + 1:
                        run += 1
                    else:
                        if run >= SUBSTR_MIN_RUN:
                            runs.append(run)
                        run = 1
                if run >= SUBSTR_MIN_RUN:
                    runs.append(run)
            if runs:
                out[(a, b)] = (max(runs) + SUBSTR_NGRAM - 1, len(runs))
    return out


def test_substring_run_matches_brute_force(spark, tmp_path):
    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(200)]
    for trial in range(3):
        docs = {}
        did = 0
        for _ in range(rng.randint(10, 30)):
            docs[did] = " ".join(
                rng.choice(vocab) for _ in range(rng.randint(10, 60))
            )
            did += 1
        # plant verbatim spans of varying length into pairs of docs
        for _ in range(rng.randint(2, 5)):
            span = " ".join(
                rng.choice(vocab) for _ in range(rng.randint(7, 25))
            )
            a, b = rng.sample(sorted(docs), 2)
            ta, tb = docs[a].split(" "), docs[b].split(" ")
            ia = rng.randint(0, len(ta))
            ib = rng.randint(0, len(tb))
            docs[a] = " ".join(ta[:ia] + span.split(" ") + ta[ia:])
            docs[b] = " ".join(tb[:ib] + span.split(" ") + tb[ib:])
        sf_dir = _write_docs(spark, tmp_path / f"sub{trial}", docs)
        (tmp_path / f"sub{trial}").mkdir(exist_ok=True)
        got = {
            (r.doc_a, r.doc_b): (r.longest_match_tokens, r.n_runs)
            for r in QUERIES["dedup_substring_run"].spark_fn(spark, sf_dir).collect()
        }
        want = _brute_substring_runs(docs)
        assert got == want, (
            f"trial {trial}: missing={sorted(set(want) - set(got))[:5]} "
            f"extra={sorted(set(got) - set(want))[:5]} "
            f"diff={[k for k in got if k in want and got[k] != want[k]][:5]}"
        )


def test_substring_run_short_and_empty_docs(spark, tmp_path):
    """ADVICE r6 regression: docs with < SUBSTR_NGRAM tokens used to
    crash the shingle fan-out (sequence(1, 0) descends to [1, 0] and
    slice then throws). Short/empty docs must contribute zero shingles
    and never appear in any pair, while long docs still match."""
    span = " ".join(f"s{i}" for i in range(12))
    docs = {
        0: "",  # empty -> 1 empty token after split
        1: "one",
        2: "one two",
        3: "a b c d",  # exactly NGRAM-1 tokens
        4: "a b c d e",  # exactly NGRAM tokens -> 1 shingle
        5: span + " tail x y z",
        6: "lead p q " + span,
    }
    sf_dir = _write_docs(spark, tmp_path / "short", docs)
    got = {
        (r.doc_a, r.doc_b): (r.longest_match_tokens, r.n_runs)
        for r in QUERIES["dedup_substring_run"].spark_fn(spark, sf_dir).collect()
    }
    want = _brute_substring_runs(docs)
    assert got == want
    assert (5, 6) in got and got[(5, 6)][0] == 12
    assert not any(a in (0, 1, 2, 3, 4) or b in (0, 1, 2, 3, 4) for a, b in got)


def _brute_phash_pairs(docs):
    ph = {d: hashlib.md5(t.encode()).hexdigest() for d, t in docs.items()}
    out = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ha, hb = ph[a], ph[b]
            if not any(
                ha[4 * k : 4 * k + 4] == hb[4 * k : 4 * k + 4]
                for k in range(PHASH_BANDS)
            ):
                continue
            ham = sum(
                bin(int(ca, 16) ^ int(cb, 16)).count("1")
                for ca, cb in zip(ha[:16], hb[:16])
            )
            out[(a, b)] = ham
    return out


def test_phash_matches_brute_force_and_finds_exact_dups(spark, tmp_path):
    rng = random.Random(99)
    docs = {i: f"doc {i} body {rng.random()}" for i in range(40)}
    # exact duplicates -> identical md5 -> must appear with hamming 0
    docs[100] = docs[3]
    docs[101] = docs[7]
    sf_dir = _write_docs(spark, tmp_path / "ph", docs)
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in QUERIES["multimodal_phash_dedup"].spark_fn(spark, sf_dir).collect()
    }
    want = _brute_phash_pairs(docs)
    assert got == want
    assert got[(3, 100)] == 0 and got[(7, 101)] == 0
