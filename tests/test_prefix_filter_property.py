"""Property tests for the round-5 candidate-generation operators.

1. Prefix-filtered Jaccard join: on random token-set corpora (with
   forced near-duplicates, exact duplicates, and singleton docs) the
   operator's survivor set must EQUAL the brute-force all-pairs set at
   the same threshold — prefix filtering promises 100% recall, not
   approximate recall, so any missing pair is a bug.
2. BFS levels: on random bipartite graphs the per-node minimum distance
   must equal a driver-side reference BFS over the collected edge list.
"""

from __future__ import annotations

import random
from collections import deque

from pyspark.sql import functions as F

from boltzmannclean_spark.operators.dedup import (
    PF_THRESHOLD_DEN,
    PF_THRESHOLD_NUM,
)
from boltzmannclean_spark.plans.registry import all_queries

QUERIES = all_queries()


def _shingles(tokens):
    return {
        f"{a} {b} {c}" for a, b, c in zip(tokens, tokens[1:], tokens[2:])
    }


def _brute_force_pairs(doc_tokens):
    out = set()
    ids = sorted(doc_tokens)
    sh = {d: _shingles(t) for d, t in doc_tokens.items()}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ta, tb = sh[a], sh[b]
            if not ta or not tb:
                continue
            inter = len(ta & tb)
            union = len(ta | tb)
            if PF_THRESHOLD_DEN * inter >= PF_THRESHOLD_NUM * union:
                out.add((a, b))
    return out


def test_prefix_filter_matches_brute_force(spark, tmp_path):
    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(40)]
    for trial in range(3):
        docs = {}
        doc_id = 0
        for _ in range(rng.choice([5, 40, 120])):
            base = rng.sample(vocab, rng.randint(3, 12))
            docs[doc_id] = base
            doc_id += 1
            if rng.random() < 0.4:  # forced near-duplicate
                mutated = list(base)
                if rng.random() < 0.5 and len(mutated) > 3:
                    mutated.pop(rng.randrange(len(mutated)))
                else:
                    mutated.append(rng.choice(vocab))
                docs[doc_id] = mutated
                doc_id += 1
            if rng.random() < 0.2:  # exact duplicate
                docs[doc_id] = list(base)
                doc_id += 1
        sf_dir = tmp_path / f"pf{trial}"
        sf_dir.mkdir()
        spark.createDataFrame(
            [
                (d, " ".join(toks), "en", "synthetic", len(" ".join(toks)))
                for d, toks in docs.items()
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(str(sf_dir / "documents.parquet"))
        got = {
            (r.doc_a, r.doc_b)
            for r in QUERIES["dedup_prefix_filter_jaccard"]
            .spark_fn(spark, str(sf_dir))
            .collect()
        }
        want = _brute_force_pairs(docs)
        assert got == want, (
            f"trial {trial}: missing={sorted(want - got)[:5]} "
            f"extra={sorted(got - want)[:5]}"
        )


def _reference_bfs(edges, start, max_level):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {start: 0}
    q = deque([start])
    while q:
        u = q.popleft()
        if dist[u] >= max_level:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_levels_match_reference(spark, sf_dir):
    from boltzmannclean_spark.operators.graph import (
        BFS_MAX_LEVEL,
        BFS_START,
        _pagerank_state,
    )

    ed, _, _ = _pagerank_state(spark, sf_dir)
    edges = [(r.src, r.dst) for r in ed.select("src", "dst").collect()]
    want = _reference_bfs(edges, BFS_START, BFS_MAX_LEVEL)

    got = {}
    for r in QUERIES["graph_bfs_levels"].spark_fn(spark, sf_dir).collect():
        kind, _, num = r.node.partition(":")
        node = int(num) * 2 + (0 if kind == "c" else 1)
        got[node] = r.level
    assert got == want
