"""Vectorized packed r-combination counting for the a-priori miner.

Round-15 optimization (guide §4.2): the per-basket pair/triple
enumeration was a nested higher-order-function expression
(``flatten(transform(... slice ...))``) — interpreted lambda evaluation
per emitted element. At sf0.1 the dense worst case (every one of the 30
frequent tokens in ~every doc, so the candidate prune removes nothing)
emits 5000 × C(30,3) ≈ 20M elements and the HOF pass measured 4.7 s of
the query's 7 s. Here the same combinations are generated in NumPy from
Arrow batches: baskets of equal length are stacked and indexed by one
precomputed combination template (pure int64 column arithmetic), then
reduced to per-batch (key, count) partials — the identical map-side
partial-aggregation shape, with the inner loop in native code.

Exactness: keys are the same ``(x·P + y)·P + z`` packed bigints over
the same SORTED item arrays (template indices are strictly increasing,
so x < y < z exactly as the HOF's slice enumeration); counts are int64
adds, commutative across batches/partitions. An optional ``candidates``
set filters keys map-side via ``np.isin`` — exact membership, the same
semantics as the former broadcast-hash-join against the candidate
frame, which it replaces.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["packed_combo_counts"]

#: Above this many combinations for a single basket length, the
#: template is not materialized in one piece; baskets fall back to a
#:  first-index loop (k vectorized slices) with the same output.
_TEMPLATE_CAP = 5_000_000

#: At most this many packed keys are materialized at once inside the
#: counting pass (128 MB of int64): _iter_key_blocks slices the
#: combination template so no block exceeds the budget and each block
#: folds straight into the batch counters — a skewed group can never
#: demand an m × C(k, r)-sized allocation (r16: block slicing replaced
#: row chunking, which re-ran the giant-basket first-index loop per
#: chunk and cost graph_triangle_count +60%).
_KEYS_BUDGET = 16_000_000


def _comb_template(k: int, r: int) -> np.ndarray:
    """(C(k, r), r) int array of strictly increasing index tuples, in
    lexicographic order (the HOF slice enumeration's order — order is
    irrelevant to counting, but keep it anyway). r16: built vectorized
    (triu_indices for pairs, per-first-index recursion above that)
    instead of ``itertools.combinations`` — a C(k, r) near the 5M cap
    took seconds of Python tuple construction PER GROUP, which the r16
    chunking interaction turned into the dominant cost of
    graph_triangle_count."""
    if r == 1:
        return np.arange(k, dtype=np.int64)[:, None]
    if r == 2:
        a, b = np.triu_indices(k, 1)
        return np.stack([a, b], axis=1).astype(np.int64, copy=False)
    parts = []
    for i in range(k - r + 1):
        tail = _comb_template(k - 1 - i, r - 1) + np.int64(i + 1)
        parts.append(
            np.concatenate(
                [np.full((tail.shape[0], 1), i, dtype=np.int64), tail],
                axis=1,
            )
        )
    return np.concatenate(parts, axis=0)


def _n_comb(k: int, r: int) -> int:
    n = 1
    for i in range(r):
        n = n * (k - i) // (i + 1)
    return n


def _iter_key_blocks(A: np.ndarray, r: int, pack: int, max_cells: int):
    """Yield row-aligned 2-D int64 key blocks over the same-length
    basket stack A (m, k). The horizontal concatenation of every
    yielded block is exactly the (m, C(k, r)) row-major combination-key
    matrix — each block holds, for EVERY row, a contiguous slice of
    that row's combinations — but no block exceeds ``max_cells`` int64
    cells, so neither the m × C(k, r) matrix nor (for giant baskets)
    the C(k, r) template is ever materialized whole. r16: this
    replaces row-chunking inside the counting pass — chunking rows
    made the giant-basket first-index loop re-run PER CHUNK (a
    Python-level k-iteration loop times chunk count, the measured
    +60% on graph_triangle_count); blocks bound memory the same way
    while the fallback loop runs once per group."""
    k = A.shape[1]
    m = A.shape[0]
    if m == 0 or k < r:
        return
    if r == 1:
        yield A
        return
    if _n_comb(k, r) <= _TEMPLATE_CAP:
        idx = _comb_template(k, r)
        tstep = max(1, max_cells // max(1, m))
        for t0 in range(0, idx.shape[0], tstep):
            sl = idx[t0 : t0 + tstep]
            key = A[:, sl[:, 0]]
            for j in range(1, r):
                key = key * pack + A[:, sl[:, j]]
            yield key
        return
    # Giant basket: loop the first index, recurse on the suffix. Each
    # per-i block pairs every row's head with ITS OWN tail combos
    # (row-aligned by construction — the r15 flat np.repeat pairing
    # mixed rows whenever the recursion nested twice).
    for i in range(k - r + 1):
        head = A[:, i][:, None] * (pack ** (r - 1))
        for tail in _iter_key_blocks(A[:, i + 1 :], r - 1, pack, max_cells):
            yield head + tail


def _keys_for_group(A: np.ndarray, r: int, pack: int) -> np.ndarray:
    """Packed combination keys for a stack of same-length baskets
    A (m, k): one flat ROW-MAJOR int64 array of m × C(k, r) keys (row
    0's combinations first, then row 1's, ...). Materializes the full
    matrix — tests and small groups only; the counting pass streams
    ``_iter_key_blocks`` instead."""
    k = A.shape[1]
    m = A.shape[0]
    if m == 0 or k < r:
        return np.empty(0, dtype=np.int64)
    blocks = list(_iter_key_blocks(A, r, pack, max_cells=1 << 62))
    if len(blocks) == 1:
        return blocks[0].reshape(-1)
    return np.concatenate(blocks, axis=1).reshape(-1)


def packed_combo_counts(
    items: DataFrame,
    *,
    r: int,
    pack: int,
    items_col: str = "items",
    candidates: np.ndarray | None = None,
) -> DataFrame:
    """Per-batch partial counts of packed r-combinations over sorted
    item-id arrays: (tk long, cnt long). Combine with a tiny
    ``groupBy("tk").agg(sum("cnt"))`` — the shuffle carries at most the
    distinct-combination domain per partition, exactly like the
    map-side partial aggregation this replaces. ``candidates`` (sorted
    int64 array) drops non-candidate keys map-side."""
    cand = None
    if candidates is not None:
        cand = np.asarray(candidates, dtype=np.int64)
        cand.sort()

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            uniq, cnt = _count_batch(batch.column(0), r, pack, cand)
            yield pa.RecordBatch.from_arrays(
                [pa.array(uniq, pa.int64()), pa.array(cnt.astype(np.int64), pa.int64())],
                ["tk", "cnt"],
            )

    return items.select(F.col(items_col)).mapInArrow(
        fn, "tk long, cnt long"
    )


def _count_batch(col, r: int, pack: int, cand: np.ndarray | None):
    """(uniq, cnt) int64 partial counts for one Arrow list column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False).astype(
        np.int64, copy=False
    )
    lengths = np.diff(offs)
    # Skewed-basket guardrail: the materialized keys array for one
    # same-length group is m × C(k, r) int64 — a hub apex (giant
    # basket) at scale would build it in one task-sized allocation.
    # Stream _iter_key_blocks (each block ≤ _KEYS_BUDGET cells) and
    # fold every block straight into the counters; a single basket's
    # own C(k, r) keys remain the floor (that volume IS the
    # enumeration's output and is bounded by the callers' basket
    # semantics: per-order baskets, oriented out-degree).
    if cand is not None:
        cnt_total = np.zeros(cand.size, dtype=np.int64)
        uniq_parts = cnt_parts = None
    else:
        cnt_total = None
        uniq_parts, cnt_parts = [], []
    for k in np.unique(lengths):
        if k < r:
            continue
        rows = np.nonzero(lengths == k)[0]
        starts = offs[rows]
        gather = starts[:, None] + np.arange(k)[None, :]
        for block in _iter_key_blocks(flat[gather], r, pack, _KEYS_BUDGET):
            keys = block.reshape(-1)
            if keys.size == 0:
                continue
            if cand is not None:
                if cand.size == 0:
                    continue
                # Candidate-indexed counting: searchsorted against the
                # sorted candidate array + bincount — O(n log m), no
                # sort of the n generated keys (np.unique/np.isin both
                # sort; at the dense sf0.1 worst case that was a 20M-
                # element sort inside one Python worker).
                idx = np.searchsorted(cand, keys)
                idx[idx == cand.size] = 0
                valid = cand[idx] == keys
                cnt_total += np.bincount(idx[valid], minlength=cand.size)
            else:
                u, c = np.unique(keys, return_counts=True)
                uniq_parts.append(u)
                cnt_parts.append(c)
    if cand is not None:
        hit = np.nonzero(cnt_total)[0]
        return cand[hit], cnt_total[hit]
    if uniq_parts:
        u = np.concatenate(uniq_parts)
        c = np.concatenate(cnt_parts)
        uniq, inv = np.unique(u, return_inverse=True)
        cnt = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(cnt, inv, c)
        return uniq, cnt
    return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
