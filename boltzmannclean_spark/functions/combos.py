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
#: counting pass (128 MB of int64): same-length basket groups are
#: processed in row chunks and folded into the batch counters, so a
#: skewed group can never demand an m × C(k, r)-sized allocation.
_KEYS_BUDGET = 16_000_000


def _comb_template(k: int, r: int) -> np.ndarray:
    """(C(k, r), r) int array of strictly increasing index tuples, in
    lexicographic order (the HOF slice enumeration's order — order is
    irrelevant to counting, but keep it anyway)."""
    from itertools import combinations

    return np.array(list(combinations(range(k), r)), dtype=np.int64)


def _n_comb(k: int, r: int) -> int:
    n = 1
    for i in range(r):
        n = n * (k - i) // (i + 1)
    return n


def _keys_for_group(A: np.ndarray, r: int, pack: int) -> np.ndarray:
    """Packed combination keys for a stack of same-length baskets
    A (m, k): one flat ROW-MAJOR int64 array of m × C(k, r) keys (row
    0's combinations first, then row 1's, ...)."""
    k = A.shape[1]
    m = A.shape[0]
    if m == 0 or k < r:
        return np.empty(0, dtype=np.int64)
    if _n_comb(k, r) <= _TEMPLATE_CAP:
        idx = _comb_template(k, r)
        key = A[:, idx[:, 0]]
        for j in range(1, r):
            key = key * pack + A[:, idx[:, j]]
        return key.reshape(-1)
    if r == 1:
        return A.reshape(-1)
    # Giant basket fallback: loop the first index, template the rest.
    # Each recursive tail is itself row-major, so reshaping it to
    # (m, -1) re-aligns every row's head with ITS OWN tail combos (the
    # former flat np.repeat pairing mixed rows whenever the recursion
    # hit this fallback a second time), and concatenating the per-i
    # blocks along axis=1 keeps the overall output row-major.
    parts = []
    for i in range(k - r + 1):
        tail = _keys_for_group(A[:, i + 1 :], r - 1, pack).reshape(m, -1)
        parts.append(A[:, i][:, None] * (pack ** (r - 1)) + tail)
    return np.concatenate(parts, axis=1).reshape(-1)


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
    # Chunk the group's ROWS so at most _KEYS_BUDGET keys exist at once
    # and fold each chunk straight into the counters; a single basket's
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
        step = max(1, _KEYS_BUDGET // max(1, _n_comb(int(k), r)))
        for lo in range(0, rows.size, step):
            sub = rows[lo : lo + step]
            starts = offs[sub]
            gather = starts[:, None] + np.arange(k)[None, :]
            keys = _keys_for_group(flat[gather], r, pack)
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
