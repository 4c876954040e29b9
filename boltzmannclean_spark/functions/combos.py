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


def _comb_template(k: int, r: int) -> np.ndarray:
    """(C(k, r), r) int array of strictly increasing index tuples, in
    lexicographic order (the HOF slice enumeration's order — order is
    irrelevant to counting, but keep it anyway)."""
    from itertools import combinations

    return np.array(list(combinations(range(k), r)), dtype=np.int64)


def _keys_for_group(A: np.ndarray, r: int, pack: int) -> np.ndarray:
    """Packed combination keys for a stack of same-length baskets
    A (m, k): one flat int64 array of m × C(k, r) keys."""
    k = A.shape[1]
    n_comb = 1
    for i in range(r):
        n_comb = n_comb * (k - i) // (i + 1)
    if n_comb <= _TEMPLATE_CAP:
        idx = _comb_template(k, r)
        key = A[:, idx[:, 0]]
        for j in range(1, r):
            key = key * pack + A[:, idx[:, j]]
        return key.reshape(-1)
    # Giant basket fallback: loop the first index, template the rest.
    parts = []
    for i in range(k - r + 1):
        tail = _keys_for_group(A[:, i + 1 :], r - 1, pack)
        m = A.shape[0]
        per = tail.size // m if m else 0
        head = np.repeat(A[:, i], per)
        parts.append(head * (pack ** (r - 1)) + tail)
    return (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    )


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
            col = batch.column(0)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat = col.values.to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            lengths = np.diff(offs)
            keys_parts = []
            for k in np.unique(lengths):
                if k < r:
                    continue
                rows = np.nonzero(lengths == k)[0]
                starts = offs[rows]
                gather = starts[:, None] + np.arange(k)[None, :]
                A = flat[gather]
                keys_parts.append(_keys_for_group(A, r, pack))
            if not keys_parts:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([], pa.int64()), pa.array([], pa.int64())],
                    ["tk", "cnt"],
                )
                continue
            keys = np.concatenate(keys_parts)
            if cand is not None and cand.size == 0:
                keys = keys[:0]
            if cand is not None and cand.size:
                # Candidate-indexed counting: searchsorted against the
                # sorted candidate array + bincount — O(n log m), no
                # sort of the n generated keys (np.unique/np.isin both
                # sort; at the dense sf0.1 worst case that was a 20M-
                # element sort inside one Python worker).
                idx = np.searchsorted(cand, keys)
                idx[idx == cand.size] = 0
                valid = cand[idx] == keys
                cnt = np.bincount(idx[valid], minlength=cand.size)
                hit = np.nonzero(cnt)[0]
                uniq, cnt = cand[hit], cnt[hit]
            else:
                uniq, cnt = np.unique(keys, return_counts=True)
            yield pa.RecordBatch.from_arrays(
                [pa.array(uniq, pa.int64()), pa.array(cnt.astype(np.int64), pa.int64())],
                ["tk", "cnt"],
            )

    return items.select(F.col(items_col)).mapInArrow(
        fn, "tk long, cnt long"
    )
