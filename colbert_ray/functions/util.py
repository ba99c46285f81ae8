"""Small scalar/sequence utilities mirroring reference helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def f7(seq):
    """Order-preserving first-occurrence dedup (utils/utils.py:123-129
    analog; D4)."""
    seen = set()
    out = []
    for x in seq:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def f7_arrow(arr: pa.Array) -> pa.Array:
    """Vectorized order-preserving dedup of an Arrow array."""
    v = arr.to_numpy(zero_copy_only=False)
    _, idx = np.unique(v, return_index=True)
    return pa.array(v[np.sort(idx)])


def numericize(s: str):
    """str -> int or float by '.' presence (ranking.py:11-15 analog; M13)."""
    return float(s) if "." in s else int(s)


def search_defaults_for_k(k: int) -> dict:
    """k-dependent query-config defaults (searcher.py:127-148 analog; K5).

    The reference tunes (ncells, centroid_score_threshold, ndocs); the
    lexical analog tunes the candidate-oversampling depth and whether the
    dense accumulator path is preferred.
    """
    if k <= 10:
        return {"oversample": 4, "prefer_dense": True}
    if k <= 100:
        return {"oversample": 2, "prefer_dense": True}
    return {"oversample": 1, "prefer_dense": False}


def broadcast_semi_join(ds: "object", ids, id_col: str) -> "object":
    """Filter a streaming Dataset to rows whose ``id_col`` is in the
    BOUNDED ``ids`` set: the set is ``ray.put`` ONCE and probed with a
    vectorized ``np.isin`` inside ``map_batches`` — the shared
    small-side-broadcast semi-join used by facet counts, feedback term
    stats, snippets, MMR and RP-LSH candidate fetches (never a shuffle;
    the big side streams)."""
    import ray as _ray

    ids_arr = np.unique(np.asarray(ids, dtype=np.int64))
    ref = _ray.put(ids_arr)

    def keep(b: pa.Table) -> pa.Table:
        allowed = _ray.get(ref)
        d = b.column(id_col).to_numpy(zero_copy_only=False)
        return b.filter(pa.array(np.isin(d, allowed)))

    return ds.map_batches(keep, batch_format="pyarrow")
