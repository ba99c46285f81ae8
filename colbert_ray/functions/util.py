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


def levenshtein_leq_mask(cands, q: str, d: int) -> np.ndarray:
    """Vectorized edit-distance filter: bool mask over ``cands`` (a
    sequence/array of strings) marking terms with Levenshtein(c, q) <= d.

    One dynamic-programming sweep vectorized over ALL candidates at once
    (dp shape (N, Lmax+1); the two short loops run over the QUERY and
    candidate CHARACTER positions, never over candidates), after a cheap
    length-band prefilter |len(c) - len(q)| <= d. Cost O(|q| * Lmax)
    vector ops of width N — the fuzzy-atom expansion path is dictionary-
    bounded (vocab, not corpus), the same budget class as the wildcard
    dictionary scans in pipelines/phrase.py.
    """
    cands = np.asarray(cands, dtype=object)
    n = len(cands)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    lens = np.fromiter((len(c) for c in cands), count=n, dtype=np.int64)
    m = len(q)
    band = np.abs(lens - m) <= d
    idx = np.flatnonzero(band)
    if len(idx) == 0:
        return out
    sub = cands[idx]
    sl = lens[idx]
    lmax = int(sl.max())
    # padded codepoint matrix (pad 0 never equals a real char)
    mat = np.zeros((len(sub), lmax), dtype=np.uint32)
    for i, c in enumerate(sub):
        mat[i, : len(c)] = np.frombuffer(c.encode("utf-32-le"),
                                         dtype=np.uint32)
    qv = np.frombuffer(q.encode("utf-32-le"), dtype=np.uint32)
    dp = np.broadcast_to(np.arange(lmax + 1, dtype=np.int64),
                         (len(sub), lmax + 1)).copy()
    for i in range(1, m + 1):
        ndp = np.empty_like(dp)
        ndp[:, 0] = i
        neq = (mat != qv[i - 1]).astype(np.int64)
        for j in range(1, lmax + 1):
            ndp[:, j] = np.minimum(
                np.minimum(dp[:, j] + 1, ndp[:, j - 1] + 1),
                dp[:, j - 1] + neq[:, j - 1])
        dp = ndp
    out[idx] = dp[np.arange(len(sub)), sl] <= d
    return out
