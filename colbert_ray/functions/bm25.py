"""Exact BM25 scalar math — float64, numpy-vectorized.

The lexical replacement for the reference's MaxSim scoring
(``colbert/modeling/colbert.py:165-187``, ``segmented_maxsim.cpp:22-92``).
Standard (Lucene-style) BM25:

    idf(t)      = ln( (N - df + 0.5) / (df + 0.5) + 1 )
    tf_sat(t,d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q,d)  = sum over query terms of  idf(t) * tf_sat(t,d)

Determinism contract (SURVEY.md §7.3 #1): all arithmetic in float64 and the
per-document sum is accumulated in ascending term order (callers iterate
terms sorted by term/term_id), so scores are bit-identical at any
parallelism level. Canonical tie-break is (-score, docid)
(``server.py:34`` analog).
"""

from __future__ import annotations

import numpy as np


def idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    """Robertson-Sparck-Jones idf with +1 inside the log (always > 0)."""
    df = np.asarray(df, dtype=np.float64)
    return np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def tf_saturation(
    tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float, b: float
) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def term_upper_bound(max_tf_sat: float, term_idf: float) -> float:
    """Upper bound of one term's contribution — exact (used for pruning)."""
    return term_idf * max_tf_sat


def topk_with_ties(scores: np.ndarray, docids: np.ndarray, k: int):
    """Top-k by (-score, docid): returns (docids, scores, ranks 1..k)."""
    n = len(scores)
    if n == 0:
        return docids[:0], scores[:0], np.empty(0, dtype=np.int32)
    kk = min(k, n)
    # partial select then canonical sort of the selected head
    if n > kk:
        part = np.argpartition(-scores, kk - 1)[:kk * 2 if kk * 2 <= n else n]
        # take enough to break ties deterministically: sort candidates fully
        order = part[np.lexsort((docids[part], -scores[part]))]
        # among equal boundary scores argpartition may have dropped a lower
        # docid; guard by re-selecting from all rows with score >= kth score
        kth = scores[order[kk - 1]]
        cand = np.flatnonzero(scores >= kth)
        order = cand[np.lexsort((docids[cand], -scores[cand]))][:kk]
    else:
        order = np.lexsort((docids, -scores))[:kk]
    ranks = np.arange(1, len(order) + 1, dtype=np.int32)
    return docids[order], scores[order], ranks


def sql_bm25_score_expr(k1: float, b: float) -> str:
    """DuckDB per-(query,doc,term) contribution expression.

    Assumes columns: tf, df, dl, and scalars n_docs, avgdl available in the
    enclosing query (joined in). Summed per (qid, docid) by the oracle SQL.
    """
    return (
        f"ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * "
        f"(tf * ({k1} + 1.0)) / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
    )
