"""Query-likelihood ranking with Dirichlet smoothing — float64, vectorized.

A second exact ranker over the SAME inverted index as BM25, proving the
scorer is pluggable (the reference swaps scoring backends over one index
the same way: ``colbert/search/index_storage.py:35-52`` chooses the scorer
implementation independently of the stored index). Standard Dirichlet QL
(Zhai & Lafferty 2001), in the rank-equivalent decomposed form that an
inverted index evaluates without touching non-matching terms:

    p(t|C)      = cf_t / n_tokens            (collection language model)
    score(q,d)  = sum_{t in q, tf>0} ln(1 + tf / (mu * p(t|C)))
                  + |q| * ln(mu / (dl + mu))

where |q| counts the query's in-vocabulary term occurrences. Candidate set
is the union of the query terms' posting lists (docs matching no term are
not ranked — the universal retrieval-system convention; the dl-only tail
term is added for candidates only).

Determinism contract matches BM25 (SURVEY.md §7.3 #1): float64 everywhere,
per-document accumulation in ascending term_id order, tie-break
(-score, docid). Collection statistics (cf_t, n_tokens) are the BUILD-time
statistics — frozen under IndexUpdater deltas until compaction, exactly
like BM25's idf/avgdl.
"""

from __future__ import annotations

import numpy as np

DEFAULT_MU = 2000.0


def ql_term_contrib(tf: np.ndarray, cf: float, n_tokens: int,
                    mu: float) -> np.ndarray:
    """ln(1 + tf * n_tokens / (mu * cf)) — the matching-term part."""
    tf = np.asarray(tf, dtype=np.float64)
    return np.log1p(tf * float(n_tokens) / (mu * float(cf)))


def ql_length_norm(dl: np.ndarray, n_query_terms: int,
                   mu: float) -> np.ndarray:
    """|q| * ln(mu / (dl + mu)) — the per-candidate document-length tail."""
    dl = np.asarray(dl, dtype=np.float64)
    return float(n_query_terms) * np.log(mu / (dl + mu))


def sql_ql_match_expr(mu: float) -> str:
    """DuckDB per-(query,doc,term) matching contribution.

    Assumes columns tf, cf and scalar n_tokens joined in; the enclosing
    query sums per (qid, docid) and adds the length tail.
    """
    return f"ln(1.0 + tf * n_tokens / ({mu} * cf))"
