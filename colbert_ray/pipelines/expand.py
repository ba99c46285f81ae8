"""Pseudo-relevance-feedback query expansion (RM3-style).

The classic retrieval composite the reference's searcher enables through
its two-pass search hooks (``colbert/searcher.py:76-99`` filter/re-search
cycle): (1) initial BM25 top-n per query, (2) a relevance model built from
the feedback documents' term statistics, (3) a re-search with the expanded,
weighted query.

Scale shapes:
- Feedback term stats come from a broadcast SEMI-JOIN: the bounded
  (n_queries x n_fb) docid set is ``ray.put`` once and the corpus STREAMS
  through ``map_batches``; tokenization happens inside the corpus task
  (via the same ``doc_term_frequencies`` used by the index build, so term
  stats match the index exactly) and only (docid, term, tf, dl) rows of
  HIT documents leave the task.
- Expansion selection and weighted-query construction are driver-side
  over bounded rows (n_queries x n_fb x avg_dl terms).
- The re-search is the normal scorer actor pool: ``BM25Scorer`` batches
  dispatch on a ``terms``/``weights`` list-column query table
  (``state/index.py:score_weighted_terms``).

Determinism/float policy: the relevance-model weight rm_w(q, t) =
sum over feedback docs of tf(t,d)/dl(d) is rounded to 6 dp before
selection; ties break by term string ascending — both replicated in the
SQL twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from colbert_ray.config import EngineConfig


def feedback_term_stats(
    ranking: pd.DataFrame,
    corpus: "ray.data.Dataset",
    cfg: EngineConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """(docid, term, tf, dl) rows for every docid in ``ranking`` — corpus
    streams, tokenization runs in the corpus tasks, output is bounded."""
    from colbert_ray.functions.tokenizer import doc_term_frequencies
    from colbert_ray.functions.util import broadcast_semi_join

    def stats(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if b.num_rows == 0:
            return pa.table({"docid": pa.array([], type=pa.int64()),
                             "term": pa.array([], type=pa.string()),
                             "tf": pa.array([], type=pa.int64()),
                             "dl": pa.array([], type=pa.int64())})
        doclens, terms, tfs = doc_term_frequencies(b.column(text_col), cfg)
        parents = pc.list_parent_indices(terms).to_numpy(zero_copy_only=False)
        docids = b.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "docid": pa.array(docids[parents], type=pa.int64()),
            "term": terms.flatten(),
            "tf": pa.array(tfs.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "dl": pa.array(doclens[parents].astype(np.int64)),
        })

    hits = broadcast_semi_join(
        corpus.select_columns([id_col, text_col]),
        ranking["docid"].to_numpy(dtype=np.int64), id_col)
    return hits.map_batches(stats, batch_format="pyarrow").to_pandas()


def rm3_expansions(
    ranking: pd.DataFrame,
    fb_stats: pd.DataFrame,
    original_terms: dict[int, list[str]],
    n_expansion: int = 5,
    alpha: float = 0.5,
) -> dict[int, tuple[list[str], list[float]]]:
    """Per-qid weighted expanded query: original terms at weight 1.0 plus
    the top-``n_expansion`` feedback terms (by rm_w = sum tf/dl over that
    query's feedback docs, rounded 6 dp, term-ascending tie-break,
    originals excluded) at weight ``alpha``."""
    fb = ranking[["qid", "docid"]].merge(fb_stats, on="docid", how="inner")
    fb = fb.assign(w=fb["tf"].to_numpy(dtype=np.float64)
                   / fb["dl"].to_numpy(dtype=np.float64))
    rm = (fb.groupby(["qid", "term"], as_index=False)["w"].sum())
    rm["w"] = rm["w"].round(6)

    out: dict[int, tuple[list[str], list[float]]] = {}
    for qid, terms in original_terms.items():
        g = rm[rm["qid"] == qid]
        g = g[~g["term"].isin(set(terms))]
        g = g.sort_values(["w", "term"], ascending=[False, True])
        exp = g.head(n_expansion)["term"].tolist()
        out[int(qid)] = (list(terms) + exp,
                         [1.0] * len(terms) + [float(alpha)] * len(exp))
    return out


def weighted_query_table(
    expansions: dict[int, tuple[list[str], list[float]]],
) -> pa.Table:
    """qid / terms / weights list-column table for the weighted scorer."""
    qids = sorted(expansions)
    return pa.table({
        "qid": pa.array(qids, type=pa.int64()),
        "terms": pa.array([expansions[q][0] for q in qids],
                          type=pa.list_(pa.string())),
        "weights": pa.array([expansions[q][1] for q in qids],
                            type=pa.list_(pa.float64())),
    })
