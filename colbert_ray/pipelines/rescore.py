"""Two-stage query rescoring — the Elasticsearch ``rescore`` analog.

The classic cheap-retrieval + expensive-window-rerank composition the
reference realizes with its two-pass search hooks
(``colbert/searcher.py:76-99``): stage 1 ranks by BM25 under the engine's
rounded float policy and keeps the top ``window`` docs per query; stage 2
computes a PROXIMITY bonus only for window docs containing EVERY distinct
query term — ``bonus = weight / span`` where ``span`` is the smallest
token window covering all terms (the same two-pointer sweep as
``proximity_search``). Final score = ``round(base_r + bonus, 6)``,
tie-break docid.

Scale shape: stage 1 is posting-driven (no corpus scan); stage 2
re-tokenizes ONLY the intersection of the window with the conjunctive
candidate set, via a broadcast docid semi-join over the streaming corpus
(the phrase/proximity verify shape) — the exchange is O(window) rows per
query, never the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from colbert_ray.config import EngineConfig


def rescore_search(
    index_dir: str,
    corpus,
    query: str,
    k: int = 10,
    window: int = 50,
    weight: float = 2.0,
    cfg: EngineConfig | None = None,
    scorer=None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Top-k after rescoring the BM25 top-``window`` with the proximity
    bonus. Returns (docid, rank, score_r, base_r, span) — ``span`` is 0
    for window docs not containing every query term (bonus 0), else the
    exact min covering span.
    """
    from colbert_ray.functions.tokenizer import tokenize_query
    from colbert_ray.pipelines.phrase import (
        _filtered_flat_tokens,
        conjunctive_candidates,
        min_token_span,
    )
    from colbert_ray.state.index import BM25Scorer

    scorer = scorer or BM25Scorer(index_dir, k=max(1, k), with_sha=False)
    if scorer.ranker != "bm25":
        raise ValueError("rescore_search supports ranker='bm25' only")
    cfg = cfg or scorer.idx.cfg
    empty = pa.table({"docid": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64()),
                      "score_r": pa.array([], type=pa.float64()),
                      "base_r": pa.array([], type=pa.float64()),
                      "span": pa.array([], type=pa.int64())})
    terms = tokenize_query(query, cfg)[0]
    tids = scorer.idx.lookup_terms(terms)
    if not len(tids) or k <= 0 or window <= 0:
        return empty
    d, s = scorer._all_match_scores(tids, docid_filter=scorer.docid_filter)
    if not len(d):
        return empty
    sr = np.round(s, 6)
    sel = np.lexsort((d, -sr))[:window]          # stage-1 window
    w_d, w_sr = d[sel], sr[sel]

    words = sorted(set(terms))
    need = np.intersect1d(w_d, conjunctive_candidates(scorer.idx, words))
    spans = np.zeros(len(w_d), dtype=np.int64)
    if len(need):
        from colbert_ray.functions.util import broadcast_semi_join

        def verify(sub: pa.Table) -> pa.Table:
            out = pa.table({"docid": pa.array([], type=pa.int64()),
                            "span": pa.array([], type=pa.int64())})
            if not sub.num_rows:
                return out
            parents, flat = _filtered_flat_tokens(sub.column(text_col),
                                                  cfg)
            tokens = flat.to_numpy(zero_copy_only=False)
            sub_ids = sub.column(id_col).to_numpy(zero_copy_only=False)
            starts = np.searchsorted(parents, np.arange(sub.num_rows))
            ends = np.searchsorted(parents, np.arange(sub.num_rows),
                                   side="right")
            out_id, out_span = [], []
            for row in range(sub.num_rows):
                tk = tokens[starts[row]:ends[row]]
                pos_by_word = [np.flatnonzero(tk == w) for w in words]
                if any(len(p) == 0 for p in pos_by_word):
                    continue          # tokenizer drift guard
                out_id.append(int(sub_ids[row]))
                out_span.append(min_token_span(pos_by_word))
            return pa.table({"docid": pa.array(out_id, type=pa.int64()),
                             "span": pa.array(out_span,
                                              type=pa.int64())})

        got = (broadcast_semi_join(
                   corpus.select_columns([id_col, text_col]), need, id_col)
               .map_batches(verify, batch_format="pyarrow",
                            zero_copy_batch=True).take_all())
        # w_d is in RANK order, not docid order — map spans by docid
        span_by_doc = {row["docid"]: row["span"] for row in got}
        spans = np.array([span_by_doc.get(int(x), 0) for x in w_d],
                         dtype=np.int64)

    bonus = np.where(spans > 0, weight / np.maximum(spans, 1), 0.0)
    final_r = np.round(w_sr + bonus, 6)
    order = np.lexsort((w_d, -final_r))[:k]
    return pa.table({
        "docid": pa.array(w_d[order], type=pa.int64()),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        "score_r": pa.array(final_r[order], type=pa.float64()),
        "base_r": pa.array(w_sr[order], type=pa.float64()),
        "span": pa.array(spans[order], type=pa.int64()),
    })
