"""Significant-terms aggregation — the Elasticsearch ``significant_terms``
analog: terms OVERREPRESENTED in a query's matching documents relative to
the whole corpus, ranked by the JLH score
``(fg_pct - bg_pct) * (fg_pct / bg_pct)`` where ``fg_pct`` is the term's
document frequency inside the matching (foreground) set and ``bg_pct``
its global (background) document frequency.

The reference's nearest capability is its term-importance introspection
over matched passages (``colbert/modeling/colbert.py:60-93`` token-match
saliency); a lexical engine expresses it as a foreground/background df
contrast.

Scale shape: the foreground docid set comes from the inverted index
(posting-driven, no corpus scan) and is broadcast ONCE (``ray.put``); the
corpus STREAMS through ``map_batches`` — only matching rows tokenize, and
each batch emits vocabulary-bounded (term, partial fg_df) rows, merged in
one small driver groupby (the dictionary-size budget every other
vocab-level stage in this engine already assumes). Background df is a
dictionary probe (posting-slice lengths), never a second corpus pass.

Float policy: fg_pct/bg_pct/JLH are float64 with the exact expression
order ``(a - b) * a / b`` replicated in the SQL twin; the score is
rounded to 6 dp before the (-score, term) cut, like every other ranked
surface here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from colbert_ray.config import EngineConfig


def significant_terms(
    index_dir: str,
    corpus,
    query: str,
    k: int = 10,
    cfg: EngineConfig | None = None,
    scorer=None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Top-k significant terms of ``query``'s match set. Returns
    (term, fg_df, bg_df, score_r) ordered by (-score_r, term).

    Background df is the index's RAW posting df (the build-time corpus);
    on an updated index with tombstones, compact first for exact
    background stats.
    """
    from colbert_ray.functions.tokenizer import (
        doc_term_frequencies,
        tokenize_query,
    )
    from colbert_ray.functions.util import broadcast_semi_join
    from colbert_ray.state.index import BM25Scorer

    scorer = scorer or BM25Scorer(index_dir, k=max(1, k), with_sha=False)
    idx = scorer.idx
    cfg = cfg or idx.cfg
    empty = pa.table({"term": pa.array([], type=pa.string()),
                      "fg_df": pa.array([], type=pa.int64()),
                      "bg_df": pa.array([], type=pa.int64()),
                      "score_r": pa.array([], type=pa.float64())})
    tids = idx.lookup_terms(tokenize_query(query, cfg)[0])
    if not len(tids) or k <= 0:
        return empty
    d, _ = scorer._all_match_scores(tids, docid_filter=scorer.docid_filter)
    if not len(d):
        return empty
    n_fg = len(d)

    def fg_partial(sub: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if not sub.num_rows:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "fg_df": pa.array([], type=pa.int64())})
        _, terms_list, _ = doc_term_frequencies(sub.column(text_col), cfg)
        # doc_term_frequencies lists each term ONCE per doc, so a
        # value_counts over the flattened lists IS the partial df
        vc = pc.value_counts(terms_list.flatten())
        return pa.table({
            "term": vc.field("values"),
            "fg_df": vc.field("counts").cast(pa.int64()),
        })

    parts = (broadcast_semi_join(
                 corpus.select_columns([id_col, text_col]), d, id_col)
             .map_batches(fg_partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas())
    if parts.empty:
        return empty
    fg = parts.groupby("term", sort=True)["fg_df"].sum()
    terms = np.asarray(fg.index, dtype=object)
    fg_df = fg.to_numpy(dtype=np.int64)
    # background df: dictionary probe (posting-slice lengths)
    pos = np.searchsorted(idx.dict_terms, terms.astype(str))
    pos_c = np.clip(pos, 0, max(0, len(idx.dict_terms) - 1))
    known = idx.dict_terms[pos_c] == terms.astype(str)
    # terms the index never saw (pruned/filtered at build) have no
    # background stats — drop them, mirroring the SQL twin's inner join
    terms, fg_df, pos_c = terms[known], fg_df[known], pos_c[known]
    if not len(terms):
        return empty
    gids = idx.dict_term_ids[pos_c]
    bg_df = (idx.posting_offsets[gids + 1]
             - idx.posting_offsets[gids]).astype(np.int64)
    # a lossy-pruned term keeps its dictionary entry but has ZERO
    # postings — bg_pct 0 would put inf at the top of the ranking; it
    # has no background stats, so drop it like an unknown term
    live = bg_df > 0
    if not live.all():
        terms, fg_df, bg_df = terms[live], fg_df[live], bg_df[live]
        if not len(terms):
            return empty
    a = fg_df.astype(np.float64) / np.float64(n_fg)
    b = bg_df.astype(np.float64) / np.float64(idx.n_docs)
    score = np.round((a - b) * a / b, 6)
    order = np.lexsort((terms, -score))[:k]
    return pa.table({
        "term": pa.array(terms[order], type=pa.string()),
        "fg_df": pa.array(fg_df[order]),
        "bg_df": pa.array(bg_df[order]),
        "score_r": pa.array(score[order], type=pa.float64()),
    })
