"""Snippet extraction: best query-term window per (query, hit document).

The result-presentation stage of a search engine (the reference serves
passage text alongside scores the same way, ``colbert/server.py:47-60``):
for every ranked (qid, docid) pair, find the fixed-width token window with
the most query-term occurrences (tie -> earliest window) and render it.

Scale shape mirrors facet_counts: the (qid, docid) pairs and per-query
term sets are BOUNDED (n_queries x k), broadcast once; the corpus streams
through map_batches and only hit docs are tokenized (with the build's own
tokenizer, so windows line up with the oracle's token lists). The window
scan per hit doc is a vectorized cumsum over the membership mask; the
Python loop is over HIT (doc, query) pairs only, never corpus rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from colbert_ray.config import EngineConfig


def extract_snippets(
    ranking: pd.DataFrame,
    corpus: "ray.data.Dataset",
    query_terms: dict[int, list[str]],
    cfg: EngineConfig,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """-> (qid, docid, start 1-based, n_hits, snippet) per ranking row.

    ``start`` is the 1-based token index of the chosen window (matches the
    SQL twin's list-slice convention); ``snippet`` joins the window's
    tokens with single spaces. Documents shorter than ``window`` use their
    full token list.
    """
    import ray as _ray

    from colbert_ray.functions.tokenizer import (_flatten_tokens,
                                                 tokenize_column)

    pairs = ranking[["qid", "docid"]].drop_duplicates()
    doc_to_qids: dict[int, list[int]] = {}
    for q, d in zip(pairs["qid"].to_numpy(), pairs["docid"].to_numpy()):
        doc_to_qids.setdefault(int(d), []).append(int(q))
    qsets = {int(q): np.asarray(sorted(set(ts)), dtype=object)
             for q, ts in query_terms.items()}
    bcast = _ray.put((doc_to_qids, qsets))

    def snip(b: pa.Table) -> pa.Table:
        d2q, qs = _ray.get(bcast)
        out = {"qid": [], "docid": [], "start": [], "n_hits": [],
               "snippet": []}
        if b.num_rows:
            toks_l = tokenize_column(b.column(text_col), cfg)
            parents, tokens = _flatten_tokens(toks_l, cfg)
            docids = b.column(id_col).to_numpy(zero_copy_only=False)
            # per-row filtered token lists, original order kept
            starts = np.searchsorted(parents, np.arange(b.num_rows))
            ends = np.searchsorted(parents, np.arange(b.num_rows),
                                   side="right")
            for row in range(b.num_rows):
                tk = tokens[starts[row]:ends[row]]
                for qid in d2q[int(docids[row])]:
                    hit = np.isin(tk, qs[qid]).astype(np.int64)
                    n = len(tk)
                    w = min(window, max(1, n))
                    if n == 0:
                        s0, hits = 0, 0
                    else:
                        csum = np.concatenate([[0], np.cumsum(hit)])
                        wins = csum[w:] - csum[:-w]     # n-w+1 windows
                        s0 = int(np.argmax(wins))       # first max
                        hits = int(wins[s0])
                    out["qid"].append(qid)
                    out["docid"].append(int(docids[row]))
                    out["start"].append(s0 + 1)
                    out["n_hits"].append(hits)
                    out["snippet"].append(" ".join(tk[s0:s0 + w].tolist()))
        return pa.table({
            "qid": pa.array(out["qid"], type=pa.int64()),
            "docid": pa.array(out["docid"], type=pa.int64()),
            "start": pa.array(out["start"], type=pa.int64()),
            "n_hits": pa.array(out["n_hits"], type=pa.int64()),
            "snippet": pa.array(out["snippet"], type=pa.string()),
        })

    from colbert_ray.functions.util import broadcast_semi_join

    hits = broadcast_semi_join(corpus.select_columns([id_col, text_col]),
                               np.fromiter(doc_to_qids.keys(),
                                           dtype=np.int64,
                                           count=len(doc_to_qids)), id_col)
    res = hits.map_batches(snip, batch_format="pyarrow").to_pandas()
    return res.sort_values(["qid", "docid"]).reset_index(drop=True)
