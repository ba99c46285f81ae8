"""Per-document term vectors — the Elasticsearch ``_termvectors``
(``term_statistics=true``) analog: for each requested doc, its distinct
terms with the in-doc term frequency and the corpus-wide document
frequency. The introspection complement of ``BM25Scorer.explain`` (which
is query-driven; this is doc-driven).

Scale shape: the requested docid set is bounded (an API request), so it
broadcasts once and the corpus STREAMS through ``map_batches`` — only
requested rows tokenize (with the build's own tokenizer, so tf matches
the index exactly); df is a dictionary probe over the mmap'd index, never
a second corpus pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from colbert_ray.config import EngineConfig


def doc_term_vectors(
    index_dir: str,
    corpus,
    docids,
    cfg: EngineConfig | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """(docid, term, tf, df) rows for every requested doc, ordered by
    (docid, term). Terms filtered out at build time never appear (the
    same token filter runs here); a term absent from the dictionary
    (possible on a stale index) reports df 0.
    """
    from colbert_ray.functions.tokenizer import doc_term_frequencies
    from colbert_ray.functions.util import broadcast_semi_join
    from colbert_ray.state.decoded import DecodedIndex

    cfg = cfg or DecodedIndex.load_cached(index_dir, load_sha=False).cfg
    empty = pa.table({"docid": pa.array([], type=pa.int64()),
                      "term": pa.array([], type=pa.string()),
                      "tf": pa.array([], type=pa.int64()),
                      "df": pa.array([], type=pa.int64())})
    want = np.unique(np.asarray(list(docids), dtype=np.int64))
    if not len(want):
        return empty
    def extract(sub: pa.Table) -> pa.Table:
        if not sub.num_rows:
            return empty.select(["docid", "term", "tf"])
        _, terms, tfs = doc_term_frequencies(sub.column(text_col), cfg)
        import pyarrow.compute as pc

        parents = pc.list_parent_indices(terms).to_numpy(
            zero_copy_only=False)
        sub_ids = sub.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "docid": pa.array(sub_ids[parents], type=pa.int64()),
            "term": terms.flatten(),
            "tf": tfs.flatten().cast(pa.int64()),
        })

    rows = (broadcast_semi_join(
                corpus.select_columns([id_col, text_col]), want, id_col)
            .map_batches(extract, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas())
    if rows.empty:
        return empty
    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    terms = rows["term"].to_numpy(dtype=object)
    df = np.zeros(len(terms), dtype=np.int64)
    if len(idx.dict_terms):
        pos = np.searchsorted(idx.dict_terms, terms.astype(str))
        pos_c = np.clip(pos, 0, len(idx.dict_terms) - 1)
        known = idx.dict_terms[pos_c] == terms.astype(str)
        gids = idx.dict_term_ids[pos_c[known]]
        df[known] = (idx.posting_offsets[gids + 1]
                     - idx.posting_offsets[gids]).astype(np.int64)
    rows["df"] = df
    rows = rows.sort_values(["docid", "term"]).reset_index(drop=True)
    return pa.table({
        "docid": pa.array(rows["docid"].to_numpy(np.int64)),
        "term": pa.array(rows["term"], type=pa.string()),
        "tf": pa.array(rows["tf"].to_numpy(np.int64)),
        "df": pa.array(rows["df"].to_numpy(np.int64)),
    })
