"""Field-weighted retrieval: BM25F over multi-field document tables.

BM25F (Robertson & Zaragoza, "The Probabilistic Relevance Framework:
BM25 and Beyond", §3.5) generalizes BM25 to documents with several
weighted text fields (title, body, anchors, ...): per-field term
frequencies are length-normalized per field, combined with field
weights BEFORE the saturation step, and saturated once —

    B_f(d)     = 1 - b_f + b_f * dl_f(d) / avgdl_f
    tfn(t, d)  = sum_f  w_f * tf_f(t, d) / B_f(d)
    score(q,d) = sum_{t in q}  idf(t) * tfn / (k1 + tfn)

with the engine's Lucene-style idf = ln((N - df + 0.5)/(df + 0.5) + 1)
and df(t) = number of docs containing t in ANY field. This is NOT the
same as a weighted sum of per-field BM25 scores — combining before
saturation is what makes a term occurring in two fields saturate
jointly (the reference's multi-vector doc/query fielding has no lexical
analog, so this is the classical field-weighted ranking the survey's
BM25 engine would grow next; reference capability anchor:
colbert/searcher.py:61-76 single-field search entry).

Scale shape (index-free streaming scorer, the `tfidf_topk` pattern):
pass 1 streams the corpus once for per-field length statistics
(per-batch partials, tiny driver sum — the A1 corpus_stats analog);
pass 2 streams it once more, tokenizing each field and keeping only
(doc, query-term) matches against the broadcast query vocabulary —
the emitted candidate set is bounded by sum_t df(t) (a posting-list
slice, never the corpus) and is materialized once so the df count and
the scoring pass share it without re-tokenizing. Scoring pre-combines
per (qid, docid) inside each batch before the one small groupby.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from colbert_ray.config import EngineConfig
from colbert_ray.functions.tokenizer import (
    doc_term_frequencies,
    tokenize_column,
    tokenize_query,
)


@dataclass(frozen=True)
class FieldSpec:
    """One scored field: a string column, its weight, and its length-
    normalization slope (BM25F allows per-field b)."""

    col: str
    weight: float
    b: float


def _filtered_tokens(texts, cfg: EngineConfig) -> tuple[np.ndarray, pa.Array]:
    """Ordered, length-filtered flat tokens + parent row ids — the same
    token stream `sql_tokenize_expr` produces, positions preserved."""
    toks = tokenize_column(texts, cfg)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = (lens >= cfg.min_token_len) & (lens <= cfg.max_token_len)
    if not keep.all():
        idx = np.flatnonzero(keep)
        parents = parents[idx]
        flat = flat.take(pa.array(idx))
    return parents.astype(np.int64), flat


def _join_slice(parents: np.ndarray, flat: pa.Array, n_rows: int,
                lo: int | None, hi: int | None) -> pa.Array:
    """Space-join tokens [lo:hi) of each row back into one string per row
    (missing range -> empty string). Pure offset arithmetic, no row loop."""
    counts = np.bincount(parents, minlength=n_rows).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    pos = np.arange(len(parents), dtype=np.int64) - starts[parents]
    mask = np.ones(len(parents), dtype=bool)
    if lo:
        mask &= pos >= lo
    if hi is not None:
        mask &= pos < hi
    sel = np.flatnonzero(mask)
    sel_counts = np.bincount(parents[sel], minlength=n_rows).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(sel_counts)))
    lst = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        flat.take(pa.array(sel)))
    return pc.binary_join(lst.cast(pa.list_(pa.string())), " ")


def field_split(ds: "ray.data.Dataset", *, text_col: str = "text",
                id_col: str = "doc_id", title_len: int = 5,
                cfg: EngineConfig | None = None) -> "ray.data.Dataset":
    """Derive a deterministic (title, body) field pair from a single text
    column: title = the first ``title_len`` filtered tokens re-joined with
    spaces, body = the rest. Tokens are already normalized (lowercase,
    camel-split, length-filtered), so re-tokenizing either field
    reproduces exactly that token slice — the property the SQL twin
    (`toks[1:title_len]` / `toks[title_len+1:]`) relies on."""
    cfg = cfg or EngineConfig()

    def fn(batch: pa.Table) -> pa.Table:
        parents, flat = _filtered_tokens(batch.column(text_col), cfg)
        n = batch.num_rows
        return pa.table({
            id_col: batch.column(id_col),
            "title": _join_slice(parents, flat, n, None, title_len),
            "body": _join_slice(parents, flat, n, title_len, None),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def _field_stats(ds: "ray.data.Dataset", fields: list[FieldSpec],
                 cfg: EngineConfig) -> tuple[int, list[float]]:
    """(n_docs, avgdl per field) in one streamed pass: per-batch partial
    sums, O(n_blocks) rows to the driver."""
    cols = [f.col for f in fields]

    def partial(batch: pa.Table) -> pa.Table:
        out = {"n": pa.array([batch.num_rows], type=pa.int64())}
        for c in cols:
            dl, _, _ = doc_term_frequencies(batch.column(c), cfg)
            out[f"sumdl_{c}"] = pa.array([int(dl.sum())], type=pa.int64())
        return pa.table(out)

    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n_docs = int(parts["n"].sum())
    avgdl = [float(parts[f"sumdl_{c}"].sum()) / max(n_docs, 1) for c in cols]
    return n_docs, avgdl


def bm25f_rank(ds: "ray.data.Dataset",
               queries: list[tuple[int, str]],
               fields: list[FieldSpec],
               *, k: int = 10, k1: float | None = None,
               id_col: str = "doc_id",
               cfg: EngineConfig | None = None) -> "ray.data.Dataset":
    """Top-k BM25F ranking: (qid, docid, rank, score_r) with the engine's
    float policy (score rounded to 6 decimals, rank over the rounded value,
    docid tie-break). Query terms are the unique tokenized terms of each
    query (multiplicity ignored), matching the BM25 path."""
    import ray as _ray

    from colbert_ray.extras.relational import grouped_topk

    cfg = cfg or EngineConfig()
    k1 = cfg.k1 if k1 is None else k1

    # ---- query vocabulary + term -> [qid] expansion (tiny, broadcast) ---
    per_q = [(qid, tokenize_query(text, cfg)[0]) for qid, text in queries]
    vocab = np.array(sorted({t for _, ts in per_q for t in ts}), dtype=object)
    V = len(vocab)
    qids_by_term: list[list[int]] = [[] for _ in range(V)]
    for qid, ts in per_q:
        for t in ts:
            qids_by_term[int(np.searchsorted(vocab, t))].append(qid)
    exp_counts = np.array([len(x) for x in qids_by_term], dtype=np.int64)
    exp_offsets = np.concatenate(([0], np.cumsum(exp_counts)))
    exp_qids = np.array([q for x in qids_by_term for q in x], dtype=np.int64)

    n_docs, avgdl = _field_stats(ds, fields, cfg)
    vocab_ref = _ray.put(vocab)

    # ---- pass 2: per-field tf for query terms only ----------------------
    fcols = [f.col for f in fields]

    def match(batch: pa.Table) -> pa.Table:
        voc = _ray.get(vocab_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        keys_per_field, tf_per_field, dl_per_field = [], [], []
        for c in fcols:
            dl, terms, tfs = doc_term_frequencies(batch.column(c), cfg)
            offs = terms.offsets.to_numpy(zero_copy_only=False)
            flat = terms.flatten().to_numpy(zero_copy_only=False)
            ftf = tfs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            parents = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
            vi = np.searchsorted(voc, flat)
            ok = (vi < len(voc))
            ok[ok] &= voc[vi[ok]] == flat[ok]
            keys_per_field.append(parents[ok] * len(voc) + vi[ok])
            tf_per_field.append(ftf[ok])
            dl_per_field.append(dl.astype(np.int64))
        uk = np.unique(np.concatenate(keys_per_field))
        cols: dict = {
            id_col: pa.array(ids[uk // len(voc)], type=pa.int64()),
            "term": pa.array(voc[uk % len(voc)].astype(str)),
        }
        for i, c in enumerate(fcols):
            tf = np.zeros(len(uk), dtype=np.int64)
            pos = np.searchsorted(uk, keys_per_field[i])
            tf[pos] = tf_per_field[i]
            cols[f"tf_{c}"] = pa.array(tf)
            cols[f"dl_{c}"] = pa.array(dl_per_field[i][uk // len(voc)])
        return pa.table(cols)

    # materialized ONCE: candidates are bounded by sum_t df(t) over the
    # query vocabulary (a posting-list slice, not the corpus) and feed
    # both the df count and the scoring pass below
    matched = ds.select_columns([id_col, *fcols]).map_batches(
        match, batch_format="pyarrow", zero_copy_batch=True).materialize()

    if matched.count() == 0:        # no query term occurs in any field
        return ray.data.from_arrow(pa.table({
            "qid": pa.array([], type=pa.int64()),
            "docid": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
            "score_r": pa.array([], type=pa.float64()),
        }))
    df_pd = matched.groupby("term").count().to_pandas()
    df_by_vocab = np.zeros(V, dtype=np.float64)
    pos = np.searchsorted(vocab, df_pd["term"].to_numpy(dtype=object))
    df_by_vocab[pos] = df_pd["count()"].to_numpy(dtype=np.float64)
    idf = np.log((n_docs - df_by_vocab + 0.5) / (df_by_vocab + 0.5) + 1.0)

    weights = np.array([f.weight for f in fields])
    bs = np.array([f.b for f in fields])
    score_ref = _ray.put((vocab, idf, exp_offsets, exp_qids,
                          np.array(avgdl), weights, bs))

    def score(batch: pa.Table) -> pa.Table:
        voc, iv, eo, eq, ad, wv, bv = _ray.get(score_ref)
        m = batch.num_rows
        if m == 0:
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             "docid": pa.array([], type=pa.int64()),
                             "part": pa.array([], type=pa.float64())})
        tfn = np.zeros(m, dtype=np.float64)
        for i, c in enumerate(fcols):
            tf = batch.column(f"tf_{c}").to_numpy(zero_copy_only=False)
            dl = batch.column(f"dl_{c}").to_numpy(zero_copy_only=False)
            B = 1.0 - bv[i] + bv[i] * dl / max(ad[i], 1e-12)
            tfn += wv[i] * tf / B
        vi = np.searchsorted(voc, batch.column("term").to_numpy(
            zero_copy_only=False))
        contrib = iv[vi] * tfn / (k1 + tfn)
        # expand term rows to every query containing the term, then
        # pre-combine per (qid, docid) inside the batch (map-side partial)
        reps = (eo[vi + 1] - eo[vi])
        ridx = np.repeat(np.arange(m), reps)
        gather = (np.arange(int(reps.sum()), dtype=np.int64)
                  - np.repeat(np.cumsum(reps) - reps, reps)
                  + eo[vi][ridx])
        qid = eq[gather]
        docid = batch.column(id_col).to_numpy(zero_copy_only=False)[ridx]
        mult = int(docid.max()) + 1
        ukey, inv = np.unique(qid * mult + docid, return_inverse=True)
        psum = np.bincount(inv, weights=contrib[ridx], minlength=len(ukey))
        return pa.table({"qid": pa.array(ukey // mult),
                         "docid": pa.array(ukey % mult),
                         "part": pa.array(psum)})

    scored = (matched.map_batches(score, batch_format="pyarrow",
                                  zero_copy_batch=True)
              .groupby(["qid", "docid"]).aggregate(Sum("part")))

    def finish(batch: pa.Table) -> pa.Table:
        s = np.round(batch.column("sum(part)").to_numpy(
            zero_copy_only=False), 6)
        return pa.table({"qid": batch.column("qid"),
                         "docid": batch.column("docid"),
                         "score_r": pa.array(s, type=pa.float64())})

    ranked = grouped_topk(
        scored.map_batches(finish, batch_format="pyarrow"),
        "qid", "score_r", k, tie_col="docid", descending=True)
    return ranked.map_batches(
        lambda b: b.rename_columns(
            ["qid", "docid", "score_r", "rank"]).select(
            ["qid", "docid", "rank", "score_r"]),
        batch_format="pyarrow")
