"""Text-analysis operators for large-scale training-data pipelines.

These run over a generic document table (e.g. the test environment's
``documents`` parquet: ``doc_id, text, lang, source, n_chars``) using the
same vectorized tokenizer as the retrieval engine. All are streaming
``map_batches`` stages; aggregates pre-combine per batch before the (small)
global groupby (ray_guide.md "Aggregation at scale").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Mean, Sum

from colbert_ray.config import EngineConfig
from colbert_ray.functions.tokenizer import doc_term_frequencies, tokenize_column

# fixed stopword list shared with oracle SQL (keep sorted, lowercase)
STOPWORDS = ["a", "and", "for", "in", "of", "the", "this", "to", "with"]

# crude n-gram/stopword language profiles for the heuristic language id —
# tuned for the synthetic multilingual-ish documents table (rows-only check)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "fast", "slow", "small", "big"},
    "fr": {"le", "la", "et", "vite"},
    "es": {"el", "la", "y"},
    "de": {"der", "die", "und"},
    "zh": {"de", "he"},
}


def _cfg() -> EngineConfig:
    return EngineConfig()


def token_counts(ds: "ray.data.Dataset", text_col: str = "text",
                 id_col: str = "doc_id") -> "ray.data.Dataset":
    """(doc_id, n_tokens, n_unique_terms) per document."""
    cfg = _cfg()

    def fn(batch: pa.Table) -> pa.Table:
        dl, terms, _ = doc_term_frequencies(batch.column(text_col), cfg)
        n_unique = np.diff(terms.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(dl),
                "n_unique_terms": pa.array(n_unique),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def corpus_stats(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    """Single-row global aggregate: n_docs, total_tokens, avgdl (A1 analog)."""
    counted = token_counts(ds.select_columns([text_col, "doc_id"]), text_col)
    agg = counted.aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="total_tokens"),
        Mean("n_tokens", alias_name="avgdl"),
    )
    return ray.data.from_items([agg])


def term_stats(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    """(term, df, cf) over the corpus — pre-aggregated per batch, then one
    small groupby (the dictionary-build pattern of the engine)."""
    cfg = _cfg()

    def partial(batch: pa.Table) -> pa.Table:
        _, terms, tfs = doc_term_frequencies(batch.column(text_col), cfg)
        flat_terms = terms.flatten()
        flat_tfs = tfs.flatten()
        t = pa.table({"term": flat_terms, "tf": flat_tfs})
        g = t.group_by("term").aggregate([("term", "count"), ("tf", "sum")])
        return g.rename_columns(["term", "df_p", "cf_p"])

    from ray.data.aggregate import Sum as RSum

    return (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(RSum("df_p", alias_name="df"), RSum("cf_p", alias_name="cf"))
    )


def bigram_stats(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    """(gram, n) corpus bigram frequencies — adjacent token pairs within a
    document (the n-gram LM / decontamination building block). Same
    pre-aggregate-then-small-groupby shape as ``term_stats``: each batch
    ships (gram, partial count) rows, never raw token streams, so the
    shuffle is bounded by the batch's distinct-bigram count."""
    cfg = _cfg()

    def partial(batch: pa.Table) -> pa.Table:
        from colbert_ray.pipelines.phrase import _filtered_flat_tokens

        parents, flat = _filtered_flat_tokens(batch.column(text_col), cfg)
        n = len(parents)
        if n < 2:
            return pa.table({"gram": pa.array([], type=pa.string()),
                             "n_p": pa.array([], type=pa.int64())})
        same = parents[:-1] == parents[1:]
        left = flat.slice(0, n - 1).filter(pa.array(same))
        right = flat.slice(1, n - 1).filter(pa.array(same))
        grams = pc.binary_join_element_wise(left, right, " ")
        t = pa.table({"gram": grams})
        g = t.group_by("gram").aggregate([("gram", "count")])
        return g.rename_columns(["gram", "n_p"])

    return (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gram")
        .aggregate(Sum("n_p", alias_name="n"))
    )


def tfidf_topk(ds: "ray.data.Dataset", k: int = 5, text_col: str = "text",
               id_col: str = "doc_id",
               n_docs: int | None = None,
               subset_ids=None) -> "ray.data.Dataset":
    """Top-k TF-IDF keywords per document: (doc_id, term, tfidf, rank) with
    tfidf = tf * ln(n_docs / df) rounded to 6 decimals and rank ties broken
    by term (ascending) — the keyword-extraction building block.

    Scale shape: pass 1 is ``term_stats`` (pre-aggregated df per batch, one
    vocabulary-sized groupby); the df table is collected ONCE and broadcast
    via ``ray.put`` (vocabulary ≪ corpus — the same assumption as the
    engine's dictionary broadcast; above ~2M terms use the engine's
    distributed join path instead). Pass 2 streams the corpus: per-batch
    tokenize, vectorized df lookup (searchsorted into the broadcast sorted
    vocab), score, and per-doc top-k selection — no corpus-side shuffle.
    """
    import ray as _ray

    cfg = _cfg()
    if n_docs is None:
        n_docs = ds.count()
    df_tbl = term_stats(ds.select_columns([text_col]), text_col).to_pandas()
    df_tbl = df_tbl.sort_values("term").reset_index(drop=True)
    vocab = df_tbl["term"].to_numpy()
    idf = np.log(float(n_docs) / df_tbl["df"].to_numpy(dtype=np.float64))
    # subset_ids: statistics stay CORPUS-wide (df/idf from pass 1 above),
    # but pass 2 scores only the requested docs — the more-like-this seed
    # path, where keywords of a handful of docs are wanted
    sub = (np.sort(np.asarray(subset_ids, dtype=np.int64))
           if subset_ids is not None else None)
    ref = _ray.put((vocab, idf, sub))

    def score(batch: pa.Table) -> pa.Table:
        v, iv, sub_ids = _ray.get(ref)
        if sub_ids is not None:
            bi = batch.column(id_col).to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(np.isin(bi, sub_ids)))
        _, terms, tfs = doc_term_frequencies(batch.column(text_col), cfg)
        offs = terms.offsets.to_numpy(zero_copy_only=False)
        flat_t = terms.flatten().to_numpy(zero_copy_only=False)
        flat_tf = tfs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(flat_t)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if n == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "term": pa.array([], type=pa.string()),
                             "tfidf": pa.array([], type=pa.float64()),
                             "rank": pa.array([], type=pa.int64())})
        pos = np.searchsorted(v, flat_t)
        sc = np.round(flat_tf * iv[pos], 6)
        parents = np.repeat(np.arange(len(ids)), np.diff(offs))
        # per-doc rank on (tfidf DESC, term ASC): one lexsort + run-relative
        # rank (same pattern as sampling._smallest_n_per_group)
        order = np.lexsort((flat_t, -sc, parents))
        sp = parents[order]
        run_start = np.flatnonzero(np.concatenate([[True], sp[1:] != sp[:-1]]))
        rank = np.arange(n) - np.repeat(
            run_start, np.diff(np.concatenate([run_start, [n]])))
        keep = order[rank < k]
        keep = keep[np.argsort(keep, kind="stable")]
        krank = np.empty(n, dtype=np.int64)
        krank[order] = rank + 1
        return pa.table({
            id_col: pa.array(np.asarray(ids)[parents[keep]]),
            "term": pa.array(flat_t[keep].astype(str)),
            "tfidf": pa.array(sc[keep]),
            "rank": pa.array(krank[keep]),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(ds: "ray.data.Dataset", text_col: str = "text",
                   id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-doc quality features: token count, char count, stopword ratio,
    mean token length — the classic pre-training quality filters."""
    cfg = _cfg()
    stop = np.array(STOPWORDS, dtype=object)

    def fn(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch.column(text_col), cfg)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(toks.flatten()).to_numpy(zero_copy_only=False)
        keep = (lens >= cfg.min_token_len) & (lens <= cfg.max_token_len)
        parents, flat, lens = parents[keep], flat[keep], lens[keep]
        n = batch.num_rows
        n_tokens = np.bincount(parents, minlength=n).astype(np.int64)
        is_stop = np.isin(flat, stop)
        n_stop = np.bincount(parents[is_stop], minlength=n).astype(np.int64)
        tok_chars = np.bincount(parents, weights=lens, minlength=n)
        denom = np.maximum(1, n_tokens).astype(np.float64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(n_tokens),
                "n_chars": pc.utf8_length(batch.column(text_col)).cast(pa.int64()),
                "stopword_ratio": pa.array(n_stop / denom),
                "mean_token_len": pa.array(tok_chars / denom),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def lang_id(ds: "ray.data.Dataset", text_col: str = "text",
            id_col: str = "doc_id") -> "ray.data.Dataset":
    """Heuristic language ID by marker-word voting (stateful actor pool:
    marker tables built once per actor). Deterministic; rows-only check."""
    cfg = _cfg()

    class LangIdActor:
        def __init__(self):
            self.markers = {
                lang: np.array(sorted(words), dtype=object)
                for lang, words in _LANG_MARKERS.items()
            }
            self.langs = sorted(self.markers)

        def __call__(self, batch: pa.Table) -> pa.Table:
            toks = tokenize_column(batch.column(text_col), cfg)
            parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
            flat = toks.flatten().to_numpy(zero_copy_only=False)
            n = batch.num_rows
            votes = np.zeros((n, len(self.langs)), dtype=np.int64)
            for j, lang in enumerate(self.langs):
                hit = np.isin(flat, self.markers[lang])
                votes[:, j] = np.bincount(parents[hit], minlength=n)
            best = np.argmax(votes, axis=1)  # ties -> first lang alphabetically
            pred = np.array(self.langs, dtype=object)[best]
            pred[votes.max(axis=1) == 0] = "unknown"
            return pa.table(
                {id_col: batch.column(id_col),
                 "pred_lang": pa.array(list(pred), type=pa.string())}
            )

    return ds.map_batches(LangIdActor, batch_format="pyarrow", concurrency=2)


def fingerprints(ds: "ray.data.Dataset", text_col: str = "text",
                 id_col: str = "doc_id") -> "ray.data.Dataset":
    """64-bit rolling (polynomial) hash fingerprint of each document's token
    stream — deterministic content fingerprint (doc-level dedup key that is
    whitespace/punctuation-insensitive).

    fp(doc) = Σ_i fnv1a64(token_i) · B^(L-1-i)  (mod 2^64) — the Horner
    rolling hash evaluated as one vectorized polynomial: token hashes via
    FNV over dictionary uniques, per-doc combine via a single
    ``np.add.reduceat`` (uint64 wraparound IS the mod). SQL-oracle-exact."""
    from colbert_ray.functions.hashing import FNV_PRIME, fnv1a64_strings

    cfg = _cfg()
    B = FNV_PRIME

    def fn(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch.column(text_col), cfg)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        th = fnv1a64_strings(toks.flatten())
        n = batch.num_rows
        fp = np.zeros(n, dtype=np.uint64)
        total = len(th)
        if total:
            lens = np.diff(offsets)
            pos = np.arange(total) - np.repeat(offsets[:-1], lens)
            exp = np.repeat(lens, lens) - 1 - pos
            maxlen = int(lens.max())
            powers = np.empty(maxlen, dtype=np.uint64)
            powers[0] = 1
            if maxlen > 1:
                np.multiply.accumulate(
                    np.full(maxlen - 1, B, dtype=np.uint64), out=powers[1:])
            contrib = th * powers[exp]
            nonempty = lens > 0
            starts = offsets[:-1][nonempty]
            fp[nonempty] = np.add.reduceat(contrib, starts)
        return pa.table(
            {id_col: batch.column(id_col),
             "fingerprint": pa.array(fp.astype(np.int64))}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def repetition_stats(ds: "ray.data.Dataset", text_col: str = "text",
                     id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-doc repetition quality signals (the Gopher-style duplicate-n-gram
    filters used in pre-training data cleaning): fraction of duplicated
    words and duplicated word-2-grams.

        dup_word_frac  = 1 - distinct_words   / n_tokens     (0 when empty)
        dup_2gram_frac = 1 - distinct_bigrams / n_bigrams    (0 when <2 toks)

    Fully vectorized: one tokenize pass, per-doc distinct counts via one
    lexsort + change-point bincount over the whole batch; bigrams are the
    space-joined adjacent-token pairs (tokens never contain spaces, so the
    join is collision-free and matches the SQL twin exactly)."""
    cfg = _cfg()

    def _distinct_per_doc(parents: np.ndarray, values: np.ndarray,
                          n: int) -> np.ndarray:
        """count of distinct ``values`` within each parent (object dtype ok)."""
        if len(parents) == 0:
            return np.zeros(n, dtype=np.int64)
        order = np.lexsort((values, parents))
        p_s, v_s = parents[order], values[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (p_s[1:] != p_s[:-1]) | (v_s[1:] != v_s[:-1])
        return np.bincount(p_s[new], minlength=n).astype(np.int64)

    def fn(batch: pa.Table) -> pa.Table:
        from colbert_ray.functions.tokenizer import _flatten_tokens

        toks = tokenize_column(batch.column(text_col), cfg)
        # one shared filtered flatten (keeps this operator in lockstep with
        # the index tokenization and its SQL twin)
        parents, flat = _flatten_tokens(toks, cfg)
        parents = parents.astype(np.int64)
        n = batch.num_rows
        n_tokens = np.bincount(parents, minlength=n).astype(np.int64)
        d_words = _distinct_per_doc(parents, flat, n)
        # adjacent-in-doc pairs: positions i, i+1 with the same parent
        same = parents[:-1] == parents[1:] if len(parents) else \
            np.empty(0, dtype=bool)
        p2 = parents[:-1][same]
        bigrams = flat[:-1][same] + " "
        bigrams = bigrams + flat[1:][same]
        n_bi = np.bincount(p2, minlength=n).astype(np.int64)
        d_bi = _distinct_per_doc(p2, bigrams, n)
        w_den = np.maximum(1, n_tokens).astype(np.float64)
        b_den = np.maximum(1, n_bi).astype(np.float64)
        dup_w = np.where(n_tokens > 0, 1.0 - d_words / w_den, 0.0)
        dup_b = np.where(n_bi > 0, 1.0 - d_bi / b_den, 0.0)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(n_tokens),
            "dup_word_frac": pa.array(dup_w),
            "dup_2gram_frac": pa.array(dup_b),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def clean_corpus_stats(
    ds: "ray.data.Dataset",
    min_tokens: int = 10,
    max_stopword_ratio: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Composite TRAINING-DATA CLEANING pipeline in one stream:
    quality-filter (token count + stopword ratio) → exact dedup (keep the
    min-id representative of each distinct text) → corpus aggregate
    (survivors, distinct texts, total/avg tokens). The pre-training
    pipeline shape: every stage is the same map_batches/groupby machinery
    the standalone operators use, fused so filtered-out rows never reach
    the dedup shuffle."""
    import hashlib

    from ray.data.aggregate import Count, Mean, Sum

    cfg = _cfg()
    stop = np.array(STOPWORDS, dtype=object)

    def score_filter_hash(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch.column(text_col), cfg)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(toks.flatten()).to_numpy(zero_copy_only=False)
        keep_tok = (lens >= cfg.min_token_len) & (lens <= cfg.max_token_len)
        parents, flat = parents[keep_tok], flat[keep_tok]
        n = batch.num_rows
        n_tokens = np.bincount(parents, minlength=n).astype(np.int64)
        n_stop = np.bincount(parents[np.isin(flat, stop)],
                             minlength=n).astype(np.int64)
        denom = np.maximum(1, n_tokens).astype(np.float64)
        keep_doc = ((n_tokens >= min_tokens)
                    & (n_stop / denom < max_stopword_ratio))
        idx = np.flatnonzero(keep_doc)
        texts = batch.column(text_col).to_pylist()
        hi = np.empty(len(idx), dtype=np.int64)
        lo = np.empty(len(idx), dtype=np.int64)
        for j, i in enumerate(idx):
            d = hashlib.sha256(texts[int(i)].encode()).digest()
            hi[j] = int.from_bytes(d[:8], "little", signed=True)
            lo[j] = int.from_bytes(d[8:16], "little", signed=True)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[idx]
        return pa.table({
            id_col: pa.array(ids.astype(np.int64)),
            "n_tokens": pa.array(n_tokens[idx]),
            "h_hi": pa.array(hi), "h_lo": pa.array(lo),
        })

    import pandas as pd

    def first_by_id(g: pd.DataFrame) -> pd.DataFrame:
        r = g.loc[g[id_col].idxmin()]
        return pd.DataFrame({id_col: [int(r[id_col])],
                             "n_tokens": [int(r["n_tokens"])]})

    deduped = (
        ds.select_columns([id_col, text_col])
        .map_batches(score_filter_hash, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(["h_hi", "h_lo"])
        .map_groups(first_by_id, batch_format="pandas")
    )
    agg = deduped.aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="total_tokens"),
        Mean("n_tokens", alias_name="avg_tokens"),
    )
    return ray.data.from_items([agg])


def sql_stopword_list() -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def doclen_quantiles(ds: "ray.data.Dataset", text_col: str = "text",
                     qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99)) -> "pa.Table":
    """EXACT global token-length quantiles over the whole corpus — the
    length-filter calibration step of a cleaning pipeline — without a
    global sort: doc lengths live in a small integer value domain, so the
    corpus reduces to a (n_tokens, count) histogram (per-batch bincount
    partials, one tiny groupby), and the quantile is read off the cumsum.
    Shuffle volume is O(distinct lengths x n_blocks), independent of corpus
    size. Selection rule = SQL percentile_disc (sorted[ceil(q*n) - 1]),
    identical to ``user_value_quantiles``."""
    import math

    from ray.data.aggregate import Sum as RSum

    counted = token_counts(ds.select_columns([text_col, "doc_id"]), text_col)

    def hist(b: pa.Table) -> pa.Table:
        v = b.column("n_tokens").to_numpy(zero_copy_only=False)
        c = np.bincount(v)
        used = np.flatnonzero(c)
        return pa.table({"n_tokens": used.astype(np.int64),
                         "c_p": c[used].astype(np.int64)})

    h = (counted.map_batches(hist, batch_format="pyarrow",
                             zero_copy_batch=True)
         .groupby("n_tokens").aggregate(RSum("c_p", alias_name="c"))
         .to_pandas().sort_values("n_tokens").reset_index(drop=True))
    n = int(h["c"].sum())
    cum = h["c"].cumsum().to_numpy()
    vals = h["n_tokens"].to_numpy()
    cols = {"n_docs": pa.array([n], type=pa.int64())}
    for q in qs:
        k = max(1, math.ceil(q * n - 1e-9))          # 1-based target rank
        cols[f"p{round(q * 100)}"] = pa.array(
            [int(vals[np.searchsorted(cum, k)])], type=pa.int64())
    return pa.table(cols)


def unigram_nll(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id",
                keep_cols: tuple = ()) -> "ray.data.Dataset":
    """Per-document unigram-LM negative log-likelihood — the CCNet-style
    LM-quality signal (low = fluent/common vocabulary, high = rare/garbled):
    ``nll(doc) = -(1/|doc|) * sum_t tf_t * ln(cf_t / N)`` with the LM trained
    on the corpus itself. Emits ``(doc_id, n_tokens, nll)`` (round-6, empty
    docs dropped — they have no tokens to score).

    Scale shape: pass 1 is :func:`term_stats` (vocab-sized groupby — the
    dictionary-build pattern); the (term, ln p) table is broadcast ONCE via
    ``ray.put``; pass 2 streams the corpus through a stateless vectorized
    searchsorted + per-doc reduceat — no corpus shuffle. Summation per doc
    runs in ascending term order (``doc_term_frequencies`` is term-sorted),
    the repo's deterministic-order rule.
    """
    import ray as _ray

    cfg = _cfg()
    cf_tbl = term_stats(ds.select_columns([text_col]), text_col).to_pandas()
    if cf_tbl.empty:
        # all-empty corpus: groupby yields a column-less frame; every doc
        # is dropped by the dl>0 mask below anyway
        vocab, logp = np.array([], dtype=object), np.array([])
    else:
        cf_tbl = cf_tbl.sort_values("term").reset_index(drop=True)
        vocab = cf_tbl["term"].to_numpy()
        cf = cf_tbl["cf"].to_numpy(dtype=np.float64)
        logp = np.log(cf / cf.sum())
    ref = _ray.put((vocab, logp))

    def score(batch: pa.Table) -> pa.Table:
        v, lp = _ray.get(ref)
        dl, terms, tfs = doc_term_frequencies(batch.column(text_col), cfg)
        offs = terms.offsets.to_numpy(zero_copy_only=False)
        flat_t = terms.flatten().to_numpy(zero_copy_only=False)
        flat_tf = tfs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keep = dl > 0
        if not keep.any():
            cols = {id_col: pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "nll": pa.array([], type=pa.float64())}
            for c in keep_cols:
                cols[c] = batch.column(c).slice(0, 0)
            return pa.table(cols)
        pos = np.searchsorted(v, flat_t)
        tok_nll = flat_tf * -lp[pos]
        doc_nll = np.add.reduceat(tok_nll, offs[:-1][keep])
        # reduceat with equal consecutive offsets (empty docs) would copy the
        # next doc's first element — the keep mask removes those rows first
        cols = {
            id_col: pa.array(np.asarray(ids)[keep]),
            "n_tokens": pa.array(dl[keep].astype(np.int64)),
            "nll": pa.array(np.round(doc_nll / dl[keep], 6)),
        }
        keep_arrow = pa.array(keep)
        for c in keep_cols:
            cols[c] = batch.column(c).filter(keep_arrow)
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def top_terms_per_group(ds: "ray.data.Dataset", group_col: str = "lang",
                        k: int = 5,
                        text_col: str = "text") -> "pd.DataFrame":
    """Top-k terms by total occurrence count per group (e.g. language) —
    the grouped corpus-vocabulary profile. Per batch, counts pre-aggregate
    to (group, term, partial) rows (the term_stats combiner pattern with a
    group key); ONE groupby merges partials; the per-group top-k cut runs
    in map_groups. Ties break (count DESC, term ASC)."""
    import pandas as pd

    from colbert_ray.functions.tokenizer import doc_term_frequencies

    cfg = _cfg()

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        _, terms, tfs = doc_term_frequencies(batch.column(text_col), cfg)
        parents = pc.list_parent_indices(terms).to_numpy(zero_copy_only=False)
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        t = pa.table({
            group_col: pa.array(g[parents]),
            "term": terms.flatten(),
            "tf": tfs.flatten(),
        })
        agg = t.group_by([group_col, "term"]).aggregate([("tf", "sum")])
        return agg.rename_columns([group_col, "term", "cnt_p"])

    from ray.data.aggregate import Sum as RSum

    merged = (ds.select_columns([group_col, text_col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby([group_col, "term"])
              .aggregate(RSum("cnt_p", alias_name="cnt")))

    def topk(gr: "pd.DataFrame") -> "pd.DataFrame":
        gr = gr.sort_values(["cnt", "term"], ascending=[False, True]).head(k)
        gr = gr.reset_index(drop=True)
        gr["rank"] = np.arange(1, len(gr) + 1, dtype=np.int64)
        return gr

    out = (merged.groupby(group_col)
           .map_groups(topk, batch_format="pandas")
           .to_pandas()
           .sort_values([group_col, "rank"]).reset_index(drop=True))
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


def pmi_collocations(ds: "ray.data.Dataset", min_count: int = 3,
                     text_col: str = "text") -> "ray.data.Dataset":
    """Pointwise-mutual-information collocation scores for every bigram
    occurring >= ``min_count`` times: pmi = ln(p(x,y) / (p(x) p(y))) with
    p(x,y) = n_xy / NB (bigram positions) and p(x) = cf_x / NU (token
    occurrences). Output (gram, x, y, n, pmi_r) with pmi_r rounded to 6
    decimals (float policy; the multiply/divide composition order matches
    the SQL twin literally).

    Scale shape: bigram and unigram tables come from the existing
    pre-aggregate-then-small-groupby passes (`bigram_stats`/`term_stats`);
    the unigram cf map is vocab-bounded and broadcast once via ray.put;
    only bigrams surviving ``min_count`` are scored."""
    big = bigram_stats(ds, text_col).materialize()
    uni = term_stats(ds, text_col).select_columns(["term", "cf"]).to_pandas()
    nu = int(uni["cf"].sum())
    nb = int(big.sum("n") or 0)
    cf_map = dict(zip(uni["term"], uni["cf"].astype(np.int64)))
    ref = ray.put(cf_map)

    def score(batch: pa.Table) -> pa.Table:
        cf = ray.get(ref)
        grams = batch.column("gram").to_pylist()
        n = batch.column("n").to_numpy(
            zero_copy_only=False).astype(np.float64)
        xs, ys = [], []
        for g in grams:
            x, _, y = g.partition(" ")
            xs.append(x); ys.append(y)
        cx = np.array([cf[x] for x in xs], dtype=np.float64)
        cy = np.array([cf[y] for y in ys], dtype=np.float64)
        pmi = np.round(np.log(((n * nu) * nu) / ((float(nb) * cx) * cy)), 6)
        return pa.table({"gram": batch.column("gram"),
                         "x": pa.array(xs, type=pa.string()),
                         "y": pa.array(ys, type=pa.string()),
                         "n": batch.column("n"),
                         "pmi_r": pa.array(pmi, type=pa.float64())})

    return big.filter(expr=f"n >= {min_count}").map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)


def regex_match_stats(ds: "ray.data.Dataset", pattern: str,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> "ray.data.Dataset":
    """Grep-style corpus regex scan: (doc_id, n_matches) for documents with
    at least one NON-OVERLAPPING match of ``pattern`` (RE2 semantics —
    pyarrow's count_substring_regex and DuckDB's regexp_extract_all are
    both RE2, so counts agree by construction). Fully vectorized, one
    streaming pass, no shuffle."""

    def scan(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.cast(batch.column(text_col), pa.string()), pattern)
        n = pc.fill_null(n, 0)
        keep = pc.greater(n, 0)
        return pa.table({
            id_col: pc.filter(batch.column(id_col), keep),
            "n_matches": pc.cast(pc.filter(n, keep), pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True)


def bigram_nll(ds: "ray.data.Dataset", text_col: str = "text",
               id_col: str = "doc_id",
               add_k: float = 1.0) -> "ray.data.Dataset":
    """Per-document bigram-LM negative log-likelihood — the conditional
    upgrade of :func:`unigram_nll` (CCNet-style perplexity filtering,
    Wenzek et al. 2020, with an order-2 count model instead of KenLM):
    ``nll(doc) = -(1/(n-1)) * sum_i ln P(t_i | t_{i-1})`` with add-k
    smoothing ``P(b|a) = (c(a,b)+k) / (c(a,.)+k*V)`` trained on the corpus
    itself. Emits ``(doc_id, n_tokens, bigram_nll)`` (round-6); docs with
    fewer than two tokens have no bigrams and are dropped.

    Scale shape: pass 1 streams per-batch partial bigram counts into ONE
    groupby (the bigram type space is corpus-bounded, the dictionary-build
    pattern); context totals and V derive from the bounded tables on the
    driver; the (a NUL b -> ln p) model is broadcast ONCE via ``ray.put``
    (the KenLM-model-to-workers shape); pass 2 is a stateless vectorized
    searchsorted + per-doc reduceat — no corpus shuffle.
    """
    import ray as _ray

    cfg = _cfg()

    def big_partial(b: pa.Table) -> pa.Table:
        toks = tokenize_column(b.column(text_col), cfg)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        flat = toks.flatten()
        if len(flat) == 0:
            return pa.table({"pair": pa.array([], type=pa.string()),
                             "c_p": pa.array([], type=pa.int64())})
        valid = np.ones(max(0, len(flat) - 1), dtype=bool)
        bnd = offs[1:-1]
        valid[bnd[bnd >= 1] - 1] = False       # no cross-doc bigrams
        # (empty leading docs have boundary offset 0 — nothing to clear)
        sep = pa.array(["\x00"] * (len(flat) - 1), type=pa.string())
        pairs = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), sep)
        t = pa.table({"pair": pairs.filter(pa.array(valid))})
        g = t.group_by("pair").aggregate([("pair", "count")])
        return g.rename_columns(["pair", "c_p"])

    from ray.data.aggregate import Sum as _Sum

    big = (ds.map_batches(big_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("pair").aggregate(_Sum("c_p", alias_name="c"))
           .to_pandas())
    vocab_tbl = term_stats(ds.select_columns([text_col]),
                           text_col).to_pandas()
    n_vocab = len(vocab_tbl)
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "n_tokens": pa.array([], type=pa.int64()),
                      "bigram_nll": pa.array([], type=pa.float64())})
    if big.empty:
        return ray.data.from_arrow(empty)
    big = big.sort_values("pair").reset_index(drop=True)
    keys = big["pair"].to_numpy()
    c_ab = big["c"].to_numpy(dtype=np.float64)
    ctx_terms = np.array([p.split("\x00", 1)[0] for p in keys], dtype=object)
    uniq_ctx, inv = np.unique(ctx_terms, return_inverse=True)
    c_a = np.zeros(len(uniq_ctx))
    np.add.at(c_a, inv, c_ab)
    lnp = np.log((c_ab + add_k) / (c_a[inv] + add_k * n_vocab))
    ref = _ray.put((keys, lnp))

    def score(b: pa.Table) -> pa.Table:
        kk, lp = _ray.get(ref)
        toks = tokenize_column(b.column(text_col), cfg)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        flat = toks.flatten()
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        dl = np.diff(offs)
        keep = dl >= 2
        if not keep.any() or len(flat) < 2:
            return empty
        valid = np.ones(len(flat) - 1, dtype=bool)
        bnd = offs[1:-1]
        valid[bnd[bnd >= 1] - 1] = False
        sep = pa.array(["\x00"] * (len(flat) - 1), type=pa.string())
        pairs = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), sep)
        pv = pairs.filter(pa.array(valid)).to_numpy(zero_copy_only=False)
        tok_nll = -lp[np.searchsorted(kk, pv)]
        # per-doc bigram segment starts in bigram index space
        bstarts = (offs[:-1] - np.arange(len(dl)))[keep]
        doc_nll = np.add.reduceat(tok_nll, bstarts)
        return pa.table({
            id_col: pa.array(np.asarray(ids)[keep]),
            "n_tokens": pa.array(dl[keep].astype(np.int64)),
            "bigram_nll": pa.array(
                np.round(doc_nll / (dl[keep] - 1), 6)),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def oov_rate(ds: "ray.data.Dataset", vocab_size: int = 1000,
             text_col: str = "text",
             id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-document out-of-vocabulary rate under a TRUNCATED top-k
    vocabulary — the tokenizer-coverage signal an LLM pipeline checks
    before committing to a vocab size (docs with high OOV under the
    planned vocab are garbled or off-domain). Vocabulary = the
    ``vocab_size`` terms with highest corpus cf, ties broken term ASC (a
    deterministic total order, so the cut is twin-reproducible). Emits
    ``(doc_id, n_tokens, n_oov, oov_frac)`` (frac round-6; empty docs
    emit 0/0/0.0).

    Scale shape: pass 1 = :func:`term_stats` (vocab-bounded groupby);
    the truncated vocab is broadcast ONCE sorted; pass 2 is a stateless
    vectorized searchsorted membership test per batch — no corpus shuffle.
    """
    import ray as _ray

    cfg = _cfg()
    ts = term_stats(ds.select_columns([text_col]), text_col).to_pandas()
    if ts.empty:
        vocab = np.array([], dtype=object)
    else:
        ts = ts.sort_values(["cf", "term"],
                            ascending=[False, True]).head(vocab_size)
        vocab = np.sort(ts["term"].to_numpy())
    ref = _ray.put(vocab)

    def score(b: pa.Table) -> pa.Table:
        v = _ray.get(ref)
        dl, terms, tfs = doc_term_frequencies(b.column(text_col), cfg)
        offs = terms.offsets.to_numpy(zero_copy_only=False)
        offs = (offs - offs[0]).astype(np.int64)
        flat_t = terms.flatten().to_numpy(zero_copy_only=False)
        flat_tf = tfs.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(v) and len(flat_t):
            pos = np.clip(np.searchsorted(v, flat_t), 0, len(v) - 1)
            in_v = v[pos] == flat_t
        else:
            in_v = np.zeros(len(flat_t), dtype=bool)
        oov_tf = np.where(in_v, 0, flat_tf)
        if len(oov_tf):
            # clip: an EMPTY TRAILING doc has start offset == len(flat),
            # which reduceat rejects; the dl>0 mask zeroes those rows
            idx = np.minimum(offs[:-1], len(oov_tf) - 1)
            n_oov = np.add.reduceat(oov_tf, idx)
        else:
            n_oov = np.zeros(max(0, len(offs) - 1), dtype=np.int64)
        n_oov = np.where(dl > 0, n_oov, 0)     # reduceat copy on empty docs
        frac = np.divide(n_oov, dl, out=np.zeros(len(dl)), where=dl > 0)
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pa.array(dl.astype(np.int64)),
            "n_oov": pa.array(n_oov.astype(np.int64)),
            "oov_frac": pa.array(np.round(frac, 6)),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def char_entropy(ds: "ray.data.Dataset", text_col: str = "text",
                 id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-document Shannon character entropy (nats) — the classic
    low-entropy junk filter (repeated-char runs, binary-ish blobs score
    near 0; natural text ~3). Emits ``(doc_id, n_chars, entropy)``
    (round-6; empty docs emit entropy 0.0).

    Vectorized: ONE bincount over (row_index * 256 + byte) per batch — no
    per-row loop. Byte-level (documents are ASCII; multi-byte UTF-8 would
    count bytes, the usual approximation)."""

    def score(b: pa.Table) -> pa.Table:
        texts = b.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.cast(texts, pa.large_string())
        bufs = texts.buffers()
        off = np.frombuffer(bufs[1], dtype=np.int64)[
            texts.offset: texts.offset + len(texts) + 1]
        data = np.frombuffer(bufs[2], dtype=np.uint8) \
            if bufs[2] is not None else np.empty(0, dtype=np.uint8)
        n = len(texts)
        lens = np.diff(off)
        if data[off[0]:off[-1]].size:
            row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
            key = row_of * 256 + data[off[0]:off[-1]].astype(np.int64)
            hist = np.bincount(key, minlength=n * 256).reshape(n, 256)
            with np.errstate(divide="ignore", invalid="ignore"):
                p = hist / np.maximum(lens, 1)[:, None]
                ent = -np.where(p > 0, p * np.log(p), 0.0).sum(axis=1)
        else:
            ent = np.zeros(n)
        return pa.table({
            id_col: b.column(id_col),
            "n_chars": pa.array(lens.astype(np.int64)),
            "entropy": pa.array(np.round(ent, 6)),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def group_kl_divergence(ds: "ray.data.Dataset", group_col: str = "lang",
                        text_col: str = "text") -> pa.Table:
    """KL(P_group || P_corpus) over unigram term distributions — the
    domain-shift / language-balance signal a mixture-weighting pipeline
    reads before setting sampling temperatures (groups far from the
    corpus mean are over- or under-represented). Emits
    ``(group, n_terms, n_tokens, kl)`` (round-6), one row per group.

    Scale shape: per-batch (group, term, partial cf) rows -> ONE
    groups x vocab bounded groupby; the KL fold runs vectorized on the
    driver over that bounded table (P_corpus = the groups' pooled counts,
    so q > 0 wherever p > 0 and the divergence is always finite)."""
    cfg = _cfg()

    def partial(b: pa.Table) -> pa.Table:
        groups = b.column(group_col).to_numpy(zero_copy_only=False)
        _, terms, tfs = doc_term_frequencies(b.column(text_col), cfg)
        offs = terms.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        parents = np.repeat(np.arange(len(groups)), np.diff(offs))
        t = pa.table({
            group_col: pa.array(groups[parents]),
            "term": terms.flatten(),
            "tf": tfs.flatten(),
        })
        g = t.group_by([group_col, "term"]).aggregate([("tf", "sum")])
        return g.rename_columns([group_col, "term", "c_p"])

    from ray.data.aggregate import Sum as _Sum

    lt = (ds.select_columns([group_col, text_col])
          .map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
          .groupby([group_col, "term"])
          .aggregate(_Sum("c_p", alias_name="c"))
          .to_pandas())
    if lt.empty:
        return pa.table({group_col: pa.array([], type=pa.string()),
                         "n_terms": pa.array([], type=pa.int64()),
                         "n_tokens": pa.array([], type=pa.int64()),
                         "kl": pa.array([], type=pa.float64())})
    c = lt["c"].to_numpy(dtype=np.float64)
    terms = lt["term"].to_numpy()
    grp = lt[group_col].to_numpy()
    total = c.sum()
    uniq_t, t_inv = np.unique(terms, return_inverse=True)
    corpus_c = np.zeros(len(uniq_t))
    np.add.at(corpus_c, t_inv, c)
    uniq_g, g_inv = np.unique(grp, return_inverse=True)
    g_tot = np.zeros(len(uniq_g))
    np.add.at(g_tot, g_inv, c)
    p = c / g_tot[g_inv]
    q = corpus_c[t_inv] / total
    contrib = p * np.log(p / q)
    kl = np.zeros(len(uniq_g))
    np.add.at(kl, g_inv, contrib)
    n_terms = np.bincount(g_inv, minlength=len(uniq_g))
    return pa.table({
        group_col: pa.array([str(x) for x in uniq_g], type=pa.string()),
        "n_terms": pa.array(n_terms.astype(np.int64)),
        "n_tokens": pa.array(g_tot.astype(np.int64)),
        "kl": pa.array(np.round(kl, 6)),
    })


def quality_percentile_rank(ds: "ray.data.Dataset",
                            text_col: str = "text",
                            id_col: str = "doc_id") -> "ray.data.Dataset":
    """Global percentile rank of every document's unigram-LM quality score
    — the corpus-wide normalization a threshold-free quality cut uses
    ("drop the worst 10%" instead of an absolute nll bound). Emits
    ``(doc_id, nll, rank, pct)``: rank = dense 0-based position under
    (nll ASC, doc_id ASC) — fluent docs first — and
    ``pct = round(rank / (n - 1), 6)`` (0.0 when n == 1).

    Scale shape: the score pass is :func:`unigram_nll` (broadcast model,
    no shuffle); the EXACT global rank reuses the engine's distributed
    sort-rank (`stages/docids.sorted_rank_dataset` — range-partitioned
    sample sort above the driver threshold), the same machinery that
    assigns docids and term_ids. Keys (nll, doc_id) are unique, so ranks
    are deterministic at any parallelism."""
    from colbert_ray.stages.docids import sorted_rank_dataset

    scored = unigram_nll(ds.select_columns([id_col, text_col]),
                         text_col=text_col, id_col=id_col) \
        .select_columns([id_col, "nll"])
    ranked = sorted_rank_dataset(scored, ["nll", id_col], "rank")
    n = ranked.count()

    def pct(b: pa.Table) -> pa.Table:
        r = b.column("rank").to_numpy(zero_copy_only=False)
        p = r / (n - 1) if n > 1 else np.zeros(len(r))
        return b.append_column("pct", pa.array(np.round(p, 6)))

    return ranked.map_batches(pct, batch_format="pyarrow",
                              zero_copy_batch=True)
