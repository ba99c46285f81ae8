"""Exact phrase search: conjunctive index candidates + positional verify.

The reference engine is bag-of-words — its phrase-like needs are covered by
neural token matching (``colbert/modeling/colbert.py:60-93``); a lexical
engine needs explicit phrase support. This module adds the classic
two-stage lexical phrase pipeline on top of the SAME inverted index (no
index-layout change, so the rankings-sha invariant is untouched):

1. **Candidate generation** (driver-side, O(sum df of phrase terms)):
   conjunctive docid intersection over the phrase's unique terms, smallest
   document frequency first, via the mmap'd postings — only the probed
   terms' slices page in. Any document containing the phrase contains all
   its terms, so the candidate set is an exact superset.
2. **Positional verify** (streaming ``map_batches``): re-tokenize ONLY the
   candidate rows of the corpus (broadcast docid set, pruned at the batch
   filter) and count exact adjacent occurrences, fully vectorized over the
   flattened token buffer. Per-batch partial top-k + tiny driver merge —
   the corpus never materializes.

At 100-TB scale stage 2 touches candidate rows only; storing positions
index-side is deliberately avoided (positions triple posting bytes and
would change the shared layout). Occurrence counting matches the SQL twin
(`sql_phrase_search`): every start offset ``i`` with
``toks[i..i+m-1] == phrase`` counts, overlaps included.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from colbert_ray.config import EngineConfig
from colbert_ray.functions.tokenizer import sql_tokenize_expr, tokenize_column


def phrase_tokens(phrase: str, cfg: EngineConfig) -> list[str]:
    """Phrase string -> ORDERED token list under the corpus tokenization
    (duplicates kept; length bounds applied — same filter as indexing)."""
    toks = tokenize_column(pa.array([phrase]), cfg)
    flat = toks.flatten()
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = (lens >= cfg.min_token_len) & (lens <= cfg.max_token_len)
    return [t for t, k in zip(flat.to_pylist(), keep) if k]


def _filtered_flat_tokens(texts: pa.ChunkedArray | pa.Array, cfg: EngineConfig):
    """Batch of texts -> (parents int64, flat StringArray) with the indexing
    length filter applied and per-doc token ORDER preserved (unlike
    ``doc_term_frequencies``, which aggregates to sorted (term, tf))."""
    toks = tokenize_column(texts, cfg)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = (lens >= cfg.min_token_len) & (lens <= cfg.max_token_len)
    if not keep.all():
        keep_idx = np.flatnonzero(keep)
        parents = parents[keep_idx]
        flat = flat.take(pa.array(keep_idx))
    return parents.astype(np.int64), flat


def count_phrase_occurrences(
    texts: pa.ChunkedArray | pa.Array, words: list[str], cfg: EngineConfig
) -> np.ndarray:
    """int64[n_rows] — number of exact phrase occurrences per text.

    Vectorized: per phrase word one Arrow ``equal`` scan over the flattened
    token buffer, then shifted ANDs; a start at flat position ``p`` is a hit
    iff all m words match consecutively AND position ``p+m-1`` still belongs
    to the same document (token order inside a doc is the filtered original
    order, so document boundaries are the only adjacency breaks)."""
    n_rows = len(texts)
    out = np.zeros(n_rows, dtype=np.int64)
    m = len(words)
    if m == 0:
        return out
    parents, flat = _filtered_flat_tokens(texts, cfg)
    n = len(parents)
    if n < m:
        return out
    valid = pc.equal(flat, words[0]).to_numpy(zero_copy_only=False)[: n - m + 1].copy()
    for j in range(1, m):
        ej = pc.equal(flat, words[j]).to_numpy(zero_copy_only=False)
        valid &= ej[j: j + n - m + 1]
    valid &= parents[: n - m + 1] == parents[m - 1:]
    hits = parents[: n - m + 1][valid]
    if len(hits):
        out += np.bincount(hits, minlength=n_rows)[:n_rows]
    return out


def conjunctive_candidates(idx, words: list[str]) -> np.ndarray:
    """Sorted docids containing ALL the words (bag semantics; exact).

    Intersects posting docid slices smallest-df-first so the working set
    shrinks monotonically; live tombstones are excluded. Returns empty when
    any word is out-of-vocabulary."""
    uniq = sorted(set(words))
    if not uniq:
        return np.empty(0, dtype=np.int64)
    tids = idx.lookup_terms(uniq)
    if len(tids) < len(uniq):                       # some term OOV
        return np.empty(0, dtype=np.int64)
    dfs = idx.posting_offsets[tids + 1] - idx.posting_offsets[tids]
    cand = None
    for tid in tids[np.argsort(dfs, kind="stable")]:
        s, e = idx.posting_offsets[tid], idx.posting_offsets[tid + 1]
        d = np.asarray(idx.posting_docids[s:e])
        if cand is None:
            cand = d
        else:
            pos = np.searchsorted(d, cand)
            pos_c = np.clip(pos, 0, max(0, len(d) - 1))
            cand = cand[(len(d) > 0) & (d[pos_c] == cand)]
        if len(cand) == 0:
            return np.empty(0, dtype=np.int64)
    if len(idx.tombstones):
        pos = np.searchsorted(idx.tombstones, cand)
        pos_c = np.clip(pos, 0, len(idx.tombstones) - 1)
        cand = cand[idx.tombstones[pos_c] != cand]
    return np.ascontiguousarray(cand, dtype=np.int64)


def _topk_occ(batch: pa.Table, k: int) -> pa.Table:
    """Keep a batch's k best (n_occ DESC, doc_id ASC) rows."""
    occ = batch.column("n_occ").to_numpy(zero_copy_only=False)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -occ))[:k]
    return pa.table({"doc_id": pa.array(ids[order], type=pa.int64()),
                     "n_occ": pa.array(occ[order], type=pa.int64())})


def phrase_scan(
    corpus: "ray.data.Dataset",
    phrase: str,
    cfg: EngineConfig | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Index-free full-corpus phrase scan -> Dataset(doc_id, n_occ), matches
    only (n_occ >= 1). The equivalence baseline for ``phrase_search`` and
    the fallback when no index exists."""
    cfg = cfg or EngineConfig()
    words = phrase_tokens(phrase, cfg)

    def scan(batch: pa.Table) -> pa.Table:
        occ = (count_phrase_occurrences(batch.column(text_col), words, cfg)
               if words else np.zeros(batch.num_rows, dtype=np.int64))
        hit = occ >= 1
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[hit]
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "n_occ": pa.array(occ[hit], type=pa.int64())})

    return corpus.select_columns([id_col, text_col]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True)


def phrase_search(
    index_dir: str,
    corpus: "ray.data.Dataset",
    phrase: str,
    k: int = 10,
    cfg: EngineConfig | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Top-k (doc_id, n_occ) documents containing the exact phrase, ranked
    by (-n_occ, doc_id). Candidates come from the inverted index; only
    candidate rows are re-tokenized. Exact: equals ``phrase_scan`` + top-k
    (asserted by the equivalence test)."""
    import ray

    from colbert_ray.state.decoded import DecodedIndex

    cfg = cfg or EngineConfig()
    words = phrase_tokens(phrase, cfg)
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "n_occ": pa.array([], type=pa.int64())})
    if not words:
        return empty
    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    cand = conjunctive_candidates(idx, words)
    if len(cand) == 0:
        return empty
    cand_ref = ray.put(cand)                     # broadcast once, not per batch

    def verify(batch: pa.Table) -> pa.Table:
        allowed = ray.get(cand_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(allowed, ids)
        pos_c = np.clip(pos, 0, len(allowed) - 1)
        keep = allowed[pos_c] == ids
        if not keep.any():
            return empty
        sub = batch.filter(pa.array(keep))
        occ = count_phrase_occurrences(sub.column(text_col), words, cfg)
        hit = occ >= 1
        sub_ids = sub.column(id_col).to_numpy(zero_copy_only=False)[hit]
        out = pa.table({"doc_id": pa.array(sub_ids.astype(np.int64)),
                        "n_occ": pa.array(occ[hit], type=pa.int64())})
        return _topk_occ(out, k)                 # per-batch partial top-k

    partials = corpus.select_columns([id_col, text_col]).map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True).take_all()
    if not partials:
        return empty
    merged = pa.Table.from_pylist(partials, schema=empty.schema)
    return _topk_occ(merged, k)


def sql_phrase_search(
    table: str, phrase: str, k: int,
    cfg: EngineConfig | None = None,
    *,
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``phrase_search``: same tokenization
    (``sql_tokenize_expr``), same start-offset occurrence count (overlaps
    included), same (-n_occ, doc_id) top-k order."""
    cfg = cfg or EngineConfig()
    words = phrase_tokens(phrase, cfg)
    if not words:
        return f"SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n_occ WHERE false"
    m = len(words)
    conds = " AND ".join(
        f"toks[i + {j}] = '{w}'" for j, w in enumerate(words))
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {sql_tokenize_expr(text_col, cfg)} AS toks
  FROM {table}
),
p AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - {m - 1})) AS i
  FROM d WHERE len(toks) >= {m}
),
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n_occ FROM p
  WHERE {conds}
  GROUP BY doc_id
)
SELECT doc_id, n_occ FROM hits
ORDER BY n_occ DESC, doc_id
LIMIT {k}
"""


def sql_conjunctive_docs(
    table: str, words: list[str],
    cfg: EngineConfig | None = None,
    *,
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``conjunctive_candidates`` (boolean AND over terms)."""
    cfg = cfg or EngineConfig()
    uniq = sorted(set(words))
    lits = ", ".join(f"'{w}'" for w in uniq)
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {sql_tokenize_expr(text_col, cfg)} AS toks
  FROM {table}
),
t AS (SELECT doc_id, unnest(toks) AS term FROM d)
SELECT doc_id FROM t
WHERE term IN ({lits})
GROUP BY doc_id
HAVING count(DISTINCT term) = {len(uniq)}
ORDER BY doc_id
"""


def min_token_span(positions_by_word: list[np.ndarray]) -> int:
    """Smallest window [lo, hi] (inclusive, 1-based or any consistent
    base) covering >=1 occurrence of EVERY word; returns hi-lo+1.
    Classic two-pointer sweep over the merged (pos, word) event list —
    O(total occurrences), exact integers."""
    events = np.concatenate(positions_by_word)
    labels = np.concatenate([
        np.full(len(p), w, dtype=np.int64)
        for w, p in enumerate(positions_by_word)])
    order = np.argsort(events, kind="stable")
    events, labels = events[order], labels[order]
    need = len(positions_by_word)
    counts = np.zeros(need, dtype=np.int64)
    have = 0
    best = np.iinfo(np.int64).max
    lo = 0
    for hi in range(len(events)):
        w = labels[hi]
        counts[w] += 1
        if counts[w] == 1:
            have += 1
        while have == need:
            best = min(best, int(events[hi] - events[lo] + 1))
            wl = labels[lo]
            counts[wl] -= 1
            if counts[wl] == 0:
                have -= 1
            lo += 1
    return int(best)


def proximity_search(
    index_dir: str,
    corpus: "ray.data.Dataset",
    query: str,
    k: int = 10,
    cfg: EngineConfig | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Proximity ranking: docs containing ALL query words, ranked by the
    smallest token window covering every word — (span ASC, doc_id ASC),
    integer-exact. Same two-stage shape as phrase_search: conjunctive
    candidates from the inverted index (only the probed terms' posting
    slices page in), then a verify pass that re-tokenizes ONLY candidate
    rows (broadcast docid set) and runs the two-pointer span sweep per
    candidate. Per-batch partial top-k keeps the exchange bounded."""
    import ray

    from colbert_ray.state.decoded import DecodedIndex

    cfg = cfg or EngineConfig()
    words = sorted(set(phrase_tokens(query, cfg)))
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "span": pa.array([], type=pa.int64())})
    if not words:
        return empty
    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    cand = conjunctive_candidates(idx, words)
    if len(cand) == 0:
        return empty
    cand_ref = ray.put(cand)

    def _topk_span(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(t, sort_keys=[("span", "ascending"),
                                              ("doc_id", "ascending")])
        return t.take(order[:k])

    def verify(batch: pa.Table) -> pa.Table:
        allowed = ray.get(cand_ref)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(allowed, ids)
        pos_c = np.clip(pos, 0, len(allowed) - 1)
        keep = allowed[pos_c] == ids
        if not keep.any():
            return empty
        sub = batch.filter(pa.array(keep))
        parents, flat = _filtered_flat_tokens(sub.column(text_col), cfg)
        tokens = flat.to_numpy(zero_copy_only=False)   # object[str]
        sub_ids = sub.column(id_col).to_numpy(zero_copy_only=False)
        row_start = np.searchsorted(parents, np.arange(sub.num_rows))
        row_end = np.searchsorted(parents, np.arange(sub.num_rows),
                                  side="right")
        out_id, out_span = [], []
        for row in range(sub.num_rows):
            tk = tokens[row_start[row]:row_end[row]]
            pos_by_word = []
            ok = True
            for w in words:
                p = np.flatnonzero(tk == w)
                if len(p) == 0:       # tokenizer drift guard; cand says all
                    ok = False
                    break
                pos_by_word.append(p)
            if not ok:
                continue
            out_id.append(int(sub_ids[row]))
            out_span.append(min_token_span(pos_by_word))
        return _topk_span(pa.table({
            "doc_id": pa.array(out_id, type=pa.int64()),
            "span": pa.array(out_span, type=pa.int64())}))

    partials = corpus.select_columns([id_col, text_col]).map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True).take_all()
    if not partials:
        return empty
    return _topk_span(pa.Table.from_pylist(partials, schema=empty.schema))


def prefix_search(index_dir: str, prefix: str) -> pa.Table:
    """Wildcard (prefix) term expansion over the BUILT index: every
    dictionary term starting with ``prefix`` (one binary-search pair over
    the sorted mmap'd dictionary — only the matched range pages in), then a
    vectorized per-doc rollup over ONLY those terms' posting slices.

    Returns (doc_id, n_terms = distinct matched terms in the doc,
    sum_tf = their total term frequency), ordered by doc_id. Live
    tombstones are excluded, mirroring ``conjunctive_candidates``.

    Driver-side O(sum df over matched terms) — the same probe-path budget
    as conjunctive candidate generation; the corpus itself is never read.
    (Reference capability: dictionary/vocab lookup, indexing/codecs
    ``residual_codec.py`` analog is the mmap'd dictionary here.)
    """
    from colbert_ray.state.decoded import DecodedIndex

    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "n_terms": pa.array([], type=pa.int64()),
                      "sum_tf": pa.array([], type=pa.int64())})
    if not prefix or not len(idx.dict_terms):
        return empty
    lo = np.searchsorted(idx.dict_terms, prefix)
    # tokens are [a-z0-9]+ (tokenizer filter), so U+FFFF is a safe upper fence
    hi = np.searchsorted(idx.dict_terms, prefix + "\uffff")
    if hi <= lo:
        return empty
    return _rollup_term_ids(idx, idx.dict_term_ids[lo:hi])


def infix_search(index_dir: str, needle: str) -> pa.Table:
    """Infix (``*needle*``) term expansion over the BUILT index: dictionary
    terms CONTAINING ``needle`` (one vectorized Arrow substring scan over
    the vocab — the dictionary is vocab-bounded, orders of magnitude smaller
    than the corpus, so the scan is the honest cost; a trigram-over-vocab
    side index would be the next step if vocabularies grew to billions),
    then the same per-doc posting rollup as ``prefix_search``."""
    import pyarrow.compute as pc

    from colbert_ray.state.decoded import DecodedIndex

    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    if not needle or not len(idx.dict_terms):
        return _rollup_term_ids(idx, np.empty(0, dtype=np.int64))
    hit = pc.match_substring(
        pa.array(idx.dict_terms, type=pa.string()), needle
    ).to_numpy(zero_copy_only=False)
    return _rollup_term_ids(idx, idx.dict_term_ids[np.flatnonzero(hit)])


def _rollup_term_ids(idx, tids: np.ndarray) -> pa.Table:
    """Shared posting rollup: (doc_id, n_terms, sum_tf) over the given
    term ids, tombstone-aware, ordered by doc_id."""
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "n_terms": pa.array([], type=pa.int64()),
                      "sum_tf": pa.array([], type=pa.int64())})
    if not len(tids):
        return empty
    doc_parts, tf_parts = [], []
    for tid in tids:
        s, e = idx.posting_offsets[tid], idx.posting_offsets[tid + 1]
        doc_parts.append(np.asarray(idx.posting_docids[s:e]))
        tf_parts.append(np.asarray(idx.posting_tfs[s:e], dtype=np.int64))
    docs = np.concatenate(doc_parts)
    tfs = np.concatenate(tf_parts)
    if len(idx.tombstones):
        pos = np.searchsorted(idx.tombstones, docs)
        pos_c = np.clip(pos, 0, len(idx.tombstones) - 1)
        keep = idx.tombstones[pos_c] != docs
        docs, tfs = docs[keep], tfs[keep]
    if not len(docs):
        return empty
    order = np.argsort(docs, kind="stable")
    docs, tfs = docs[order], tfs[order]
    starts = np.flatnonzero(np.r_[True, docs[1:] != docs[:-1]])
    bounds = np.r_[starts, len(docs)]
    return pa.table({
        "doc_id": pa.array(docs[starts], type=pa.int64()),
        "n_terms": pa.array(np.diff(bounds), type=pa.int64()),
        "sum_tf": pa.array(np.add.reduceat(tfs, starts), type=pa.int64()),
    })


def sql_prefix_search(table: str, prefix: str,
                      cfg: EngineConfig | None = None, *,
                      text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of ``prefix_search`` — per-doc distinct-term count and
    total tf over terms LIKE 'prefix%'."""
    cfg = cfg or EngineConfig()
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {sql_tokenize_expr(text_col, cfg)} AS toks
  FROM {table}
),
t AS (SELECT doc_id, unnest(toks) AS term FROM d),
m AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM t
      WHERE term LIKE '{prefix}%' GROUP BY doc_id, term)
SELECT doc_id, count(*)::BIGINT AS n_terms, sum(tf)::BIGINT AS sum_tf
FROM m GROUP BY doc_id ORDER BY doc_id
"""


def sql_infix_search(table: str, needle: str,
                     cfg: EngineConfig | None = None, *,
                     text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of ``infix_search`` — per-doc rollup over terms
    containing the needle (contains() = plain substring, no wildcards)."""
    cfg = cfg or EngineConfig()
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {sql_tokenize_expr(text_col, cfg)} AS toks
  FROM {table}
),
t AS (SELECT doc_id, unnest(toks) AS term FROM d),
m AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM t
      WHERE contains(term, '{needle}') GROUP BY doc_id, term)
SELECT doc_id, count(*)::BIGINT AS n_terms, sum(tf)::BIGINT AS sum_tf
FROM m GROUP BY doc_id ORDER BY doc_id
"""


def _reversed_dict(idx) -> tuple[np.ndarray, np.ndarray]:
    """(reversed_terms_sorted, perm) over the index dictionary, built ONCE
    per loaded index and cached on the instance (same lifetime as the
    ``load_cached`` entry, so one O(V log V) sort per actor process, vocab-
    bounded — the classic Lucene ``ReversedWildcardFilter`` trick that turns
    a ``*suffix`` scan into a binary search). ``perm`` maps positions in the
    reversed-sorted order back to positions in the forward-sorted
    ``dict_terms`` / ``dict_term_ids`` arrays."""
    cached = getattr(idx, "_rev_dict_cache", None)
    # rebuilt if the dictionary grew (IndexUpdater adds terms in place)
    if cached is None or len(cached[1]) != len(idx.dict_terms):
        rev = pc.utf8_reverse(
            pa.array(idx.dict_terms, type=pa.string())
        ).to_numpy(zero_copy_only=False)
        perm = np.argsort(rev, kind="stable")
        cached = (rev[perm], perm)
        idx._rev_dict_cache = cached
    return cached


def suffix_search(index_dir: str, suffix: str) -> pa.Table:
    """Suffix wildcard (``*suffix``) term expansion over the BUILT index.

    Index-native (NOT a vocab scan): terms are matched by binary-searching
    a reversed-sorted copy of the dictionary for ``reversed(suffix)`` as a
    prefix — only the matched range is touched, mirroring ``prefix_search``.
    The reversed permutation is built lazily once per actor (vocab-bounded,
    cached on the DecodedIndex). Returns the same (doc_id, n_terms, sum_tf)
    rollup as the other wildcard searches, tombstone-aware, doc_id order.
    """
    from colbert_ray.state.decoded import DecodedIndex

    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "n_terms": pa.array([], type=pa.int64()),
                      "sum_tf": pa.array([], type=pa.int64())})
    if not suffix or not len(idx.dict_terms):
        return empty
    rev_sorted, perm = _reversed_dict(idx)
    key = suffix[::-1]
    lo = np.searchsorted(rev_sorted, key)
    hi = np.searchsorted(rev_sorted, key + "\uffff")
    if hi <= lo:
        return empty
    return _rollup_term_ids(idx, idx.dict_term_ids[perm[lo:hi]])


def wildcard_search(index_dir: str, prefix: str, suffix: str) -> pa.Table:
    """Combined wildcard (``prefix*suffix``, SQL ``LIKE 'prefix%suffix'``)
    over the BUILT index: intersection of the prefix binary-search range
    (forward dictionary) and the suffix binary-search range (reversed
    dictionary), plus the non-overlap length constraint
    ``len(term) >= len(prefix) + len(suffix)`` — exactly LIKE semantics.
    Both ranges are O(log V) probes; the intersection runs over dictionary
    POSITIONS (two small sorted int sets), never the postings, and only the
    surviving terms' posting slices page in for the rollup."""
    from colbert_ray.state.decoded import DecodedIndex

    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "n_terms": pa.array([], type=pa.int64()),
                      "sum_tf": pa.array([], type=pa.int64())})
    if not prefix or not suffix or not len(idx.dict_terms):
        return empty
    p_lo = np.searchsorted(idx.dict_terms, prefix)
    p_hi = np.searchsorted(idx.dict_terms, prefix + "\uffff")
    rev_sorted, perm = _reversed_dict(idx)
    key = suffix[::-1]
    s_lo = np.searchsorted(rev_sorted, key)
    s_hi = np.searchsorted(rev_sorted, key + "\uffff")
    if p_hi <= p_lo or s_hi <= s_lo:
        return empty
    pos = np.intersect1d(np.arange(p_lo, p_hi), perm[s_lo:s_hi],
                         assume_unique=True)
    if not len(pos):
        return empty
    lens = pc.utf8_length(
        pa.array(idx.dict_terms[pos], type=pa.string())
    ).to_numpy(zero_copy_only=False)
    pos = pos[lens >= len(prefix) + len(suffix)]
    if not len(pos):
        return empty
    return _rollup_term_ids(idx, idx.dict_term_ids[pos])


def sql_suffix_search(table: str, suffix: str,
                      cfg: EngineConfig | None = None, *,
                      text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of ``suffix_search`` — rollup over terms LIKE '%suffix'."""
    cfg = cfg or EngineConfig()
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {sql_tokenize_expr(text_col, cfg)} AS toks
  FROM {table}
),
t AS (SELECT doc_id, unnest(toks) AS term FROM d),
m AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM t
      WHERE term LIKE '%{suffix}' GROUP BY doc_id, term)
SELECT doc_id, count(*)::BIGINT AS n_terms, sum(tf)::BIGINT AS sum_tf
FROM m GROUP BY doc_id ORDER BY doc_id
"""


def sql_wildcard_search(table: str, prefix: str, suffix: str,
                        cfg: EngineConfig | None = None, *,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB twin of ``wildcard_search`` — rollup over terms LIKE
    'prefix%suffix' (LIKE's ``%`` may match empty but never overlaps the
    anchors, which is exactly the engine's length constraint)."""
    cfg = cfg or EngineConfig()
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {sql_tokenize_expr(text_col, cfg)} AS toks
  FROM {table}
),
t AS (SELECT doc_id, unnest(toks) AS term FROM d),
m AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM t
      WHERE term LIKE '{prefix}%{suffix}' GROUP BY doc_id, term)
SELECT doc_id, count(*)::BIGINT AS n_terms, sum(tf)::BIGINT AS sum_tf
FROM m GROUP BY doc_id ORDER BY doc_id
"""


def disjunctive_docs(index_dir: str, or_terms: list[str],
                     not_terms: list[str] | None = None,
                     min_should_match: int = 1) -> pa.Table:
    """Boolean OR / NOT query over the BUILT index: documents matching at
    least ``min_should_match`` distinct terms from ``or_terms`` and NONE of
    ``not_terms``. Complements ``conjunctive_candidates`` (the AND path).

    Shape: one posting rollup over the OR terms (same probe-path budget as
    any candidate generation — O(sum df), only probed slices page in), a
    vectorized count filter, then a sorted-array exclusion built from the
    NOT terms' posting docids. OOV OR-terms contribute nothing; OOV NOT
    terms exclude nothing. Returns (doc_id, n_match) in doc_id order.
    (Reference capability: candidate generation / filtering,
    ``colbert/search/index_storage.py:72-96`` analog.)"""
    from colbert_ray.state.decoded import DecodedIndex

    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "n_match": pa.array([], type=pa.int64())})
    uniq_or = sorted(set(or_terms))
    if not uniq_or:
        return empty
    roll = _rollup_term_ids(idx, idx.lookup_terms(uniq_or))
    if roll.num_rows == 0:
        return empty
    docs = roll.column("doc_id").to_numpy(zero_copy_only=False)
    n_match = roll.column("n_terms").to_numpy(zero_copy_only=False)
    keep = n_match >= int(min_should_match)
    docs, n_match = docs[keep], n_match[keep]
    uniq_not = sorted(set(not_terms or ()))
    if len(docs) and uniq_not:
        not_tids = idx.lookup_terms(uniq_not)
        excl_parts = [
            np.asarray(idx.posting_docids[
                idx.posting_offsets[t]:idx.posting_offsets[t + 1]])
            for t in not_tids]
        if excl_parts:
            excl = np.unique(np.concatenate(excl_parts))
            if len(excl):
                pos = np.searchsorted(excl, docs)
                pos_c = np.clip(pos, 0, len(excl) - 1)
                ok = excl[pos_c] != docs
                docs, n_match = docs[ok], n_match[ok]
    return pa.table({"doc_id": pa.array(docs, type=pa.int64()),
                     "n_match": pa.array(n_match, type=pa.int64())})


def sql_disjunctive_docs(
    table: str, or_terms: list[str], not_terms: list[str] | None = None,
    min_should_match: int = 1,
    cfg: EngineConfig | None = None,
    *,
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``disjunctive_docs`` (OR with min-should-match, minus
    any doc containing a NOT term)."""
    cfg = cfg or EngineConfig()
    or_lits = ", ".join(f"'{w}'" for w in sorted(set(or_terms)))
    not_clause = ""
    uniq_not = sorted(set(not_terms or ()))
    if uniq_not:
        not_lits = ", ".join(f"'{w}'" for w in uniq_not)
        not_clause = (f"WHERE doc_id NOT IN "
                      f"(SELECT doc_id FROM t WHERE term IN ({not_lits}))")
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {sql_tokenize_expr(text_col, cfg)} AS toks
  FROM {table}
),
t AS (SELECT doc_id, unnest(toks) AS term FROM d),
m AS (
  SELECT doc_id, count(DISTINCT term)::BIGINT AS n_match FROM t
  WHERE term IN ({or_lits})
  GROUP BY doc_id
  HAVING count(DISTINCT term) >= {int(min_should_match)}
)
SELECT doc_id, n_match FROM m
{not_clause}
ORDER BY doc_id
"""


def suggest_terms_idx(idx, prefix: str, k: int = 10) -> pa.Table:
    """Query autocompletion: top-k dictionary terms starting with
    ``prefix``, ranked by (live df DESC, term ASC) — the
    suggest-as-you-type surface over the SAME mmap'd dictionary (one
    binary-search range probe; only the matched range pages in). Live df
    subtracts tombstoned docs per term via the posting slices, so
    suggestions never surface vocabulary that only deleted docs used.
    Operates on an already-loaded (possibly docid-range-restricted)
    DecodedIndex — a shard's dfs count ITS postings, so shard suggestions
    SUM to the exact global df in a fan-out merge."""
    empty = pa.table({"term": pa.array([], type=pa.string()),
                      "df": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64())})
    # the dictionary is lowercase (tokenizer lowers before splitting), so
    # match the search surface: 'Tab' must suggest what 'tab' suggests
    # rather than landing before every lowercase term in the range probe
    prefix = prefix.lower()
    if not prefix or k <= 0 or not len(idx.dict_terms):
        return empty
    lo = np.searchsorted(idx.dict_terms, prefix)
    hi = np.searchsorted(idx.dict_terms, prefix + "￿")
    if hi <= lo:
        return empty
    terms = idx.dict_terms[lo:hi]
    tids = idx.dict_term_ids[lo:hi]
    if len(idx.tombstones):
        dfs = np.empty(len(tids), dtype=np.int64)
        for i, t in enumerate(tids):
            s, e = idx.posting_offsets[t], idx.posting_offsets[t + 1]
            d = np.asarray(idx.posting_docids[s:e])
            pos = np.clip(np.searchsorted(idx.tombstones, d), 0,
                          len(idx.tombstones) - 1)
            dfs[i] = int((idx.tombstones[pos] != d).sum())
    else:
        dfs = (idx.posting_offsets[tids + 1]
               - idx.posting_offsets[tids]).astype(np.int64)
    keep = dfs > 0
    terms, dfs = terms[keep], dfs[keep]
    order = np.lexsort((terms, -dfs))[:k]
    return pa.table({
        "term": pa.array(terms[order], type=pa.string()),
        "df": pa.array(dfs[order]),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    })


def suggest_terms(index_dir: str, prefix: str, k: int = 10) -> pa.Table:
    """Autocompletion over an index DIRECTORY (full, unsharded view)."""
    from colbert_ray.state.decoded import DecodedIndex

    return suggest_terms_idx(
        DecodedIndex.load_cached(index_dir, load_sha=False), prefix, k=k)


def fuzzy_search(index_dir: str, term: str, max_edits: int = 2) -> pa.Table:
    """Fuzzy-term expansion over the BUILT index (Lucene FuzzyQuery
    analog, the DSL's ``word~d`` atom): dictionary terms within
    Levenshtein distance <= ``max_edits`` of ``term`` (one vectorized DP
    sweep over the length-banded vocab slice —
    functions/util.levenshtein_leq_mask; vocab-bounded, the same budget
    class as the wildcard dictionary scans), then the shared per-doc
    posting rollup. Returns (doc_id, n_terms, sum_tf) ordered by doc_id,
    tombstone-aware."""
    from colbert_ray.functions.util import levenshtein_leq_mask
    from colbert_ray.state.decoded import DecodedIndex

    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    if not term or not len(idx.dict_terms):
        return _rollup_term_ids(idx, np.empty(0, dtype=np.int64))
    hit = levenshtein_leq_mask(idx.dict_terms, term, max_edits)
    return _rollup_term_ids(idx, idx.dict_term_ids[np.flatnonzero(hit)])


def sql_fuzzy_search(table: str, term: str, max_edits: int = 2,
                     cfg: EngineConfig | None = None, *,
                     text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of ``fuzzy_search`` — per-doc rollup over terms with
    levenshtein(term, q) <= d."""
    cfg = cfg or EngineConfig()
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {sql_tokenize_expr(text_col, cfg)} AS toks
  FROM {table}
),
t AS (SELECT doc_id, unnest(toks) AS term FROM d),
m AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM t
      WHERE levenshtein(term, '{term}') <= {int(max_edits)}
      GROUP BY doc_id, term)
SELECT doc_id, count(*)::BIGINT AS n_terms, sum(tf)::BIGINT AS sum_tf
FROM m GROUP BY doc_id ORDER BY doc_id
"""
