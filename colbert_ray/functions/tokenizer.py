"""Code-aware tokenizer — vectorized over Arrow string columns.

Capability analog of the reference's doc/query tokenization
(``colbert/modeling/tokenization/doc_tokenization.py:57-73``,
``query_tokenization.py:52-111``): instead of a BERT wordpiece encoder the
lexical engine lowercases, splits identifiers on camelCase boundaries and
splits on non-alphanumerics, then aggregates per-document ``(term, tf)``
pairs (the lexical analog of the token-embedding matrix, SURVEY.md §1.1).

All kernels are pyarrow.compute (RE2) + numpy/pandas — no Python loop over
rows. The regexes use RE2 semantics identical to DuckDB's ``regexp_replace``
so the same tokenization is expressible in oracle SQL:

    regexp_replace(s, '([a-z0-9])([A-Z])', '\\1 \\2', 'g')
    regexp_replace(s, '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g')
    lower(s); regexp_split_to_array(s, '[^a-z0-9]+')
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from colbert_ray.config import EngineConfig

_CAMEL_1 = r"([a-z0-9])([A-Z])"          # fooBar -> foo Bar
_CAMEL_2 = r"([A-Z]+)([A-Z][a-z])"       # HTTPServer -> HTTP Server
_SPLIT = r"[^a-zA-Z0-9]+"
_SPLIT_LOWER = r"[^a-z0-9]+"


def tokenize_column(col: pa.ChunkedArray | pa.Array, cfg: EngineConfig) -> pa.ListArray:
    """string column -> list<string> of tokens per row (vectorized)."""
    s = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    s = pc.cast(s, pa.string())
    if cfg.split_camel_case:
        s = pc.replace_substring_regex(s, pattern=_CAMEL_1, replacement=r"\1 \2")
        s = pc.replace_substring_regex(s, pattern=_CAMEL_2, replacement=r"\1 \2")
    if cfg.lowercase:
        s = pc.utf8_lower(s)
        toks = pc.split_pattern_regex(s, pattern=_SPLIT_LOWER)
    else:
        toks = pc.split_pattern_regex(s, pattern=_SPLIT)
    return toks if isinstance(toks, pa.ListArray) else toks.combine_chunks()


def _flatten_tokens(toks: pa.ListArray, cfg: EngineConfig):
    """list<string> -> (row_idx int64, token str np arrays), empties dropped."""
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = (lens >= cfg.min_token_len) & (lens <= cfg.max_token_len)
    tokens = flat.to_numpy(zero_copy_only=False)
    return parents[keep], tokens[keep]


def doc_term_frequencies(
    texts: pa.ChunkedArray | pa.Array, cfg: EngineConfig
) -> tuple[np.ndarray, pa.ListArray, pa.ListArray]:
    """Tokenize a batch of documents and aggregate per-doc (term, tf).

    Returns ``(doclens int64[n_rows], terms list<string>, tfs list<int32>)``
    where within each row the terms are sorted lexicographically — the fixed
    per-document term order that guarantees a deterministic float64 summation
    order at query time (SURVEY.md §7.3 hard-part #1).
    """
    toks = tokenize_column(texts, cfg)
    n_rows = len(toks)
    parents, tokens = _flatten_tokens(toks, cfg)

    # doclen = number of kept tokens per doc (tf mass, not unique terms)
    doclens = np.bincount(parents, minlength=n_rows).astype(np.int64)

    if len(tokens) == 0:
        empty_terms = pa.ListArray.from_arrays(
            pa.array(np.zeros(n_rows + 1, dtype=np.int32)), pa.array([], type=pa.string())
        )
        empty_tfs = pa.ListArray.from_arrays(
            pa.array(np.zeros(n_rows + 1, dtype=np.int32)), pa.array([], type=pa.int32())
        )
        return doclens, empty_terms, empty_tfs

    # vectorized (row, token) -> tf. Strings are factorized to int codes once
    # (hash-based, O(n)); codes are re-ranked so integer order ==
    # lexicographic term order; then one int64 sort + run-length encode.
    # (An object-dtype lexsort over the raw strings is ~10x slower.)
    codes, uniques = pd.factorize(tokens, sort=False)
    uniq_order = np.argsort(uniques, kind="stable")
    rank_of_code = np.empty(len(uniques), dtype=np.int64)
    rank_of_code[uniq_order] = np.arange(len(uniques), dtype=np.int64)
    uniques_sorted = uniques[uniq_order]
    n_u = max(1, len(uniques))
    key = parents.astype(np.int64) * n_u + rank_of_code[codes]
    run_keys, tfs = np.unique(key, return_counts=True)
    tfs = tfs.astype(np.int32)
    run_parents = (run_keys // n_u).astype(np.int64)
    run_terms = uniques_sorted[run_keys % n_u]   # sorted by (row, term)

    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(np.bincount(run_parents, minlength=n_rows), out=offsets[1:])
    terms_arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(run_terms, type=pa.string()))
    tfs_arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(tfs, type=pa.int32()))
    return doclens, terms_arr, tfs_arr


def tokenize_query(text: str, cfg: EngineConfig) -> tuple[list[str], list[int]]:
    """Single query -> (unique sorted terms, tfs). Driver/actor-side helper."""
    doclens, terms, tfs = doc_term_frequencies(pa.array([text]), cfg)
    return terms.flatten().to_pylist(), tfs.flatten().to_pylist()


def sql_tokenize_expr(col: str, cfg: EngineConfig | None = None) -> str:
    """DuckDB SQL expression producing the SAME token list as tokenize_column.

    Used by oracle_sql() so the DuckDB oracle tokenizes identically.
    """
    cfg = cfg or EngineConfig()
    e = col
    if cfg.split_camel_case:
        e = rf"regexp_replace({e}, '([a-z0-9])([A-Z])', '\1 \2', 'g')"
        e = rf"regexp_replace({e}, '([A-Z]+)([A-Z][a-z])', '\1 \2', 'g')"
    if cfg.lowercase:
        e = f"lower({e})"
    return rf"list_filter(regexp_split_to_array({e}, '[^a-z0-9]+'), t -> len(t) >= {cfg.min_token_len} AND len(t) <= {cfg.max_token_len})"
