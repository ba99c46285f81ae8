"""Tokenize stage: corpus batches -> per-doc (terms, tfs) + sha256 + doclen.

The lexical analog of the reference's encode step
(``colbert/indexing/collection_encoder.py:14-56``: passages -> packed
embeddings + doclens). Stateless ``map_batches`` task, Arrow in / Arrow out,
vectorized (SURVEY.md §2.2 M1). ``content`` is dropped here — immediately
after sha256 + tokenization — so nothing downstream ever shuffles the raw
text (SURVEY.md §7.3 #6).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from colbert_ray.config import EngineConfig
from colbert_ray.functions.tokenizer import doc_term_frequencies


_TOKENIZER_KNOBS = ("split_camel_case", "lowercase",
                    "min_token_len", "max_token_len")


def _tokenize_with_lang_overrides(batch: pa.Table, cfg: EngineConfig):
    """Per-language tokenizer plugin dispatch (SURVEY §7.1 M9): rows whose
    ``lang`` has an override in ``cfg.lang_overrides`` are tokenized with
    the overridden knobs, everything else with the base config; results are
    stitched back in the original row order (one kernel pass per distinct
    overridden language — still fully vectorized within each group)."""
    import numpy as np

    lang = batch.column("lang").to_numpy(zero_copy_only=False)
    content = batch.column("content")
    overridden = {l: o for l, o in cfg.lang_overrides.items() if o}
    groups: list[tuple[np.ndarray, EngineConfig]] = []
    rest = np.full(len(lang), True)
    for l, o in sorted(overridden.items()):
        m = lang == l
        if m.any():
            groups.append((np.flatnonzero(m), cfg.merged(**o)))
            rest &= ~m
    if rest.any():
        groups.append((np.flatnonzero(rest), cfg))
    parts = []
    for idx, gcfg in groups:
        sub = content.take(pa.array(idx))
        dl, terms, tfs = doc_term_frequencies(sub, gcfg)
        parts.append((idx, pa.array(dl, type=pa.int64()), terms, tfs))
    order = np.concatenate([idx for idx, *_ in parts])
    inv = np.empty(len(order), dtype=np.int64)
    inv[order] = np.arange(len(order))
    inv_a = pa.array(inv)
    doclens = pa.concat_arrays(
        [p[1] for p in parts]).take(inv_a).to_numpy(zero_copy_only=False)
    terms = pa.concat_arrays(
        [p[2].combine_chunks() if isinstance(p[2], pa.ChunkedArray) else p[2]
         for p in parts]).take(inv_a)
    tfs = pa.concat_arrays(
        [p[3].combine_chunks() if isinstance(p[3], pa.ChunkedArray) else p[3]
         for p in parts]).take(inv_a)
    return doclens, terms, tfs


def make_tokenize_fn(cfg: EngineConfig):
    """Returns a batch fn for ``ds.map_batches(fn, batch_format='pyarrow')``."""
    # validate plugin knobs ONCE at plan time — a bad config must fail
    # before any Ray task launches, not deep inside a worker
    for l, o in cfg.lang_overrides.items():
        bad = set(o) - set(_TOKENIZER_KNOBS)
        if bad:
            raise ValueError(
                f"lang_overrides[{l!r}] may only set {_TOKENIZER_KNOBS}, "
                f"got {sorted(bad)}")

    def tokenize_batch(batch: pa.Table) -> pa.Table:
        content = batch.column("content")
        if cfg.lang_overrides and "lang" not in batch.column_names:
            # silently tokenizing with base knobs would stamp the index's
            # semantic hash as if the plugins applied — fail loudly
            raise ValueError(
                "lang_overrides is set but the corpus batch has no 'lang' "
                f"column (columns: {batch.column_names})")
        if cfg.lang_overrides and batch.num_rows > 0:
            doclens, terms, tfs = _tokenize_with_lang_overrides(batch, cfg)
        else:
            doclens, terms, tfs = doc_term_frequencies(content, cfg)
        # sha256 has no vectorized Arrow kernel; hashlib over the buffer per
        # row is C-speed and the only per-row op in this stage. Null content
        # hashes as "" — consistent with the tokenizer's fill_null.
        shas = [hashlib.sha256((s or "").encode()).hexdigest()
                for s in content.to_pylist()]
        cols = {
            name: batch.column(name)
            for name in batch.column_names
            if name not in ("content",)
        }
        cols["content_sha256"] = pa.array(shas, type=pa.string())
        cols["doclen"] = pa.array(doclens, type=pa.int64())
        cols["terms"] = terms
        cols["tfs"] = tfs
        return pa.table(cols)

    return tokenize_batch
