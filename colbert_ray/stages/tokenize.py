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


def make_tokenize_fn(cfg: EngineConfig):
    """Returns a batch fn for ``ds.map_batches(fn, batch_format='pyarrow')``."""

    def tokenize_batch(batch: pa.Table) -> pa.Table:
        content = batch.column("content")
        doclens, terms, tfs = doc_term_frequencies(content, cfg)
        # sha256 has no vectorized Arrow kernel; hashlib over the buffer per
        # row is C-speed and the only per-row op in this stage.
        shas = [hashlib.sha256(s.encode()).hexdigest() for s in content.to_pylist()]
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
