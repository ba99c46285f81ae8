"""End-to-end corpus curation composite: the pipeline a training-data user
actually runs, expressed as one Ray Data stream.

``normalize -> token-count gate -> corpus-LM NLL gate -> exact dedup on the
NORMALIZED text`` — deduping after normalization is the point: case /
whitespace variants of the same document collapse to one survivor, which
raw-text dedup misses.

Scale shape: normalization and NLL scoring are stateless/broadcast
``map_batches`` stages (the LM is one vocab-sized ``ray.put``); the ONLY
corpus-wide exchange is the dedup groupby, and it carries 128-bit digest
halves + the tiny stat columns — never the text. Reference capability
analog: the preprocessing chain ahead of indexing
(``colbert/indexing/collection_indexer.py`` setup pass); the curation
stages themselves are standard public corpus-cleaning practice (CCNet-style
LM filter + exact dedup).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from colbert_ray.extras.redact import normalize_text
from colbert_ray.extras.textstats import unigram_nll

# default gates (shared verbatim with the SQL twin in __ray_entry__)
MIN_TOKENS = 15
MAX_TOKENS = 10_000
MAX_NLL = 3.42


def curate_corpus(ds: "ray.data.Dataset", text_col: str = "text",
                  id_col: str = "doc_id", *,
                  min_tokens: int = MIN_TOKENS,
                  max_tokens: int = MAX_TOKENS,
                  max_nll: float = MAX_NLL) -> "ray.data.Dataset":
    """Survivors of the full curation pipeline:
    ``(doc_id = min id of its normalized-text group, n_tokens, nll,
    dup_count)`` where the unigram LM is trained on the WHOLE normalized
    corpus (before gating — the LM must see the distribution it scores)."""
    norm = normalize_text(ds, text_col=text_col, id_col=id_col)
    scored = unigram_nll(norm, text_col="norm_text", id_col=id_col,
                         keep_cols=("norm_text",))

    def gate_and_hash(b: pa.Table) -> pa.Table:
        nt = b.column("n_tokens").to_numpy(zero_copy_only=False)
        nll = b.column("nll").to_numpy(zero_copy_only=False)
        m = (nt >= min_tokens) & (nt <= max_tokens) & (nll <= max_nll)
        b = b.filter(pa.array(m))
        texts = b.column("norm_text").to_pylist()
        hi = np.empty(len(texts), dtype=np.int64)
        lo = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            d = hashlib.sha256(t.encode()).digest()
            hi[i] = int.from_bytes(d[:8], "little", signed=True)
            lo[i] = int.from_bytes(d[8:16], "little", signed=True)
        return pa.table({id_col: b.column(id_col),
                         "n_tokens": b.column("n_tokens"),
                         "nll": b.column("nll"),
                         "h_hi": pa.array(hi), "h_lo": pa.array(lo)})

    def survivor(g: "pd.DataFrame") -> "pd.DataFrame":
        # stats are constant within a group (identical normalized text),
        # so the min-id row's values ARE the group's values
        i = int(g[id_col].idxmin())
        return pd.DataFrame([{
            id_col: int(g[id_col].loc[i]),
            "n_tokens": int(g["n_tokens"].loc[i]),
            "nll": float(g["nll"].loc[i]),
            "dup_count": int(len(g)),
        }])

    return (scored.map_batches(gate_and_hash, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(["h_hi", "h_lo"])
            .map_groups(survivor, batch_format="pandas"))
