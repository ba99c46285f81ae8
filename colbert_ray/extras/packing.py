"""Training-sequence packing — the GPT-style fixed-boundary packer.

LLM pre-training consumes documents as fixed-length token sequences: the
corpus is concatenated in a deterministic order and cut every ``seq_len``
tokens, documents straddling boundaries (Brown et al. 2020 §2.1; T5's
"pack examples" input pipeline). The operator computes, for every doc,
its global token offset and the sequence span it lands in — the shuffle-
free metadata a downstream batch writer needs to emit packed sequences.

A global concatenation offset is a cross-partition PREFIX SUM — the same
scan shape as ``relational.late_events``: per-batch bucket partials ->
driver exclusive prefix over the (bounded) bucket sums -> ONE
groupby(bucket) with a seeded local cumsum. Exact integers at any
parallelism; token counts are vectorized (``count_substring`` — the word
lists are never materialized).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pack_sequences(
    docs: "ray.data.Dataset",
    seq_len: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 100_000,
) -> "ray.data.Dataset":
    """One row per doc: (doc_id, n_tokens, tok_start, seq_first, seq_last)
    under concatenate-in-ascending-``id_col``-order + cut-every-``seq_len``
    packing. Token count = whitespace word count (the corpus packer's
    unit; swap in a tokenizer column upstream for BPE units).
    """
    import ray as _ray
    from ray.data.aggregate import Sum as _Sum

    base = docs.select_columns([id_col, text_col])

    def bucket_partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        n = pc.add(pc.count_substring(b.column(text_col), " "), 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        bk = ids // bucket_width
        ub, inv = np.unique(bk, return_inverse=True)
        tot = np.zeros(len(ub), dtype=np.int64)
        np.add.at(tot, inv, n)
        return pa.table({"bucket": pa.array(ub, type=pa.int64()),
                         "n_part": pa.array(tot)})

    bsum = (base.map_batches(bucket_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("bucket").aggregate(_Sum("n_part", alias_name="n_tok"))
            .to_pandas())
    if bsum.empty:
        empty = pa.schema([(id_col, pa.int64()), ("n_tokens", pa.int64()),
                           ("tok_start", pa.int64()),
                           ("seq_first", pa.int64()),
                           ("seq_last", pa.int64())])
        import ray.data as _rd

        return _rd.from_arrow(empty.empty_table())
    bsum = bsum.sort_values("bucket")
    buckets = bsum["bucket"].to_numpy(dtype=np.int64)
    sums = bsum["n_tok"].to_numpy(dtype=np.int64)
    excl = np.concatenate([[0], np.cumsum(sums)[:-1]])
    prefix_ref = _ray.put({int(b): int(p) for b, p in zip(buckets, excl)})

    def seeded_scan(g: pd.DataFrame) -> pd.DataFrame:
        pref = _ray.get(prefix_ref)
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy(dtype=np.int64)
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        start = pref[int(ids[0] // bucket_width)] + \
            np.concatenate([[0], np.cumsum(n)[:-1]])
        return pd.DataFrame({
            id_col: ids, "n_tokens": n, "tok_start": start,
            "seq_first": start // seq_len,
            "seq_last": (start + n - 1) // seq_len,
        })

    def with_counts(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        n = pc.add(pc.count_substring(b.column(text_col), " "), 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: b.column(id_col),
                         "n_tokens": pa.array(n),
                         "bucket": pa.array(ids // bucket_width)})

    return (base.map_batches(with_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(seeded_scan, batch_format="pandas"))
