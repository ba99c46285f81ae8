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


def _bucket_prefix(base, text_col: str, id_col: str, bucket_width: int):
    """Shared stage-1 of both packers: per-batch (bucket, token partial)
    rows -> ONE groupby -> driver exclusive prefix -> broadcast
    {bucket -> start offset} dict (None when the corpus is empty)."""
    import ray as _ray
    from ray.data.aggregate import Sum as _Sum

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
        return None
    bsum = bsum.sort_values("bucket")
    sums = bsum["n_tok"].to_numpy(dtype=np.int64)
    excl = np.concatenate([[0], np.cumsum(sums)[:-1]])
    return _ray.put({int(b): int(p) for b, p in zip(bsum["bucket"], excl)})


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

    base = docs.select_columns([id_col, text_col])
    prefix_ref = _bucket_prefix(base, text_col, id_col, bucket_width)
    if prefix_ref is None:
        empty = pa.schema([(id_col, pa.int64()), ("n_tokens", pa.int64()),
                           ("tok_start", pa.int64()),
                           ("seq_first", pa.int64()),
                           ("seq_last", pa.int64())])
        import ray.data as _rd

        return _rd.from_arrow(empty.empty_table())

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


def materialize_sequences(
    docs: "ray.data.Dataset",
    seq_len: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 100_000,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """MATERIALIZE the packed training sequences: one output row per
    sequence ``(seq_id, n_tokens, n_docs, text)`` under the same
    concatenate-in-id-order + cut-every-``seq_len`` layout as
    :func:`pack_sequences` (every sequence holds exactly ``seq_len``
    tokens except the last).

    Shape: per-doc global offsets come from the same bucket prefix scan;
    offsets and text meet in a bucketed co-group (union + groupby(bucket)
    — the repo's join shape, no acero join); each doc then flat-maps into
    per-sequence FRAGMENTS (vectorized offsets arithmetic + binary_join —
    a doc straddling a boundary splits, text never re-tokenizes), and ONE
    ``groupby(seq_id)`` assembles fragments in global-offset order. Text
    rides exactly two exchanges (offset co-group, sequence assembly) —
    the minimum for a layout that re-groups text by output sequence."""
    import ray as _ray

    base = docs.select_columns([id_col, text_col])
    prefix_ref = _bucket_prefix(base, text_col, id_col, bucket_width)
    empty = pa.table({"seq_id": pa.array([], type=pa.int64()),
                      "n_tokens": pa.array([], type=pa.int64()),
                      "n_docs": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    if prefix_ref is None:
        import ray.data as _rd

        return _rd.from_arrow(empty)

    def fragments(g: pd.DataFrame) -> pd.DataFrame:
        pref = _ray.get(prefix_ref)
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy(dtype=np.int64)
        texts = pa.array(g[text_col].tolist(), type=pa.string())
        lists = pc.split_pattern(texts, " ")
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = lists.flatten()
        n = np.diff(off)
        start = pref[int(ids[0] // bucket_width)] + \
            np.concatenate([[0], np.cumsum(n)[:-1]])
        # fragment boundaries: multiples of seq_len inside (start, end)
        first_seq = start // seq_len
        last_seq = (start + n - 1) // seq_len
        nfrag = last_seq - first_seq + 1
        doc_rep = np.repeat(np.arange(len(ids)), nfrag)
        frag_base = np.cumsum(nfrag) - nfrag
        fno = np.arange(len(doc_rep)) - frag_base[doc_rep]
        # global token position where each fragment begins
        gstart = np.where(fno == 0, start[doc_rep],
                          (first_seq[doc_rep] + fno) * seq_len)
        gend = np.minimum((first_seq[doc_rep] + fno + 1) * seq_len,
                          (start + n)[doc_rep])
        # flat-word offsets of each fragment
        wstart = off[:-1][doc_rep] + (gstart - start[doc_rep])
        bounds = np.append(wstart, off[-1]).astype(np.int64)
        frag_list = pa.ListArray.from_arrays(
            pa.array(bounds, type=pa.int32()), flat)
        frag_txt = pc.binary_join(frag_list, " ")
        return pd.DataFrame({
            "seq_id": first_seq[doc_rep] + fno,
            "gstart": gstart,
            "n_frag_tokens": gend - gstart,
            id_col: ids[doc_rep],
            "frag": frag_txt.to_pandas(),
        })

    def with_bucket(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        return b.append_column("bucket", pa.array(ids // bucket_width))

    frags = (base.map_batches(with_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)
             .groupby("bucket")
             .map_groups(fragments, batch_format="pandas"))

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("gstart")
        return pd.DataFrame({
            "seq_id": [int(g["seq_id"].iloc[0])],
            "n_tokens": [int(g["n_frag_tokens"].sum())],
            "n_docs": [int(g[id_col].nunique())],
            "text": [" ".join(g["frag"].tolist())],
        })

    return frags.groupby("seq_id").map_groups(assemble,
                                              batch_format="pandas")
