"""BPE tokenizer training over the corpus — the learn-the-tokenizer stage
of an LLM data pipeline (Sennrich et al. 2016, ``learn_bpe``).

Scale shape (exactly Sennrich's, distributed where it counts): the corpus
pass is ONE distributed word count (per-batch partial counts -> one
vocab-bounded groupby); the merge-learning loop then runs on the driver
over the (word, freq) table — the table is vocab-bounded, which is the
published algorithm's own working set (learn_bpe is single-process over a
word-freq dict for the same reason). Applying a learned merge table back
to the corpus (``bpe_token_counts``) IS distributed: the merge list is
broadcast, each batch segments only its DISTINCT words (dictionary
encoding) and scatters through the indices.

Determinism: merge selection is (max pair count, then lexicographically
smallest pair) — a total order, so the learned table is identical at any
parallelism and exactly reproducible by the unrolled SQL twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _word_counts(ds: "ray.data.Dataset", text_col: str):
    """(word, freq) pandas frame via per-batch partials + ONE groupby."""

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b.column(text_col), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        t = pa.table({"word": words.flatten()})
        g = t.group_by("word").aggregate([("word", "count")])
        return g.rename_columns(["word", "f_p"])

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("word").sum("f_p").to_pandas()
            .rename(columns={"sum(f_p)": "f"}))


def _merge_syms(syms: list[str], pl: str, pr: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (pl, pr)."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == pl and syms[i + 1] == pr:
            out.append(pl + pr)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(ds: "ray.data.Dataset", n_merges: int = 8,
              text_col: str = "text") -> pa.Table:
    """Learn ``n_merges`` BPE merges. Returns (rank, left, right, cnt) —
    cnt is the winning pair's corpus count at selection time. Stops early
    (fewer rows) if no adjacent pair remains."""
    wc = _word_counts(ds, text_col)
    vocab = [list(w) for w in wc["word"].tolist()]
    freqs = wc["f"].to_numpy(dtype=np.int64)
    ranks, lefts, rights, cnts = [], [], [], []
    for r in range(1, n_merges + 1):
        pair_cnt: dict[tuple[str, str], int] = {}
        for syms, f in zip(vocab, freqs):
            for a, b in zip(syms, syms[1:]):
                pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + int(f)
        if not pair_cnt:
            break
        (pl, pr), c = min(pair_cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        ranks.append(r)
        lefts.append(pl)
        rights.append(pr)
        cnts.append(c)
        vocab = [_merge_syms(s, pl, pr)
                 if pl in s else s for s in vocab]
    return pa.table({
        "rank": pa.array(ranks, type=pa.int64()),
        "left": pa.array(lefts, type=pa.string()),
        "right": pa.array(rights, type=pa.string()),
        "cnt": pa.array(cnts, type=pa.int64()),
    })


def segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges in rank order to one word (BPE apply)."""
    syms = list(word)
    for pl, pr in merges:
        if pl in syms:
            syms = _merge_syms(syms, pl, pr)
    return syms


def bpe_token_counts(ds: "ray.data.Dataset", merges_tbl: pa.Table,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> "ray.data.Dataset":
    """Distributed BPE APPLY: per-doc token count under the learned merge
    table. The merge list is broadcast once; each batch segments only its
    DISTINCT words (dictionary encode -> per-unique segmentation -> scatter
    through indices), so cost scales with unique words per batch, not
    corpus tokens."""
    import ray as _ray

    merges = list(zip(merges_tbl.column("left").to_pylist(),
                      merges_tbl.column("right").to_pylist()))
    ref = _ray.put(merges)

    def count(b: pa.Table) -> pa.Table:
        mg = _ray.get(ref)
        words = pc.split_pattern(b.column(text_col), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        de = flat.dictionary_encode()
        uniq = de.dictionary.to_pylist()
        per_uniq = np.fromiter(
            (len(segment_word(u, mg)) for u in uniq),
            dtype=np.int64, count=len(uniq))
        per_word = per_uniq[de.indices.to_numpy(zero_copy_only=False)] \
            if len(uniq) else np.empty(0, dtype=np.int64)
        off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        per_doc = np.add.reduceat(per_word, off[:-1]) if len(off) > 1 \
            else np.empty(0, dtype=np.int64)
        return pa.table({id_col: b.column(id_col),
                         "n_bpe_tokens": pa.array(per_doc)})

    return ds.map_batches(count, batch_format="pyarrow",
                          zero_copy_batch=True)
