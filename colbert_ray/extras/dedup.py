"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale shapes (ray_guide.md "Aggregation at scale"):
- exact: hash column in map_batches -> groupby(hash) -> first-by-docid
- minhash: shingle->minhash per batch -> explode (band, band_hash, doc) ->
  groupby bands -> candidate pairs -> verify true Jaccard
- simhash: 64-bit signature per doc (near-dup key by Hamming distance)

All hashes are deterministic (blake2b / fixed seeds) => identical output at
any parallelism level.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_NGRAM = 3


def _char_ngrams(texts: list[str], n: int = _NGRAM) -> list[set]:
    # texts shorter than n yield an EMPTY set (matches the SQL oracle's
    # generate_series(1, len-n+1) which is empty for short strings)
    return [
        {t[i:i + n] for i in range(len(t) - n + 1)} if len(t) >= n else set()
        for t in texts
    ]


def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """One representative row per distinct content: (doc_id=min id in group,
    dup_count). The engine-level analog of D2 exact dedup."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = [hashlib.sha256(t.encode()).hexdigest()
             for t in batch.column(text_col).to_pylist()]
        return pa.table({id_col: batch.column(id_col),
                         "content_hash": pa.array(h, type=pa.string())})

    def first_by_id(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: [int(g[id_col].min())], "dup_count": [int(len(g))]}
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("content_hash")
        .map_groups(first_by_id, batch_format="pandas")
    )


def jaccard_pairs(
    ds: "ray.data.Dataset",
    threshold_num: int = 4,
    threshold_den: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_id: int | None = None,
) -> "ray.data.Dataset":
    """Exact all-pairs character-trigram Jaccard >= threshold_num/threshold_den.

    The threshold test and the emitted similarity are INTEGER-exact
    (``n_common``, ``n_union``) so results are bit-stable and oracle-
    comparable with no float rounding semantics involved.

    O(n^2) verification — intended for a bounded id range (``max_id``) or as
    the verify stage after LSH blocking; the scalable path is
    ``minhash_lsh_pairs``. Pairs are emitted once with id_a < id_b.
    """
    if max_id is not None:
        ds = ds.filter(expr=f"{id_col} < {max_id}")
    # small bounded side: collect to the driver and broadcast
    ref = ds.select_columns([id_col, text_col]).to_pandas()
    ref = ref.sort_values(id_col).reset_index(drop=True)
    ids = ref[id_col].to_numpy(dtype=np.int64)
    shingles = _char_ngrams(ref[text_col].tolist())
    ref_obj = ray.put((ids, shingles))

    def pairs_for(batch: pa.Table) -> pa.Table:
        r_ids, r_sh = ray.get(ref_obj)
        b_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        b_sh = _char_ngrams(batch.column(text_col).to_pylist())
        out_a, out_b, out_i, out_u = [], [], [], []
        for bid, s in zip(b_ids, b_sh):
            if not s:
                continue
            for rid, rs in zip(r_ids, r_sh):
                if rid <= bid or not rs:
                    continue
                inter = len(s & rs)
                if inter == 0:
                    continue
                union = len(s) + len(rs) - inter
                if inter * threshold_den >= threshold_num * union:
                    out_a.append(int(bid)); out_b.append(int(rid))
                    out_i.append(inter); out_u.append(union)
        return pa.table({"id_a": pa.array(out_a, type=pa.int64()),
                         "id_b": pa.array(out_b, type=pa.int64()),
                         "n_common": pa.array(out_i, type=pa.int64()),
                         "n_union": pa.array(out_u, type=pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        pairs_for, batch_format="pyarrow"
    )


_MINHASH_K = 64
_LSH_BANDS = 16            # 16 bands x 4 rows
_LSH_ROWS = _MINHASH_K // _LSH_BANDS


def _minhash_matrix(shingle_sets: list[set], k: int = _MINHASH_K) -> np.ndarray:
    """k minhashes per doc via k universal-hash permutations of blake2b
    shingle hashes (seeded, deterministic)."""
    rng = np.random.default_rng(12345)
    a = rng.integers(1, (1 << 61) - 1, size=k, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, (1 << 61) - 1, size=k, dtype=np.uint64)
    out = np.full((len(shingle_sets), k), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, s in enumerate(shingle_sets):
        if not s:
            continue
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(x.encode(), digest_size=8).digest(), "little")
             for x in s),
            dtype=np.uint64, count=len(s),
        )
        # (a*h + b) mod 2^64, min per permutation — fully vectorized
        vals = (hs[None, :] * a[:, None] + b[:, None])
        out[i] = vals.min(axis=1)
    return out


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """MinHash+LSH near-dup candidates verified by true trigram Jaccard.

    Pipeline shape: per-batch minhash -> explode (band, band_hash, doc_id)
    -> groupby band bucket -> within-bucket pairs -> exact verify.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """

    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        mh = _minhash_matrix(_char_ngrams(texts))
        band_hash = np.empty((len(texts), _LSH_BANDS), dtype=np.int64)
        for bband in range(_LSH_BANDS):
            seg = mh[:, bband * _LSH_ROWS:(bband + 1) * _LSH_ROWS]
            # blake2b, NOT python hash() (randomized per process)
            band_hash[:, bband] = np.array(
                [int.from_bytes(
                    hashlib.blake2b(seg[i].tobytes(), digest_size=8).digest(), "little")
                 & 0x7FFFFFFFFFFFFFFF
                 for i in range(len(texts))],
                dtype=np.int64,
            )
        n = len(texts)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(_LSH_BANDS, dtype=np.int32), n)),
                "band_hash": pa.array(band_hash.T.reshape(-1)),
                id_col: pa.array(np.tile(
                    batch.column(id_col).to_numpy(zero_copy_only=False), _LSH_BANDS)),
                text_col: pa.array(
                    [t for _ in range(_LSH_BANDS) for t in texts], type=pa.string()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy(dtype=np.int64)
        sh = _char_ngrams(g[text_col].tolist())
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if not sh[i] or not sh[j]:
                    continue
                inter = len(sh[i] & sh[j])
                union = len(sh[i]) + len(sh[j]) - inter
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    out_a.append(int(ids[i])); out_b.append(int(ids[j])); out_j.append(jac)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard": out_j})

    pairs = (
        ds.select_columns([id_col, text_col])
        .map_batches(sigs, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # same pair can surface from several bands -> distinct
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dedup_pairs, batch_format="pandas")


def simhash(ds: "ray.data.Dataset", text_col: str = "text",
            id_col: str = "doc_id") -> "ray.data.Dataset":
    """64-bit SimHash of the token multiset (near-dup signature)."""
    from colbert_ray.config import EngineConfig
    from colbert_ray.functions.tokenizer import doc_term_frequencies

    cfg = EngineConfig()

    def fn(batch: pa.Table) -> pa.Table:
        _, terms, tfs = doc_term_frequencies(batch.column(text_col), cfg)
        offsets = terms.offsets.to_numpy(zero_copy_only=False)
        flat = terms.flatten().to_pylist()
        w = tfs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        th = np.fromiter(
            (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
             for t in flat),
            dtype=np.uint64, count=len(flat),
        )
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
                ).astype(np.int64) * 2 - 1          # ±1 per bit
        contrib = bits * w[:, None]
        n = batch.num_rows
        sig = np.zeros(n, dtype=np.int64)
        for row in range(n):
            seg = contrib[offsets[row]:offsets[row + 1]]
            if len(seg) == 0:
                continue
            v = (seg.sum(axis=0) > 0).astype(np.uint64)
            sig[row] = int((v << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
                           & np.uint64(0x7FFFFFFFFFFFFFFF))
        return pa.table({id_col: batch.column(id_col), "simhash": pa.array(sig)})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
