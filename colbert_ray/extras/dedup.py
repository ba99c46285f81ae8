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

from colbert_ray.functions.hashing import popcount64 as _popcount64_2d

_NGRAM = 3


def _cat(parts: list) -> np.ndarray:
    """Empty-safe concatenate for per-batch result accumulators."""
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)


def _char_trigram_codes(texts: list[str]) -> list[np.ndarray]:
    """Distinct CHAR-trigram codes per text, as sorted uint64 arrays.

    Unlike ``_trigram_codes`` (byte trigrams) this packs unicode CODEPOINTS
    — three 21-bit codepoints (max 0x10FFFF < 2^21) into 63 bits — so the
    mapping distinct-char-trigram <-> distinct-code is injective and set
    sizes / intersections match the set-of-string-trigrams model
    exactly on any text (parity asserted in tests/test_dedup.py).
    Vectorized: utf-32 decode gives the codepoint array in one shot."""
    out = []
    for t in texts:
        cp = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
        if len(cp) < 3:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        codes = (cp[:-2] << np.uint64(42)) | (cp[1:-1] << np.uint64(21)) | cp[2:]
        out.append(np.unique(codes))
    return out


def _code_index(code_sets: list[np.ndarray]):
    """Flatten per-doc sorted code arrays into ONE (codes, owners) pair
    sorted by code — the probe-side inverted index for the vectorized
    verify tiers. Returns (codes, owners, sizes)."""
    n = len(code_sets)
    sizes = np.fromiter((len(c) for c in code_sets), dtype=np.int64, count=n)
    if sizes.sum() == 0:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64),
                sizes)
    codes = np.concatenate(code_sets)
    owners = np.repeat(np.arange(n, dtype=np.int64), sizes)
    order = np.argsort(codes, kind="stable")
    return codes[order], owners[order], sizes


def _intersect_counts(probe: np.ndarray, codes: np.ndarray,
                      owners: np.ndarray, n_ref: int) -> np.ndarray:
    """|probe ∩ ref_doc| for EVERY ref doc at once: searchsorted ranges in
    the flattened (code, owner) index, vectorized gather, bincount by owner.
    Codes are unique within each doc, so each hit contributes exactly 1."""
    if len(probe) == 0 or len(codes) == 0:
        return np.zeros(n_ref, dtype=np.int64)
    lo = np.searchsorted(codes, probe, side="left")
    hi = np.searchsorted(codes, probe, side="right")
    reps = hi - lo
    total = int(reps.sum())
    if total == 0:
        return np.zeros(n_ref, dtype=np.int64)
    excl = np.cumsum(reps) - reps
    gather = np.repeat(lo - excl, reps) + np.arange(total)
    return np.bincount(owners[gather], minlength=n_ref)


def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """One representative row per distinct content: (doc_id=min id in group,
    dup_count). The engine-level analog of D2 exact dedup.

    The shuffle carries TWO int64 halves of the sha256 digest instead of
    the 64-char hex string (4x fewer key bytes through the exchange;
    128-bit collision space, so grouping equals grouping by content)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hi = np.empty(len(texts), dtype=np.int64)
        lo = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            d = hashlib.sha256(t.encode()).digest()
            hi[i] = int.from_bytes(d[:8], "little", signed=True)
            lo[i] = int.from_bytes(d[8:16], "little", signed=True)
        return pa.table({id_col: batch.column(id_col),
                         "h_hi": pa.array(hi), "h_lo": pa.array(lo)})

    def first_by_id(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: [int(g[id_col].min())], "dup_count": [int(len(g))]}
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["h_hi", "h_lo"])
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
    # small bounded side: collect to the driver and broadcast as ONE
    # flattened sorted (code, owner) index — probed per batch doc with
    # searchsorted+bincount, so there is no inner loop over ref docs
    ref = ds.select_columns([id_col, text_col]).to_pandas()
    ref = ref.sort_values(id_col).reset_index(drop=True)
    ids = ref[id_col].to_numpy(dtype=np.int64)
    codes, owners, sizes = _code_index(_char_trigram_codes(ref[text_col].tolist()))
    ref_obj = ray.put((ids, codes, owners, sizes))

    def pairs_for(batch: pa.Table) -> pa.Table:
        r_ids, r_codes, r_owners, r_sizes = ray.get(ref_obj)
        b_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        b_sh = _char_trigram_codes(batch.column(text_col).to_pylist())
        out_a, out_b, out_i, out_u = [], [], [], []
        for bid, s in zip(b_ids, b_sh):
            if len(s) == 0:
                continue
            inter = _intersect_counts(s, r_codes, r_owners, len(r_ids))
            union = len(s) + r_sizes - inter
            keep = ((r_ids > bid) & (inter > 0)
                    & (inter * threshold_den >= threshold_num * union))
            if keep.any():
                k = np.flatnonzero(keep)
                out_a.append(np.full(len(k), bid, dtype=np.int64))
                out_b.append(r_ids[k])
                out_i.append(inter[k]); out_u.append(union[k])

        return pa.table({"id_a": pa.array(_cat(out_a), type=pa.int64()),
                         "id_b": pa.array(_cat(out_b), type=pa.int64()),
                         "n_common": pa.array(_cat(out_i), type=pa.int64()),
                         "n_union": pa.array(_cat(out_u), type=pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        pairs_for, batch_format="pyarrow"
    )


def containment_pairs(
    ds: "ray.data.Dataset",
    threshold_num: int = 9,
    threshold_den: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_id: int | None = None,
) -> "ray.data.Dataset":
    """DIRECTIONAL near-dup: character-trigram containment
    ``C(src -> dst) = |S(src) ∩ S(dst)| / |S(src)| >= num/den`` — the
    asymmetric complement of ``jaccard_pairs`` that catches quotes /
    boilerplate / subset documents Jaccard misses (a short doc inside a
    long one has tiny Jaccard but containment ~1; the Dolma/RefinedWeb
    inclusion-dedup signal). Integer-exact (n_common, n_src); both
    directions emitted independently; src == dst excluded.

    Like ``jaccard_pairs`` this is the bounded O(n^2) VERIFY tier
    (``max_id``-bounded broadcast side); at corpus scale run it after LSH
    blocking — the prefix-filter trick also applies (only the probe side
    prefixes; the indexed side must keep all shingles).
    """
    if max_id is not None:
        ds = ds.filter(expr=f"{id_col} < {max_id}")
    ref = ds.select_columns([id_col, text_col]).to_pandas()
    ref = ref.sort_values(id_col).reset_index(drop=True)
    ids = ref[id_col].to_numpy(dtype=np.int64)
    codes, owners, sizes = _code_index(_char_trigram_codes(ref[text_col].tolist()))
    ref_obj = ray.put((ids, codes, owners, sizes))

    def pairs_for(batch: pa.Table) -> pa.Table:
        r_ids, r_codes, r_owners, r_sizes = ray.get(ref_obj)
        b_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        b_sh = _char_trigram_codes(batch.column(text_col).to_pylist())
        src, dst, com, ns = [], [], [], []
        for bid, s in zip(b_ids, b_sh):          # batch rows are the SRC side
            if len(s) == 0:
                continue
            inter = _intersect_counts(s, r_codes, r_owners, len(r_ids))
            # empty-shingle ref docs are excluded (r_sizes > 0), matching
            # the SQL oracle's empty generate_series for short strings
            keep = ((r_ids != bid) & (r_sizes > 0)
                    & (inter * threshold_den >= threshold_num * len(s)))
            if keep.any():
                k = np.flatnonzero(keep)
                src.append(np.full(len(k), bid, dtype=np.int64))
                dst.append(r_ids[k])
                com.append(inter[k])
                ns.append(np.full(len(k), len(s), dtype=np.int64))

        return pa.table({"id_src": pa.array(_cat(src), type=pa.int64()),
                         "id_dst": pa.array(_cat(dst), type=pa.int64()),
                         "n_common": pa.array(_cat(com), type=pa.int64()),
                         "n_src": pa.array(_cat(ns), type=pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        pairs_for, batch_format="pyarrow"
    )


def prefix_filter_jaccard_pairs(
    ds: "ray.data.Dataset",
    threshold_num: int = 4,
    threshold_den: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Exact trigram-Jaccard similarity join via AllPairs/PPJoin PREFIX
    FILTERING (Bayardo et al. WWW'07; Xiao et al. WWW'08) — same output as
    ``jaccard_pairs`` (id_a < id_b, integer-exact n_common/n_union,
    J >= num/den) WITHOUT the O(n^2) all-pairs pass or any corpus broadcast.

    The filter: order all shingles globally by (df ASC, code ASC); a doc
    with s distinct shingles keeps only its first ``s - ceil(t*s) + 1``
    shingles in that order (its "prefix"). Any pair with J >= t MUST share
    at least one prefix shingle, so grouping prefix rows by shingle yields
    a complete candidate set — sized by the df of the RAREST shingles of
    each doc, not the corpus.

    Stages (all streaming):
    1. trigram document frequencies: vectorized per-batch partials ->
       ONE small groupby (trigram space is ≤2^24, vocab-bounded) ->
       broadcast the (code -> global rank) map via ``ray.put``.
    2. per-batch prefix emission: (code, doc_id, n_codes, codes_bin) — the
       packed distinct-shingle array rides the shuffle (~|doc| bytes),
       the text never does; ~(1-t)·s rows per doc.
    3. ``groupby(code)``: within-group pairwise EXACT verification
       (size-ratio prefilter ``den*|x| >= num*|y|`` first — J <= |x|/|y|),
       vectorized intersect per surviving pair.
    4. pair-distinct via ``groupby(id_a, id_b)`` (a pair can collide in
       several prefix shingles).

    Skew: a prefix shingle's group is bounded by its df; dfs are minimal
    by construction (each doc contributes its rarest shingles), the same
    assumption every published prefix-filter join makes. Deterministic at
    any parallelism level (global rank is data-defined, not seed-defined).
    """
    base = ds.select_columns([id_col, text_col])
    empty_df = pa.table({"code": pa.array([], type=pa.int64()),
                         "df_part": pa.array([], type=pa.int64())})

    def df_partials(batch: pa.Table) -> pa.Table:
        codes = _trigram_codes(batch.column(text_col).to_pylist())
        nonempty = [c for c in codes if len(c)]
        if not nonempty:
            return empty_df
        uniq, cnt = np.unique(np.concatenate(nonempty), return_counts=True)
        return pa.table({"code": pa.array(uniq.astype(np.int64)),
                         "df_part": pa.array(cnt.astype(np.int64))})

    df_pd = (base.map_batches(df_partials, batch_format="pyarrow",
                              zero_copy_batch=True)
             .groupby("code").sum("df_part").to_pandas())   # vocab-bounded
    codes_by_code = np.sort(df_pd["code"].to_numpy(dtype=np.int64))
    dfs_aligned = df_pd.sort_values("code")["sum(df_part)"].to_numpy(
        dtype=np.int64)
    # global shingle order (df ASC, code ASC) -> rank per code, aligned to
    # the code-sorted array so lookup is one searchsorted
    order = np.lexsort((codes_by_code, dfs_aligned))
    rank_aligned = np.empty(len(order), dtype=np.int64)
    rank_aligned[order] = np.arange(len(order), dtype=np.int64)
    rank_ref = ray.put((codes_by_code, rank_aligned))

    empty_prefix = pa.table({
        "code": pa.array([], type=pa.int64()),
        id_col: pa.array([], type=pa.int64()),
        "n_codes": pa.array([], type=pa.int64()),
        "codes_bin": pa.array([], type=pa.binary())})

    def prefix_rows(batch: pa.Table) -> pa.Table:
        by_code, rank = ray.get(rank_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        codes = _trigram_codes(batch.column(text_col).to_pylist())
        out_code, out_id, out_n, out_bin = [], [], [], []
        for did, cs in zip(ids, codes):
            s = len(cs)
            if s == 0:
                continue
            cs_i = cs.astype(np.int64)
            r = rank[np.searchsorted(by_code, cs_i)]
            # prefix length: s - ceil(t*s) + 1, integer ceil
            p = s - (threshold_num * s + threshold_den - 1) // threshold_den + 1
            pref = cs_i[np.argsort(r, kind="stable")[:p]]
            packed = cs.tobytes()
            out_code.extend(int(c) for c in pref)
            out_id.extend([int(did)] * len(pref))
            out_n.extend([s] * len(pref))
            out_bin.extend([packed] * len(pref))
        if not out_code:
            return empty_prefix
        return pa.table({"code": pa.array(out_code, type=pa.int64()),
                         id_col: pa.array(out_id, type=pa.int64()),
                         "n_codes": pa.array(out_n, type=pa.int64()),
                         "codes_bin": pa.array(out_bin, type=pa.binary())})

    empty_pairs = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                "id_b": pd.Series(dtype=np.int64),
                                "n_common": pd.Series(dtype=np.int64),
                                "n_union": pd.Series(dtype=np.int64)})

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        if len(g) < 2:
            return empty_pairs
        ids = g[id_col].to_numpy(dtype=np.int64)
        sizes = g["n_codes"].to_numpy(dtype=np.int64)
        bins = g["codes_bin"].tolist()
        out = []
        for i in range(len(ids) - 1):
            si = sizes[i]
            # size-ratio prefilter: J <= min/max, so den*min >= num*max
            small = np.minimum(si, sizes[i + 1:])
            large = np.maximum(si, sizes[i + 1:])
            cand = np.flatnonzero(threshold_den * small >=
                                  threshold_num * large)
            if not len(cand):
                continue
            ci = np.frombuffer(bins[i], dtype=np.uint64)
            for j in cand + i + 1:
                cj = np.frombuffer(bins[j], dtype=np.uint64)
                inter = len(np.intersect1d(ci, cj, assume_unique=True))
                if inter == 0:
                    continue
                union = int(si + sizes[j] - inter)
                if inter * threshold_den >= threshold_num * union:
                    out.append((int(ids[i]), int(ids[j]), inter, union))
        if not out:
            return empty_pairs
        a, b, n_c, n_u = map(np.array, zip(*out))
        return pd.DataFrame({"id_a": a.astype(np.int64),
                             "id_b": b.astype(np.int64),
                             "n_common": n_c.astype(np.int64),
                             "n_union": n_u.astype(np.int64)})

    def pair_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1][["id_a", "id_b", "n_common", "n_union"]]

    return (base.map_batches(prefix_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("code").map_groups(group_pairs, batch_format="pandas")
            .groupby(["id_a", "id_b"]).map_groups(pair_first,
                                                  batch_format="pandas"))


def prefix_filter_containment_pairs(
    ds: "ray.data.Dataset",
    threshold_num: int = 9,
    threshold_den: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """UNBOUNDED directional containment join via the probe-side prefix
    filter — same output contract as :func:`containment_pairs`
    (``C(src->dst) = |∩|/|S(src)| >= num/den``, integer-exact, both
    directions) over the ENTIRE table, no O(n^2) pass, no corpus
    broadcast.

    The asymmetric filter (the containment variant of AllPairs/PPJoin):
    only the PROBE (src) side prefixes — src keeps its
    ``s - ceil(t*s) + 1`` globally-rarest shingles; the indexed (dst) side
    must emit ALL its distinct shingles (a qualifying pair shares
    >= ceil(t*s_src) shingles, so at least one lands in src's prefix, but
    it may be ANY of dst's shingles). Each doc therefore ships ~s rows
    (vs ~(1-t)s for the symmetric join) — the published cost of exact
    containment joins; rows carry the packed code array, never text.

    Stages: global (df ASC, code ASC) shingle ranks broadcast once ->
    per-batch row emission with an ``is_prefix`` flag -> ``groupby(code)``
    directional verify (size prefilter ``den*s_dst >= num*s_src`` since
    ``|∩| <= s_dst``) -> pair-distinct groupby."""
    base = ds.select_columns([id_col, text_col])
    empty_df = pa.table({"code": pa.array([], type=pa.int64()),
                         "df_part": pa.array([], type=pa.int64())})

    def df_partials(batch: pa.Table) -> pa.Table:
        codes = _trigram_codes(batch.column(text_col).to_pylist())
        nonempty = [c for c in codes if len(c)]
        if not nonempty:
            return empty_df
        uniq, cnt = np.unique(np.concatenate(nonempty), return_counts=True)
        return pa.table({"code": pa.array(uniq.astype(np.int64)),
                         "df_part": pa.array(cnt.astype(np.int64))})

    df_pd = (base.map_batches(df_partials, batch_format="pyarrow",
                              zero_copy_batch=True)
             .groupby("code").sum("df_part").to_pandas())
    codes_by_code = np.sort(df_pd["code"].to_numpy(dtype=np.int64))
    dfs_aligned = df_pd.sort_values("code")["sum(df_part)"].to_numpy(
        dtype=np.int64)
    order = np.lexsort((codes_by_code, dfs_aligned))
    rank_aligned = np.empty(len(order), dtype=np.int64)
    rank_aligned[order] = np.arange(len(order), dtype=np.int64)
    rank_ref = ray.put((codes_by_code, rank_aligned))

    empty_rows = pa.table({
        "code": pa.array([], type=pa.int64()),
        id_col: pa.array([], type=pa.int64()),
        "n_codes": pa.array([], type=pa.int64()),
        "is_prefix": pa.array([], type=pa.bool_()),
        "codes_bin": pa.array([], type=pa.binary())})

    def all_rows(batch: pa.Table) -> pa.Table:
        by_code, rank = ray.get(rank_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        codes = _trigram_codes(batch.column(text_col).to_pylist())
        o_code, o_id, o_n, o_pf, o_bin = [], [], [], [], []
        for did, cs in zip(ids, codes):
            s = len(cs)
            if s == 0:
                continue
            cs_i = cs.astype(np.int64)
            r = rank[np.searchsorted(by_code, cs_i)]
            p = s - (threshold_num * s + threshold_den - 1) // threshold_den + 1
            pref_pos = np.argsort(r, kind="stable")[:p]
            is_pf = np.zeros(s, dtype=bool)
            is_pf[pref_pos] = True
            packed = cs.tobytes()
            o_code.extend(int(c) for c in cs_i)
            o_id.extend([int(did)] * s)
            o_n.extend([s] * s)
            o_pf.extend(is_pf.tolist())
            o_bin.extend([packed] * s)
        if not o_code:
            return empty_rows
        return pa.table({"code": pa.array(o_code, type=pa.int64()),
                         id_col: pa.array(o_id, type=pa.int64()),
                         "n_codes": pa.array(o_n, type=pa.int64()),
                         "is_prefix": pa.array(o_pf, type=pa.bool_()),
                         "codes_bin": pa.array(o_bin, type=pa.binary())})

    empty_pairs = pd.DataFrame({"id_src": pd.Series(dtype=np.int64),
                                "id_dst": pd.Series(dtype=np.int64),
                                "n_common": pd.Series(dtype=np.int64),
                                "n_src": pd.Series(dtype=np.int64)})

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one row per doc, prefix flag OR-ed (a doc hits a group once per
        # distinct shingle by construction, but keep this defensive)
        g = (g.sort_values([id_col, "is_prefix"],
                           ascending=[True, False])
             .drop_duplicates(subset=[id_col]))
        ids = g[id_col].to_numpy(dtype=np.int64)
        sizes = g["n_codes"].to_numpy(dtype=np.int64)
        pf = g["is_prefix"].to_numpy(dtype=bool)
        bins = g["codes_bin"].tolist()
        srcs = np.flatnonzero(pf)
        if not len(srcs) or len(ids) < 2:
            return empty_pairs
        out = []
        for i in srcs:
            si = sizes[i]
            # |∩| <= s_dst, so containment needs den*s_dst >= num*s_src
            cand = np.flatnonzero(
                (threshold_den * sizes >= threshold_num * si)
                & (ids != ids[i]))
            if not len(cand):
                continue
            ci = np.frombuffer(bins[i], dtype=np.uint64)
            for j in cand:
                cj = np.frombuffer(bins[j], dtype=np.uint64)
                inter = len(np.intersect1d(ci, cj, assume_unique=True))
                if inter * threshold_den >= threshold_num * si:
                    out.append((int(ids[i]), int(ids[j]), inter, int(si)))
        if not out:
            return empty_pairs
        a, b, n_c, n_s = map(np.array, zip(*out))
        return pd.DataFrame({"id_src": a.astype(np.int64),
                             "id_dst": b.astype(np.int64),
                             "n_common": n_c.astype(np.int64),
                             "n_src": n_s.astype(np.int64)})

    def pair_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1][["id_src", "id_dst", "n_common", "n_src"]]

    return (base.map_batches(all_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("code").map_groups(group_pairs, batch_format="pandas")
            .groupby(["id_src", "id_dst"]).map_groups(
                pair_first, batch_format="pandas"))


_MINHASH_K = 64
# 8 bands x 8 rows: band-collision prob = j^8, so merely-similar docs
# (j~0.6-0.7) rarely collide and buckets stay small on look-alike corpora.
# Recall at j=0.8 is 1-(1-0.8^8)^8 ~ 0.77, ~0.99 at j=0.9, 1.0 at j=1.0 —
# the standard LSH trade; tune bands/rows per workload.
_LSH_BANDS = 8
_LSH_ROWS = _MINHASH_K // _LSH_BANDS


def _trigram_codes(texts: list[str]) -> list[np.ndarray]:
    """Distinct byte-TRIGRAM codes per text — fully vectorized (each trigram
    packed into a 24-bit int; no per-shingle hashing; the shingle size is
    fixed at 3 by the packing arithmetic). Equivalent to char trigrams for
    ASCII text."""
    n = 3
    out = []
    for t in texts:
        b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.uint64)
        if len(b) < n:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        codes = (b[:-2] << np.uint64(16)) | (b[1:-1] << np.uint64(8)) | b[2:]
        out.append(np.unique(codes))
    return out


def minhash_params(k: int = _MINHASH_K):
    """The deterministic MinHash/LSH constants, exposed so the SQL oracle
    can inline the SAME permutation and band-mixer values the engine uses:
    (a, b) uint64 arrays of length k for the universal-hash permutations
    ``(a*code + b) mod 2^64``, and the (bands, rows) uint64 band mixer."""
    rng = np.random.default_rng(12345)
    a = rng.integers(1, (1 << 61) - 1, size=k, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, (1 << 61) - 1, size=k, dtype=np.uint64)
    rng2 = np.random.default_rng(777)
    mixer = rng2.integers(1, (1 << 63) - 1,
                          size=(_LSH_BANDS, _LSH_ROWS),
                          dtype=np.uint64) | np.uint64(1)
    return a, b, mixer


#: constants are seeded-fixed by design — computed once per process, not
#: per batch (two RNG constructions + three array draws per map_batches
#: call was pure hot-path waste)
_MINHASH_CONSTS = minhash_params()


def _minhash_matrix(code_sets: list[np.ndarray], k: int = _MINHASH_K) -> np.ndarray:
    """k minhashes per doc via k universal-hash permutations of the integer
    shingle codes (seeded, deterministic, vectorized)."""
    a, b, _ = _MINHASH_CONSTS if k == _MINHASH_K else minhash_params(k)
    out = np.full((len(code_sets), k), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, hs in enumerate(code_sets):
        if len(hs) == 0:
            continue
        # (a*h + b) mod 2^64, min per permutation — fully vectorized
        vals = (hs[None, :] * a[:, None] + b[:, None])
        out[i] = vals.min(axis=1)
    return out


def _pack_codes(code_sets: list[np.ndarray]) -> list[bytes]:
    return [c.tobytes() for c in code_sets]


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """MinHash+LSH near-dup candidates verified by true trigram Jaccard.

    Cluster-shaped end to end (nothing is ever materialized on the driver
    and no whole-corpus broadcast exists):

    1. ``map_batches``: minhash signatures per batch; emit one row per
       (band, doc) carrying (band, band_hash, doc_id, sig_bin) — the packed
       64-value signature (512 B/doc) rides through the shuffle, the TEXT
       never does.
    2. ``groupby(band, band_hash)``: within-bucket candidate pairs,
       prefiltered by the ESTIMATED jaccard (matching-minhash fraction,
       computed from the sigs carried into the bucket) so a giant bucket of
       merely-look-alike docs doesn't explode into O(n^2) exact checks.
    3. pair-distinct via ``groupby(id_a, id_b)``.
    4. verify by TRUE trigram jaccard via two hash JOINS of the candidate
       pairs against a (doc_id, packed shingle codes) dataset — the
       ray_guide join pattern; candidates ≪ corpus.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    Deterministic (fixed seeds) at any parallelism level.
    """
    est_cut = max(0.0, threshold - 0.15)     # safety margin on the estimate

    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        mh = _minhash_matrix(_trigram_codes(texts))
        n = len(texts)
        # band hash = seeded multiply-mix over the band's rows + splitmix64
        # finalizer — fully vectorized, deterministic across processes (no
        # per-row hashlib loop; a rare collision only creates a candidate
        # pair, which exact verification then rejects)
        _, _, mixer = _MINHASH_CONSTS
        bh = (mh.reshape(n, _LSH_BANDS, _LSH_ROWS) * mixer[None]).sum(axis=2)
        bh ^= bh >> np.uint64(30)
        bh *= np.uint64(0xBF58476D1CE4E5B9)
        bh ^= bh >> np.uint64(27)
        band_hash = (bh & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        sig_bin = [mh[i].tobytes() for i in range(n)]
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(_LSH_BANDS, dtype=np.int32), n)),
                "band_hash": pa.array(band_hash.T.reshape(-1)),
                id_col: pa.array(np.tile(
                    batch.column(id_col).to_numpy(zero_copy_only=False), _LSH_BANDS)),
                "sig_bin": pa.array(sig_bin * _LSH_BANDS, type=pa.binary()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64)})
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return empty
        m = np.frombuffer(b"".join(g["sig_bin"]), dtype=np.uint64)
        m = m.reshape(len(ids), _MINHASH_K)
        out_a, out_b = [], []
        chunk = 256
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            est = (m[lo:hi, None, :] == m[None, :, :]).mean(axis=2)
            ai, bi = np.nonzero(est >= est_cut)
            keep = (ai + lo) < bi            # upper triangle, global order
            out_a.append(ids[ai[keep] + lo])
            out_b.append(ids[bi[keep]])
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    base = ds.select_columns([id_col, text_col])
    candidates = (
        base.map_batches(sigs, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # verify stage: ONE hash join of the exploded pair-halves against the
    # packed shingle codes (ids + codes through the join; never the text,
    # never a broadcast). Pairs are then reassembled per HASH BUCKET — not
    # per pair — so the candidate set is processed in ~n_pair_buckets
    # vectorized pandas merges instead of one Python call per pair; the
    # same bucket pass drops duplicate candidates (a pair collides in
    # several bands), so no separate pair-distinct shuffle is needed.
    n_pair_buckets = 256

    def codes_tbl(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            "codes_bin": pa.array(
                _pack_codes(_trigram_codes(batch.column(text_col).to_pylist())),
                type=pa.binary()),
        })

    codes = base.map_batches(codes_tbl, batch_format="pyarrow")

    def explode_pairs(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        bucket = ((a * np.int64(1000003) + b) % n_pair_buckets).astype(np.int32)
        return pa.table({
            id_col: pa.array(np.concatenate([a, b]).astype(np.int64)),
            "id_a": pa.array(np.concatenate([a, a]).astype(np.int64)),
            "id_b": pa.array(np.concatenate([b, b]).astype(np.int64)),
            "side": pa.array(np.repeat(np.array([0, 1], dtype=np.int32),
                                       len(a))),
            "pair_bucket": pa.array(np.concatenate([bucket, bucket])),
        })

    halves = candidates.map_batches(explode_pairs, batch_format="pyarrow")
    joined = halves.join(codes, join_type="inner", on=(id_col,),
                         num_partitions=num_partitions)

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64),
                              "jaccard": pd.Series(dtype=np.float64)})
        g = g.drop_duplicates(subset=["id_a", "id_b", "side"])
        merged = g[g["side"] == 0].merge(
            g[g["side"] == 1], on=["id_a", "id_b"], suffixes=("_a", "_b"))
        out_a, out_b, out_j = [], [], []
        for ia, ib, ca, cb in zip(merged["id_a"], merged["id_b"],
                                  merged["codes_bin_a"], merged["codes_bin_b"]):
            sa = np.frombuffer(ca, dtype=np.uint64)
            sb = np.frombuffer(cb, dtype=np.uint64)
            if len(sa) == 0 or len(sb) == 0:
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac = inter / union if union else 0.0
            if jac >= threshold:
                out_a.append(int(ia)); out_b.append(int(ib)); out_j.append(jac)
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": np.array(out_a, dtype=np.int64),
                             "id_b": np.array(out_b, dtype=np.int64),
                             "jaccard": np.array(out_j, dtype=np.float64)})

    return joined.groupby("pair_bucket").map_groups(
        verify_bucket, batch_format="pandas")


def simhash(ds: "ray.data.Dataset", text_col: str = "text",
            id_col: str = "doc_id") -> "ray.data.Dataset":
    """64-bit SimHash of the token multiset (near-dup signature).

    Token hashes are vectorized FNV-1a over dictionary uniques; the per-doc
    ±1-bit reduction is one ``np.add.reduceat`` over the doc offsets (no
    Python loop over rows or tokens). Masked to 63 bits (int64-positive).
    SQL-oracle-exact (FNV is plain modular arithmetic)."""
    from colbert_ray.config import EngineConfig
    from colbert_ray.functions.hashing import fnv1a64_strings
    from colbert_ray.functions.tokenizer import doc_term_frequencies

    cfg = EngineConfig()

    def fn(batch: pa.Table) -> pa.Table:
        _, terms, tfs = doc_term_frequencies(batch.column(text_col), cfg)
        offsets = terms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        w = tfs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        th = fnv1a64_strings(terms.flatten())
        n = batch.num_rows
        sig = np.zeros(n, dtype=np.int64)
        if len(th):
            bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64) * 2 - 1    # ±1 per bit
            contrib = bits * w[:, None]
            lens = np.diff(offsets)
            nonempty = lens > 0
            starts = offsets[:-1][nonempty]
            sums = np.add.reduceat(contrib, starts, axis=0)
            v = (sums > 0).astype(np.uint64)
            packed = (v << np.arange(64, dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64) & np.uint64(0x7FFFFFFFFFFFFFFF)
            sig[nonempty] = packed.astype(np.int64)
        return pa.table({id_col: batch.column(id_col), "simhash": pa.array(sig)})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def benchmark_contamination(
    ds: "ray.data.Dataset",
    benchmark_ds: "ray.data.Dataset",
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Benchmark decontamination (the standard LLM-training-data hygiene
    pass): flag every document sharing at least one word n-gram with a
    benchmark/eval set. Returns ``(doc_id, n_matched)`` for contaminated
    docs only — ``n_matched`` = DISTINCT benchmark n-grams found in the doc.

    Scale shape: the benchmark side is SMALL by construction (eval sets are
    thousands of rows, not terabytes) — its n-gram set is built once and
    broadcast via ``ray.put``; the corpus side STREAMS through one
    ``map_batches`` membership test. No shuffle at any size; corpus docs
    never leave their batch. Tokenization matches the engine tokenizer
    (functions/tokenizer.py) so the SQL oracle mirrors it exactly.
    """
    import ray as _ray

    from colbert_ray.config import EngineConfig
    from colbert_ray.functions.tokenizer import tokenize_column

    cfg = EngineConfig()

    def _grams(texts_tokens: list[list[str]]) -> list[set]:
        # apply the engine tokenizer's length contract (raw tokenize_column
        # keeps empty edge tokens that doc_term_frequencies — and the SQL
        # oracle's list_filter — drop)
        out = []
        for toks in texts_tokens:
            toks = [t for t in toks
                    if cfg.min_token_len <= len(t) <= cfg.max_token_len]
            out.append(
                {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
                if len(toks) >= n else set())
        return out

    bench = benchmark_ds.select_columns([text_col]).to_pandas()
    bench_tokens = tokenize_column(
        pa.chunked_array([pa.array(bench[text_col].tolist(),
                                   type=pa.string())]), cfg).to_pylist()
    bench_grams: set = set()
    for g in _grams(bench_tokens):
        bench_grams |= g
    bench_ref = _ray.put(bench_grams)

    def flag(batch: pa.Table) -> pa.Table:
        bg = _ray.get(bench_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        toks = tokenize_column(batch.column(text_col), cfg).to_pylist()
        out_id, out_n = [], []
        for did, g in zip(ids, _grams(toks)):
            hits = len(g & bg)
            if hits:
                out_id.append(int(did))
                out_n.append(hits)
        return pa.table({id_col: pa.array(out_id, type=pa.int64()),
                         "n_matched": pa.array(out_n, type=pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        flag, batch_format="pyarrow")


def connected_components(
    pairs: "ray.data.Dataset",
    col_a: str = "id_a",
    col_b: str = "id_b",
    node_col: str = "node",
    cluster_col: str = "cluster_id",
    num_partitions: int = 8,
    max_rounds: int = 64,
) -> "ray.data.Dataset":
    """Cluster the dup-pair graph: (node, cluster_id) for every node that
    appears in ``pairs``, with ``cluster_id`` = the smallest node id in the
    node's connected component. This is the step BETWEEN pair finding
    (``jaccard_pairs`` / ``minhash_lsh_pairs``) and the keep decision
    (``dedup_keep``): transitive duplicates (A~B, B~C) land in one cluster
    even when A~C was never emitted as a pair.

    Algorithm: hash-min label propagation with pointer jumping (the
    MapReduce-CC family, cf. Kiveris et al., "Connected Components in
    MapReduce and Beyond") — every round each node's label drops to
    min(label(label(node)), min over neighbors' labels), which converges in
    O(log n) rounds. Each round is two hash joins + one groupby-min over the
    PAIR graph only (nodes that occur in some dup pair — orders of magnitude
    smaller than the corpus); labels are materialized per round (tiny) so
    lineage doesn't re-execute, and convergence is detected by the label sum
    (labels only decrease, so an unchanged sum is a fixed point). Nodes with
    no pair are implicitly their own singleton cluster and are NOT emitted.
    """
    from ray.data.aggregate import Min, Sum

    def sym(b: pa.Table) -> pa.Table:
        a = b.column(col_a).to_numpy(zero_copy_only=False).astype(np.int64)
        c = b.column(col_b).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": np.concatenate([a, c]),
                         "v": np.concatenate([c, a])})

    edges = pairs.select_columns([col_a, col_b]).map_batches(
        sym, batch_format="pyarrow", zero_copy_batch=True).materialize()

    empty = ray.data.from_arrow(pa.table({
        node_col: pa.array([], type=pa.int64()),
        cluster_col: pa.array([], type=pa.int64())}))
    if edges.count() == 0:
        return empty

    # round 0: label(u) = min(u, min neighbor)
    def self_min(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("u"),
            "label": pc.min_element_wise(b.column("u"), b.column("min(v)")),
        })

    labels = (edges.groupby("u").aggregate(Min("v"))
              .map_batches(self_min, batch_format="pyarrow").materialize())
    prev_sum = None

    def jump_out(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"), "label": b.column("label2")})

    def prop_out(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("v"), "label": b.column("label")})

    def rename2(b: pa.Table) -> pa.Table:
        return pa.table({"node2": b.column("node"), "label2": b.column("label")})

    for _ in range(max_rounds):
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s
        lab2 = labels.map_batches(rename2, batch_format="pyarrow")
        # pointer jump: label(node) <- label(label(node)); every label value
        # is itself a node (min over node ids), so the inner join is total
        jumped = labels.join(lab2, join_type="inner", on=("label",),
                             right_on=("node2",),
                             num_partitions=num_partitions
                             ).map_batches(jump_out, batch_format="pyarrow")
        # neighbor propagation: node <- min over neighbors' labels
        prop = edges.join(labels, join_type="inner", on=("u",),
                          right_on=("node",),
                          num_partitions=num_partitions
                          ).map_batches(prop_out, batch_format="pyarrow")
        # repartition before materializing: the union+groupby can emit
        # schema-less empty blocks, and a downstream join partition fed
        # ONLY those loses its key columns (pyarrow "no match for field");
        # merging blocks restores a typed schema on every block
        labels = (jumped.union(prop).groupby("node")
                  .aggregate(Min("label", alias_name="label"))
                  .repartition(num_partitions).materialize())
    else:
        raise RuntimeError(f"connected_components: no convergence "
                           f"in {max_rounds} rounds")

    def final(b: pa.Table) -> pa.Table:
        return pa.table({node_col: b.column("node"),
                         cluster_col: b.column("label")})

    return labels.map_batches(final, batch_format="pyarrow")


def dedup_keep(
    ds: "ray.data.Dataset",
    clusters: "ray.data.Dataset",
    id_col: str = "doc_id",
    node_col: str = "node",
    cluster_col: str = "cluster_id",
) -> "ray.data.Dataset":
    """Filter the corpus to one survivor per duplicate cluster: the doc
    whose id IS the cluster id (the component min) is kept, every other
    clustered doc is dropped; docs in no cluster pass through untouched.

    Scale shape: the drop set (clustered nodes != their cluster min) is tiny
    — bounded by the number of near-duplicate docs, not the corpus — so it
    is collected once, ``ray.put`` once, and the corpus STREAMS through a
    stateless membership filter; no corpus-side shuffle or join."""
    import ray as _ray

    drop_tbl = clusters.map_batches(
        lambda b: b.filter(pc.not_equal(b.column(node_col),
                                        b.column(cluster_col))),
        batch_format="pyarrow").select_columns([node_col]).to_pandas()
    drop_ref = _ray.put(np.sort(drop_tbl[node_col].to_numpy(dtype=np.int64)))

    def keep(batch: pa.Table) -> pa.Table:
        drop = _ray.get(drop_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(drop) == 0:
            return batch
        pos = np.searchsorted(drop, ids)
        pos[pos >= len(drop)] = len(drop) - 1
        return batch.filter(pa.array(drop[pos] != ids))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Fuzzy vocabulary matching: edit-distance-1 term pairs (SymSpell family)
# ---------------------------------------------------------------------------
# Typo-level dictionary dedup: find every pair of vocabulary terms at
# Levenshtein distance EXACTLY 1 without the O(V^2) cross product. Candidate
# generation is the deletion-neighborhood trick (Garbe's SymSpell, public):
# each term emits its identity key plus its |t| single-character deletions;
# two terms at ed<=1 always share a key (substitution -> same-position
# deletions collide; insert/delete -> the shorter term IS a deletion of the
# longer), so grouping by key yields a candidate superset (it also admits
# some ed-2 pairs, e.g. transpositions "ab"/"ba" — the vectorized verify
# removes them). Exchange volume: O(V x avg_len) key rows — vocabulary-
# scale, never corpus-scale.


def _ed1_pair_mask(a_list, b_list) -> np.ndarray:
    """Vectorized exact Levenshtein==1 check for paired ASCII term arrays
    (tokens are [a-z0-9]+ by construction, so bytes == chars). No per-pair
    Python: pairs are padded into (n, W) uint8 matrices and verified with
    numpy comparisons only."""
    n = len(a_list)
    if n == 0:
        return np.zeros(0, dtype=bool)
    aa = np.asarray(a_list, dtype=object)
    bb = np.asarray(b_list, dtype=object)
    la = np.asarray([len(x) for x in a_list], dtype=np.int64)
    lb = np.asarray([len(x) for x in b_list], dtype=np.int64)
    # orient: A = shorter (or equal), B = longer
    swap = la > lb
    aa[swap], bb[swap] = bb[swap], aa[swap]
    la2 = np.minimum(la, lb)
    lb2 = np.maximum(la, lb)
    W = int(lb2.max()) + 1
    A = np.asarray(aa, dtype=f"S{W}").view(np.uint8).reshape(n, W)
    B = np.asarray(bb, dtype=f"S{W}").view(np.uint8).reshape(n, W)
    diff = A != B
    out = np.zeros(n, dtype=bool)
    same_len = la2 == lb2
    out[same_len] = diff[same_len].sum(axis=1) == 1
    one_off = lb2 == la2 + 1
    if one_off.any():
        D, Bo, Ao = diff[one_off], B[one_off], A[one_off]
        # first mismatch position (guaranteed to exist: B has a real char
        # where A has padding, if nowhere earlier)
        p = np.argmax(D, axis=1)
        # deletion check: A[p:] must equal B[p+1:] elementwise (both tails
        # carry the \0 padding, so full-width shifted comparison works)
        M = Ao[:, :-1] == Bo[:, 1:]
        suffix_ok = np.logical_and.accumulate(M[:, ::-1], axis=1)[:, ::-1]
        out[one_off] = suffix_ok[np.arange(len(p)), p]
    return out


def fuzzy_term_pairs(ds: "ray.data.Dataset",
                     text_col: str = "text") -> "pa.Table":
    """All vocabulary term pairs (term_a < term_b) at Levenshtein distance
    exactly 1 over the corpus' token vocabulary. Returns a small Arrow table
    ``(term_a, term_b)`` sorted lexicographically."""
    from colbert_ray.extras.textstats import term_stats

    vocab_ds = term_stats(ds, text_col).select_columns(["term"])

    def del_keys(b: pa.Table) -> pa.Table:
        terms = b.column("term")
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        lens = pc.utf8_length(terms).to_numpy(zero_copy_only=False)
        max_len = int(lens.max()) if len(lens) else 0
        keys = [terms]          # identity key
        parents = [np.arange(len(terms))]
        for d in range(max_len):
            sel = np.flatnonzero(lens > d)
            if len(sel) == 0:
                continue
            sub = terms.take(pa.array(sel))
            head = pc.utf8_slice_codeunits(sub, 0, d)
            tail = pc.utf8_slice_codeunits(sub, d + 1, 2**31 - 1)
            keys.append(pc.binary_join_element_wise(head, tail, ""))
            parents.append(sel)
        flat_keys = pa.concat_arrays([k.combine_chunks() if
                                      isinstance(k, pa.ChunkedArray) else k
                                      for k in keys])
        flat_parent = np.concatenate(parents)
        t_np = terms.to_numpy(zero_copy_only=False)
        return pa.table({"key": flat_keys,
                         "term": pa.array(t_np[flat_parent])})

    def pairs_in_group(g) -> "pd.DataFrame":
        ts = sorted(set(g["term"].tolist()))
        if len(ts) < 2:
            return pd.DataFrame({"term_a": pd.Series([], dtype=object),
                                 "term_b": pd.Series([], dtype=object)})
        i, j = np.triu_indices(len(ts), k=1)
        arr = np.asarray(ts, dtype=object)
        return pd.DataFrame({"term_a": arr[i], "term_b": arr[j]})

    cand = (vocab_ds.map_batches(del_keys, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby("key")
            .map_groups(pairs_in_group, batch_format="pandas")
            .groupby(["term_a", "term_b"]).count()   # dedupe across keys
            .to_pandas())
    if cand.empty:
        return pa.table({"term_a": pa.array([], type=pa.string()),
                         "term_b": pa.array([], type=pa.string())})
    keep = _ed1_pair_mask(cand["term_a"].tolist(), cand["term_b"].tolist())
    out = (cand.loc[keep, ["term_a", "term_b"]]
           .sort_values(["term_a", "term_b"]).reset_index(drop=True))
    return pa.table({"term_a": pa.array(out["term_a"], type=pa.string()),
                     "term_b": pa.array(out["term_b"], type=pa.string())})


def sql_fuzzy_pairs_expr(*, table: str, text_col: str) -> str:
    """DuckDB twin of :func:`fuzzy_term_pairs` — the plain quadratic
    definition (levenshtein == 1 over the distinct-term self-join, with the
    sound |len diff| <= 1 prefilter); the deletion-neighborhood join is an
    execution strategy, not a semantics change."""
    from colbert_ray.config import EngineConfig
    from colbert_ray.functions.tokenizer import sql_tokenize_expr

    tok = sql_tokenize_expr(text_col, EngineConfig())
    return f"""
WITH v AS (SELECT DISTINCT unnest({tok}) AS term FROM {table})
SELECT a.term AS term_a, b.term AS term_b
FROM v a JOIN v b
ON a.term < b.term
AND abs(length(a.term) - length(b.term)) <= 1
AND levenshtein(a.term, b.term) = 1
ORDER BY term_a, term_b
"""


# ---------------------------------------------------------------------------
# exact duplicated-substring spans (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — the cross-document repeated-substring
# operator; distinct from whole-doc near-dup above)
# ---------------------------------------------------------------------------

_SPAN_GRAM = 8
_SPAN_HASH_BASE = np.uint64(1000003)


def _token_hash_windows(tok_list: pa.ListArray, gram_len: int):
    """Per-doc rolling uint64 hashes of every ``gram_len``-token window.

    Token strings are hashed once per DISTINCT token in the batch (blake2b,
    8 bytes) via dictionary encoding; window hashes are a vectorized
    polynomial combine over the per-token hashes (wraparound uint64 — the
    same arithmetic at any parallelism level, so results are deterministic).

    Returns (offsets, flat_tokens, per-doc list of (start_positions, hashes)).
    """
    off = tok_list.offsets.to_numpy()
    off = (off - off[0]).astype(np.int64)
    flat = tok_list.flatten()
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = d.dictionary.to_pylist()
    uh = np.fromiter(
        (int.from_bytes(hashlib.blake2b(u.encode(), digest_size=8).digest(),
                        "little") for u in uniq),
        dtype=np.uint64, count=len(uniq))
    th = uh[codes] if len(codes) else np.empty(0, dtype=np.uint64)
    pows = _SPAN_HASH_BASE ** np.arange(gram_len, dtype=np.uint64)
    per_doc = []
    for i in range(len(off) - 1):
        seg = th[off[i]:off[i + 1]]
        n = len(seg) - gram_len + 1
        if n <= 0:
            per_doc.append((np.empty(0, np.int64), np.empty(0, np.uint64)))
            continue
        win = np.lib.stride_tricks.sliding_window_view(seg, gram_len)
        gh = (win * pows).sum(axis=1, dtype=np.uint64)
        per_doc.append((np.arange(n, dtype=np.int64), gh))
    return off, flat, per_doc


def duplicate_spans(
    ds: "ray.data.Dataset",
    gram_len: int = _SPAN_GRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg=None,
) -> "ray.data.Dataset":
    """Merged per-document token spans covered by any ``gram_len``-token
    substring that also occurs in at least one OTHER document.

    Output: one row per maximal span — (doc_id, start_tok, end_tok, n_toks)
    with 0-based ``start_tok`` and exclusive ``end_tok`` in token positions
    (the oracle twin reproduces this from 1-based SQL positions).

    Scale shape (reference capability: corpus-level dedup; the published
    alternative is a suffix array, Lee et al. §4 — this is the distributed
    hash-shuffle equivalent):

    1. **Candidate hashes** — map_batches emits one PARTIAL row per distinct
       window hash per batch (hash, min_doc, max_doc); a groupby-min/max
       keeps only hashes whose occurrences span >= 2 distinct docs
       (``min != max`` <=> >= 2 distinct). The shuffle carries ~one 32-byte
       row per corpus token — the same order of data movement a suffix-array
       build would need; nothing is driver-side.
    2. **Broadcast + verify** — the duplicated-hash set (tiny: only truly
       repeated content survives) is ``ray.put`` once; a second pass emits
       (gram STRING, doc, pos) only for candidate positions, and a
       groupby(gram) re-checks >= 2 distinct docs on the exact string, so a
       uint64 collision can create no false span.
    3. **Island merge** — covered token positions are merged per doc into
       maximal intervals (vectorized diff/cumsum inside one groupby(doc)).
    """
    from ray.data.aggregate import Max, Min

    from colbert_ray.config import EngineConfig
    from colbert_ray.functions.tokenizer import tokenize_column

    cfg = cfg or EngineConfig()
    src = ds.select_columns([id_col, text_col])

    def partials(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch.column(text_col), cfg)
        _, _, per_doc = _token_hash_windows(toks, gram_len)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        ghs, dids = [], []
        for did, (_, gh) in zip(ids, per_doc):
            if len(gh):
                ghs.append(gh)
                dids.append(np.full(len(gh), did, dtype=np.int64))
        if not ghs:
            return pa.table({"gh": pa.array([], type=pa.int64()),
                             "dmin": pa.array([], type=pa.int64()),
                             "dmax": pa.array([], type=pa.int64())})
        gh = np.concatenate(ghs).view(np.int64)
        did = np.concatenate(dids)
        # batch-local combine: one row per distinct hash
        order = np.argsort(gh, kind="stable")
        gh_s, did_s = gh[order], did[order]
        starts = np.flatnonzero(np.r_[True, gh_s[1:] != gh_s[:-1]])
        ends = np.r_[starts[1:], len(gh_s)]
        dmin = np.minimum.reduceat(did_s, starts)
        dmax = np.maximum.reduceat(did_s, starts)
        return pa.table({"gh": gh_s[starts], "dmin": dmin, "dmax": dmax})

    agg = (
        src.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gh")
        .aggregate(Min("dmin", alias_name="dmin"),
                   Max("dmax", alias_name="dmax"))
    )
    dup_df = agg.filter(expr="dmin != dmax").select_columns(["gh"]).to_pandas()
    dup_sorted = np.sort(dup_df["gh"].to_numpy(dtype=np.int64))
    dup_ref = ray.put(dup_sorted)

    def candidates(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        toks = tokenize_column(batch.column(text_col), cfg)
        off, flat, per_doc = _token_hash_windows(toks, gram_len)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        flat_py = None
        grams, dids, poss = [], [], []
        for i, (pos, gh) in enumerate(per_doc):
            if not len(gh):
                continue
            hit = np.flatnonzero(np.isin(gh.view(np.int64), dup,
                                         assume_unique=False))
            if not len(hit):
                continue
            if flat_py is None:
                flat_py = flat.to_pylist()
            base = int(off[i])
            for p in pos[hit]:
                grams.append(" ".join(flat_py[base + p:base + p + gram_len]))
                dids.append(int(ids[i]))
                poss.append(int(p))
        return pa.table({"gram": pa.array(grams, type=pa.string()),
                         id_col: pa.array(dids, type=pa.int64()),
                         "pos": pa.array(poss, type=pa.int64())})

    cand = src.map_batches(candidates, batch_format="pyarrow",
                           zero_copy_batch=True)

    def verified_cover(g: pd.DataFrame) -> pd.DataFrame:
        # exact-string re-check: >= 2 distinct docs required per gram
        if g[id_col].nunique() < 2:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "tokpos": pd.Series([], dtype=np.int64)})
        pos = g["pos"].to_numpy(dtype=np.int64)
        did = g[id_col].to_numpy(dtype=np.int64)
        cover = pos[:, None] + np.arange(gram_len, dtype=np.int64)[None, :]
        return pd.DataFrame({id_col: np.repeat(did, gram_len),
                             "tokpos": cover.ravel()})

    covered = cand.groupby("gram").map_groups(
        verified_cover, batch_format="pandas")

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        did = int(g[id_col].iloc[0])
        p = np.unique(g["tokpos"].to_numpy(dtype=np.int64))
        cut = np.flatnonzero(np.r_[True, np.diff(p) > 1])
        starts = p[cut]
        ends = p[np.r_[cut[1:] - 1, len(p) - 1]] + 1
        return pd.DataFrame({
            id_col: np.full(len(starts), did, dtype=np.int64),
            "start_tok": starts, "end_tok": ends,
            "n_toks": ends - starts})

    return covered.groupby(id_col).map_groups(islands, batch_format="pandas")


# ---------------------------------------------------------------------------
# C4/RefinedWeb-style duplicated-span REMOVAL with document rewrite
# (distinct from duplicate_spans above, which only DETECTS repeated runs)
# ---------------------------------------------------------------------------

_SPAN_DEDUP_W = 10
_SPAN_NO_MAX = 1 << 20        # packed key = doc_id * 2^20 + span_no


def _split_offsets(texts: pa.Array):
    """(normalized int64 offsets, flat word values) of a ' '-split."""
    lists = pc.split_pattern(texts, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return off - off[0], lists.flatten()


def _span_bounds(off: np.ndarray, span_w: int):
    """Per-doc consecutive span windows over the flat word array:
    (span start offsets incl. final end, doc index per span, within-doc
    span_no, word count per span)."""
    lens = np.diff(off)
    nspans = -(-lens // span_w)             # ceil; len >= 1 after split
    doc_rep = np.repeat(np.arange(len(lens)), nspans)
    span_base = np.cumsum(nspans) - nspans
    sp_no = np.arange(len(doc_rep), dtype=np.int64) - span_base[doc_rep]
    starts = off[:-1][doc_rep] + sp_no * span_w
    bounds = np.append(starts, off[-1])
    counts = np.full(len(sp_no), span_w, dtype=np.int64)
    last = span_base + nspans - 1
    counts[last] = lens - (nspans - 1) * span_w
    return bounds, doc_rep, sp_no, counts, nspans, span_base


def span_window_dedup(
    ds: "ray.data.Dataset",
    span_w: int = _SPAN_DEDUP_W,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Duplicated-span removal with document rewrite (the C4 three-sentence
    rule of Raffel et al. 2020 / the span dedup of Lee et al. 2022, over
    fixed ``span_w``-word windows because this corpus has no sentence
    delimiters): each doc is cut into consecutive whitespace-word windows,
    any window occurring elsewhere in the corpus survives ONLY at its
    globally first occurrence (min (doc_id, span_no)), and docs are
    reassembled from their surviving windows. One output row per input doc:
    (doc_id, text_dedup, n_kept, n_dropped).

    Scale shape: the global decision shuffle carries only (fnv64 hash,
    packed int64 position) pairs — span TEXT never leaves the map side;
    winners come from ONE ``groupby(h).min(packed)``; losers compress to a
    per-doc packed drop blob and meet the docs in a BUCKETED co-group
    (union + groupby(doc_id % P) — the repo's join shape; ``Dataset.join``
    is avoided because Ray 2.49's hash-join feeds zero-column blocks for
    empty key partitions, the documented full_outer ArrowInvalid pitfall);
    the rewrite is a vectorized offsets/mask pass per bucket. Duplicate
    decision is hash equality (64-bit FNV-1a of the span string) — the
    documented scale tradeoff vs string equality, verified collision-free
    by the SQL gate at test scale.
    """
    from colbert_ray.functions.hashing import fnv1a64_strings

    docs = ds.select_columns([id_col, text_col])

    def to_spans(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        off, flat = _split_offsets(b.column(text_col).combine_chunks())
        bounds, doc_rep, sp_no, _, _, _ = _span_bounds(off, span_w)
        if len(sp_no) and int(sp_no.max()) >= _SPAN_NO_MAX:
            raise ValueError(
                f"doc with >= {_SPAN_NO_MAX} spans breaks the packed "
                f"(doc_id, span_no) key; raise span_w or repartition docs")
        span_list = pa.ListArray.from_arrays(
            pa.array(bounds, type=pa.int32()), flat)
        spans = pc.binary_join(span_list, " ")
        h = fnv1a64_strings(spans).astype(np.int64)
        return pa.table({
            "h": pa.array(h),
            "packed": pa.array(ids[doc_rep] * _SPAN_NO_MAX + sp_no),
        })

    lines = docs.map_batches(to_spans, batch_format="pyarrow",
                             zero_copy_batch=True)
    winners = lines.groupby("h").min("packed")

    def losers(b: pa.Table) -> pa.Table:
        packed = b.column("packed").to_numpy(zero_copy_only=False)
        wp = b.column("min(packed)").to_numpy(zero_copy_only=False)
        drop = packed != wp
        p = packed[drop]
        return pa.table({
            id_col: pa.array(p // _SPAN_NO_MAX),
            "span_no": pa.array(p % _SPAN_NO_MAX),
        })

    drops = (lines.join(winners, join_type="inner",
                        num_partitions=num_partitions, on=("h",))
             .map_batches(losers, batch_format="pyarrow"))

    # ---- per-doc drop blob (span_nos packed as int64 bytes: nested list
    # payloads are join/union-hostile, binary is schema-stable) ----------
    def drop_list(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        nos = g.column("span_no").to_numpy(zero_copy_only=False)
        order = np.lexsort((nos, ids))
        ids_s, nos_s = ids[order], nos[order]
        starts = np.flatnonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])
        offs = np.append(starts, len(ids_s))
        blobs = [nos_s[a:b].tobytes() for a, b in zip(offs[:-1], offs[1:])]
        return pa.table({
            id_col: pa.array(ids_s[starts], type=pa.int64()),
            "bucket": pa.array(ids_s[starts] % num_partitions),
            text_col: pa.array([None] * len(starts), type=pa.string()),
            "drop_nos": pa.array(blobs, type=pa.binary()),
        })

    drop_rows = drops.groupby(id_col).map_groups(
        drop_list, batch_format="pyarrow")

    def doc_rows(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: b.column(id_col),
            "bucket": pa.array(ids % num_partitions),
            text_col: b.column(text_col),
            "drop_nos": pa.array([None] * len(ids), type=pa.binary()),
        })

    def bucket_rewrite(g: pa.Table) -> pa.Table:
        texts_all = g.column(text_col).combine_chunks()
        is_doc = np.asarray(pc.is_valid(texts_all))
        d = g.filter(pa.array(is_doc))
        r = g.filter(pa.array(~is_doc))
        ids = d.column(id_col).to_numpy(zero_copy_only=False)
        off, flat = _split_offsets(d.column(text_col).combine_chunks())
        _, _, _, counts, nspans, span_base = _span_bounds(off, span_w)
        keep = np.ones(int(nspans.sum()), dtype=bool)
        if r.num_rows:
            rid = r.column(id_col).to_numpy(zero_copy_only=False)
            rorder = np.argsort(ids, kind="stable")
            pos = rorder[np.searchsorted(ids, rid, sorter=rorder)]
            blobs = r.column("drop_nos").combine_chunks()
            cnts = np.empty(len(rid), dtype=np.int64)
            allv = []
            for i, blob in enumerate(blobs):
                v = np.frombuffer(blob.as_py(), dtype=np.int64)
                cnts[i] = len(v)
                allv.append(v)
            vals = np.concatenate(allv) if allv else np.empty(0, np.int64)
            parents = np.repeat(pos, cnts)
            keep[span_base[parents] + vals] = False
        word_keep = np.repeat(keep, counts)
        kept_words = flat.filter(pa.array(word_keep))
        kept_per_doc = np.add.reduceat(
            word_keep.astype(np.int64), off[:-1]) if len(off) > 1 else \
            np.empty(0, dtype=np.int64)
        new_off = np.concatenate([[0], np.cumsum(kept_per_doc)])
        new_list = pa.ListArray.from_arrays(
            pa.array(new_off, type=pa.int32()), kept_words)
        n_kept = np.add.reduceat(keep.astype(np.int64), span_base) \
            if len(span_base) else np.empty(0, dtype=np.int64)
        return pa.table({
            id_col: d.column(id_col),
            "text_dedup": pc.binary_join(new_list, " "),
            "n_kept": pa.array(n_kept),
            "n_dropped": pa.array(nspans - n_kept),
        })

    merged = docs.map_batches(doc_rows, batch_format="pyarrow").union(
        drop_rows)
    return merged.groupby("bucket").map_groups(
        bucket_rewrite, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Generic Hamming-LSH banding over 64-bit fingerprints (SimHash, aHash, ...)
# ---------------------------------------------------------------------------


def banded_hamming_pairs(
    hashes: "ray.data.Dataset",
    hash_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> pa.Table:
    """All pairs within ``max_hamming`` bits over a 64-bit fingerprint
    column — EXACT (not probabilistic) via pigeonhole banding: the hash
    splits into B = max_hamming + 1 DISJOINT bit bands, and a pair
    differing in <= max_hamming bits leaves at least one band untouched,
    so every qualifying pair collides on >= 1 exact band value.

    The shared scale engine behind ``simhash_dup_pairs`` (text) and
    ``multimodal.banded_ahash_dup_pairs`` (images). 100-TB shape: only
    (band, band_value, id, hash) rows — B x ~28 bytes per item — ride ONE
    groupby shuffle; verify is an in-bucket chunked vectorized
    XOR+popcount; a pair is emitted only in its FIRST colliding band
    (decided locally from the two full hashes riding the bucket), so pair
    distinctness costs no extra shuffle. Known LSH skew: a hot band value
    (e.g. the all-zero band of boilerplate-heavy fingerprints) degrades
    one bucket toward the quadratic verify — raise B or salt-split hot
    buckets upstream if a corpus exhibits it.

    Returns (id_a < id_b, hamming), sorted."""
    B = max_hamming + 1
    if B > 64:
        raise ValueError("max_hamming must be < 64")
    base_w, rem = divmod(64, B)
    widths = np.array([base_w + (1 if i < rem else 0) for i in range(B)],
                      dtype=np.uint64)
    los = np.zeros(B, dtype=np.uint64)
    los[1:] = np.cumsum(widths)[:-1]
    # masks built in Python ints: numpy uint64 << 64 (the B=1 full-width
    # band of max_hamming=0) is shift-count UB — on a mod-64 SIMD path it
    # would yield mask 0 and silently collapse the corpus into ONE bucket
    masks = np.array([(1 << int(w)) - 1 for w in widths], dtype=np.uint64)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = batch.column(hash_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        n = len(ids)
        vals = (h[None, :] >> los[:, None]) & masks[:, None]     # B x n
        return pa.table({
            "band": pa.array(np.repeat(np.arange(B, dtype=np.int32), n)),
            "band_value": pa.array(vals.reshape(-1).astype(np.int64)),
            id_col: pa.array(np.tile(ids, B)),
            "h64": pa.array(np.tile(h, B).astype(np.int64)),
        })

    empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                          "id_b": pd.Series(dtype=np.int64),
                          "hamming": pd.Series(dtype=np.int64)})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return empty
        band_k = int(g["band"].iloc[0])
        order = np.argsort(g[id_col].to_numpy(), kind="stable")
        ids = g[id_col].to_numpy(dtype=np.int64)[order]
        h = g["h64"].to_numpy(dtype=np.int64)[order].astype(np.uint64)
        out_a, out_b, out_d = [], [], []
        chunk = 512
        for lo_i in range(0, len(ids), chunk):
            hi_i = min(lo_i + chunk, len(ids))
            # columns start at lo_i: pairs (p < q) with p in this chunk
            # have q > p >= lo_i, so columns below lo_i can never keep —
            # slicing halves the XOR/popcount work on a degenerate bucket
            x = h[lo_i:hi_i, None] ^ h[None, lo_i:]
            d = _popcount64_2d(x)
            ai, bi = np.nonzero(d <= max_hamming)
            keep = ai < bi                               # upper triangle
            ai, bi = ai[keep], bi[keep]
            if not len(ai):
                continue
            xs = x[ai, bi]
            first = np.full(len(xs), B, dtype=np.int64)
            for i in range(B - 1, -1, -1):
                agree = ((xs >> los[i]) & masks[i]) == 0
                first[agree] = i
            sel = first == band_k
            out_a.append(ids[ai[sel] + lo_i])
            out_b.append(ids[bi[sel] + lo_i])
            out_d.append(d[ai[sel], bi[sel]].astype(np.int64))
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_d)})

    out = (hashes
           .map_batches(explode, batch_format="pyarrow")
           .groupby(["band", "band_value"])
           .map_groups(bucket_pairs, batch_format="pandas")
           .to_pandas())
    if "id_a" not in out.columns:        # zero-pair corpus: schema dropped
        out = empty
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.table({
        "id_a": pa.array(out["id_a"].to_numpy(dtype=np.int64)),
        "id_b": pa.array(out["id_b"].to_numpy(dtype=np.int64)),
        "hamming": pa.array(out["hamming"].to_numpy(dtype=np.int64)),
    })


def simhash_dup_pairs(
    ds: "ray.data.Dataset",
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """SimHash near-duplicate pairs — the classic web-scale text near-dup
    criterion (Charikar 2002; Manku et al. 2007 used Hamming distance 3 on
    64-bit SimHashes for Google's crawl dedup): fingerprint every doc with
    ``simhash`` (vectorized FNV-1a token hashes, tf-weighted ±1 bit
    reduction), then mine all pairs within ``max_hamming`` bits via the
    EXACT pigeonhole banding of ``banded_hamming_pairs`` — one groupby
    shuffle of 8-byte signatures, never the text, never a driver-side
    all-pairs sweep."""
    return banded_hamming_pairs(simhash(ds, text_col=text_col,
                                        id_col=id_col),
                                "simhash", id_col, max_hamming=max_hamming)


# ---------------------------------------------------------------------------
# Winnowing fingerprints + code-clone pair mining (MOSS)
# ---------------------------------------------------------------------------

def winnow_fingerprints(
    ds: "ray.data.Dataset",
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Winnowed k-gram fingerprints per document (Schleimer/Wilkerson/Aiken
    2003 — the MOSS local-fingerprinting algorithm): hash every k-token
    gram (polynomial-FNV, the ``fingerprints`` rolling hash restricted to a
    window), slide a w-gram window over the gram stream and keep each
    window's LEFTMOST minimum — a position-robust fingerprint subset that
    guarantees any shared token run of length >= k + w - 1 contributes at
    least one COMMON selected fingerprint to both documents (the winnowing
    coverage theorem), which is what makes partial-overlap clone detection
    work where doc-level hashes see nothing.

    Fully vectorized across the batch: one flat token-hash stream, k
    shifted multiply-adds for the gram hashes (doc boundaries masked), one
    ``sliding_window_view`` argmin for the window minima; documents with
    fewer than w grams contribute the minimum over all their grams
    (single clipped window), documents shorter than k tokens contribute
    nothing. Output: DISTINCT (doc, fingerprint) rows — signed-int64
    bit pattern of the uint64 hash."""
    from colbert_ray.config import EngineConfig
    from colbert_ray.functions.hashing import FNV_PRIME, fnv1a64_strings
    from colbert_ray.functions.tokenizer import tokenize_column

    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    cfg = EngineConfig()
    B = FNV_PRIME

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        toks = tokenize_column(batch.column(text_col), cfg)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        th = fnv1a64_strings(toks.flatten())
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "fp": pa.array([], type=pa.int64())})
        total = len(th)
        if total < k:
            return empty
        # gram hash at start i: sum_j th[i+j] * B^(k-1-j)  (mod 2^64 by
        # uint64 wraparound) — k shifted multiply-adds, no per-doc loop
        pw = np.empty(k, dtype=np.uint64)
        pw[0] = 1
        if k > 1:       # vectorized accumulate: uint64 wraparound IS the mod
            np.multiply.accumulate(np.full(k - 1, B, dtype=np.uint64),
                                   out=pw[1:])
        n_g = total - k + 1
        g = np.zeros(n_g, dtype=np.uint64)
        for j in range(k):
            g += th[j:j + n_g] * pw[k - 1 - j]
        # valid gram starts: whole gram inside one doc
        lens = np.diff(offsets)
        parents = np.repeat(np.arange(len(lens)), lens)
        valid = parents[:n_g] == parents[k - 1:]
        g = g[valid]
        gp = parents[:n_g][valid]              # gram -> doc row
        if not len(g):
            return empty
        # per-doc gram fenceposts (grams of a doc are contiguous)
        g_lens = np.bincount(gp, minlength=len(lens))
        g_offs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(g_lens, out=g_offs[1:])
        sel = []
        # long docs (>= w grams): one argmin per sliding window
        if len(g) >= w:
            wins = np.lib.stride_tricks.sliding_window_view(g, w)
            starts = np.arange(len(g) - w + 1)
            ok = gp[starts] == gp[starts + w - 1]
            if ok.any():
                s_ok = starts[ok]
                sel.append(s_ok + np.argmin(wins[ok], axis=1))
        # short docs (1 <= n_grams < w): min over all their grams
        short = np.flatnonzero((g_lens >= 1) & (g_lens < w))
        if len(short):
            for r in short:                    # O(#short docs), tiny
                lo, hi = g_offs[r], g_offs[r + 1]
                sel.append(np.array([lo + int(np.argmin(g[lo:hi]))]))
        if not sel:
            return empty
        pick = np.unique(np.concatenate(sel))
        rows = np.stack([ids[gp[pick]], g[pick].astype(np.int64)], axis=1)
        rows = np.unique(rows, axis=0)         # distinct (doc, fp)
        return pa.table({id_col: pa.array(rows[:, 0]),
                         "fp": pa.array(rows[:, 1])})

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def shared_key_pairs(
    rows: "ray.data.Dataset",
    key_col: str,
    id_col: str,
    min_shared: int = 2,
    max_df: int | None = None,
) -> "ray.data.Dataset":
    """Pairs of ids sharing >= ``min_shared`` DISTINCT ``key_col`` values —
    the generic shared-fingerprint pair miner behind ``code_clone_pairs``
    (winnowed fps) and ``multimodal.video_dup_pairs`` (frame aHashes).
    Input rows must already be DISTINCT (id, key). Shuffle shape: one
    ``groupby(key)`` exchange, in-group pair expansion (bounded by the
    key's duplication count; ``max_df`` drops boilerplate keys shared by
    more docs than that), then ONE pair-key count groupby. Returns a
    Dataset of (id_a < id_b, n_shared)."""

    pair_empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                               "id_b": pd.Series(dtype=np.int64)})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy(dtype=np.int64))
        if len(ids) < 2 or (max_df is not None and len(ids) > max_df):
            return pair_empty
        ai, bi = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bi]})

    def count_shared(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < min_shared:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 "n_shared": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"id_a": g["id_a"].iloc[:1],
                             "id_b": g["id_b"].iloc[:1],
                             "n_shared": [np.int64(len(g))]})

    def _pin(schema: pa.Schema):
        def fix(t: pa.Table) -> pa.Table:
            return schema.empty_table() if t.num_rows == 0 else t.cast(schema)
        return fix

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    out_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                            ("n_shared", pa.int64())])
    return (rows.groupby(key_col)
            .map_groups(bucket_pairs, batch_format="pandas")
            .map_batches(_pin(pair_schema), batch_format="pyarrow")
            .groupby(["id_a", "id_b"])
            .map_groups(count_shared, batch_format="pandas")
            .map_batches(_pin(out_schema), batch_format="pyarrow"))



def code_clone_pairs(
    ds: "ray.data.Dataset",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """MOSS-style clone pairs: documents sharing >= ``min_shared`` DISTINCT
    winnowed fingerprints (id_a < id_b, n_shared) — partial-overlap
    near-dup detection for source code (and any token stream), where a
    copied function inside an otherwise-different file still collides.

    Shuffle shape (the ``video_dup_pairs`` shared-fingerprint precedent):
    winnowed (doc, fp) rows — 16 bytes each, never the text — ride ONE
    ``groupby(fp)`` exchange; each fingerprint bucket emits its doc pairs;
    a second groupby on the pair key counts distinct shared fingerprints.
    ``max_df`` (optional) drops fingerprints shared by more than that many
    docs — the standard boilerplate/license-header filter; None keeps the
    operator oracle-exact against the quadratic SQL twin."""
    fps = winnow_fingerprints(ds, k=k, w=w, text_col=text_col,
                              id_col=id_col)
    out = shared_key_pairs(fps, "fp", id_col, min_shared=min_shared,
                           max_df=max_df).to_pandas()
    if "id_a" not in out.columns:
        out = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                            "id_b": pd.Series(dtype=np.int64),
                            "n_shared": pd.Series(dtype=np.int64)})
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.table({
        "id_a": pa.array(out["id_a"].to_numpy(dtype=np.int64)),
        "id_b": pa.array(out["id_b"].to_numpy(dtype=np.int64)),
        "n_shared": pa.array(out["n_shared"].to_numpy(dtype=np.int64)),
    })
