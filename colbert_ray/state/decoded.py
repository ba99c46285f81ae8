"""DecodedIndex: fully-decoded, flat-array form of the index for serving.

The serving analog of the reference's mmap'd coalesced index
(``residual_embeddings.py:31-54`` + ``index_loader.py:13-66``): posting
lists live as three flat numpy arrays (docids, tfs, precomputed float64
tf-saturation) addressed by a dense ``term_id -> [start, end)`` offset
table — exactly a StridedTensor (values + offsets, SURVEY.md §1.1).

Built once per node from the on-disk segments, then shared ZERO-COPY with
every scorer actor through the Ray object store (``ray.put`` of numpy
arrays → plasma shared memory), so N actors on a node hold one copy and
skip per-actor decode entirely.

Scoring determinism: ``tfsat`` is precomputed per posting in float64;
per-query accumulation scatter-adds ``idf_t * tfsat`` term-by-term in
ascending term_id order — the same per-document float64 summation order as
the oracle at any parallelism level.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from colbert_ray.config import EngineConfig
from colbert_ray.functions.bm25 import idf as idf_fn
from colbert_ray.functions.bm25 import tf_saturation
from colbert_ray.functions.codec import varint_decode


# per-process loaded-index LRU (see DecodedIndex.load_cached)
_PROC_CACHE: dict = {}
_PROC_CACHE_MAX = 4

# segment-decode fallback bound (docs): this path bulk-decodes postings AND
# allocates a dense doclens array in ONE process's heap, so it is O(index) by
# design — the scale path is the serve/ artifact (mmap) plus docid_range
# shards. The bound makes the fallback's limit explicit instead of an OOM.
_MAX_DECODE_DOCS = int(os.environ.get("COLBERT_RAY_MAX_DECODE_DOCS",
                                      100_000_000))


class SplitDoclens:
    """doclens presented as BASE (often a read-only serve-artifact mmap)
    plus a small EXTENSION holding delta-added docs, with the ndarray
    surface the scorers use: ``len``, integer/array indexing, unit-stride
    slicing, ``np.asarray`` (dense escape hatch).

    Why: folding deltas into an mmap'd 10^9-doc index must not copy the
    whole doclens into heap — the delta fold costs O(n_delta) with this,
    and the base keeps paging lazily (shared page-cache across actors)."""

    __slots__ = ("base", "ext")

    def __init__(self, base, ext: np.ndarray):
        self.base = base
        self.ext = ext

    def __len__(self) -> int:
        return len(self.base) + len(self.ext)

    @property
    def dtype(self):
        return self.ext.dtype

    def __array__(self, dtype=None, copy=None):
        # dense escape hatch (O(n_docs)) for call sites that genuinely
        # need one ndarray; the hot paths below never hit it
        out = np.concatenate([np.asarray(self.base), self.ext])
        return out.astype(dtype) if dtype is not None else out

    def __getitem__(self, key):
        nb = len(self.base)
        if isinstance(key, slice):
            lo, hi, step = key.indices(len(self))
            if step != 1:
                raise ValueError("SplitDoclens supports unit-stride slices")
            if hi <= nb:
                return self.base[lo:hi]          # mmap slice stays lazy
            if lo >= nb:
                return self.ext[lo - nb:hi - nb]
            return SplitDoclens(self.base[lo:], self.ext[:hi - nb])
        arr = np.asarray(key)
        if arr.dtype == np.bool_:
            # boolean masks select positions, they don't compare to nb
            if arr.shape != (len(self),):
                raise IndexError("boolean mask length must equal len(self)")
            arr = np.nonzero(arr)[0]
        if arr.ndim == 0:
            i = int(arr)
            if i < 0:
                i += len(self)   # ndarray semantics: -1 = overall last doc
            if not 0 <= i < len(self):
                raise IndexError(f"index {int(arr)} out of range")
            return self.base[i] if i < nb else self.ext[i - nb]
        if arr.size and arr.min() < 0:
            arr = np.where(arr < 0, arr + len(self), arr)
        out = np.empty(arr.shape, dtype=self.ext.dtype)
        m = arr < nb
        out[m] = np.asarray(self.base[arr[m]])
        out[~m] = self.ext[arr[~m] - nb]
        return out


def _gather_binary(arr, order: np.ndarray,
                   return_offsets: bool = False):
    """Concatenate the elements of an Arrow binary array in ``order`` as ONE
    contiguous uint8 numpy array — sliced straight from the Arrow value
    buffer (offsets + one vectorized gather), never through per-element
    Python bytes objects. With ``return_offsets`` also returns the
    per-element start offsets into the concatenated array (length
    ``len(order) + 1``)."""
    if arr.null_count:
        raise ValueError("binary column with nulls in posting segment")
    import pyarrow as pa

    if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, dtype=np.uint8))
    starts = offs[:-1][order]
    lens = (offs[1:] - offs[:-1])[order]
    total = int(lens.sum())
    out_offs = np.zeros(len(order) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offs[1:])
    if total == 0:
        out = np.empty(0, dtype=np.uint8)
        return (out, out_offs) if return_offsets else out
    intra = np.arange(total, dtype=np.int64) - np.repeat(out_offs[:-1], lens)
    out = data[np.repeat(starts, lens) + intra]
    return (out, out_offs) if return_offsets else out


def bulk_decode_runs(seg, codec: str = "varint"):
    """Decode ALL posting runs of one segment table in one vectorized pass.

    Returns ``(tid, salt, nper, docids, tfs, order)`` with runs sorted by
    (term_id, salt) and postings concatenated in that order (salts are
    docid-range partitions, so docid order within a term is preserved);
    ``order`` is the permutation from the table's row order to the sorted
    run order. Load cost is O(total postings), no Python loop over runs —
    the compressed streams are concatenated at the Arrow BUFFER level and
    decoded with the segment codec (varint LEB128 or PForDelta).
    """
    from colbert_ray.functions.codec import ef_decode_concat, pfor_decode_concat

    tid = seg.column("term_id").to_numpy(zero_copy_only=False).astype(np.int64)
    salt = seg.column("salt").to_numpy(zero_copy_only=False)
    nper = seg.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((salt, tid))
    tid, salt, nper = tid[order], salt[order], nper[order]
    db = seg.column("docids_bin").combine_chunks()
    tb = seg.column("tfs_bin").combine_chunks()
    total = int(nper.sum())
    if codec in ("pfor", "ef"):
        dec = pfor_decode_concat if codec == "pfor" else ef_decode_concat
        dbuf, doffs = _gather_binary(db, order, return_offsets=True)
        tbuf, toffs = _gather_binary(tb, order, return_offsets=True)
        gaps = dec(dbuf, doffs[:-1], nper, doffs[1:]).astype(np.int64)
        tfs = dec(tbuf, toffs[:-1], nper, toffs[1:]).astype(np.int32)
    else:
        dbuf = _gather_binary(db, order)
        tbuf = _gather_binary(tb, order)
        gaps = varint_decode(dbuf, total).astype(np.int64)
        tfs = varint_decode(tbuf, total).astype(np.int32)
    g_cum = np.cumsum(gaps)
    run_start = np.concatenate([[0], np.cumsum(nper)[:-1]])
    base = np.where(run_start > 0, g_cum[run_start - 1], 0)
    docids = g_cum - np.repeat(base, nper)
    return tid, salt, nper, docids, tfs, order


def _segmented_searchsorted(d, starts: np.ndarray, ends: np.ndarray,
                            v: int) -> np.ndarray:
    """Left insertion point of scalar ``v`` in EVERY sorted segment
    ``d[starts[i]:ends[i]]`` at once — one bisection loop over all segments
    simultaneously (~log2(max segment length) vectorized gathers instead of
    a Python loop over segments). ``d`` may be a memmap; only the probed
    elements are touched."""
    lo_b = np.asarray(starts, dtype=np.int64).copy()
    hi_b = np.asarray(ends, dtype=np.int64).copy()
    while True:
        active = np.flatnonzero(lo_b < hi_b)
        if len(active) == 0:
            return lo_b
        mid = (lo_b[active] + hi_b[active]) >> 1
        go_right = np.asarray(d[mid]) < v
        la, ha = lo_b[active], hi_b[active]
        la[go_right] = mid[go_right] + 1
        ha[~go_right] = mid[~go_right]
        lo_b[active] = la
        hi_b[active] = ha


def _segment_max(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-segment max of ``values`` addressed by ``offsets`` (n+1 fenceposts),
    0.0 for EMPTY segments (reduceat alone is out-of-bounds / wrong there)."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.float64)
    counts = np.diff(offsets)
    nonempty = counts > 0
    starts = offsets[:-1][nonempty]
    if len(starts):
        out[nonempty] = np.maximum.reduceat(values, starts)
    return out


def _segment_sum_chunked(values, offsets: np.ndarray,
                         slab: int = 1 << 24) -> np.ndarray:
    """Per-segment int64 sums of ``values`` (possibly a read-only mmap)
    addressed by ``offsets`` fenceposts, in bounded slabs of ~``slab``
    elements — computes per-term collection frequency without ever
    materializing the whole tf array (O(slab) temp, one sequential pass)."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.int64)
    t = 0
    while t < n:
        t2 = int(np.searchsorted(offsets, int(offsets[t]) + slab, "left"))
        t2 = min(max(t2, t + 1), n)
        lo, hi = int(offsets[t]), int(offsets[t2])
        if t2 == t + 1 and hi - lo > slab:
            # ONE term whose df exceeds the slab (a stopword at 10^8+ docs):
            # sum its run in slab-sized pieces so peak temp stays O(slab),
            # not O(max per-term df) — no cumsum needed for one segment
            acc = 0
            for s in range(lo, hi, slab):
                acc += int(np.asarray(values[s:min(s + slab, hi)],
                                      dtype=np.int64).sum())
            out[t] = acc
        elif hi > lo:
            seg = np.asarray(values[lo:hi], dtype=np.int64)
            cs = np.concatenate([[0], np.cumsum(seg)])
            out[t:t2] = cs[offsets[t + 1:t2 + 1] - lo] - cs[offsets[t:t2] - lo]
        t = t2
    return out


@dataclass
class DecodedIndex:
    cfg: EngineConfig
    n_docs: int
    avgdl: float
    # dictionary (sorted by term string; term_id is the sorted rank)
    dict_terms: np.ndarray          # object[str], sorted
    dict_term_ids: np.ndarray       # int64
    dict_dfs: np.ndarray            # int64
    idf_by_term_id: np.ndarray      # float64[n_terms]
    # postings: term_id -> slice of the flat arrays
    posting_offsets: np.ndarray     # int64[n_terms + 1]
    posting_docids: np.ndarray      # int64[total_postings]
    posting_tfs: np.ndarray         # int32[total_postings]
    posting_tfsat: np.ndarray       # float64[total_postings]
    max_tfsat_by_term: np.ndarray   # float64[n_terms]
    # docs
    doclens: np.ndarray             # int64[max_docid + 1]
    sha256: np.ndarray | None       # object[str][max_docid + 1]; None if skipped
    tombstones: np.ndarray          # int64, sorted (removed docids)
    # block-max metadata (K4 two-stage pruning): fixed-size posting blocks
    block_offsets: np.ndarray = None      # int64[n_terms + 1]
    block_last_docid: np.ndarray = None   # int64[n_blocks]
    block_max_tfsat: np.ndarray = None    # float64[n_blocks]
    # docid-range shard origin: doclens/sha256 cover [docid_base, docid_limit)
    docid_base: int = 0
    # exact build-time collection token count (stats.json); frozen under
    # deltas like avgdl/idf. Used by the Dirichlet-QL ranker's p(t|C).
    total_tokens: int = 0
    # GLOBAL per-term collection frequency (sum of tfs over the SERVED
    # postings, deltas folded in) — the Dirichlet-QL collection model.
    # Vocab-sized, so it survives docid_range restriction intact: that is
    # what makes sharded ranker=ql score exactly like the unsharded index.
    # None only for pre-cf serve artifacts loaded unsharded (QL then sums
    # the served postings on demand, which is identical when unsharded).
    cf_by_term: np.ndarray | None = None
    # lazy-cf stash: (global posting_tfs, global posting_offsets) captured
    # by _restrict_to_docid_range on a pre-cf artifact — mmap references,
    # so holding them costs nothing until ensure_cf_by_term() scans them
    _cf_pending: tuple | None = None

    def ensure_cf_by_term(self) -> np.ndarray | None:
        """Global per-term collection frequency, computed LAZILY for
        restricted pre-cf artifacts: one bounded-slab pass over the
        ORIGINAL (global, pre-restrict) tf mmap, deferred to first QL use
        so a BM25-only shard server never pays the full posting_tfs scan
        at startup. Returns None only when no global tf source exists
        (unsharded pre-cf load — QL then sums served postings on demand,
        which is identical when unsharded)."""
        if self.cf_by_term is None and self._cf_pending is not None:
            tfs, offs = self._cf_pending
            self.cf_by_term = _segment_sum_chunked(tfs, offs)
            self._cf_pending = None
        return self.cf_by_term

    @property
    def docid_limit(self) -> int:
        """One past the last docid this (possibly sharded) index covers."""
        return self.docid_base + len(self.doclens)

    def sha_for(self, docids: np.ndarray) -> np.ndarray:
        """content sha256 per ABSOLUTE docid (shard-offset aware)."""
        return self.sha256[np.asarray(docids, dtype=np.int64) - self.docid_base]

    @classmethod
    def load(cls, index_dir: str,
             docid_range: tuple[int, int] | None = None,
             load_sha: bool = True) -> "DecodedIndex":
        """Load the index; ``docid_range=(lo, hi)`` keeps only postings of
        docids in [lo, hi) — the serve-time docid-range SHARD (each node of
        a serving cluster holds one range; global statistics are unchanged,
        so per-shard scores are exact and cross-shard merge by
        (-score, docid) reproduces the unsharded ranking bit-for-bit).

        Fast path: if the ``serve/`` artifact exists and matches the current
        segments, every heavy array is ``np.load(mmap_mode='r')`` — opening
        is O(metadata), postings page in on demand, and N loaders on a node
        share one page-cache copy (the mmap'd-coalesced-index analog,
        ``residual_embeddings.py:31-54``). Otherwise the varint segments are
        bulk-decoded into RAM. ``load_sha=False`` skips the per-doc sha256
        column entirely (serving with ``with_sha=False`` never pays for it).
        """
        with open(os.path.join(index_dir, "metadata.json")) as f:
            meta = json.load(f)
        cfg = EngineConfig.from_dict(meta["config"])
        n_docs = int(meta["n_docs"])
        avgdl = float(meta["avgdl"])
        # pre-total_tokens metadata (older indexes): avgdl*n_docs is exact
        # there because avgdl was computed as total/n_docs in float64
        total_tokens = int(meta.get("total_tokens",
                                    round(avgdl * max(1, n_docs))))

        dt = pads.dataset(os.path.join(index_dir, "dictionary")).to_table(
            columns=["term", "term_id", "df"]
        )
        t_np = dt.column("term").to_numpy(zero_copy_only=False)
        order = np.argsort(t_np, kind="stable")
        dict_terms = t_np[order]
        dict_term_ids = dt.column("term_id").to_numpy(zero_copy_only=False)[order]
        dict_dfs = dt.column("df").to_numpy(zero_copy_only=False)[order]
        n_terms = len(dict_terms)
        idf_by_tid = np.zeros(n_terms, dtype=np.float64)
        idf_by_tid[dict_term_ids] = idf_fn(dict_dfs.astype(np.float64), n_docs)

        from colbert_ray.state import serve as serve_mod

        arrays = serve_mod.open_arrays(index_dir)

        if arrays is not None:
            # ---- mmap fast path: no decode, no full-array read ---------
            self = cls(
                cfg=cfg, n_docs=n_docs, avgdl=avgdl, total_tokens=total_tokens,
                dict_terms=dict_terms, dict_term_ids=dict_term_ids,
                dict_dfs=dict_dfs, idf_by_term_id=idf_by_tid,
                posting_offsets=np.asarray(arrays["posting_offsets"]),
                posting_docids=arrays["posting_docids"],
                posting_tfs=arrays["posting_tfs"],
                posting_tfsat=arrays["posting_tfsat"],
                max_tfsat_by_term=np.asarray(arrays["max_tfsat"]),
                doclens=arrays["doclens"], sha256=None,
                tombstones=np.empty(0, dtype=np.int64),
                block_offsets=np.asarray(arrays["block_offsets"]),
                block_last_docid=arrays["block_last_docid"],
                block_max_tfsat=arrays["block_max_tfsat"],
                cf_by_term=arrays.get("cf_by_term"),
            )
            self._fold_in_deltas(index_dir)
            if docid_range is not None:
                self._restrict_to_docid_range(*docid_range)
            if load_sha:
                self._load_sha(index_dir)
            return self

        # ---- segment-decode path (no serve artifact, or stale) --------
        docs = pads.dataset(os.path.join(index_dir, "docmeta")).to_table(
            columns=["docid", "doclen"]
        )
        docids = docs.column("docid").to_numpy(zero_copy_only=False)
        max_docid = int(docids.max()) if len(docids) else -1
        if max_docid + 1 > _MAX_DECODE_DOCS:
            raise ValueError(
                f"segment-decode fallback over {max_docid + 1:,} docids "
                f"exceeds COLBERT_RAY_MAX_DECODE_DOCS="
                f"{_MAX_DECODE_DOCS:,}: this path materializes dense "
                "per-doc arrays and ALL postings in one heap. Build the "
                "serve/ artifact (pipelines.build writes it; or re-run "
                "the serve phase) and/or load docid_range shards instead.")
        doclens = np.zeros(max_docid + 1, dtype=np.int64)
        doclens[docids] = docs.column("doclen").to_numpy(zero_copy_only=False)

        # BULK decode: all runs' varint streams concatenated in global
        # (term_id, salt) order and decoded in ONE vectorized pass.
        seg_files = sorted(glob.glob(os.path.join(index_dir, "segments", "part_*.parquet")))
        import pyarrow as pa

        tables = [
            pq.read_table(f, columns=["term_id", "salt", "n", "docids_bin", "tfs_bin"])
            for f in seg_files
        ]
        seg = pa.concat_tables(tables) if tables else None
        if seg is not None and seg.num_rows:
            tid, _salt, nper, posting_docids, posting_tfs, _ = \
                bulk_decode_runs(seg, codec=cfg.segment_codec)
            posting_offsets = np.zeros(n_terms + 1, dtype=np.int64)
            np.add.at(posting_offsets, tid + 1, nper)
            np.cumsum(posting_offsets, out=posting_offsets)
        else:
            posting_docids = np.empty(0, dtype=np.int64)
            posting_tfs = np.empty(0, dtype=np.int32)
            posting_offsets = np.zeros(n_terms + 1, dtype=np.int64)

        posting_tfsat = tf_saturation(
            posting_tfs.astype(np.float64),
            doclens[posting_docids].astype(np.float64),
            avgdl, cfg.k1, cfg.b,
        )
        cf_by_term = _segment_sum_chunked(posting_tfs, posting_offsets)
        # lossy pruning (stages/prune.py) can leave dictionary terms with ZERO
        # postings — reduce only nonempty terms (guard inside _segment_max)
        max_tfsat = _segment_max(posting_tfsat, posting_offsets)

        self = cls(
            cfg=cfg, n_docs=n_docs, avgdl=avgdl, total_tokens=total_tokens,
            dict_terms=dict_terms, dict_term_ids=dict_term_ids, dict_dfs=dict_dfs,
            idf_by_term_id=idf_by_tid,
            posting_offsets=posting_offsets, posting_docids=posting_docids,
            posting_tfs=posting_tfs, posting_tfsat=posting_tfsat,
            max_tfsat_by_term=max_tfsat,
            doclens=doclens, sha256=None,
            tombstones=np.empty(0, dtype=np.int64),
            cf_by_term=cf_by_term,
        )
        self._build_block_arrays()
        self._fold_in_deltas(index_dir)
        if docid_range is not None:
            self._restrict_to_docid_range(*docid_range)
        if load_sha:
            self._load_sha(index_dir)
        return self

    def _load_sha(self, index_dir: str) -> None:
        """Load content sha256 for THIS shard's docid range only: a
        predicate-pushed docmeta read (parquet row groups outside
        [docid_base, docid_limit) never leave storage — docmeta is written
        docid-sorted, so the row-group stats prune), plus an overlay of any
        delta docs in range. A 1/N shard therefore holds ~1/N of the sha
        strings, not a whole-corpus object array."""
        base, limit = self.docid_base, self.docid_limit
        dset = pads.dataset(os.path.join(index_dir, "docmeta"))
        filt = None
        if getattr(self, "_restricted", False):
            filt = (pads.field("docid") >= base) & (pads.field("docid") < limit)
        docs = dset.to_table(columns=["docid", "content_sha256"], filter=filt)
        sha = np.empty(limit - base, dtype=object)
        ids = docs.column("docid").to_numpy(zero_copy_only=False)
        sha[ids - base] = np.asarray(
            docs.column("content_sha256").to_numpy(zero_copy_only=False))
        dm_all = getattr(self, "_delta_docmeta", None)
        if dm_all is not None and dm_all.num_rows:
            d_ids = dm_all.column("docid").to_numpy(zero_copy_only=False)
            d_sha = np.asarray(
                dm_all.column("content_sha256").to_numpy(zero_copy_only=False))
            in_range = (d_ids >= base) & (d_ids < limit)
            sha[d_ids[in_range] - base] = d_sha[in_range]
        self.sha256 = sha

    @classmethod
    def load_cached(cls, index_dir: str,
                    docid_range: tuple[int, int] | None = None,
                    load_sha: bool = True) -> "DecodedIndex":
        """Per-process LRU of loaded indexes keyed by (path, metadata mtime,
        shard, sha) — Ray reuses worker processes across actor pools, so
        repeated searches against the same index skip the load entirely."""
        key = (os.path.abspath(index_dir),
               os.path.getmtime(os.path.join(index_dir, "metadata.json")),
               tuple(docid_range) if docid_range else None, bool(load_sha))
        hit = _PROC_CACHE.get(key)
        if hit is None:
            hit = cls.load(index_dir, docid_range=docid_range, load_sha=load_sha)
            _PROC_CACHE[key] = hit
            while len(_PROC_CACHE) > _PROC_CACHE_MAX:
                _PROC_CACHE.pop(next(iter(_PROC_CACHE)))
        return hit

    def _build_block_arrays(self) -> None:
        """Fixed-size block-max metadata from the in-RAM posting arrays
        (the serve artifact carries these precomputed; this is the fallback
        for segment-decoded / delta-folded / restricted indexes)."""
        bs = self.cfg.posting_block_size
        counts = np.diff(self.posting_offsets)
        from colbert_ray.state.serve import block_layout

        nb, block_offsets = block_layout(counts, bs)
        total_blocks = int(block_offsets[-1])
        if total_blocks == 0:
            self.block_offsets = block_offsets
            self.block_last_docid = np.empty(0, dtype=np.int64)
            self.block_max_tfsat = np.empty(0, dtype=np.float64)
            return
        term_start_rep = np.repeat(self.posting_offsets[:-1], nb)
        intra = np.arange(total_blocks) - np.repeat(block_offsets[:-1], nb)
        bstart = term_start_rep + intra * bs
        bend = np.minimum(bstart + bs, np.repeat(self.posting_offsets[1:], nb)) - 1
        self.block_offsets = block_offsets
        self.block_last_docid = np.asarray(self.posting_docids)[bend]
        # posting arrays are contiguous across terms, so consecutive block
        # starts bound each block exactly (last segment runs to array end)
        self.block_max_tfsat = np.maximum.reduceat(self.posting_tfsat, bstart)

    def _restrict_to_docid_range(self, lo: int, hi: int) -> None:
        """Keep only postings of docids in [lo, hi); offsets rebuilt.
        Statistics (n_docs, avgdl, idf) stay GLOBAL by design.

        Shard-pruned read: per-term docids are sorted, so the shard's slice
        of each list is found by TWO binary searches per term, run as ONE
        vectorized bisection over ALL terms simultaneously (~log2(max df)
        numpy gathers — no Python loop over terms, so a 10M-term vocabulary
        restricts in milliseconds of numpy, and on the mmap fast path only
        O(log) pages per list are touched). Exactly the shard's ~1/N of the
        postings is then copied into compact RAM arrays, and the per-doc
        arrays (doclens, tombstones) are sliced to the shard's range —
        per-shard resident memory is ~1/N of ALL index arrays; the whole
        index is never materialized on any node."""
        # the collection model must survive restriction: per-term GLOBAL cf
        # needs the full tf array, which is about to be sliced away. Don't
        # SCAN it here though — a BM25-only shard server over a pre-cf
        # artifact would pay a full sequential posting_tfs read at startup
        # for a sidecar it never uses. Stash the (mmap) references and let
        # ensure_cf_by_term() run the bounded-slab pass on first QL use.
        if self.cf_by_term is None:
            if isinstance(self.posting_tfs, np.memmap):
                self._cf_pending = (self.posting_tfs, self.posting_offsets)
            else:
                # delta fold already rebuilt DENSE posting arrays —
                # stashing them would pin O(base postings) heap past
                # restrict, so pay the (comparatively cheap) scan now
                self.cf_by_term = _segment_sum_chunked(
                    self.posting_tfs, self.posting_offsets)
        offs = self.posting_offsets
        d = self.posting_docids
        lo_pos = _segmented_searchsorted(d, offs[:-1], offs[1:], int(lo))
        hi_pos = _segmented_searchsorted(d, offs[:-1], offs[1:], int(hi))
        n_terms = len(offs) - 1
        counts = hi_pos - lo_pos
        new_offsets = np.zeros(n_terms + 1, dtype=np.int64)
        np.cumsum(counts, out=new_offsets[1:])
        total = int(new_offsets[-1])
        intra = np.arange(total) - np.repeat(new_offsets[:-1], counts)
        src = np.repeat(lo_pos, counts) + intra
        self.posting_docids = np.asarray(self.posting_docids[src])
        self.posting_tfs = np.asarray(self.posting_tfs[src])
        self.posting_tfsat = np.asarray(self.posting_tfsat[src])
        self.posting_offsets = new_offsets
        self.max_tfsat_by_term = _segment_max(
            self.posting_tfsat, self.posting_offsets)
        # shard the per-doc arrays: the shard holds [base, limit) only
        size = len(self.doclens)
        base = max(0, min(int(lo), size))
        limit = max(base, min(int(hi), size))
        self.doclens = self.doclens[base:limit]     # mmap slice stays lazy
        if self.sha256 is not None:
            # copy so the out-of-range string objects are actually freed
            self.sha256 = self.sha256[base:limit].copy()
        self.docid_base = base
        self._restricted = True
        self.tombstones = self.tombstones[
            (self.tombstones >= base) & (self.tombstones < limit)]
        self._build_block_arrays()

    def _fold_in_deltas(self, index_dir: str) -> None:
        """Fold delta segments + tombstones into the in-memory arrays
        (IndexUpdater T6 analog). Frozen-statistics semantics: avgdl and the
        idf of PRE-EXISTING terms stay those of the last full build; terms
        first seen in a delta get idf from their delta df (the analog of the
        reference reusing its trained codec for added passages).

        Memory contract: doclens folds in O(n_delta) (``SplitDoclens``
        extension; an mmap'd base is never copied), but the POSTING arrays
        are rebuilt densely — O(base postings) heap in this process,
        transiently even for a ``docid_range`` shard (fold runs before
        restrict). Deltas are therefore a small/medium-update mechanism by
        contract (state/updates.py module docstring); past that, compact
        (full rebuild) refreshes the serve artifact and empties deltas, so
        serving returns to the pure-mmap O(shard) path."""
        from functools import partial

        from colbert_ray.functions.codec import decode_docids_run, decode_tfs_run
        from colbert_ray.state.updates import load_deltas

        _ddd = partial(decode_docids_run, codec=self.cfg.segment_codec)
        _dtf = partial(decode_tfs_run, codec=self.cfg.segment_codec)

        segs, terms_tbls, metas, tomb = load_deltas(index_dir)
        self.tombstones = tomb
        if not segs:
            return
        n_terms_old = len(self.dict_terms)

        # decode delta postings; map delta-local term ids -> term strings
        d_docids, d_tfs, d_terms = [], [], []
        new_docid_rows = []
        for seg, tt, dm in zip(segs, terms_tbls, metas):
            local_terms = tt.column("term").to_numpy(zero_copy_only=False)
            tid = seg.column("term_id").to_numpy(zero_copy_only=False)
            nn = seg.column("n").to_numpy(zero_copy_only=False)
            db, tb = seg.column("docids_bin"), seg.column("tfs_bin")
            for i in range(seg.num_rows):
                n = int(nn[i])
                d_docids.append(_ddd(db[i].as_py(), n))
                d_tfs.append(_dtf(tb[i].as_py(), n))
                d_terms.append(np.repeat(local_terms[int(tid[i])], n))
            new_docid_rows.append(dm)
        dd = np.concatenate(d_docids)
        dt = np.concatenate(d_tfs)
        dterm = np.concatenate(d_terms)

        # extend doc arrays to the new max docid
        import pyarrow as pa

        # deltas may carry different optional metadata columns (add_documents
        # persists whatever the caller supplied) — promote to the union
        # schema, missing columns null-filled
        dm_all = pa.concat_tables(new_docid_rows, promote_options="default")
        new_ids = dm_all.column("docid").to_numpy(zero_copy_only=False)
        new_dls = dm_all.column("doclen").to_numpy(zero_copy_only=False)
        n_base = len(self.doclens)
        new_max = max(n_base - 1, int(new_ids.max()) if len(new_ids) else -1)
        if not len(new_ids) or int(new_ids.min()) >= n_base:
            # pure append — the IndexUpdater contract (delta docids start
            # past the base max): keep the base array (often a read-only
            # serve-artifact mmap) UNTOUCHED and attach an O(n_delta)
            # extension, so the fold never copies O(n_docs) into heap
            ext = np.zeros(new_max + 1 - n_base, dtype=np.int64)
            if len(new_ids):
                ext[new_ids - n_base] = new_dls
            self.doclens = SplitDoclens(self.doclens, ext)
        else:
            # delta targets EXISTING docids (not produced by IndexUpdater,
            # but tolerated): dense rebuild, documented O(n_docs)
            doclens = np.zeros(new_max + 1, dtype=np.int64)
            doclens[:n_base] = np.asarray(self.doclens)
            doclens[new_ids] = new_dls
            self.doclens = doclens
        # sha is loaded AFTER fold/restrict (range-filtered); stash the delta
        # doc metadata so _load_sha can overlay the added docs' hashes
        self._delta_docmeta = dm_all

        # resolve delta terms -> global term ids (append brand-new terms)
        uniq_new = np.sort(np.array(sorted(set(dterm.tolist())), dtype=object))
        pos = np.searchsorted(self.dict_terms, uniq_new)
        pos_c = np.clip(pos, 0, max(0, n_terms_old - 1))
        known = (n_terms_old > 0) & (self.dict_terms[pos_c] == uniq_new)
        gids = np.empty(len(uniq_new), dtype=np.int64)
        gids[known] = self.dict_term_ids[pos_c[known]]
        brand_new = uniq_new[~known]
        gids[~known] = n_terms_old + np.arange(len(brand_new), dtype=np.int64)
        term_to_gid = dict(zip(uniq_new.tolist(), gids.tolist()))
        d_gid = np.array([term_to_gid[t] for t in dterm], dtype=np.int64)

        n_terms_new = n_terms_old + len(brand_new)
        # dictionary arrays stay term-string-sorted for searchsorted
        if len(brand_new):
            all_terms = np.concatenate([self.dict_terms, brand_new])
            all_ids = np.concatenate(
                [self.dict_term_ids,
                 n_terms_old + np.arange(len(brand_new), dtype=np.int64)])
            # df of brand-new terms = docs containing them in the deltas
            bn_df = np.zeros(len(brand_new), dtype=np.int64)
            bn_pos = {t: i for i, t in enumerate(brand_new.tolist())}
            for t in set(brand_new.tolist()):
                bn_df[bn_pos[t]] = len(np.unique(dd[dterm == t]))
            all_dfs = np.concatenate([self.dict_dfs, bn_df])
            order = np.argsort(all_terms, kind="stable")
            self.dict_terms = all_terms[order]
            self.dict_term_ids = all_ids[order]
            self.dict_dfs = all_dfs[order]
            idf_new = np.zeros(n_terms_new, dtype=np.float64)
            idf_new[: n_terms_old] = self.idf_by_term_id
            idf_new[n_terms_old:] = idf_fn(bn_df.astype(np.float64), self.n_docs)
            self.idf_by_term_id = idf_new

        # served-content collection model: delta tfs add to the global cf
        # (same "cf is the served postings" semantics QL uses unsharded)
        if self.cf_by_term is not None:
            cf = np.zeros(n_terms_new, dtype=np.int64)
            cf[:n_terms_old] = np.asarray(self.cf_by_term)
            np.add.at(cf, d_gid, dt.astype(np.int64))
            self.cf_by_term = cf

        # rebuild term-major flat posting arrays (stable: old before delta)
        old_rep = np.repeat(np.arange(n_terms_old, dtype=np.int64),
                            np.diff(self.posting_offsets).astype(np.int64))
        all_tid = np.concatenate([old_rep, d_gid])
        all_doc = np.concatenate([self.posting_docids, dd])
        all_tf = np.concatenate([self.posting_tfs.astype(np.int64), dt])
        d_tfsat = tf_saturation(dt.astype(np.float64),
                                self.doclens[dd].astype(np.float64),
                                self.avgdl, self.cfg.k1, self.cfg.b)
        all_tfsat = np.concatenate([self.posting_tfsat, d_tfsat])
        order = np.argsort(all_tid, kind="stable")
        self.posting_docids = all_doc[order]
        self.posting_tfs = all_tf[order].astype(np.int32)
        self.posting_tfsat = all_tfsat[order]
        counts = np.bincount(all_tid, minlength=n_terms_new)
        self.posting_offsets = np.zeros(n_terms_new + 1, dtype=np.int64)
        np.cumsum(counts, out=self.posting_offsets[1:])
        self.max_tfsat_by_term = _segment_max(
            self.posting_tfsat, self.posting_offsets)
        self._build_block_arrays()

    # ---- query-side lookups -------------------------------------------

    def lookup_terms(self, terms: list[str]) -> np.ndarray:
        """terms -> sorted unique term_id array (OOV dropped)."""
        if not terms:
            return np.empty(0, dtype=np.int64)
        t = np.asarray(terms, dtype=object)
        pos = np.searchsorted(self.dict_terms, t)
        pos_c = np.clip(pos, 0, max(0, len(self.dict_terms) - 1))
        hit = (len(self.dict_terms) > 0) & (self.dict_terms[pos_c] == t)
        return np.sort(self.dict_term_ids[pos_c[hit]])

    def postings_slice(self, term_id: int):
        s, e = self.posting_offsets[term_id], self.posting_offsets[term_id + 1]
        return (self.posting_docids[s:e], self.posting_tfsat[s:e])

    def postings_slice_raw(self, term_id: int):
        """(docids, RAW int tfs) — for rankers that smooth tf themselves
        (Dirichlet QL) instead of using the precomputed BM25 saturation."""
        s, e = self.posting_offsets[term_id], self.posting_offsets[term_id + 1]
        return (self.posting_docids[s:e], self.posting_tfs[s:e])
