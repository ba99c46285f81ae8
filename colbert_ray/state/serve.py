"""Out-of-core serve artifact: pre-decoded flat posting arrays on disk.

The analog of the reference's mmap'd coalesced index
(``colbert/indexing/codecs/residual_embeddings.py:31-54`` +
``colbert/search/index_loader.py:13-66``): at finalize the varint segments
are decoded ONCE into flat ``.npy`` arrays (docids, tfs, precomputed float64
tf-saturation, per-term offsets, block-max metadata), so serving opens the
index with ``np.load(mmap_mode="r")`` in milliseconds and N scorer actors on
a node share one page-cache copy — no per-actor decode, no driver-side
decode, no ``ray.put`` of the whole index.

Scale shape: the artifact is written by one Ray task per segment file
(bounded memory = one term partition), each writing DISJOINT slices of the
shared memmap files (a term lives in exactly one partition). On a multi-node
cluster the artifact lives on the shared index store (the same place the
segments live); each serving node mmaps it and pages in only the postings
its queries (or its docid shard) touch.

Validity: ``manifest.json`` records a token over the segment files
(name, size, mtime) + the build's semantic/inputs hashes. Any segment
rewrite (prune, coalesce, compact) changes the token and the loader falls
back to segment decode until the artifact is rebuilt.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq

SERVE_DIR = "serve"

ARRAY_FILES = {
    "posting_offsets": "posting_offsets.npy",   # int64[n_terms + 1]
    "posting_docids": "posting_docids.npy",     # int64[n_postings]
    "posting_tfs": "posting_tfs.npy",           # int32[n_postings]
    "posting_tfsat": "posting_tfsat.npy",       # float64[n_postings]
    "max_tfsat": "max_tfsat.npy",               # float64[n_terms]
    "block_offsets": "block_offsets.npy",       # int64[n_terms + 1]
    "block_last_docid": "block_last_docid.npy", # int64[n_blocks]
    "block_max_tfsat": "block_max_tfsat.npy",   # float64[n_blocks]
    "doclens": "doclens.npy",                   # int64[max_docid + 1]
}


def _segment_files(index_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(index_dir, "segments", "part_*.parquet")))


def segments_token(index_dir: str) -> str:
    """Cheap fingerprint of the segment files + build identity; any segment
    rewrite (prune/coalesce/compact) invalidates the serve artifact."""
    with open(os.path.join(index_dir, "metadata.json")) as f:
        meta = json.load(f)
    parts = [str(meta.get("semantic_hash")), str(meta.get("inputs_hash"))]
    for f in _segment_files(index_dir):
        st = os.stat(f)
        parts.append(f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def serve_valid(index_dir: str) -> bool:
    mpath = os.path.join(index_dir, SERVE_DIR, "manifest.json")
    if not os.path.exists(mpath):
        return False
    try:
        with open(mpath) as f:
            m = json.load(f)
        return m.get("token") == segments_token(index_dir)
    except (OSError, ValueError):
        return False


def open_arrays(index_dir: str) -> dict | None:
    """mmap-open every serve array; None if the artifact is absent/stale."""
    if not serve_valid(index_dir):
        return None
    sdir = os.path.join(index_dir, SERVE_DIR)
    return {k: np.load(os.path.join(sdir, v), mmap_mode="r")
            for k, v in ARRAY_FILES.items()}


def block_layout(counts: np.ndarray, block_size: int):
    """Per-term block counts + global block fenceposts for fixed-size
    posting blocks (empty terms get zero blocks)."""
    nb = -(-counts // block_size)
    block_offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(nb, out=block_offsets[1:])
    return nb, block_offsets


def _write_one_segment(seg_path: str, layout, index_dir: str) -> int:
    """Decode one segment file and write its terms' slices of the shared
    serve arrays (disjoint across tasks: a term lives in one segment file).
    ``layout`` is the broadcast placement tuple (an ObjectRef arg resolves
    to it automatically in the remote path). Returns postings written."""
    from colbert_ray.functions.bm25 import tf_saturation
    from colbert_ray.state.decoded import bulk_decode_runs

    (posting_offsets, block_offsets, avgdl, k1, b, bs) = layout
    sdir = os.path.join(index_dir, SERVE_DIR)
    seg = pq.read_table(seg_path,
                        columns=["term_id", "salt", "n", "docids_bin", "tfs_bin"])
    if seg.num_rows == 0:
        return 0
    tid, _salt, nper, docids, tfs = bulk_decode_runs(seg)
    doclens = np.load(os.path.join(sdir, ARRAY_FILES["doclens"]), mmap_mode="r")
    tfsat = tf_saturation(tfs.astype(np.float64),
                          np.asarray(doclens[docids], dtype=np.float64),
                          avgdl, k1, b)

    out_docids = np.lib.format.open_memmap(
        os.path.join(sdir, ARRAY_FILES["posting_docids"]), mode="r+")
    out_tfs = np.lib.format.open_memmap(
        os.path.join(sdir, ARRAY_FILES["posting_tfs"]), mode="r+")
    out_tfsat = np.lib.format.open_memmap(
        os.path.join(sdir, ARRAY_FILES["posting_tfsat"]), mode="r+")
    out_max = np.lib.format.open_memmap(
        os.path.join(sdir, ARRAY_FILES["max_tfsat"]), mode="r+")
    out_blast = np.lib.format.open_memmap(
        os.path.join(sdir, ARRAY_FILES["block_last_docid"]), mode="r+")
    out_bmax = np.lib.format.open_memmap(
        os.path.join(sdir, ARRAY_FILES["block_max_tfsat"]), mode="r+")

    # local per-term segments (runs are (term_id, salt)-sorted, so a term's
    # postings are one contiguous local slice in final docid order)
    run_starts = np.concatenate([[0], np.cumsum(nper)])
    new_term = np.empty(len(tid), dtype=bool)
    new_term[0] = True
    new_term[1:] = tid[1:] != tid[:-1]
    term_run_idx = np.flatnonzero(new_term)
    term_ids = tid[term_run_idx]
    term_lo = run_starts[term_run_idx]
    term_hi = np.append(term_lo[1:], run_starts[-1])

    for t, lo, hi in zip(term_ids, term_lo, term_hi):
        g = int(posting_offsets[t])
        d = docids[lo:hi]
        ts = tfsat[lo:hi]
        out_docids[g:g + (hi - lo)] = d
        out_tfs[g:g + (hi - lo)] = tfs[lo:hi]
        out_tfsat[g:g + (hi - lo)] = ts
        out_max[t] = ts.max()
        n = hi - lo
        nb = -(-n // bs)
        bends = np.minimum(np.arange(1, nb + 1) * bs, n) - 1
        bstarts = np.arange(nb) * bs
        bo = int(block_offsets[t])
        out_blast[bo:bo + nb] = d[bends]
        out_bmax[bo:bo + nb] = np.maximum.reduceat(ts, bstarts)
    for a in (out_docids, out_tfs, out_tfsat, out_max, out_blast, out_bmax):
        a.flush()
    return int(len(docids))


def write_serve_artifact(index_dir: str, parallel: bool = True) -> dict:
    """Build (or rebuild) the serve artifact from the current segments.

    Driver work is metadata-only: run (term_id, n) columns decide the global
    placement; per-segment Ray tasks decode + write their disjoint slices.
    """
    import ray as _ray

    with open(os.path.join(index_dir, "metadata.json")) as f:
        meta = json.load(f)
    from colbert_ray.config import EngineConfig

    cfg = EngineConfig.from_dict(meta["config"])
    n_terms = int(meta["n_terms"])
    sdir = os.path.join(index_dir, SERVE_DIR)
    os.makedirs(sdir, exist_ok=True)

    # ---- global placement from run metadata (small columns only) -------
    files = _segment_files(index_dir)
    counts = np.zeros(n_terms, dtype=np.int64)
    for f in files:
        t = pq.read_table(f, columns=["term_id", "n"])
        np.add.at(counts, t.column("term_id").to_numpy(zero_copy_only=False),
                  t.column("n").to_numpy(zero_copy_only=False))
    posting_offsets = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(counts, out=posting_offsets[1:])
    total = int(posting_offsets[-1])
    _nb, block_offsets = block_layout(counts, cfg.posting_block_size)
    n_blocks = int(block_offsets[-1])

    # ---- doclens (needed by every decode task for tf-saturation) -------
    docs = pads.dataset(os.path.join(index_dir, "docmeta")).to_table(
        columns=["docid", "doclen"])
    ids = docs.column("docid").to_numpy(zero_copy_only=False)
    doclens = np.zeros((int(ids.max()) + 1) if len(ids) else 0, dtype=np.int64)
    doclens[ids] = docs.column("doclen").to_numpy(zero_copy_only=False)

    def _alloc(name, shape, dtype):
        np.lib.format.open_memmap(os.path.join(sdir, ARRAY_FILES[name]),
                                  mode="w+", dtype=dtype, shape=shape).flush()

    np.save(os.path.join(sdir, ARRAY_FILES["posting_offsets"]), posting_offsets)
    np.save(os.path.join(sdir, ARRAY_FILES["block_offsets"]), block_offsets)
    np.save(os.path.join(sdir, ARRAY_FILES["doclens"]), doclens)
    _alloc("posting_docids", (total,), np.int64)
    _alloc("posting_tfs", (total,), np.int32)
    _alloc("posting_tfsat", (total,), np.float64)
    _alloc("max_tfsat", (n_terms,), np.float64)
    _alloc("block_last_docid", (n_blocks,), np.int64)
    _alloc("block_max_tfsat", (n_blocks,), np.float64)

    layout = (posting_offsets, block_offsets, float(meta["avgdl"]),
              cfg.k1, cfg.b, cfg.posting_block_size)
    if parallel and files and _ray.is_initialized():
        layout_ref = _ray.put(layout)   # broadcast once, read per task
        task = _ray.remote(num_cpus=1)(_write_one_segment)
        written = sum(_ray.get([task.remote(f, layout_ref, index_dir)
                                for f in files]))
    else:
        written = sum(_write_one_segment(f, layout, index_dir)
                      for f in files)
    assert written == total, (written, total)

    manifest = {"token": segments_token(index_dir), "n_postings": total,
                "n_terms": n_terms, "n_blocks": n_blocks,
                "block_size": cfg.posting_block_size}
    tmp = os.path.join(sdir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(sdir, "manifest.json"))
    return manifest
