"""Segment compaction: merge per-partition segment files into one sorted
segment (optionally merging salted runs of a term into single runs).

Analog of the reference's index coalescer (``colbert/utils/coalesce.py:9-111``:
N chunks -> 1 mmap-able file) and its equivalence guarantee
(``colbert/tests/index_coalesce_test.py:27-98``: identical logical content in
a different physical layout). After compaction the index answers every query
identically — enforced by ``tests/test_compact.py``.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from colbert_ray.config import EngineConfig
from colbert_ray.functions.bm25 import tf_saturation
from colbert_ray.functions.codec import (
    decode_docids_run,
    decode_tfs_run,
    encode_docids_run,
    encode_tfs_run,
)
from colbert_ray.stages.manifests import atomic_write_json
from colbert_ray.stages.postings import SEGMENT_SCHEMA


def coalesce_segments(index_dir: str, merge_salts: bool = True) -> str:
    """Rewrite segments/ as ONE file sorted by (term_id, salt); when
    ``merge_salts`` the salted runs of each term are concatenated into a
    single run (salt ranges are docid-disjoint and ordered, so plain
    concatenation preserves docid order). Returns the new file path."""
    import json

    with open(os.path.join(index_dir, "metadata.json")) as f:
        meta = json.load(f)
    cfg = EngineConfig.from_dict(meta["config"])
    avgdl = float(meta["avgdl"])

    seg_dir = os.path.join(index_dir, "segments")
    files = sorted(glob.glob(os.path.join(seg_dir, "part_*.parquet")))
    if not files:
        raise FileNotFoundError(f"no segments under {seg_dir}")
    seg = pa.concat_tables(pq.read_table(f) for f in files)
    df = seg.to_pandas()
    df = df.sort_values(["term_id", "salt"]).reset_index(drop=True)

    if merge_salts:
        rows = {k: [] for k in SEGMENT_SCHEMA.names}
        bs = cfg.posting_block_size
        for term_id, g in df.groupby("term_id", sort=True):
            if len(g) == 1:
                r = g.iloc[0]
                for k in SEGMENT_SCHEMA.names:
                    rows[k].append(r[k] if k != "salt" else 0)
                continue
            d = np.concatenate([
                decode_docids_run(b, int(n), cfg.segment_codec)
                for b, n in zip(g["docids_bin"], g["n"])
            ])
            tf = np.concatenate([
                decode_tfs_run(b, int(n), cfg.segment_codec)
                for b, n in zip(g["tfs_bin"], g["n"])
            ])
            # block-max metadata rebuilt over the merged run
            rows["term_id"].append(int(term_id))
            rows["salt"].append(0)
            rows["n"].append(int(len(d)))
            rows["docids_bin"].append(encode_docids_run(d, cfg.segment_codec))
            rows["tfs_bin"].append(encode_tfs_run(tf, cfg.segment_codec))
            n_blocks = -(-len(d) // bs)
            blk_last = d[np.minimum(np.arange(1, n_blocks + 1) * bs - 1, len(d) - 1)]
            # recompute tfsat for block maxes from doclens
            rows["block_last_docid"].append(blk_last.tolist())
            rows["block_max_tfsat"].append(
                _block_max_tfsat(index_dir, d, tf, avgdl, cfg, bs)
            )
            rows["max_tfsat"].append(max(rows["block_max_tfsat"][-1]))
        out = pa.table({k: pa.array(rows[k], type=SEGMENT_SCHEMA.field(k).type)
                        for k in SEGMENT_SCHEMA.names})
    else:
        out = pa.Table.from_pandas(df, preserve_index=False, schema=SEGMENT_SCHEMA)

    for f in files:
        os.remove(f)
    dest = os.path.join(seg_dir, "part_00000.parquet")
    pq.write_table(out, dest + ".tmp", compression="zstd")
    os.replace(dest + ".tmp", dest)
    atomic_write_json(
        os.path.join(seg_dir, "_coalesced.json"),
        {"files_merged": len(files), "n_runs": out.num_rows,
         "merge_salts": merge_salts},
    )
    # bump metadata mtime so driver-side decoded-index caches invalidate
    os.utime(os.path.join(index_dir, "metadata.json"))
    # the segment rewrite stales the serve artifact's token; rebuild it so
    # serving keeps the mmap fast path (cheap relative to the coalesce)
    if os.path.isdir(os.path.join(index_dir, "serve")):
        from colbert_ray.state.serve import write_serve_artifact

        write_serve_artifact(index_dir)
    return dest


_DOCLEN_CACHE: dict = {}


def _block_max_tfsat(index_dir, docids, tfs, avgdl, cfg, bs):
    # cache key includes metadata mtime: a same-process rebuild/compact of the
    # index must not reuse stale doclens (same invalidation as _INDEX_CACHE)
    key = (index_dir,
           os.path.getmtime(os.path.join(index_dir, "metadata.json")))
    dl = _DOCLEN_CACHE.get(key)
    if dl is None:
        import pyarrow.dataset as pads

        docs = pads.dataset(os.path.join(index_dir, "docmeta")).to_table(
            columns=["docid", "doclen"]
        )
        ids = docs.column("docid").to_numpy(zero_copy_only=False)
        dl = np.zeros(int(ids.max()) + 1, dtype=np.int64)
        dl[ids] = docs.column("doclen").to_numpy(zero_copy_only=False)
        _DOCLEN_CACHE.clear()
        _DOCLEN_CACHE[key] = dl
    ts = tf_saturation(tfs.astype(np.float64), dl[docids].astype(np.float64),
                       avgdl, cfg.k1, cfg.b)
    n_blocks = -(-len(docids) // bs)
    pad = n_blocks * bs - len(docids)
    return np.pad(ts, (0, pad)).reshape(n_blocks, bs).max(axis=1).tolist()
