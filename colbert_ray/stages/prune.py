"""Lossy index shrinking: stop-term pruning.

Capability analog of the reference's hierarchical token pooling
(``colbert/modeling/checkpoint.py:11-64``, ``pool_factor`` — M11): an
OPTIONAL, clearly-lossy transformation that shrinks the index at a known
quality cost. The lexical version drops posting lists of ultra-common terms
(df > max_df_ratio * N): their idf ≈ ln(1 + small) contributes least per
posting while holding the most postings (Zipf head).

Like the reference's pooling, this changes scores — it is NOT used by the
exactness-gated paths; tests assert the documented semantics instead
(pruned terms stop matching, others keep their exact scores).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from colbert_ray.stages.manifests import atomic_write_json


def prune_index(index_dir: str, max_df_ratio: float = 0.5) -> dict:
    """Drop posting runs of terms with df > max_df_ratio * n_docs.

    Rewrites segment files in place (atomic) and records the pruned term_ids
    in ``pruned.json``. Returns {n_terms_pruned, n_postings_dropped}.
    """
    with open(os.path.join(index_dir, "metadata.json")) as f:
        meta = json.load(f)
    n_docs = int(meta["n_docs"])
    cutoff = max_df_ratio * n_docs

    dt = pads.dataset(os.path.join(index_dir, "dictionary")).to_table(
        columns=["term_id", "df"]
    )
    dfs = dt.column("df").to_numpy(zero_copy_only=False)
    tids = dt.column("term_id").to_numpy(zero_copy_only=False)
    pruned = np.sort(tids[dfs > cutoff])
    dropped = 0
    if len(pruned):
        for f in sorted(glob.glob(os.path.join(index_dir, "segments", "part_*.parquet"))):
            t = pq.read_table(f)
            tid = t.column("term_id").to_numpy(zero_copy_only=False)
            keep = ~np.isin(tid, pruned)
            if keep.all():
                continue
            dropped += int(t.column("n").to_numpy(zero_copy_only=False)[~keep].sum())
            kept = t.filter(pa.array(keep))
            pq.write_table(kept, f + ".tmp", compression="zstd")
            os.replace(f + ".tmp", f)
    atomic_write_json(
        os.path.join(index_dir, "pruned.json"),
        {"max_df_ratio": max_df_ratio, "pruned_term_ids": pruned.tolist(),
         "n_postings_dropped": dropped},
    )
    os.utime(os.path.join(index_dir, "metadata.json"))  # invalidate caches
    if len(pruned) and os.path.isdir(os.path.join(index_dir, "serve")):
        from colbert_ray.state.serve import write_serve_artifact

        write_serve_artifact(index_dir)   # segment rewrite staled the token
    return {"n_terms_pruned": int(len(pruned)), "n_postings_dropped": dropped}
