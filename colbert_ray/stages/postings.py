"""Posting-list construction: explode, term-id mapping, segment encoding.

The engine's one big shuffle (SURVEY.md §2.5 A5/A6, §7.1 M3): tokenized docs
are exploded to ``(term, docid, tf, dl)`` rows, mapped to dense term_ids via
the dictionary (stateful actor pool — dictionary loaded once per actor,
T1/T2 analog of ``index_saver.py:52-57``), hash-partitioned by
``part = term_id % P`` with **salting of head terms** (df > salt_max_run is
split into docid-RANGE sub-runs so salted partials concatenate in sorted
docid order without a merge sort — SURVEY.md §7.3 #2), then
``groupby('part').map_groups`` delta+varint encodes each (term_id, salt) run
into a posting segment with block-max metadata (``optimize_ivf`` analog,
``colbert/indexing/utils.py:8-65``; chunk writer analog
``index_saver.py:79-90``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from colbert_ray.config import EngineConfig
from colbert_ray.functions.bm25 import tf_saturation
from colbert_ray.functions.codec import (
    delta_gaps_segmented,
    ef_encode_segmented,
    pfor_encode_segmented,
    varint_encode_segmented,
)
from colbert_ray.stages import manifests

SEGMENT_SCHEMA = pa.schema(
    [
        ("term_id", pa.int64()),
        ("salt", pa.int32()),
        ("n", pa.int64()),
        ("docids_bin", pa.binary()),
        ("tfs_bin", pa.binary()),
        ("block_last_docid", pa.list_(pa.int64())),
        ("block_max_tfsat", pa.list_(pa.float64())),
        ("max_tfsat", pa.float64()),
    ]
)


def explode_batch(batch: pa.Table) -> pa.Table:
    """(docid, doclen, terms, tfs) -> rows (term, docid, tf, dl). Vectorized."""
    terms = batch.column("terms").combine_chunks()
    tfs = batch.column("tfs").combine_chunks()
    parents = pc.list_parent_indices(terms)
    docids = pc.take(batch.column("docid"), parents)
    dls = pc.take(batch.column("doclen"), parents)
    return pa.table(
        {
            "term": terms.flatten(),
            "docid": docids,
            "tf": tfs.flatten(),
            "dl": dls,
        }
    )


class TermIdMapper:
    """Actor-pool stage: term string -> (term_id, part, salt).

    ``__init__`` loads the dictionary once per actor (sorted term array +
    df); ``__call__`` maps a batch via ``np.searchsorted`` (vectorized binary
    search — the classical analog of compress-into-codes,
    ``residual.py:204-220``).
    """

    def __init__(self, dictionary_path: str | list[str], cfg_dict: dict, n_docs: int):
        import pyarrow.dataset as pads

        self.cfg = EngineConfig.from_dict(cfg_dict)
        t = pads.dataset(dictionary_path).to_table(columns=["term", "term_id", "df"])
        order = pc.sort_indices(t.column("term"))
        t = t.take(order)
        self.terms = np.asarray(t.column("term").to_numpy(zero_copy_only=False))
        self.term_ids = t.column("term_id").to_numpy(zero_copy_only=False)
        self.dfs = t.column("df").to_numpy(zero_copy_only=False)
        # salt count per dictionary term: ceil(df / salt_max_run)
        self.n_salts = np.maximum(
            1, -(-self.dfs // self.cfg.salt_max_run)
        ).astype(np.int64)
        self.n_docs = max(1, n_docs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        term_str = batch.column("term").to_numpy(zero_copy_only=False)
        # factorize first: the binary search over dictionary strings runs on
        # the batch's UNIQUE terms (hundreds), not its 10^5-10^6 rows
        codes, uniques = pd.factorize(term_str, sort=False)
        upos = np.searchsorted(self.terms, uniques)
        # every term seen at build time is in the dictionary by construction
        term_id = self.term_ids[upos][codes]
        pos = upos[codes]
        docid = batch.column("docid").to_numpy(zero_copy_only=False)
        n_salt = self.n_salts[pos]
        # docid-RANGE salt: partials are docid-disjoint, ordered by salt id
        salt = ((docid.astype(np.int64) * n_salt) // self.n_docs).astype(np.int32)
        part = (term_id % self.cfg.num_term_partitions).astype(np.int32)
        return pa.table(
            {
                "part": pa.array(part),
                "term_id": pa.array(term_id.astype(np.int64)),
                "salt": pa.array(salt),
                "docid": batch.column("docid"),
                "tf": batch.column("tf"),
                "dl": batch.column("dl"),
            }
        )


MINIRUN_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("term_id", pa.int64()),
        ("salt", pa.int32()),
        ("n", pa.int64()),
        ("docids_bin", pa.binary()),
        ("tfs_bin", pa.binary()),
        ("dls_bin", pa.binary()),
    ]
)


class PostingCombiner(TermIdMapper):
    """Fused explode + term-id map + SPIMI map-side combiner.

    Input: tokenized doc batches ``(docid, doclen, terms, tfs)``.
    Output: ONE row per (term_id, salt) per batch — postings delta+varint
    packed into ``docids_bin/tfs_bin/dls_bin`` mini-runs. The shuffle then
    moves ~3 orders of magnitude fewer rows at ~5x fewer bytes than raw
    ``(term_id, docid, tf, dl)`` rows (the classical SPIMI combiner;
    map-side pre-aggregation per ray_guide.md "Aggregation at scale").
    """

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        ex = explode_batch(batch)
        mapped = TermIdMapper.__call__(self, ex)
        term_id = mapped.column("term_id").to_numpy(zero_copy_only=False)
        salt = mapped.column("salt").to_numpy(zero_copy_only=False)
        part = mapped.column("part").to_numpy(zero_copy_only=False)
        docid = mapped.column("docid").to_numpy(zero_copy_only=False).astype(np.int64)
        tf = mapped.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        dl = mapped.column("dl").to_numpy(zero_copy_only=False).astype(np.int64)

        order = np.lexsort((docid, salt, term_id))
        term_id, salt, part, docid, tf, dl = (
            term_id[order], salt[order], part[order], docid[order], tf[order], dl[order]
        )
        if len(term_id) == 0:
            return MINIRUN_SCHEMA.empty_table()
        new_run = np.empty(len(term_id), dtype=bool)
        new_run[0] = True
        new_run[1:] = (term_id[1:] != term_id[:-1]) | (salt[1:] != salt[:-1])
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(term_id))
        # one vectorized encode pass for ALL runs, then buffer slicing
        gaps = delta_gaps_segmented(docid, starts)
        docids_bins = varint_encode_segmented(gaps, starts)
        tfs_bins = varint_encode_segmented(tf.astype(np.uint64), starts)
        dls_bins = varint_encode_segmented(dl.astype(np.uint64), starts)
        return pa.table(
            {
                "part": pa.array(part[starts], type=pa.int32()),
                "term_id": pa.array(term_id[starts], type=pa.int64()),
                "salt": pa.array(salt[starts], type=pa.int32()),
                "n": pa.array((ends - starts).astype(np.int64)),
                "docids_bin": pa.array(docids_bins, type=pa.binary()),
                "tfs_bin": pa.array(tfs_bins, type=pa.binary()),
                "dls_bin": pa.array(dls_bins, type=pa.binary()),
            }
        )


def encode_runs(
    df, cfg: EngineConfig, avgdl: float
) -> pa.Table:
    """Postings of ONE partition -> encoded segment rows (one per term_id,salt).

    Fully numpy: one lexsort + run-length split; per-run varint encode.
    ``df`` is any column mapping (pandas DataFrame or dict of arrays).
    """
    term_id = np.asarray(df["term_id"], dtype=np.int64)
    salt = np.asarray(df["salt"], dtype=np.int32)
    docid = np.asarray(df["docid"], dtype=np.int64)
    tf = np.asarray(df["tf"], dtype=np.int64)
    dl = np.asarray(df["dl"], dtype=np.int64)

    order = np.lexsort((docid, salt, term_id))
    term_id, salt, docid, tf, dl = (
        term_id[order], salt[order], docid[order], tf[order], dl[order]
    )
    tfsat = tf_saturation(tf, dl, avgdl, cfg.k1, cfg.b)

    new_run = np.empty(len(term_id), dtype=bool)
    new_run[0] = True
    new_run[1:] = (term_id[1:] != term_id[:-1]) | (salt[1:] != salt[:-1])
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], len(term_id))

    bs = cfg.posting_block_size
    if len(starts) == 0:
        return SEGMENT_SCHEMA.empty_table()
    # one vectorized encode pass over ALL runs (codec per cfg.segment_codec);
    # for varint this is byte-identical to per-run delta_encode_docids
    gaps = delta_gaps_segmented(docid, starts)
    if cfg.segment_codec == "pfor":
        docids_bins = pfor_encode_segmented(gaps, starts)
        tfs_bins = pfor_encode_segmented(tf.astype(np.uint64), starts)
    elif cfg.segment_codec == "ef":
        docids_bins = ef_encode_segmented(gaps, starts)
        tfs_bins = ef_encode_segmented(tf.astype(np.uint64), starts)
    else:
        docids_bins = varint_encode_segmented(gaps, starts)
        tfs_bins = varint_encode_segmented(tf.astype(np.uint64), starts)

    # block-max metadata for ALL runs' blocks in one pass (same layout math
    # as DecodedIndex._build_block_arrays): runs are contiguous in the
    # posting arrays, so consecutive block starts bound each block exactly
    from colbert_ray.state.serve import block_layout

    counts = ends - starts
    nb, block_offsets = block_layout(counts, bs)
    total_blocks = int(block_offsets[-1])
    intra = np.arange(total_blocks) - np.repeat(block_offsets[:-1], nb)
    bstart = np.repeat(starts, nb) + intra * bs
    bend = np.minimum(bstart + bs, np.repeat(ends, nb)) - 1
    block_last = docid[bend]
    block_max = np.maximum.reduceat(tfsat, bstart) if total_blocks else \
        np.empty(0, dtype=np.float64)
    max_tfsat = np.maximum.reduceat(tfsat, starts)
    list_offs = pa.array(block_offsets, type=pa.int32())
    return pa.table(
        {
            "term_id": pa.array(term_id[starts], type=pa.int64()),
            "salt": pa.array(salt[starts], type=pa.int32()),
            "n": pa.array(counts, type=pa.int64()),
            "docids_bin": pa.array(docids_bins, type=pa.binary()),
            "tfs_bin": pa.array(tfs_bins, type=pa.binary()),
            "block_last_docid": pa.ListArray.from_arrays(
                list_offs, pa.array(block_last, type=pa.int64())),
            "block_max_tfsat": pa.ListArray.from_arrays(
                list_offs, pa.array(block_max, type=pa.float64())),
            "max_tfsat": pa.array(max_tfsat, type=pa.float64()),
        }
    )


def make_segment_writer(
    seg_dir: str, cfg: EngineConfig, avgdl: float, inputs_hash: str,
    verify_content: bool = False,
):
    """Encoder for one term partition: decode the spilled mini-runs, encode
    delta+varint posting runs, atomically write segment parquet(s), record
    the per-partition manifest.

    Memory cap (A2 heuristic analog): if the partition's decoded postings
    exceed ``cfg.max_encode_postings``, the mini-runs are split at
    (term_id, salt) boundaries into chunk files ``part_XXXXX.cNN.parquet``
    (salting bounds a single run to ``salt_max_run`` postings, so chunks
    can never blow the budget by more than one run). Logical index content
    is identical either way — readers concatenate and re-sort all files."""
    sem_hash = cfg.semantic_hash()

    def _decode_miniruns(group: pa.Table) -> dict:
        """Mini-run rows (Arrow) -> per-posting numpy column dict (reduce
        side of the SPIMI combiner), decoded in ONE bulk varint pass per
        column — no pandas materialization (DataFrame consolidation was
        ~40% of the encode task's wall). Mini-runs of one (term_id, salt)
        from different map tasks interleave in docid; encode_runs re-sorts
        by docid exactly."""
        from colbert_ray.functions.codec import varint_decode_segmented

        ns = group.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        term_id = np.repeat(
            group.column("term_id").to_numpy(zero_copy_only=False).astype(np.int64), ns)
        salt = np.repeat(
            group.column("salt").to_numpy(zero_copy_only=False).astype(np.int32), ns)
        gaps = varint_decode_segmented(
            group.column("docids_bin").to_pylist(), ns).astype(np.int64)
        g_cum = np.cumsum(gaps)
        run_start = np.concatenate([[0], np.cumsum(ns)[:-1]]).astype(np.int64)
        base = np.where(run_start > 0, g_cum[run_start - 1], 0)
        docid = g_cum - np.repeat(base, ns)
        tf = varint_decode_segmented(
            group.column("tfs_bin").to_pylist(), ns).astype(np.int64)
        dl = varint_decode_segmented(
            group.column("dls_bin").to_pylist(), ns).astype(np.int64)
        return {"term_id": term_id, "salt": salt,
                "docid": docid, "tf": tf, "dl": dl}

    def write_part(part: int, runs: pa.Table) -> dict:
        n_postings = int(pc.sum(runs.column("n")).as_py() or 0)
        if manifests.segment_complete(seg_dir, part, sem_hash, inputs_hash,
                                      verify_content=verify_content):
            n_runs = sum(
                pq.read_metadata(os.path.join(seg_dir, f)).num_rows
                for f in sorted(os.listdir(seg_dir))
                if f.startswith(f"part_{part:05d}") and f.endswith(".parquet")
            )
            return {"part": part, "n_runs": n_runs,
                    "n_postings": n_postings, "skipped": True}

        # chunk assignment at (term_id, salt) run boundaries
        tid = runs.column("term_id").to_numpy(zero_copy_only=False)
        salt = runs.column("salt").to_numpy(zero_copy_only=False)
        nn = runs.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((salt, tid))
        tid_s, salt_s, n_s = tid[order], salt[order], nn[order]
        new_run = np.empty(len(order), dtype=bool)
        if len(order):
            new_run[0] = True
            new_run[1:] = (tid_s[1:] != tid_s[:-1]) | (salt_s[1:] != salt_s[:-1])
        run_id = np.cumsum(new_run) - 1 if len(order) else np.empty(0, np.int64)
        run_total = np.bincount(run_id, weights=n_s).astype(np.int64) \
            if len(order) else np.empty(0, np.int64)
        cum = np.cumsum(run_total)
        chunk_of_run = (np.maximum(cum - 1, 0) // max(1, cfg.max_encode_postings))
        chunk_of_row = chunk_of_run[run_id] if len(order) else run_id
        n_chunks = int(chunk_of_run.max()) + 1 if len(run_total) else 1

        fnames, n_runs = [], 0
        for c in range(n_chunks):
            rows = order[chunk_of_row == c]
            chunk = runs.take(pa.array(rows)) if n_chunks > 1 else runs
            fname = (f"part_{part:05d}.parquet" if n_chunks == 1
                     else f"part_{part:05d}.c{c:02d}.parquet")
            fpath = os.path.join(seg_dir, fname)
            seg = encode_runs(_decode_miniruns(chunk), cfg, avgdl)
            tmp = fpath + ".tmp"
            pq.write_table(seg, tmp, compression="zstd")
            os.replace(tmp, fpath)
            fnames.append(fname)
            n_runs += seg.num_rows
        manifests.mark_segment_complete(
            seg_dir, part, sem_hash, inputs_hash, fnames,
            n_runs=n_runs, n_postings=n_postings, n_chunks=n_chunks,
        )
        return {"part": part, "n_runs": n_runs,
                "n_postings": n_postings, "skipped": False}

    return write_part
