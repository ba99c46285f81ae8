"""Index build pipeline — phased, resumable, Ray-Data-first.

The analog of ``CollectionIndexer.run`` (``collection_indexer.py:61-78``):
the reference's four barrier-separated phases (setup / train / index /
finalize) become Dataset stages separated by per-phase manifests, so an
interrupted build resumes without recomputing finished phases and finished
posting segments are never rebuilt (``index_saver.py:30-50`` analog;
north_rule resumability).

Phases (each writes an artifact + manifest under ``index_dir``):

  A tokenize    corpus parquet -> map_batches(tokenize) -> tokenized/
  B docids      deterministic docid (sort-rank of (repo,path), SURVEY §7.0)
                -> docs/   (docid + meta + terms/tfs)
  C stats       N, total_tokens, avgdl -> stats.json   (A1 analog, exact)
  D dictionary  explode -> partial (df, cf) per batch -> groupby(term).sum
                -> sort-rank term_id -> dictionary/    (A3 "train" analog)
  E segments    explode -> TermIdMapper actor pool -> groupby(part)
                -> encode + atomic write -> segments/  (A5/A6 + S10 analog)
  F finalize    verify all segments, metadata.json     (finalize analog)
  G serve       pre-decoded mmap serve artifact        (coalesce/mmap analog)
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from colbert_ray.config import DEFAULT_CONFIG, EngineConfig
from colbert_ray.stages import manifests
from colbert_ray.stages.docids import sorted_rank_dataset
from colbert_ray.stages.postings import PostingCombiner, explode_batch, make_segment_writer
from colbert_ray.stages.tokenize import make_tokenize_fn

TOKENIZED = "tokenized"
DOCID_MAP = "docid_map"
DOCMETA = "docmeta"
DICTIONARY = "dictionary"
SEGMENTS = "segments"

# below this row count the docid phase runs fully on the driver (one pyarrow
# read + sort + direct writes); above it, the distributed sort-rank path.
# Same threshold rationale as sorted_rank_dataset's driver fast path.
DOCID_DRIVER_THRESHOLD = 2_000_000


def _write_single_parquet_dir(t: pa.Table, out_dir: str, stem: str) -> None:
    """Overwrite ``out_dir`` with one parquet file holding ``t`` (atomic:
    tmp + rename; stale *.parquet removed) — the driver-side equivalent of
    ``write_parquet(..., mode="overwrite")`` without a Ray execution."""
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, f"{stem}.parquet.tmp")
    pq.write_table(t, tmp)
    for f in glob.glob(os.path.join(out_dir, "*.parquet")):
        os.remove(f)
    os.replace(tmp, os.path.join(out_dir, f"{stem}.parquet"))


def _attach_docid(
    ds: "ray.data.Dataset",
    map_dir: str,
    key_cols: tuple[str, ...],
    cfg: EngineConfig,
    docid_col: str | None,
) -> "ray.data.Dataset":
    """Attach the docid column to a tokenized-derived dataset.

    - source already has ids (``docid_col``): no-op.
    - ``broadcast`` (default): the docid map is ``ray.put`` once as sorted
      key/docid arrays; each batch does a vectorized ``np.searchsorted``
      lookup. Right for maps that fit a worker heap (<~10^8 docs).
    - ``join``: hash-partitioned ``Dataset.join`` on the key columns — the
      multi-node scale path when the map itself is huge.
    """
    if docid_col:
        return ds
    map_ds = ray.data.read_parquet(map_dir)
    if cfg.docid_map_strategy == "join":
        # Acero hash joins reject list-typed payload columns: pack the
        # (terms, tfs) lists into join-compatible scalars around the join
        # (NUL-joined term string + varint-packed tfs), unpack after.
        import numpy as np

        from colbert_ray.functions.codec import (
            varint_decode_segmented as _vds,
        )
        from colbert_ray.functions.codec import varint_encode_segmented as _ves

        has_lists = "terms" in ds.schema().names

        def pack(batch: pa.Table) -> pa.Table:
            terms = batch.column("terms").combine_chunks()
            tfs = batch.column("tfs").combine_chunks()
            n_terms = pc.list_value_length(terms).cast(pa.int64())
            flat_tfs = tfs.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
            offs = tfs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            starts = offs[:-1] - offs[0]
            tf_bins = _ves(flat_tfs, starts)
            packed_terms = pc.binary_join(terms, "\x00")
            cols = {n: batch.column(n) for n in batch.column_names
                    if n not in ("terms", "tfs")}
            cols["terms_packed"] = packed_terms
            cols["tfs_packed"] = pa.array(tf_bins, type=pa.binary())
            cols["n_terms"] = n_terms
            return pa.table(cols)

        def unpack(batch: pa.Table) -> pa.Table:
            n = batch.column("n_terms").to_numpy(zero_copy_only=False)
            split = pc.split_pattern(batch.column("terms_packed"), "\x00")
            # rows with 0 terms split to [""] — rebuild offsets from n_terms
            flat = split.combine_chunks().flatten()
            keep_offsets = np.concatenate([[0], np.cumsum(n)]).astype(np.int32)
            # flatten yields n>=1 entries per row; drop the phantom "" of
            # empty rows by taking exactly n_i strings per row in order
            src_off = split.combine_chunks().offsets.to_numpy(zero_copy_only=False)
            idx = np.concatenate([
                np.arange(src_off[i], src_off[i] + n[i], dtype=np.int64)
                for i in range(len(n))
            ]) if len(n) else np.empty(0, dtype=np.int64)
            terms_flat = flat.take(pa.array(idx))
            terms = pa.ListArray.from_arrays(pa.array(keep_offsets), terms_flat)
            tf_flat = _vds(batch.column("tfs_packed").to_pylist(), n).astype(np.int64)
            tfs = pa.ListArray.from_arrays(
                pa.array(keep_offsets), pa.array(tf_flat.astype(np.int32))
            )
            cols = {c: batch.column(c) for c in batch.column_names
                    if c not in ("terms_packed", "tfs_packed", "n_terms")}
            cols["terms"] = terms
            cols["tfs"] = tfs
            return pa.table(cols)

        side = ds.map_batches(pack, batch_format="pyarrow",
                              zero_copy_batch=True) if has_lists else ds
        joined = side.join(map_ds, join_type="inner", on=tuple(key_cols),
                           num_partitions=cfg.num_term_partitions)
        if has_lists:
            joined = joined.map_batches(unpack, batch_format="pyarrow")
        return joined

    mt = pa.concat_tables(
        pq.read_table(f)
        for f in sorted(glob.glob(os.path.join(map_dir, "*.parquet")))
    )
    import numpy as np

    def composite(tbl: pa.Table) -> "np.ndarray":
        parts = [
            pc.cast(tbl.column(c), pa.string()).to_numpy(zero_copy_only=False)
            for c in key_cols
        ]
        out = parts[0]
        for p in parts[1:]:
            out = np.char.add(np.char.add(out.astype(str), "\x00"), p.astype(str))
        return out

    keys = composite(mt)
    docids = mt.column("docid").to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order], docids[order]))

    def lookup(batch: pa.Table) -> pa.Table:
        k_sorted, d_sorted = ray.get(ref)
        pos = np.searchsorted(k_sorted, composite(batch))
        return batch.append_column("docid", pa.array(d_sorted[pos], type=pa.int64()))

    return ds.map_batches(lookup, batch_format="pyarrow", zero_copy_batch=True)


def corpus_fingerprint(paths: list[str]) -> str:
    """Input lineage hash: sorted (path, size, num_rows) from parquet footers."""
    parts = []
    for p in sorted(paths):
        md = pq.read_metadata(p)
        parts.append(f"{os.path.basename(p)}:{os.path.getsize(p)}:{md.num_rows}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def _expand(corpus_path: str | list[str]) -> list[str]:
    if isinstance(corpus_path, list):
        return sorted(corpus_path)
    if os.path.isdir(corpus_path):
        return sorted(glob.glob(os.path.join(corpus_path, "*.parquet")))
    return [corpus_path]


def build_index(
    corpus_path: str | list[str],
    index_dir: str,
    cfg: EngineConfig | None = None,
    *,
    content_col: str = "content",
    key_cols: tuple[str, ...] = ("repo", "path"),
    meta_cols: tuple[str, ...] = ("commit", "lang"),
    docid_col: str | None = None,
) -> dict:
    """Build (or resume) the inverted index. Returns the build report.

    ``docid_col``: if the source already carries a unique int64 id (e.g. the
    ``documents`` table's ``doc_id``) it is used directly; otherwise docid =
    rank of ``key_cols`` under a global sort — identical at any parallelism.
    """
    cfg = cfg or DEFAULT_CONFIG
    os.makedirs(index_dir, exist_ok=True)
    files = _expand(corpus_path)
    inputs_hash = corpus_fingerprint(files)
    # two-level manifest keying: phases upstream of partitioning (A-D) key
    # on the tokenizer-only hash, so the data-driven effective partition
    # count (A2 heuristic, set after stats) never invalidates the cached
    # tokenize; partition-dependent phases key on the full semantic hash
    # computed AFTER the effective partition count is known.
    sem_pre = cfg.semantic_hash_pretokenize()
    report: dict = {"phases": {}, "inputs_hash": inputs_hash}

    manifests.atomic_write_json(
        os.path.join(index_dir, "plan.json"),
        {"config": cfg.to_dict(), "inputs": files, "inputs_hash": inputs_hash,
         "semantic_hash_pretokenize": sem_pre, "key_cols": list(key_cols),
         "meta_cols": list(meta_cols), "docid_col": docid_col},
    )

    def _phase(name, h):
        return not manifests.phase_complete(index_dir, name, h, inputs_hash)

    read_cols = [content_col, *key_cols, *meta_cols]
    if docid_col:
        read_cols.append(docid_col)
    if cfg.lang_overrides:
        # per-lang tokenizer plugins dispatch on the lang column — make sure
        # the pruned read keeps it even when it isn't a key/meta column
        read_cols.append("lang")
    read_cols = list(dict.fromkeys(read_cols))

    # ---- A: tokenize --------------------------------------------------
    # tokenized/ holds the ONLY persisted copy of the heavy (terms, tfs)
    # columns; every later phase reads it and attaches the (tiny) docid map
    # in-stream instead of rewriting the corpus (a second full-copy write
    # would double the I/O of a 100TB build).
    tok_dir = os.path.join(index_dir, TOKENIZED)
    if _phase("tokenize", sem_pre):
        t0 = time.time()
        ds = ray.data.read_parquet(files, columns=read_cols)
        renames = {}
        if content_col != "content":
            renames[content_col] = "content"
        if docid_col and docid_col != "docid":
            renames[docid_col] = "docid"
        if renames:
            ds = ds.rename_columns(renames)
        ds = ds.map_batches(
            make_tokenize_fn(cfg),
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
            zero_copy_batch=True,
        )
        os.makedirs(tok_dir, exist_ok=True)
        ds.write_parquet(tok_dir, mode="overwrite")
        manifests.mark_phase_complete(
            index_dir, "tokenize", sem_pre, inputs_hash, wall_sec=time.time() - t0,
            ray_stats=ds.stats()[:4000],
        )
        report["phases"]["tokenize"] = time.time() - t0

    # ---- B: docid map + light doc metadata ----------------------------
    map_dir = os.path.join(index_dir, DOCID_MAP)
    meta_dir = os.path.join(index_dir, DOCMETA)
    light_cols = [c for c in (*key_cols, *meta_cols) if c != docid_col]
    if _phase("docids", sem_pre):
        t0 = time.time()
        lite_cols = list(dict.fromkeys(
            [*key_cols, *light_cols, "content_sha256", "doclen"]
            + (["docid"] if docid_col else [])))
        tok_files = sorted(glob.glob(os.path.join(tok_dir, "*.parquet")))
        n_rows = sum(pq.read_metadata(f).num_rows for f in tok_files)
        if n_rows <= DOCID_DRIVER_THRESHOLD:
            # fused driver fast path: the light columns fit the driver, so
            # docid assignment is ONE pyarrow read + ONE sort + two direct
            # parquet writes — no Ray Data executions at all. This removes
            # the phase's ~4-5 s of fixed pipeline/coordination cost (it was
            # the worst non-scaling phase in the round-2 profile). Rank
            # semantics are IDENTICAL to the distributed path: pyarrow
            # sort_indices gives the same UTF-8-byte order as Ray's sample
            # sort, and docid = rank under that sort.
            t = pads.dataset(tok_files).to_table(columns=lite_cols)
            if not docid_col:
                import numpy as _np

                order = pc.sort_indices(
                    t, sort_keys=[(k, "ascending") for k in key_cols])
                t = t.take(order)
                t = t.append_column("docid", pa.array(
                    _np.arange(t.num_rows, dtype=_np.int64), type=pa.int64()))
                _write_single_parquet_dir(
                    t.select([*key_cols, "docid"]), map_dir, "docid_map_0")
            meta_keep = list(dict.fromkeys(
                [*light_cols, "content_sha256", "doclen", "docid"]))
            _write_single_parquet_dir(t.select(meta_keep), meta_dir, "docmeta_0")
        else:
            # distributed path (corpora beyond driver scale)
            if not docid_col:
                # docid = rank of key_cols under a global sort, computed on
                # the KEYS-ONLY projection (never moves the heavy term lists)
                keys = ray.data.read_parquet(tok_dir, columns=list(key_cols))
                sorted_rank_dataset(keys, list(key_cols), "docid").write_parquet(
                    map_dir, mode="overwrite"
                )
            lite = ray.data.read_parquet(
                tok_dir,
                columns=light_cols + ["content_sha256", "doclen"]
                + (["docid"] if docid_col else []),
            )
            lite = _attach_docid(lite, map_dir, key_cols, cfg, docid_col)
            lite.write_parquet(meta_dir, mode="overwrite")
        manifests.mark_phase_complete(
            index_dir, "docids", sem_pre, inputs_hash, wall_sec=time.time() - t0
        )
        report["phases"]["docids"] = time.time() - t0

    # ---- C: corpus stats ---------------------------------------------
    stats_path = os.path.join(index_dir, "stats.json")
    if _phase("stats", sem_pre):
        t0 = time.time()
        dls = ray.data.read_parquet(tok_dir, columns=["doclen"])
        agg = dls.aggregate(Sum("doclen", alias_name="total_tokens"),
                            Count(alias_name="n_docs"))
        n_docs = int(agg["n_docs"])
        total = int(agg["total_tokens"] or 0)
        stats = {
            "n_docs": n_docs,
            "total_tokens": total,
            "avgdl": float(total) / float(max(1, n_docs)),
        }
        manifests.atomic_write_json(stats_path, stats)
        manifests.mark_phase_complete(
            index_dir, "stats", sem_pre, inputs_hash, wall_sec=time.time() - t0, **stats
        )
        report["phases"]["stats"] = time.time() - t0
    with open(stats_path) as f:
        stats = json.load(f)
    # A2 heuristic: effective partition count from the measured corpus size
    # (pure function of the data — identical at any parallelism level)
    import dataclasses as _dc

    p_eff = cfg.effective_partitions(stats["total_tokens"])
    if p_eff != cfg.num_term_partitions:
        cfg = _dc.replace(cfg, num_term_partitions=p_eff)
    sem = cfg.semantic_hash()
    report["semantic_hash"] = sem
    report["num_term_partitions"] = p_eff

    # ---- D: dictionary (df/cf + dense sorted term_id) ----------------
    dict_dir = os.path.join(index_dir, DICTIONARY)
    if _phase("dictionary", sem_pre):
        t0 = time.time()
        tok = ray.data.read_parquet(tok_dir, columns=["terms", "tfs"])

        def partial_df_cf(batch: pa.Table) -> pa.Table:
            terms = batch.column("terms").combine_chunks()
            tfs = batch.column("tfs").combine_chunks()
            t = pa.table({"term": terms.flatten(), "tf": tfs.flatten()})
            g = t.group_by("term").aggregate([("term", "count"), ("tf", "sum")])
            return g.rename_columns(["term", "df_p", "cf_p"])

        partials = tok.map_batches(partial_df_cf, batch_format="pyarrow",
                                   batch_size=cfg.tokenize_batch_size).materialize()
        if partials.count() <= 2_000_000:
            # small-side fast path: the per-batch partials are already
            # pre-aggregated, so the final merge is tiny — Ray's AllToAll
            # groupby + sample sort carry ~5-10 s of fixed coordination
            # that dominates small dictionaries and wrecks strong scaling
            pt = pa.concat_tables(
                [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows],
                promote_options="default")
            g = pt.group_by("term").aggregate([("df_p", "sum"), ("cf_p", "sum")])
            g = g.rename_columns(["term", "df", "cf"])
            order = pc.sort_indices(g.column("term"))
            g = g.take(order)
            import numpy as np

            g = g.append_column(
                "term_id",
                pa.array(np.arange(g.num_rows, dtype=np.int64), type=pa.int64()))
            os.makedirs(dict_dir, exist_ok=True)
            for f in glob.glob(os.path.join(dict_dir, "*.parquet")):
                os.remove(f)
            pq.write_table(g, os.path.join(dict_dir, "dictionary_0.parquet"))
        else:
            terms = partials.groupby("term").aggregate(
                Sum("df_p", alias_name="df"), Sum("cf_p", alias_name="cf")
            )
            with_ids = sorted_rank_dataset(terms, ["term"], "term_id")
            with_ids.write_parquet(dict_dir, mode="overwrite")
        manifests.mark_phase_complete(
            index_dir, "dictionary", sem_pre, inputs_hash, wall_sec=time.time() - t0
        )
        report["phases"]["dictionary"] = time.time() - t0

    dict_files = sorted(glob.glob(os.path.join(dict_dir, "*.parquet")))

    # ---- E: posting segments (THE shuffle) ---------------------------
    seg_dir = os.path.join(index_dir, SEGMENTS)
    os.makedirs(seg_dir, exist_ok=True)
    if _phase("segments", sem):
        # drop STALE segment artifacts from a prior configuration (e.g. a
        # different effective partition count — readers glob part_*.parquet,
        # so a leftover file from a larger P would DUPLICATE postings):
        # manifests not matching the current (semantic, inputs) hash are
        # deleted with their data files; orphan part files likewise.
        valid_files: set[str] = set()
        for mf in glob.glob(os.path.join(seg_dir, "_manifest_part_*.json")):
            try:
                with open(mf) as f:
                    m = json.load(f)
            except (OSError, json.JSONDecodeError):
                m = {}
            if (m.get("semantic_hash") == sem
                    and m.get("inputs_hash") == inputs_hash):
                valid_files.update(
                    e.get("name", "") for e in
                    (m.get("files") or [{"name": m.get("file", "")}]))
            else:
                os.remove(mf)
        for f in glob.glob(os.path.join(seg_dir, "part_*.parquet")):
            if os.path.basename(f) not in valid_files:
                os.remove(f)
    # resolved ONCE in the driver: Ray worker tasks don't see env changes
    # made after ray.init, so the flag is passed explicitly below
    verify_content = os.environ.get("COLBERT_RAY_VERIFY_CONTENT") == "1"
    done_parts = {
        p for p in range(cfg.num_term_partitions)
        if manifests.segment_complete(seg_dir, p, sem, inputs_hash,
                                      verify_content=verify_content)
    }
    # The shuffle is EXPLICIT and disk-based (classical SPIMI external
    # shuffle): E1 spills combiner mini-runs hive-partitioned by term
    # partition; E2 encodes each partition independently. No AllToAll
    # operator (Ray's sort-groupby carries ~10s of fixed coordination cost
    # regardless of size), each E2 task is individually resumable, and the
    # spill IS the map-output checkpoint.
    spill_dir = os.path.join(index_dir, "spill")
    if _phase("segments", sem):
        t0 = time.time()
        todo = sorted(set(range(cfg.num_term_partitions)) - done_parts)
        if todo and not manifests.phase_complete(index_dir, "spill", sem, inputs_hash):
            # read with ~2 blocks per combiner actor: the hive write emits
            # one file per (block, part), so fewer/larger input blocks keep
            # the spill file count at ~2·pool·P without any repartition
            # barrier (the old repartition materialized every mini-run in
            # an all-to-all right before the write)
            avail0 = int(ray.cluster_resources().get("CPU", 8))
            tok = ray.data.read_parquet(
                tok_dir,
                columns=(["docid"] if docid_col else list(key_cols))
                + ["doclen", "terms", "tfs"],
                override_num_blocks=max(2, (avail0 - 2) * 2),
            )
            tok = _attach_docid(tok, map_dir, key_cols, cfg, docid_col)
            if not docid_col:
                tok = tok.drop_columns(list(key_cols))
            # size the actor pool to leave CPUs for the read + write stages —
            # a pool reserving every CPU deadlocks the streaming executor
            avail = int(ray.cluster_resources().get("CPU", 8))
            pool = max(1, min(cfg.scorer_concurrency, avail - 2))
            # fused explode + term-id map + SPIMI map-side combiner: the
            # spill holds encoded mini-runs, not raw posting rows
            mapped = tok.map_batches(
                PostingCombiner,
                fn_constructor_kwargs={
                    "dictionary_path": dict_files,
                    "cfg_dict": cfg.to_dict(),
                    "n_docs": stats["n_docs"],
                },
                batch_format="pyarrow",
                batch_size=cfg.tokenize_batch_size,
                concurrency=pool,
            )
            mapped.write_parquet(spill_dir, partition_cols=["part"],
                                 mode="overwrite")
            manifests.mark_phase_complete(index_dir, "spill", sem, inputs_hash,
                                          wall_sec=time.time() - t0,
                                          ray_stats=mapped.stats()[:4000])
        if todo:
            writer = make_segment_writer(seg_dir, cfg, stats["avgdl"],
                                         inputs_hash,
                                         verify_content=verify_content)

            def encode_part(row: dict) -> dict:
                part = int(row["part"])
                pdir = os.path.join(spill_dir, f"part={part}")
                if not os.path.isdir(pdir):
                    return {"part": part, "n_runs": 0, "n_postings": 0,
                            "skipped": False}
                # Arrow table (varint bins stay packed ~on-disk size); the
                # writer decodes per (term_id, salt)-aligned CHUNK so task
                # memory is bounded by cfg.max_encode_postings, not by the
                # partition's total postings
                return writer(part, pq.read_table(pdir))

            summary = (
                ray.data.from_items([{"part": p} for p in todo],
                                    override_num_blocks=len(todo))
                .map(encode_part)
                .to_pandas()
            )
            report["phases"]["segments_detail"] = summary.to_dict("records")
        manifests.mark_phase_complete(
            index_dir, "segments", sem, inputs_hash, wall_sec=time.time() - t0
        )
        report["phases"]["segments"] = time.time() - t0

    # ---- F: finalize --------------------------------------------------
    if _phase("finalize", sem):
        t0 = time.time()
        dict_md = [pq.read_metadata(f) for f in dict_files]
        n_terms = sum(m.num_rows for m in dict_md)
        seg_files = sorted(glob.glob(os.path.join(seg_dir, "part_*.parquet")))
        from concurrent.futures import ThreadPoolExecutor

        def _count_runs(f):
            t = pq.read_table(f, columns=["n"])
            return t.num_rows, int(pc.sum(t.column("n")).as_py() or 0)

        with ThreadPoolExecutor(max_workers=min(16, max(1, len(seg_files)))) as ex:
            counts_rf = list(ex.map(_count_runs, seg_files))
        n_runs = sum(r for r, _ in counts_rf)
        n_postings = sum(p for _, p in counts_rf)
        meta = {
            "n_docs": stats["n_docs"],
            "avgdl": stats["avgdl"],
            "total_tokens": stats["total_tokens"],
            "n_terms": n_terms,
            "n_postings": n_postings,
            "n_runs": n_runs,
            "num_term_partitions": cfg.num_term_partitions,
            "config": cfg.to_dict(),
            "semantic_hash": sem,
            "inputs_hash": inputs_hash,
        }
        manifests.atomic_write_json(os.path.join(index_dir, "metadata.json"), meta)
        manifests.mark_phase_complete(
            index_dir, "finalize", sem, inputs_hash, wall_sec=time.time() - t0
        )
        report["phases"]["finalize"] = time.time() - t0

    # ---- G: serve artifact (mmap flat arrays; one task per segment) ---
    from colbert_ray.state.serve import serve_valid, write_serve_artifact

    if _phase("serve", sem) or not serve_valid(index_dir):
        t0 = time.time()
        write_serve_artifact(index_dir)
        manifests.mark_phase_complete(
            index_dir, "serve", sem, inputs_hash, wall_sec=time.time() - t0
        )
        report["phases"]["serve"] = time.time() - t0

    with open(os.path.join(index_dir, "metadata.json")) as f:
        report["metadata"] = json.load(f)
    return report
