"""Incremental index updates: delta segments + tombstones + compaction.

Analog of the reference's ``IndexUpdater`` (``colbert/index_updater.py:28-65,
150-274``): add passages / remove pids against a built index without a full
rebuild, persisted so a reloaded index reflects the changes. Mapped to the
classical delta-segment design (SURVEY.md §2.3 T6):

- ``add_documents``: tokenize the new docs, assign fresh docids after the
  current max (the reference also appends new pids at the end,
  index_updater.py:150-174), write ``deltas/delta_NNNNN/`` holding posting
  runs (same SEGMENT_SCHEMA) + docmeta rows. Frozen-statistics semantics:
  idf/avgdl stay those of the last full build until compaction — the exact
  analog of the reference reusing the trained codec/centroids for added
  passages (it never retrains on add).
- ``remove_docids``: tombstone list; scoring masks tombstoned docs
  (index_updater.py:67-110 analog).
- ``compact()``: full rebuild from current corpus = the reference's
  ``persist_to_disk`` + re-index path; statistics refresh here.

``DecodedIndex.load`` folds deltas + tombstones in, so the scorer actor pool
serves the updated view with no other changes.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from colbert_ray.config import EngineConfig
from colbert_ray.functions.tokenizer import doc_term_frequencies
from colbert_ray.stages.manifests import atomic_write_json
from colbert_ray.stages.postings import SEGMENT_SCHEMA, encode_runs


class IndexUpdater:
    """Driver-side updater for small/medium deltas (the reference updater is
    likewise single-process). Large backfills should use ``build_index`` on
    the combined corpus instead."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "metadata.json")) as f:
            self.meta = json.load(f)
        self.cfg = EngineConfig.from_dict(self.meta["config"])

    # ------------------------------------------------------------------
    def _delta_dirs(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.index_dir, "deltas", "delta_*")))

    def _next_docid(self) -> int:
        import pyarrow.dataset as pads

        mx = -1
        t = pads.dataset(os.path.join(self.index_dir, "docmeta")).to_table(
            columns=["docid"])
        if t.num_rows:
            mx = int(t.column("docid").to_numpy(zero_copy_only=False).max())
        for d in self._delta_dirs():
            dm = pq.read_table(os.path.join(d, "docmeta.parquet"), columns=["docid"])
            if dm.num_rows:
                mx = max(mx, int(dm.column("docid").to_numpy(zero_copy_only=False).max()))
        return mx + 1

    def add_documents(self, corpus: pa.Table, content_col: str = "content") -> np.ndarray:
        """Append documents; returns their assigned docids (sequential after
        the current max — index_updater.py:150-174 analog)."""
        import hashlib

        cfg = self.cfg
        n = corpus.num_rows
        start = self._next_docid()
        docids = np.arange(start, start + n, dtype=np.int64)

        content = corpus.column(content_col)
        doclens, terms, tfs = doc_term_frequencies(content, cfg)
        # explode to (term, docid, tf, dl) then encode with FROZEN avgdl
        import pyarrow.compute as pc

        parents = pc.list_parent_indices(terms).to_numpy(zero_copy_only=False)
        flat_terms = terms.flatten().to_numpy(zero_copy_only=False)
        flat_tfs = tfs.flatten().to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                # term STRING kept: delta term-ids resolve at load time
                "term": flat_terms,
                "term_id": np.zeros(len(flat_terms), dtype=np.int64),  # filled below
                "salt": np.zeros(len(flat_terms), dtype=np.int32),
                "docid": docids[parents],
                "tf": flat_tfs.astype(np.int64),
                "dl": doclens[parents],
            }
        )
        # per-delta local term ids (dense over the delta's sorted terms)
        uniq = np.sort(pd.unique(df["term"]))
        df["term_id"] = np.searchsorted(uniq, df["term"].to_numpy())
        seg = encode_runs(df[["term_id", "salt", "docid", "tf", "dl"]],
                          cfg, float(self.meta["avgdl"]))
        terms_tbl = pa.table({"local_term_id": pa.array(np.arange(len(uniq), dtype=np.int64)),
                              "term": pa.array(uniq, type=pa.string())})

        shas = [hashlib.sha256(s.encode()).hexdigest() for s in content.to_pylist()]
        docmeta = pa.table(
            {
                "docid": pa.array(docids),
                "doclen": pa.array(doclens),
                "content_sha256": pa.array(shas, type=pa.string()),
            }
        )
        # persist any extra (non-content) corpus columns so the docmeta
        # overlay in pipelines.search._docmeta_lookup sees delta docs'
        # metadata too (collapse / function-score boost_field on a live-
        # updated index; delta docs read NULL only for columns the caller
        # genuinely didn't supply)
        for name in corpus.column_names:
            if name != content_col and name not in docmeta.column_names:
                docmeta = docmeta.append_column(name, corpus.column(name))

        d = os.path.join(self.index_dir, "deltas",
                         f"delta_{len(self._delta_dirs()):05d}")
        os.makedirs(d + ".tmp", exist_ok=True)
        pq.write_table(seg, os.path.join(d + ".tmp", "segments.parquet"),
                       compression="zstd")
        pq.write_table(terms_tbl, os.path.join(d + ".tmp", "terms.parquet"),
                       compression="zstd")
        pq.write_table(docmeta, os.path.join(d + ".tmp", "docmeta.parquet"),
                       compression="zstd")
        os.replace(d + ".tmp", d)
        os.utime(os.path.join(self.index_dir, "metadata.json"))  # invalidate caches
        return docids

    def remove_docids(self, docids) -> None:
        """Tombstone docids (index_updater.py:67-110 analog)."""
        p = os.path.join(self.index_dir, "tombstones.json")
        cur = set()
        if os.path.exists(p):
            with open(p) as f:
                cur = set(json.load(f))
        cur.update(int(d) for d in docids)
        atomic_write_json(p, sorted(cur))
        os.utime(os.path.join(self.index_dir, "metadata.json"))

    def remove_by_query(self, q: str) -> np.ndarray:
        """Delete-by-query (the Elasticsearch ``_delete_by_query`` analog):
        tombstone every LIVE doc matching a boolean-DSL query (index-only
        atoms — term/wildcard/fuzzy/field/range booleans; phrase/NEAR need
        a corpus pass and are rejected by the evaluator). Returns the
        docids removed. Composes the querylang candidate evaluator with
        ``remove_docids``; the match set is computed against the current
        live view (already-tombstoned docs are never re-reported)."""
        from colbert_ray.pipelines.querylang import (
            _eval_set,
            node_kinds,
            parse,
        )
        from colbert_ray.state.decoded import DecodedIndex

        idx = DecodedIndex.load_cached(self.index_dir, load_sha=False)
        ast = parse(q, idx.cfg)
        if set(node_kinds(ast)) & {"phrase", "near"}:
            raise ValueError("remove_by_query supports index-only atoms "
                             "(phrase/NEAR need a corpus pass)")
        cand = _eval_set(ast, self.index_dir, None, idx, idx.cfg,
                         "text", "doc_id")
        if len(cand):
            self.remove_docids(cand)
        return np.asarray(cand, dtype=np.int64)

    def update_by_query(self, corpus, q: str, transform,
                        *, text_col: str = "text",
                        id_col: str = "doc_id",
                        content_col: str = "content") -> pa.Table:
        """Update-by-query (the Elasticsearch ``_update_by_query``
        analog): for every live doc matching an index-only boolean query,
        tombstone it and re-add ``transform(text)`` as a NEW delta doc
        (docids are immutable in this engine, so an update is
        remove+add — the same trade Lucene makes). ``transform`` is a
        vectorized callable ``list[str] -> list[str]`` applied INSIDE the
        streamed semi-join, so the corpus never materializes; only the
        matching rows' transformed text returns to the driver (bounded by
        the match set, like any delta batch). Returns (old_docid,
        new_docid) aligned rows."""
        from colbert_ray.functions.util import broadcast_semi_join
        from colbert_ray.pipelines.querylang import (
            _eval_set,
            node_kinds,
            parse,
        )
        from colbert_ray.state.decoded import DecodedIndex

        idx = DecodedIndex.load_cached(self.index_dir, load_sha=False)
        ast = parse(q, idx.cfg)
        if set(node_kinds(ast)) & {"phrase", "near"}:
            raise ValueError("update_by_query supports index-only atoms "
                             "(phrase/NEAR need a corpus pass)")
        cand = _eval_set(ast, self.index_dir, None, idx, idx.cfg,
                         "text", "doc_id")
        empty = pa.table({"old_docid": pa.array([], type=pa.int64()),
                          "new_docid": pa.array([], type=pa.int64())})
        if not len(cand):
            return empty

        def rewrite(sub: pa.Table) -> pa.Table:
            if not sub.num_rows:
                return pa.table({"docid": pa.array([], type=pa.int64()),
                                 "text": pa.array([], type=pa.string())})
            return pa.table({
                "docid": sub.column(id_col).cast(pa.int64()),
                "text": pa.array(
                    transform(sub.column(text_col).to_pylist()),
                    type=pa.string()),
            })

        rows = (broadcast_semi_join(
                    corpus.select_columns([id_col, text_col]), cand,
                    id_col)
                .map_batches(rewrite, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas())
        rows = rows.sort_values("docid").reset_index(drop=True)
        if len(rows) != len(cand):
            # silently skipping live matches (typically delta docs, whose
            # text is not in the base corpus) would leave them stale
            # forever — fail loudly and tell the caller what to include
            missing = sorted(set(int(c) for c in cand)
                             - set(int(d) for d in rows["docid"]))
            raise ValueError(
                f"update_by_query: {len(missing)} matching docid(s) are "
                f"not in the supplied corpus (first: {missing[:5]}). "
                f"Include delta corpora (e.g. deltas added via "
                f"add_documents) in the corpus argument, or remove those "
                f"docids explicitly.")
        self.remove_docids(rows["docid"].tolist())
        new_ids = self.add_documents(
            pa.table({content_col: pa.array(rows["text"],
                                            type=pa.string())}),
            content_col=content_col)
        return pa.table({
            "old_docid": pa.array(rows["docid"].to_numpy("int64")),
            "new_docid": pa.array(np.asarray(new_ids, dtype=np.int64)),
        })

    def compact(self, corpus_path, **build_kwargs) -> dict:
        """Full rebuild from the given corpus (statistics refresh) — the
        persist+reindex path. Clears deltas and tombstones."""
        import shutil

        from colbert_ray.pipelines.build import build_index

        shutil.rmtree(os.path.join(self.index_dir, "deltas"), ignore_errors=True)
        for f in ("tombstones.json",):
            try:
                os.remove(os.path.join(self.index_dir, f))
            except FileNotFoundError:
                pass
        # drop manifests so every phase rebuilds
        for f in glob.glob(os.path.join(self.index_dir, "_manifest_*.json")):
            os.remove(f)
        return build_index(corpus_path, self.index_dir, self.cfg, **build_kwargs)


def load_deltas(index_dir: str):
    """-> (segments rows, terms tables, docmeta tables, tombstones array)."""
    dirs = sorted(glob.glob(os.path.join(index_dir, "deltas", "delta_*")))
    segs, terms, metas = [], [], []
    for d in dirs:
        segs.append(pq.read_table(os.path.join(d, "segments.parquet")))
        terms.append(pq.read_table(os.path.join(d, "terms.parquet")))
        metas.append(pq.read_table(os.path.join(d, "docmeta.parquet")))
    tomb = np.empty(0, dtype=np.int64)
    p = os.path.join(index_dir, "tombstones.json")
    if os.path.exists(p):
        with open(p) as f:
            tomb = np.array(sorted(json.load(f)), dtype=np.int64)
    return segs, terms, metas, tomb
