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
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from colbert_ray.config import DEFAULT_CONFIG, EngineConfig
from colbert_ray.stages import manifests
from colbert_ray.stages.docids import sorted_rank_dataset
from colbert_ray.stages.postings import TermIdMapper, explode_batch, make_segment_writer
from colbert_ray.stages.tokenize import make_tokenize_fn

TOKENIZED = "tokenized"
DOCS = "docs"
DICTIONARY = "dictionary"
SEGMENTS = "segments"


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
    sem = cfg.semantic_hash()
    report: dict = {"phases": {}, "inputs_hash": inputs_hash, "semantic_hash": sem}

    manifests.atomic_write_json(
        os.path.join(index_dir, "plan.json"),
        {"config": cfg.to_dict(), "inputs": files, "inputs_hash": inputs_hash,
         "semantic_hash": sem, "key_cols": list(key_cols), "docid_col": docid_col},
    )

    def _phase(name):
        return not manifests.phase_complete(index_dir, name, sem, inputs_hash)

    read_cols = [content_col, *key_cols, *meta_cols]
    if docid_col:
        read_cols.append(docid_col)
    read_cols = list(dict.fromkeys(read_cols))

    # ---- A: tokenize --------------------------------------------------
    tok_dir = os.path.join(index_dir, TOKENIZED)
    if _phase("tokenize"):
        t0 = time.time()
        ds = ray.data.read_parquet(files, columns=read_cols)
        if content_col != "content":
            ds = ds.rename_columns({content_col: "content"})
        ds = ds.map_batches(
            make_tokenize_fn(cfg),
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
            zero_copy_batch=True,
        )
        os.makedirs(tok_dir, exist_ok=True)
        ds.write_parquet(tok_dir, mode="overwrite")
        manifests.mark_phase_complete(
            index_dir, "tokenize", sem, inputs_hash, wall_sec=time.time() - t0
        )
        report["phases"]["tokenize"] = time.time() - t0

    # ---- B: docid assignment -> docs/ --------------------------------
    docs_dir = os.path.join(index_dir, DOCS)
    if _phase("docids"):
        t0 = time.time()
        tok = ray.data.read_parquet(tok_dir)
        if docid_col:
            tok = tok.rename_columns({docid_col: "docid"}) if docid_col != "docid" else tok
            docs = tok
        else:
            docs = sorted_rank_dataset(tok, list(key_cols), "docid")
        docs.write_parquet(docs_dir, mode="overwrite")
        manifests.mark_phase_complete(
            index_dir, "docids", sem, inputs_hash, wall_sec=time.time() - t0
        )
        report["phases"]["docids"] = time.time() - t0

    # ---- C: corpus stats ---------------------------------------------
    stats_path = os.path.join(index_dir, "stats.json")
    if _phase("stats"):
        t0 = time.time()
        dls = ray.data.read_parquet(docs_dir, columns=["doclen"])
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
            index_dir, "stats", sem, inputs_hash, wall_sec=time.time() - t0, **stats
        )
        report["phases"]["stats"] = time.time() - t0
    with open(stats_path) as f:
        stats = json.load(f)

    # ---- D: dictionary (df/cf + dense sorted term_id) ----------------
    dict_dir = os.path.join(index_dir, DICTIONARY)
    if _phase("dictionary"):
        t0 = time.time()
        tok = ray.data.read_parquet(docs_dir, columns=["docid", "doclen", "terms", "tfs"])

        def partial_df_cf(batch: pa.Table) -> pa.Table:
            ex = explode_batch(batch)
            g = ex.group_by("term").aggregate([("docid", "count"), ("tf", "sum")])
            return g.rename_columns(["term", "df_p", "cf_p"])

        partials = tok.map_batches(partial_df_cf, batch_format="pyarrow",
                                   batch_size=cfg.tokenize_batch_size)
        terms = partials.groupby("term").aggregate(
            Sum("df_p", alias_name="df"), Sum("cf_p", alias_name="cf")
        )
        with_ids = sorted_rank_dataset(terms, ["term"], "term_id")
        with_ids.write_parquet(dict_dir, mode="overwrite")
        manifests.mark_phase_complete(
            index_dir, "dictionary", sem, inputs_hash, wall_sec=time.time() - t0
        )
        report["phases"]["dictionary"] = time.time() - t0

    dict_files = sorted(glob.glob(os.path.join(dict_dir, "*.parquet")))

    # ---- E: posting segments (THE shuffle) ---------------------------
    seg_dir = os.path.join(index_dir, SEGMENTS)
    os.makedirs(seg_dir, exist_ok=True)
    done_parts = {
        p for p in range(cfg.num_term_partitions)
        if manifests.segment_complete(seg_dir, p, sem, inputs_hash)
    }
    if _phase("segments"):
        t0 = time.time()
        todo = set(range(cfg.num_term_partitions)) - done_parts
        if todo:
            tok = ray.data.read_parquet(
                docs_dir, columns=["docid", "doclen", "terms", "tfs"]
            )
            exploded = tok.map_batches(
                explode_batch, batch_format="pyarrow",
                batch_size=cfg.tokenize_batch_size, zero_copy_batch=True,
            )
            # size the actor pool to leave CPUs for the read + shuffle +
            # write stages — a pool reserving every CPU deadlocks the
            # streaming executor (ray_guide.md "Stateful stages" rule)
            avail = int(ray.cluster_resources().get("CPU", 8))
            pool = max(1, min(cfg.scorer_concurrency, avail - 2))
            mapped = exploded.map_batches(
                TermIdMapper,
                fn_constructor_kwargs={
                    "dictionary_path": dict_files,
                    "cfg_dict": cfg.to_dict(),
                    "n_docs": stats["n_docs"],
                },
                batch_format="pyarrow",
                batch_size=cfg.tokenize_batch_size,
                concurrency=pool,
            )
            if done_parts:  # resume: shuffle only unfinished partitions
                todo_arr = pa.array(sorted(todo), type=pa.int32())
                mapped = mapped.map_batches(
                    lambda t: t.filter(pc.is_in(t.column("part"), value_set=todo_arr)),
                    batch_format="pyarrow",
                )
            summary = (
                mapped.groupby("part")
                .map_groups(
                    make_segment_writer(seg_dir, cfg, stats["avgdl"], inputs_hash),
                    batch_format="pandas",
                )
                .to_pandas()
            )
            report["phases"]["segments_detail"] = summary.to_dict("records")
        manifests.mark_phase_complete(
            index_dir, "segments", sem, inputs_hash, wall_sec=time.time() - t0
        )
        report["phases"]["segments"] = time.time() - t0

    # ---- F: finalize --------------------------------------------------
    if _phase("finalize"):
        t0 = time.time()
        dict_md = [pq.read_metadata(f) for f in dict_files]
        n_terms = sum(m.num_rows for m in dict_md)
        seg_files = sorted(glob.glob(os.path.join(seg_dir, "part_*.parquet")))
        n_postings = 0
        n_runs = 0
        for f in seg_files:
            t = pq.read_table(f, columns=["n"])
            n_runs += t.num_rows
            n_postings += int(pc.sum(t.column("n")).as_py() or 0)
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

    with open(os.path.join(index_dir, "metadata.json")) as f:
        report["metadata"] = json.load(f)
    return report
