"""Index merge — combine independently built indexes into one.

The Lucene-segment-merge analog for this engine (the reference's
checkpoint/index reuse has no multi-index merge; capability modeled on
Lucene ``IndexWriter.addIndexes`` / SPIMI multi-way merge): given N
complete sub-indexes built with the SAME tokenizer configuration, produce
one index over the union of their corpora whose search results are
IDENTICAL to a single build over the combined corpus.

Why this shape: in this engine every phase after tokenize (docids, stats,
dictionary, the SPIMI spill shuffle, segments, serve) is a pure function
of the ``tokenized/`` dataset — and tokenize is the dominant build cost.
Merging therefore = adopt the sub-indexes' tokenized runs (hardlink, no
re-read of the raw corpus, no re-tokenize) and re-run the global phases,
which are exactly the stats-refresh a correct merge REQUIRES anyway: df,
avgdl, and tf-saturation all change when corpora combine, so Lucene-style
posting-block concatenation alone would serve stale BM25 statistics.
Global docid/term_id assignment stays the engine's deterministic
sort-rank, so the merged index is bit-equivalent to the single build
(rankings sha included), not merely rank-equivalent.

Resumability: the merged dir is a normal phased index — interrupting the
merge and re-calling ``merge_indexes`` resumes from the finished phase
manifests like any build (north_rule lineage).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines.build import TOKENIZED, build_index, corpus_fingerprint
from colbert_ray.stages import manifests


def _plan(index_dir: str) -> dict:
    p = os.path.join(index_dir, "plan.json")
    if not os.path.exists(p):
        raise ValueError(f"{index_dir}: no plan.json — not a built index")
    with open(p) as f:
        return json.load(f)


def merge_indexes(
    index_dirs: list[str],
    out_dir: str,
    cfg: EngineConfig | None = None,
) -> dict:
    """Merge complete sub-indexes into ``out_dir``. Returns the build report.

    Requirements (validated):
    - every sub-index finished its tokenize phase;
    - all sub-indexes (and ``cfg``, if given) share the same tokenizer
      configuration (``semantic_hash_pretokenize``) and the same
      key_cols / docid_col / content_col contract;
    - with ``docid_col`` sources, the id ranges must be disjoint (checked
      via docmeta min/max — ids are the user's, a collision would silently
      fuse two documents).

    ``cfg`` defaults to the first sub-index's recorded config. Partition
    count is re-derived from the MERGED corpus size (A2 heuristic), exactly
    as a single build would.
    """
    if len(index_dirs) < 2:
        raise ValueError("merge_indexes needs at least two sub-indexes")
    plans = [_plan(d) for d in index_dirs]
    key_cols = tuple(plans[0]["key_cols"])
    docid_col = plans[0]["docid_col"]
    meta_cols = plans[0].get("meta_cols")
    if meta_cols is None:
        # plan predates meta_cols recording: derive from the tokenized
        # schema (everything that isn't a key/engine column is metadata)
        import pyarrow.parquet as pq

        tok0 = sorted(glob.glob(
            os.path.join(index_dirs[0], TOKENIZED, "*.parquet")))
        engine_cols = {"content_sha256", "doclen", "terms", "tfs", "docid",
                       *key_cols}
        meta_cols = [c for c in pq.read_schema(tok0[0]).names
                     if c not in engine_cols] if tok0 else []
    meta_cols = tuple(meta_cols)
    if cfg is None:
        cfg = EngineConfig(**plans[0]["config"])
    sem_pre = cfg.semantic_hash_pretokenize()
    for d, pl in zip(index_dirs, plans):
        if pl["semantic_hash_pretokenize"] != sem_pre:
            raise ValueError(
                f"{d}: tokenizer config mismatch "
                f"({pl['semantic_hash_pretokenize']} != {sem_pre}) — "
                f"tokenized runs are not reusable across tokenizers")
        if tuple(pl["key_cols"]) != key_cols or pl["docid_col"] != docid_col:
            raise ValueError(
                f"{d}: key_cols/docid_col contract differs from "
                f"{index_dirs[0]}")
        if not manifests.phase_complete(
                d, "tokenize", sem_pre, pl["inputs_hash"]):
            raise ValueError(f"{d}: tokenize phase incomplete — finish the "
                             f"sub-index build first")

    if docid_col:
        _assert_disjoint_docids(index_dirs)

    # ---- adopt the tokenized runs (hardlink; copy across devices) ------
    os.makedirs(out_dir, exist_ok=True)
    tok_dir = os.path.join(out_dir, TOKENIZED)
    os.makedirs(tok_dir, exist_ok=True)
    # plan the adopted file names FIRST, then drop any previously adopted
    # file not in the plan — re-merging a different (or reordered)
    # sub-index list into the same out_dir must not leave stale runs for
    # phase B+'s glob to pick up (they would silently fuse corpora)
    plan: list[tuple[str, str]] = []
    for i, d in enumerate(index_dirs):
        srcs = sorted(glob.glob(os.path.join(d, TOKENIZED, "*.parquet")))
        if not srcs:
            raise ValueError(f"{d}: tokenized/ holds no parquet files")
        for s in srcs:
            plan.append((s, os.path.join(
                tok_dir, f"sub{i:03d}_{os.path.basename(s)}")))
    planned = {dst for _, dst in plan}
    for f in glob.glob(os.path.join(tok_dir, "*.parquet")):
        if f not in planned:
            os.remove(f)
    merged_files: list[str] = []
    for s, dst in plan:
        if not os.path.exists(dst):
            tmp = dst + ".tmp"
            try:
                os.link(s, tmp)
            except OSError:
                shutil.copyfile(s, tmp)
            os.replace(tmp, dst)
        merged_files.append(dst)

    # the merged build's input lineage IS the adopted tokenized files —
    # mark tokenize complete for that fingerprint, then run the normal
    # phased build over them (phase A skips; B..G read only tokenized/)
    inputs_hash = corpus_fingerprint(merged_files)
    if not manifests.phase_complete(out_dir, "tokenize", sem_pre, inputs_hash):
        manifests.mark_phase_complete(
            out_dir, "tokenize", sem_pre, inputs_hash,
            merged_from=[os.path.abspath(d) for d in index_dirs])
    report = build_index(
        merged_files, out_dir, cfg,
        key_cols=key_cols, meta_cols=meta_cols, docid_col=docid_col)
    report["merged_from"] = [os.path.abspath(d) for d in index_dirs]
    return report


def _assert_disjoint_docids(index_dirs: list[str]) -> None:
    """min/max per sub-index from docmeta parquet column stats (footer-only
    reads) — overlapping user-id ranges would silently fuse documents."""
    import pyarrow.parquet as pq

    spans = []
    for d in index_dirs:
        lo, hi = None, None
        for f in sorted(glob.glob(os.path.join(d, "docmeta", "*.parquet"))):
            md = pq.read_metadata(f)
            sch = md.schema.to_arrow_schema()
            ci = sch.get_field_index("docid")
            stats = [md.row_group(rg).column(ci).statistics
                     for rg in range(md.num_row_groups)]
            if any(st is None or not st.has_min_max for st in stats):
                # footer stats missing: ONE full-column read for the file
                import pyarrow.compute as pc

                mm = pc.min_max(pq.read_table(f, columns=["docid"])
                                .column("docid"))
                spans_f = [(mm["min"].as_py(), mm["max"].as_py())]
            else:
                spans_f = [(st.min, st.max) for st in stats]
            for lo_v, hi_v in spans_f:
                lo = lo_v if lo is None else min(lo, lo_v)
                hi = hi_v if hi is None else max(hi, hi_v)
        if lo is None:
            raise ValueError(f"{d}: docmeta/ holds no rows")
        spans.append((lo, hi, d))
    spans.sort()
    for (lo_a, hi_a, da), (lo_b, hi_b, db) in zip(spans, spans[1:]):
        if lo_b <= hi_a:
            raise ValueError(
                f"docid ranges overlap between {da} [{lo_a},{hi_a}] and "
                f"{db} [{lo_b},{hi_b}] — merge requires disjoint id spaces")
