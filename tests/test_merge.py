"""Index-merge tests: merged sub-indexes must equal a single build over the
union corpus (rankings AND statistics), resume as a normal phased index,
and refuse incompatible inputs."""

import glob
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from colbert_ray.config import EngineConfig
from colbert_ray.fixtures import ensure_fixture
from colbert_ray.pipelines.build import build_index
from colbert_ray.pipelines.merge import merge_indexes
from colbert_ray.pipelines.search import search_table

CFG = EngineConfig(salt_max_run=40, num_term_partitions=8)
N_DOCS = 300


@pytest.fixture(scope="module")
def merged_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("merge_fix"))
    corpus_dir, queries_path = ensure_fixture(root, N_DOCS, 20)
    files = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    ha, hb = os.path.join(root, "ha"), os.path.join(root, "hb")
    os.makedirs(ha)
    os.makedirs(hb)
    cut = N_DOCS // 3
    pq.write_table(t.slice(0, cut), os.path.join(ha, "a.parquet"))
    pq.write_table(t.slice(cut), os.path.join(hb, "b.parquet"))
    ia = os.path.join(root, "idx_a")
    ib = os.path.join(root, "idx_b")
    build_index(ha, ia, CFG)
    build_index(hb, ib, CFG)
    single = os.path.join(root, "idx_single")
    build_index(corpus_dir, single, CFG)
    merged = os.path.join(root, "idx_merged")
    merge_indexes([ia, ib], merged, CFG)
    return root, ia, ib, single, merged, queries_path


def test_merged_equals_single_build(merged_setup):
    _, _, _, single, merged, queries_path = merged_setup
    q = pq.read_table(queries_path).slice(0, 12)
    r1 = (search_table(q, single, k=10).to_pandas()
          .sort_values(["qid", "rank"]).reset_index(drop=True))
    r2 = (search_table(q, merged, k=10).to_pandas()
          .sort_values(["qid", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(r1, r2)   # exact float64 scores + shas


def test_merged_statistics_refreshed_globally(merged_setup):
    _, _, _, single, merged, _ = merged_setup
    m1 = json.load(open(os.path.join(single, "metadata.json")))
    m2 = json.load(open(os.path.join(merged, "metadata.json")))
    for k in ("n_docs", "n_terms", "n_postings", "avgdl", "total_tokens",
              "num_term_partitions"):
        assert m1[k] == m2[k], (k, m1[k], m2[k])


def test_merge_resume_is_noop_and_dictionary_identical(merged_setup):
    _, ia, ib, single, merged, _ = merged_setup
    rep = merge_indexes([ia, ib], merged, CFG)
    assert not rep["phases"]
    d1 = pa.concat_tables(pq.read_table(f) for f in sorted(
        glob.glob(os.path.join(single, "dictionary", "*.parquet"))))
    d2 = pa.concat_tables(pq.read_table(f) for f in sorted(
        glob.glob(os.path.join(merged, "dictionary", "*.parquet"))))
    assert d1.sort_by("term_id").equals(d2.sort_by("term_id"))


def test_merge_rejects_tokenizer_mismatch(merged_setup, tmp_path):
    root, ia, ib, _, _, _ = merged_setup
    other = EngineConfig(salt_max_run=40, num_term_partitions=8,
                         split_camel_case=False)
    with pytest.raises(ValueError, match="tokenizer config mismatch"):
        merge_indexes([ia, ib], str(tmp_path / "m"), other)


def test_merge_rejects_single_input(merged_setup, tmp_path):
    _, ia, _, _, _, _ = merged_setup
    with pytest.raises(ValueError, match="at least two"):
        merge_indexes([ia], str(tmp_path / "m"))


def test_merge_rejects_overlapping_docid_ranges(tmp_path):
    docs_a = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["alpha beta", "gamma delta", "epsilon zeta"]),
    })
    docs_b = pa.table({
        "doc_id": pa.array([3, 4], type=pa.int64()),   # 3 overlaps
        "text": pa.array(["eta theta", "iota kappa"]),
    })
    pa_dir, pb_dir = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(docs_a, pa_dir)
    pq.write_table(docs_b, pb_dir)
    ia, ib = str(tmp_path / "ia"), str(tmp_path / "ib")
    cfg = EngineConfig(num_term_partitions=2)
    build_index(pa_dir, ia, cfg, content_col="text", key_cols=(),
                meta_cols=(), docid_col="doc_id")
    build_index(pb_dir, ib, cfg, content_col="text", key_cols=(),
                meta_cols=(), docid_col="doc_id")
    with pytest.raises(ValueError, match="docid ranges overlap"):
        merge_indexes([ia, ib], str(tmp_path / "m"), cfg)


def test_remerge_with_different_sublist_drops_stale_runs(tmp_path):
    """Re-merging a DIFFERENT sub-index list into the same out_dir must not
    adopt the previous merge's tokenized runs (review finding: stale
    sub-files would silently fuse corpora)."""
    import numpy as np

    cfg = EngineConfig(num_term_partitions=2)

    def mk(name, ids):
        t = pa.table({
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "text": pa.array([f"tok{i} filler words" for i in ids]),
        })
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(t, p)
        idx = str(tmp_path / f"idx_{name}")
        build_index(p, idx, cfg, content_col="text", key_cols=(),
                    meta_cols=(), docid_col="doc_id")
        return idx

    ia = mk("a", [1, 2, 3])
    ib = mk("b", [10, 11])
    ic = mk("c", [20, 21, 22, 23])
    out = str(tmp_path / "merged")
    r1 = merge_indexes([ia, ib], out, cfg)
    assert r1["metadata"]["n_docs"] == 5
    r2 = merge_indexes([ia, ic], out, cfg)
    assert r2["metadata"]["n_docs"] == 7          # 3 + 4, ib gone
    # reordering is also safe (no doubled docs)
    r3 = merge_indexes([ic, ia], out, cfg)
    assert r3["metadata"]["n_docs"] == 7


def test_merge_interrupted_segment_resumes_partition_only(merged_setup):
    """north_rule resumability through merge: killing one posting segment
    (+ the phase manifests that gate it) must rebuild ONLY that partition
    on re-merge, and the merged rankings stay byte-identical."""
    _, ia, ib, _, merged, queries_path = merged_setup
    q = pq.read_table(queries_path).slice(0, 8)
    before = (search_table(q, merged, k=10).to_pandas()
              .sort_values(["qid", "rank"]).reset_index(drop=True))

    seg_dir = os.path.join(merged, "segments")
    victims = sorted(glob.glob(os.path.join(seg_dir, "part_*.parquet")))
    victim = victims[1]
    os.remove(victim)
    os.remove(os.path.join(
        seg_dir, f"_manifest_{os.path.basename(victim).split('.')[0]}.json"))
    for m in ("_manifest_segments.json", "_manifest_finalize.json",
              "_manifest_serve.json"):
        os.remove(os.path.join(merged, m))
    survivor_mtimes = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(seg_dir, "part_*.parquet"))}

    rep = merge_indexes([ia, ib], merged, CFG)
    assert "segments" in rep["phases"]           # the phase re-ran
    assert "tokenize" not in rep["phases"]       # adoption untouched
    assert "dictionary" not in rep["phases"]
    # untouched partitions were NOT rewritten
    for f, mt in survivor_mtimes.items():
        assert os.path.getmtime(f) == mt, f
    assert os.path.exists(victim)                # the victim came back
    os.utime(os.path.join(merged, "metadata.json"))
    after = (search_table(q, merged, k=10).to_pandas()
             .sort_values(["qid", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(before, after)
