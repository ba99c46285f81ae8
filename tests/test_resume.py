"""Resume semantics (north_rule): an interrupted build restarted must skip
finished work and produce an identical final index (reference pattern:
``check_chunk_exists`` / resume flag, ``index_saver.py:30-50``,
``collection_indexer.py:360-363``; incremental test pattern
``colbert/tests/index_updater_test.py``)."""

import glob
import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines.build import build_index
from colbert_ray.stages import manifests

CFG = EngineConfig(salt_max_run=20, num_term_partitions=8)


def _segments(d):
    return (
        pa.concat_tables(
            pq.read_table(f)
            for f in sorted(glob.glob(os.path.join(d, "segments", "*.parquet")))
        )
        .to_pandas()
        .sort_values(["term_id", "salt"])
        .reset_index(drop=True)
    )


def test_resume_skips_finished_phases(small_fixture, tmp_path_factory):
    corpus_dir, _ = small_fixture
    d = str(tmp_path_factory.mktemp("idx_resume"))
    r1 = build_index(corpus_dir, d, CFG)
    assert set(r1["phases"]) >= {"tokenize", "docids", "stats", "dictionary", "segments"}
    # re-run: everything already complete -> no phase re-executed
    r2 = build_index(corpus_dir, d, CFG)
    assert not any(
        k in r2["phases"] for k in ("tokenize", "docids", "stats", "dictionary", "segments")
    )


def test_interrupted_segments_phase_resumes_partition_level(
    small_fixture, tmp_path_factory
):
    """Simulate a crash mid-phase-E: some segments written, manifest for the
    phase absent. Restart must rebuild ONLY the missing partitions and the
    final index must equal a clean build."""
    corpus_dir, _ = small_fixture
    clean = str(tmp_path_factory.mktemp("idx_clean"))
    crash = str(tmp_path_factory.mktemp("idx_crash"))
    build_index(corpus_dir, clean, CFG)
    build_index(corpus_dir, crash, CFG)

    # "crash": drop the segments phase manifest + delete half the segments
    os.remove(manifests.phase_manifest_path(crash, "segments"))
    os.remove(manifests.phase_manifest_path(crash, "finalize"))
    seg_dir = os.path.join(crash, "segments")
    victims = sorted(glob.glob(os.path.join(seg_dir, "part_*.parquet")))[::2]
    for f in victims:
        part = int(os.path.basename(f)[5:10])
        os.remove(f)
        os.remove(manifests.segment_manifest_path(seg_dir, part))

    r = build_index(corpus_dir, crash, CFG)
    detail = r["phases"].get("segments_detail", [])
    rebuilt = {row["part"] for row in detail if not row.get("skipped")}
    surviving = {
        int(os.path.basename(f)[5:10])
        for f in glob.glob(os.path.join(seg_dir, "part_*.parquet"))
    } - rebuilt
    # every surviving partition was skipped, every victim rebuilt
    assert all(int(os.path.basename(f)[5:10]) in rebuilt for f in victims)
    assert surviving  # some partitions really were preserved
    pd.testing.assert_frame_equal(_segments(clean), _segments(crash))


def test_deep_verify_detects_same_size_corruption(
    small_fixture, tmp_path_factory, monkeypatch
):
    """Manifests record per-file sha256. A same-size bit-flip passes the
    cheap default resume check (documented), but
    COLBERT_RAY_VERIFY_CONTENT=1 re-hashes each file and rebuilds the
    corrupted partition."""
    corpus_dir, _ = small_fixture
    d = str(tmp_path_factory.mktemp("idx_flip"))
    build_index(corpus_dir, d, CFG)
    seg_dir = os.path.join(d, "segments")
    victim = sorted(glob.glob(os.path.join(seg_dir, "part_*.parquet")))[0]
    part = int(os.path.basename(victim)[5:10])
    with open(victim, "r+b") as f:
        f.seek(100)
        b = f.read(1)
        f.seek(100)
        f.write(bytes([b[0] ^ 0xFF]))

    sem = CFG.semantic_hash()
    with open(os.path.join(d, "plan.json")) as f:
        import json

        inputs_hash = json.load(f)["inputs_hash"]
    # cheap default check: size unchanged -> still "complete"
    assert manifests.segment_complete(seg_dir, part, sem, inputs_hash)
    # deep-verify mode detects the flip
    monkeypatch.setenv("COLBERT_RAY_VERIFY_CONTENT", "1")
    assert not manifests.segment_complete(seg_dir, part, sem, inputs_hash)
    # a resume under deep-verify rebuilds the flipped partition and the
    # index again equals a clean build
    os.remove(manifests.phase_manifest_path(d, "segments"))
    os.remove(manifests.phase_manifest_path(d, "finalize"))
    r = build_index(corpus_dir, d, CFG)
    detail = r["phases"].get("segments_detail", [])
    rebuilt = {row["part"] for row in detail if not row.get("skipped")}
    assert part in rebuilt
    clean = str(tmp_path_factory.mktemp("idx_clean2"))
    monkeypatch.delenv("COLBERT_RAY_VERIFY_CONTENT")
    build_index(corpus_dir, clean, CFG)
    pd.testing.assert_frame_equal(_segments(clean), _segments(d))


def test_config_change_invalidates_resume(small_fixture, tmp_path_factory):
    corpus_dir, _ = small_fixture
    d = str(tmp_path_factory.mktemp("idx_cfg"))
    build_index(corpus_dir, d, CFG)
    cfg2 = EngineConfig(salt_max_run=20, num_term_partitions=8, k1=2.0)
    r = build_index(corpus_dir, d, cfg2)
    assert "segments" in r["phases"]       # semantic change -> rebuilt
    with open(os.path.join(d, "metadata.json")) as f:
        assert f and json.load(f)["config"]["k1"] == 2.0


def test_serve_phase_rebuilds_after_crash(small_fixture, tmp_path_factory):
    """A crash during the serve-artifact write leaves no valid manifest;
    re-running the build rebuilds ONLY the serve phase and serving works."""
    import pyarrow.parquet as pq

    from colbert_ray.pipelines.build import build_index
    from colbert_ray.pipelines.search import search_table
    from colbert_ray.state.serve import serve_valid

    corpus_dir, queries_path = small_fixture
    d = str(tmp_path_factory.mktemp("idx_serve_resume"))
    cfg = EngineConfig(salt_max_run=20, num_term_partitions=8)
    build_index(corpus_dir, d, cfg)
    before = search_table(pq.read_table(queries_path).slice(0, 5), d, k=5).to_pandas()

    # simulate mid-write crash: manifest gone, one array torn
    os.remove(os.path.join(d, "serve", "manifest.json"))
    with open(os.path.join(d, "serve", "posting_docids.npy"), "r+b") as f:
        f.truncate(128)
    assert not serve_valid(d)

    report = build_index(corpus_dir, d, cfg)   # resume
    assert list(report["phases"].keys()) == ["serve"]   # only serve reran
    assert serve_valid(d)
    import os as _os
    _os.utime(os.path.join(d, "metadata.json"))  # drop the load cache
    after = search_table(pq.read_table(queries_path).slice(0, 5), d, k=5).to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(before, after)


def test_deep_verify_rejects_pre_sha_manifest(
    small_fixture, tmp_path_factory
):
    """A manifest written before sha256 recording must NOT pass deep-verify
    on the size check alone (ADVICE r3): deep mode warns and treats the
    partition as unverified, so it is rebuilt (and the sha re-recorded)
    instead of the content guarantee silently degrading."""
    import pytest

    corpus_dir, _ = small_fixture
    d = str(tmp_path_factory.mktemp("idx_presha"))
    build_index(corpus_dir, d, CFG)
    seg_dir = os.path.join(d, "segments")
    victim = sorted(glob.glob(os.path.join(seg_dir, "part_*.parquet")))[0]
    part = int(os.path.basename(victim)[5:10])
    mpath = manifests.segment_manifest_path(seg_dir, part)
    with open(mpath) as f:
        m = json.load(f)
    for ent in m.get("files", []):
        ent.pop("sha256", None)
    manifests.atomic_write_json(mpath, m)
    sem = CFG.semantic_hash()
    with open(os.path.join(d, "plan.json")) as f:
        inputs_hash = json.load(f)["inputs_hash"]
    # cheap default mode still accepts it (sizes match)
    assert manifests.segment_complete(seg_dir, part, sem, inputs_hash)
    # deep mode refuses to call it verified
    with pytest.warns(UserWarning, match="predates sha256"):
        assert not manifests.segment_complete(
            seg_dir, part, sem, inputs_hash, verify_content=True)
