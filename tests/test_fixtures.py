"""Fixture generator invariants — chunked large-scale generation must keep
the documented guarantees (FIXTURES.md §5) and stay byte-identical to the
historical one-shot path below the chunk threshold."""

import glob

import pyarrow.parquet as pq

from colbert_ray import fixtures
from colbert_ray.fixtures import generate_corpus, write_corpus


def test_small_write_is_one_shot_identical(tmp_path):
    """n <= chunk threshold: written parts concatenate to exactly the
    one-shot generate_corpus table (existing corpora / bench sha unchanged)."""
    out = str(tmp_path / "c")
    write_corpus(out, 120, files_per_part=50)
    parts = sorted(glob.glob(out + "/part-*.parquet"))
    got = pq.read_table(parts[0]).schema.empty_table()
    got = pq.ParquetDataset(parts).read()
    want = generate_corpus(120)
    assert got.equals(want)


import pytest


@pytest.mark.parametrize("files_per_part", [40, 50])
def test_chunked_write_preserves_invariants(tmp_path, monkeypatch,
                                            files_per_part):
    """Above the threshold, chunks are generated independently (serial when
    part numbering can't align across chunks at fpp=40; parallel worker
    processes at fpp=50): rows must still be globally (repo, path)-unique
    with the full schema, and each chunk carries its own near-empty +
    duplicate-pair markers."""
    monkeypatch.setattr(fixtures, "_GEN_CHUNK_FILES", 100)
    out = str(tmp_path / "c")
    write_corpus(out, 250, files_per_part=files_per_part)
    t = pq.ParquetDataset(sorted(glob.glob(out + "/part-*.parquet"))).read()
    assert t.num_rows == 250
    assert t.column_names == ["repo", "path", "commit", "lang", "content"]
    keys = set(zip(t.column("repo").to_pylist(), t.column("path").to_pylist()))
    assert len(keys) == 250
    content = t.column("content").to_pylist()
    assert content.count("x") == 3  # one near-empty doc per chunk
    # chunk seeds differ => chunk bodies differ (not 3 copies of one chunk)
    assert content[0] != content[100]


def test_chunked_parallel_serial_identical(tmp_path, monkeypatch):
    """The parallel worker-process path must write byte-wise the same parts
    as the serial path."""
    monkeypatch.setattr(fixtures, "_GEN_CHUNK_FILES", 100)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_corpus(a, 250, files_per_part=50)           # parallel (aligned)
    # serial reference: call _write_chunk directly with the same layout
    import os
    os.makedirs(b, exist_ok=True)
    for k, lo in enumerate(range(0, 250, 100)):
        n = min(100, 250 - lo)
        fixtures._write_chunk(b, k, lo, n, 42, 50, 1, k * 2)
    fa = sorted(glob.glob(a + "/part-*.parquet"))
    fb = sorted(glob.glob(b + "/part-*.parquet"))
    assert [os.path.basename(f) for f in fa] == [os.path.basename(f) for f in fb]
    for x, y in zip(fa, fb):
        assert pq.read_table(x).equals(pq.read_table(y))
