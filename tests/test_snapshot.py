"""Snapshot/restore lifecycle: restored index serves identical rankings,
verification catches corruption, guards on targets and non-indexes."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines.build import build_index
from colbert_ray.pipelines.search import search_table
from colbert_ray.state.snapshot import (
    restore_index,
    snapshot_index,
    verify_snapshot,
)

CFG = EngineConfig(num_term_partitions=4)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("snap_fix")
    texts = [f"alpha beta doc{i} gamma common" for i in range(30)]
    t = pa.table({
        "doc_id": pa.array(list(range(1, 31)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    src = str(root / "docs.parquet")
    pq.write_table(t, src)
    idx = str(root / "idx")
    build_index(src, idx, CFG, content_col="text", key_cols=(),
                meta_cols=(), docid_col="doc_id")
    return str(root), idx


def _rank(idx):
    qt = pa.table({"qid": pa.array([0], type=pa.int64()),
                   "query": pa.array(["alpha gamma"])})
    return search_table(qt, idx, k=10, with_sha=False).to_pandas()


def test_snapshot_restore_roundtrip(ray_session, built, tmp_path):
    root, idx = built
    want = _rank(idx)
    snap = str(tmp_path / "snap")
    m = snapshot_index(idx, snap)
    assert m["n_files"] > 0 and verify_snapshot(snap)["n_files"] == m["n_files"]
    dest = str(tmp_path / "restored")
    restore_index(snap, dest)
    import pandas as pd
    pd.testing.assert_frame_equal(_rank(dest), want)


def test_snapshot_verify_catches_corruption(ray_session, built, tmp_path):
    _, idx = built
    snap = str(tmp_path / "snap_c")
    snapshot_index(idx, snap)
    # flip one byte in some data file (break the hardlink first so the
    # live index is untouched)
    victim = None
    for base, _, names in os.walk(snap):
        for n in names:
            if n != "snapshot.json" and os.path.getsize(
                    os.path.join(base, n)) > 8:
                victim = os.path.join(base, n)
                break
        if victim:
            break
    data = open(victim, "rb").read()
    os.unlink(victim)
    with open(victim, "wb") as f:
        f.write(data[:-1] + bytes([data[-1] ^ 0xFF]))
    with pytest.raises(ValueError, match="corrupt"):
        verify_snapshot(snap)
    with pytest.raises(ValueError, match="corrupt"):
        restore_index(snap, str(tmp_path / "nope"))
    assert not os.path.exists(str(tmp_path / "nope"))
    # a deleted file is caught as a set mismatch
    os.unlink(victim)
    with pytest.raises(ValueError, match="missing"):
        verify_snapshot(snap)


def test_snapshot_guards(ray_session, built, tmp_path):
    _, idx = built
    snap = str(tmp_path / "snap_g")
    snapshot_index(idx, snap)
    with pytest.raises(FileExistsError):
        snapshot_index(idx, snap)
    with pytest.raises(FileExistsError):
        restore_index(snap, idx)
    with pytest.raises(ValueError, match="not a built index"):
        snapshot_index(str(tmp_path), str(tmp_path / "x"))
    # no tmp turds left behind on failures
    parent = os.path.dirname(snap)
    assert not [n for n in os.listdir(parent) if ".tmp-" in n]


def test_snapshot_cli_subcommands(ray_session, built, tmp_path):
    import json
    import subprocess
    import sys

    _, idx = built
    snap = str(tmp_path / "cli_snap")
    dest = str(tmp_path / "cli_restored")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r1 = subprocess.run(
        [sys.executable, "-m", "colbert_ray.cli", "snapshot",
         "--index", idx, "--out", snap],
        capture_output=True, text=True, env=env, timeout=120)
    assert r1.returncode == 0, r1.stderr
    assert json.loads(r1.stdout.strip().splitlines()[-1])["n_files"] > 0
    r2 = subprocess.run(
        [sys.executable, "-m", "colbert_ray.cli", "restore",
         "--snapshot", snap, "--out", dest],
        capture_output=True, text=True, env=env, timeout=120)
    assert r2.returncode == 0, r2.stderr
    assert json.loads(r2.stdout.strip().splitlines()[-1])["verified"]
    assert os.path.isfile(os.path.join(dest, "metadata.json"))


def test_restore_rejects_traversal_paths(ray_session, built, tmp_path):
    """A tampered manifest with ../ entries must be rejected even with
    verify=False — restore may never write outside its target tree."""
    import json

    _, idx = built
    snap = str(tmp_path / "snap_t")
    snapshot_index(idx, snap)
    mpath = os.path.join(snap, "snapshot.json")
    with open(mpath) as f:
        m = json.load(f)
    m["files"]["../escape.txt"] = {"bytes": 1, "sha256": "0" * 64}
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="unsafe path|missing"):
        restore_index(snap, str(tmp_path / "d1"), verify=True)
    with pytest.raises(ValueError, match="unsafe path"):
        restore_index(snap, str(tmp_path / "d2"), verify=False)
    assert not os.path.exists(str(tmp_path / "escape.txt"))
    assert not os.path.exists(str(tmp_path / "d2"))


def test_aliases_atomic_cutover(ray_session, built, tmp_path):
    """Alias registry: set/resolve/swap/drop; resolve passes index paths
    through; swapping an alias re-points searches without touching the
    old index (the blue/green cutover primitive)."""
    from colbert_ray.state.aliases import (
        drop_alias,
        list_aliases,
        resolve,
        set_alias,
    )

    _, idx = built
    reg = str(tmp_path / "registry")
    set_alias(reg, "prod", idx)
    assert resolve(reg, "prod") == os.path.abspath(idx)
    assert resolve(reg, idx) == idx            # path passthrough
    # build a second (restored) index and swap
    snap = str(tmp_path / "alias_snap")
    snapshot_index(idx, snap)
    idx2 = str(tmp_path / "green")
    restore_index(snap, idx2)
    set_alias(reg, "prod", idx2)
    assert resolve(reg, "prod") == os.path.abspath(idx2)
    import pandas as pd
    pd.testing.assert_frame_equal(_rank(resolve(reg, "prod")), _rank(idx))
    # guards
    with pytest.raises(ValueError, match="not a built index"):
        set_alias(reg, "bad", str(tmp_path))
    with pytest.raises(ValueError, match="invalid alias"):
        set_alias(reg, "../x", idx)
    with pytest.raises(ValueError, match="neither"):
        resolve(reg, "nosuchalias")
    drop_alias(reg, "prod")
    assert "prod" not in list_aliases(reg)


def test_alias_cli(ray_session, built, tmp_path):
    import json
    import subprocess
    import sys

    _, idx = built
    reg = str(tmp_path / "cli_reg")
    env = dict(os.environ, PYTHONPATH="/root/repo")

    def run(*extra):
        r = subprocess.run(
            [sys.executable, "-m", "colbert_ray.cli", "alias",
             "--registry", reg, *extra],
            capture_output=True, text=True, env=env, timeout=60)
        assert r.returncode == 0, r.stderr
        return r.stdout.strip().splitlines()[-1]

    assert json.loads(run()) == {}
    out = json.loads(run("--set", f"prod={idx}"))
    assert out["prod"] == os.path.abspath(idx)
    assert run("--resolve", "prod") == os.path.abspath(idx)
    assert json.loads(run("--drop", "prod")) == {}
