"""Index snapshot / restore — the operational backup lifecycle
(Elasticsearch snapshot API analog; the reference's nearest capability is
its saved-checkpoint reuse, ``colbert/infra/config/settings.py:141-156``).

A snapshot is an immutable, content-addressed copy of a quiesced index
directory: every regular file is HARDLINKED when the snapshot lives on
the same filesystem (O(1) per file — index segments are never rewritten
in place, append/merge/compaction always write NEW files, so links are
safe), copied otherwise, and recorded in ``snapshot.json`` with its size
and sha256. Restore replays the manifest into a fresh directory and
(by default) re-hashes every file — a corrupted or tampered snapshot
fails loudly instead of serving wrong results.

Crash-safety mirrors the build's manifest discipline: the snapshot is
assembled under ``<snap_dir>.tmp-*`` and atomically renamed, so a torn
snapshot is never mistaken for a complete one (the manifest is written
last, inside the tmp tree).

Quiesce contract: snapshot AFTER build/update/merge phases complete —
the phase manifests included in the snapshot are exactly what makes the
restored index resume-consistent.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from colbert_ray.stages.manifests import _file_sha256

SNAPSHOT_MANIFEST = "snapshot.json"


def _walk_files(root: str) -> list[str]:
    out = []
    for base, _, names in os.walk(root):
        for n in names:
            out.append(os.path.relpath(os.path.join(base, n), root))
    return sorted(out)


def _safe_rel(rel: str) -> str:
    """Reject manifest paths that would escape the target tree — a
    tampered snapshot.json must not be able to write outside dest_dir
    (checked even with verify=False)."""
    if os.path.isabs(rel) or ".." in rel.split(os.sep) \
            or rel.startswith("~"):
        raise ValueError(f"unsafe path in snapshot manifest: {rel!r}")
    return rel


def _link_or_copy(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
    except OSError:            # cross-device or FS without hardlinks
        shutil.copy2(src, dst)


def snapshot_index(index_dir: str, snap_dir: str) -> dict:
    """Snapshot ``index_dir`` into ``snap_dir`` (must not exist).
    Returns the manifest dict. O(index bytes) only for hashing; data
    movement is hardlinks on the common same-filesystem layout."""
    if os.path.exists(snap_dir):
        raise FileExistsError(f"snapshot target exists: {snap_dir}")
    if not os.path.isfile(os.path.join(index_dir, "metadata.json")):
        raise ValueError(f"{index_dir} is not a built index "
                         "(no metadata.json)")
    tmp = f"{snap_dir}.tmp-{uuid.uuid4().hex[:8]}"
    files = {}
    try:
        for rel in _walk_files(index_dir):
            src = os.path.join(index_dir, rel)
            _link_or_copy(src, os.path.join(tmp, rel))
            st = os.stat(src)
            files[rel] = {"bytes": int(st.st_size),
                          "sha256": _file_sha256(src)}
        manifest = {"source": os.path.abspath(index_dir),
                    "n_files": len(files), "files": files}
        with open(os.path.join(tmp, SNAPSHOT_MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.makedirs(os.path.dirname(os.path.abspath(snap_dir)),
                    exist_ok=True)
        os.rename(tmp, snap_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return manifest


def verify_snapshot(snap_dir: str) -> dict:
    """Re-hash every snapshot file against its manifest entry; raises
    ValueError on any missing/extra/corrupt file. Returns the manifest."""
    mpath = os.path.join(snap_dir, SNAPSHOT_MANIFEST)
    if not os.path.isfile(mpath):
        raise ValueError(f"no {SNAPSHOT_MANIFEST} in {snap_dir}")
    with open(mpath) as f:
        manifest = json.load(f)
    on_disk = set(_walk_files(snap_dir)) - {SNAPSHOT_MANIFEST}
    want = set(manifest["files"])
    if on_disk != want:
        raise ValueError(
            f"snapshot file set mismatch: missing={sorted(want - on_disk)} "
            f"extra={sorted(on_disk - want)}")
    for rel, ent in manifest["files"].items():
        p = os.path.join(snap_dir, rel)
        if os.path.getsize(p) != ent["bytes"] \
                or _file_sha256(p) != ent["sha256"]:
            raise ValueError(f"snapshot file corrupt: {rel}")
    return manifest


def restore_index(snap_dir: str, dest_dir: str, verify: bool = True) -> dict:
    """Materialize a snapshot into ``dest_dir`` (must not exist). With
    ``verify`` (default) every restored file is re-hashed against the
    snapshot manifest. Returns the manifest."""
    if os.path.exists(dest_dir):
        raise FileExistsError(f"restore target exists: {dest_dir}")
    manifest = verify_snapshot(snap_dir) if verify else None
    if manifest is None:
        with open(os.path.join(snap_dir, SNAPSHOT_MANIFEST)) as f:
            manifest = json.load(f)
    tmp = f"{dest_dir}.tmp-{uuid.uuid4().hex[:8]}"
    try:
        for rel in manifest["files"]:
            _safe_rel(rel)
            _link_or_copy(os.path.join(snap_dir, rel),
                          os.path.join(tmp, rel))
        os.makedirs(os.path.dirname(os.path.abspath(dest_dir)),
                    exist_ok=True)
        os.rename(tmp, dest_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return manifest
