"""Per-stage / per-partition build manifests: lineage + resume.

Analog of the reference's plan/metadata/provenance machinery
(``plan.json`` write/reload ``collection_indexer.py:80-112, 185-223``;
chunk-completeness check ``index_saver.py:30-50`` used for resume
``collection_indexer.py:360-363``; provenance ``colbert/infra/provenance.py``).

A phase is complete iff its manifest exists AND records the same
``semantic_hash`` (config) and ``inputs_hash`` (input fingerprint). Segment
writes are atomic (tmp + rename) so a crash never leaves a manifest without
its data.
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def phase_manifest_path(index_dir: str, phase: str) -> str:
    return os.path.join(index_dir, f"_manifest_{phase}.json")


def phase_complete(index_dir: str, phase: str, semantic_hash: str, inputs_hash: str) -> bool:
    p = phase_manifest_path(index_dir, phase)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return m.get("semantic_hash") == semantic_hash and m.get("inputs_hash") == inputs_hash


def mark_phase_complete(
    index_dir: str, phase: str, semantic_hash: str, inputs_hash: str, **metrics
) -> None:
    atomic_write_json(
        phase_manifest_path(index_dir, phase),
        {
            "phase": phase,
            "semantic_hash": semantic_hash,
            "inputs_hash": inputs_hash,
            "completed_at": time.time(),
            **metrics,
        },
    )


def segment_manifest_path(seg_dir: str, part: int) -> str:
    return os.path.join(seg_dir, f"_manifest_part_{part:05d}.json")


def _file_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def segment_complete(seg_dir: str, part: int, semantic_hash: str,
                     inputs_hash: str,
                     verify_content: bool | None = None) -> bool:
    """True iff the partition's manifest matches the wanted hashes and every
    recorded file exists with the recorded size. With
    ``verify_content`` (or ``COLBERT_RAY_VERIFY_CONTENT=1`` where unset;
    note Ray WORKER tasks don't inherit driver env changes made after
    ray.init — build_index resolves the env once and passes the flag
    explicitly) each file's sha256 is ALSO re-hashed against the manifest
    (one full read per segment — the post-incident deep-verify resume
    mode; size checks stay the cheap default because a deep verify of a
    100TB index is a full index scan)."""
    p = segment_manifest_path(seg_dir, part)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    if m.get("semantic_hash") != semantic_hash or m.get("inputs_hash") != inputs_hash:
        return False
    deep = (verify_content if verify_content is not None
            else os.environ.get("COLBERT_RAY_VERIFY_CONTENT") == "1")
    # chunked parts record a file list; single-file parts record "file"
    entries = m.get("files") or [{"name": m.get("file", ""), "bytes": m.get("bytes", -1)}]
    for ent in entries:
        data = os.path.join(seg_dir, ent.get("name", ""))
        if not (os.path.exists(data) and os.path.getsize(data) == ent.get("bytes", -1)):
            return False
        if deep:
            # a manifest written before sha recording has no sha256 entry —
            # deep mode must NOT silently downgrade to the size check: treat
            # the partition as unverified (it is rebuilt, which re-records
            # the sha) rather than pretend the content was verified
            if not ent.get("sha256"):
                import warnings

                warnings.warn(
                    f"deep-verify: partition {part} manifest predates sha256 "
                    f"recording ({ent.get('name')}); treating as unverified")
                return False
            if _file_sha256(data) != ent["sha256"]:
                return False
    return True


def mark_segment_complete(
    seg_dir: str, part: int, semantic_hash: str, inputs_hash: str,
    file: str | list[str], **metrics
) -> None:
    names = [file] if isinstance(file, str) else list(file)
    # content sha recorded at write time (the bytes are still in page
    # cache); verified on resume only in deep-verify mode
    entries = [{"name": n, "bytes": os.path.getsize(os.path.join(seg_dir, n)),
                "sha256": _file_sha256(os.path.join(seg_dir, n))}
               for n in names]
    atomic_write_json(
        segment_manifest_path(seg_dir, part),
        {
            "partition": part,
            "file": names[0],
            "bytes": entries[0]["bytes"],
            "files": entries,
            "semantic_hash": semantic_hash,
            "inputs_hash": inputs_hash,
            "completed_at": time.time(),
            **metrics,
        },
    )
