"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are NOT available in this environment, so
the decode kernel is a clearly-marked stub (deterministic fake) — but the
Ray-side plumbing is real and tested: binary columns flow zero-copy through
Arrow batches, the feature extractor is a stateful ACTOR POOL (model load
once per actor in ``__init__``), batch sizes are small because payload rows
are wide (ray_guide.md memory note).

Swap ``FakeImageDecoder`` for a real decoder (PIL/ffmpeg) on a cluster with
the libs installed; the schema and actor signature stay identical.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

PAYLOAD_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("media_type", pa.string()),        # "image" | "audio" | "video"
        ("payload", pa.binary()),           # opaque encoded bytes
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
    ]
)


def make_payload_table(ids: np.ndarray, blobs: list[bytes],
                       media_type: str = "image") -> pa.Table:
    """Helper used by tests/fixtures to synthesize a payload table."""
    w = np.array([max(1, len(b) % 640) for b in blobs], dtype=np.int32)
    h = np.array([max(1, len(b) % 480) for b in blobs], dtype=np.int32)
    return pa.table(
        {
            "item_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "media_type": pa.array([media_type] * len(blobs), type=pa.string()),
            "payload": pa.array(blobs, type=pa.binary()),
            "meta_width": pa.array(w),
            "meta_height": pa.array(h),
        }
    )


class FakeImageDecoder:
    """STUB decode kernel. Deterministic: 'decodes' a payload to a tiny
    pseudo-pixel array seeded by the payload's blake2b digest.

    Real implementation would do ``PIL.Image.open(io.BytesIO(payload))``;
    raise NotImplementedError for media types a deployment doesn't support.
    """

    SUPPORTED = {"image"}

    def decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if media_type not in self.SUPPORTED:
            raise NotImplementedError(
                f"decode for media_type={media_type!r} requires codec libs "
                "not present in this environment"
            )
        seed = int.from_bytes(
            hashlib.blake2b(payload, digest_size=8).digest(), "little"
        )
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


class MediaFeatureExtractor:
    """Actor-pool stage: decode payloads + emit fixed-size feature rows.

    ``__init__`` loads the (stub) decoder once per actor — the T1 'model
    load' pattern. ``__call__`` handles one Arrow batch of payload rows.
    """

    def __init__(self, resize: tuple[int, int] = (4, 4)):
        self.decoder = FakeImageDecoder()
        self.resize = resize

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_numpy(zero_copy_only=False)
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n_bytes, means, feats, ok = [], [], [], []
        for t, p in zip(types, payloads):
            n_bytes.append(len(p))
            try:
                px = self.decoder.decode(p, t)
                # "resize": mean-pool to a fixed grid (deterministic)
                h, w, _ = px.shape
                rh, rw = self.resize
                pooled = px[: h - h % rh or h, : w - w % rw or w].reshape(
                    rh, h // rh, rw, w // rw, 3
                ).mean(axis=(1, 3))
                means.append(float(px.mean()))
                feats.append(pooled.reshape(-1).astype(np.float32).tolist())
                ok.append(True)
            except NotImplementedError:
                means.append(0.0)
                feats.append([])
                ok.append(False)
        return pa.table(
            {
                "item_id": pa.array(ids.astype(np.int64)),
                "n_bytes": pa.array(np.array(n_bytes, dtype=np.int64)),
                "pixel_mean": pa.array(np.array(means, dtype=np.float64)),
                "features": pa.array(feats, type=pa.list_(pa.float32())),
                "decoded": pa.array(ok, type=pa.bool_()),
            }
        )


def extract_media_features(
    ds: "ray.data.Dataset", concurrency: int = 2, batch_size: int = 64
) -> "ray.data.Dataset":
    """Payload table -> feature table via the actor pool. Small batch size
    on purpose: payload rows are wide (binary), batch x concurrency must fit
    worker heaps."""
    return ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
