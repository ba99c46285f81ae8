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


import numpy as np
import pyarrow as pa
import ray.data

from colbert_ray.functions.hashing import popcount64 as _popcount64

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
    """STUB decode kernel. Deterministic and purely arithmetic: 'decodes' a
    payload to an 8x8x3 pixel array by tiling the raw payload bytes — so
    derived statistics (pixel mean) are SQL-expressible and oracle-checked.

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
        b = np.frombuffer(payload, dtype=np.uint8)
        if len(b) == 0:
            return np.zeros((8, 8, 3), dtype=np.uint8)
        return np.resize(b, 8 * 8 * 3).reshape(8, 8, 3)   # cyclic tiling


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


class FakeVideoDecoder:
    """STUB video decode, purely arithmetic (SQL-oracle-checkable like the
    image stub): frame i of a payload is the 8x8x3 grid of payload bytes
    read cyclically from offset i*37. Real impl: ffmpeg/pyav seek+decode."""

    FRAME_STEP = 37      # byte offset per frame index (coprime-ish stride)

    def n_frames(self, payload: bytes) -> int:
        return 4 + len(payload) % 28          # 4..31 fake frames

    def decode_frame(self, payload: bytes, i: int) -> np.ndarray:
        b = np.frombuffer(payload, dtype=np.uint8)
        if len(b) == 0:
            return np.zeros((8, 8, 3), dtype=np.uint8)
        start = (i * self.FRAME_STEP) % len(b)
        idx = (start + np.arange(8 * 8 * 3)) % len(b)
        return b[idx].reshape(8, 8, 3)


class FrameSampler:
    """Actor-pool stage: sample every ``stride``-th frame of each video
    payload and emit one ROW PER SAMPLED FRAME (flat_map-shaped output —
    downstream stages treat frames as independent items). Decoder loads
    once per actor; only sampled frames are decoded (the real-decoder
    contract: seek, don't scan)."""

    def __init__(self, stride: int = 4, max_frames: int = 8):
        self.decoder = FakeVideoDecoder()
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        out_id, out_fi, out_mean = [], [], []
        for item, p in zip(ids, payloads):
            total = self.decoder.n_frames(p)
            picks = list(range(0, total, self.stride))[: self.max_frames]
            for fi in picks:
                px = self.decoder.decode_frame(p, fi)
                out_id.append(int(item))
                out_fi.append(fi)
                out_mean.append(float(px.mean()))
        return pa.table({
            "item_id": pa.array(out_id, type=pa.int64()),
            "frame_idx": pa.array(out_fi, type=pa.int32()),
            "frame_mean": pa.array(out_mean, type=pa.float64()),
        })


def sample_video_frames(
    ds: "ray.data.Dataset", stride: int = 4, max_frames: int = 8,
    concurrency: int = 2, batch_size: int = 16,
) -> "ray.data.Dataset":
    """Video payload table -> sampled-frame rows (1 row per frame)."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"stride": stride, "max_frames": max_frames},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, zero_copy_batch=True,
    )


class AudioFeatureExtractor:
    """Actor-pool stage: fixed-size 'audio' features. The stub treats the
    payload bytes as int16-ish samples and computes real DSP-lite features
    (RMS energy per of 8 equal windows + zero-crossing rate) — these are
    genuine vectorized computations over the payload; only the CODEC
    (compressed-audio decode) is stubbed as identity."""

    N_WINDOWS = 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        feats, zcrs, n_samples = [], [], []
        for p in payloads:
            buf = p[: len(p) - len(p) % 2]
            x = (np.frombuffer(buf, dtype=np.int16).astype(np.float64)
                 if buf else np.zeros(2))
            n = len(x)
            n_samples.append(n)
            pad = (-n) % self.N_WINDOWS
            xw = np.pad(x, (0, pad)).reshape(self.N_WINDOWS, -1)
            feats.append(np.sqrt((xw ** 2).mean(axis=1)).astype(np.float32).tolist())
            zcrs.append(float((np.diff(np.signbit(x)) != 0).mean()) if n > 1 else 0.0)
        return pa.table({
            "item_id": pa.array(ids.astype(np.int64)),
            "n_samples": pa.array(np.array(n_samples, dtype=np.int64)),
            "rms_windows": pa.array(feats, type=pa.list_(pa.float32())),
            "zero_crossing_rate": pa.array(np.array(zcrs, dtype=np.float64)),
        })


def extract_audio_features(
    ds: "ray.data.Dataset", concurrency: int = 2, batch_size: int = 64
) -> "ray.data.Dataset":
    return ds.map_batches(
        AudioFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency, zero_copy_batch=True,
    )


def dedup_payloads(payloads: "ray.data.Dataset",
                   payload_col: str = "payload",
                   id_col: str = "item_id") -> "pa.Table":
    """Exact dedup over OPAQUE binary payloads: one survivor (min id) per
    distinct byte string + its copy count. Per batch, each payload hashes
    to a 128-bit md5 digest (the per-row hash loop is the exact_dedup
    precedent — hashing is inherently per-payload); only (digest, id)
    rows ride the shuffle, the payload bytes never do. Output sorted by
    survivor id."""
    import hashlib

    from ray.data.aggregate import Count, Min

    def digests(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        col = b.column(payload_col)
        dg = [hashlib.md5(col[i].as_py()).hexdigest()
              for i in range(b.num_rows)]
        return pa.table({"digest": pa.array(dg, type=pa.string()),
                         id_col: pa.array(ids, type=pa.int64())})

    out = (payloads.select_columns([id_col, payload_col])
           .map_batches(digests, batch_format="pyarrow")
           .groupby("digest")
           .aggregate(Min(id_col, alias_name="survivor"),
                      Count(alias_name="n_copies"))
           .to_pandas()
           .sort_values("survivor").reset_index(drop=True))
    return pa.table({
        "item_id": pa.array(out["survivor"].astype(np.int64)),
        "n_copies": pa.array(out["n_copies"].astype(np.int64)),
    })


_POW64 = np.uint64(1) << np.arange(64, dtype=np.uint64)


def ahash64(pixels: np.ndarray) -> np.int64:
    """THE 64-bit average-hash bit rule, shared by AHashExtractor (images)
    and FrameHashSampler (video frames) and pinned bit-for-bit by their
    SQL twins: channel-sum the 64 pixels, set bit j iff
    ``64 * pixel_sum[j] >= total_sum`` (all-integer, so the stub decode
    stays oracle-checkable), fold to the signed-wrapped int64 of the
    uint64 bit pattern (bit j = pixel j, row-major)."""
    ps = pixels.reshape(64, 3).astype(np.int64).sum(axis=1)
    bits = 64 * ps >= ps.sum()
    return np.int64(_POW64[bits].sum(dtype=np.uint64).astype(np.int64))


def pin_schema(schema: pa.Schema):
    """Empty map_groups partitions emit zero-column blocks that break a
    downstream groupby's key resolution — pin every block to ``schema``."""
    def fix(t: pa.Table) -> pa.Table:
        return schema.empty_table() if t.num_rows == 0 else t.cast(schema)
    return fix


class AHashExtractor:
    """Actor-pool stage: decode + 64-bit AVERAGE HASH (aHash) per payload —
    the classic perceptual image fingerprint (8x8 grayscale, bit = pixel
    >= image mean); the bit rule lives in ``ahash64``."""

    def __init__(self):
        self.decoder = FakeImageDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_numpy(zero_copy_only=False)
        mts = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_h = [], []
        for i, (mt, p) in enumerate(zip(mts, payloads)):
            try:
                dec = self.decoder.decode(p, mt)
            except NotImplementedError:
                continue
            out_id.append(int(ids[i]))
            out_h.append(ahash64(dec))
        return pa.table({
            "item_id": pa.array(out_id, type=pa.int64()),
            "ahash": pa.array(np.asarray(out_h, dtype=np.int64)
                              if out_h else
                              np.empty(0, dtype=np.int64)),
        })


def image_ahash(payloads: "ray.data.Dataset",
                concurrency: int = 2) -> "ray.data.Dataset":
    """(item_id, ahash) via the actor-pool AHashExtractor."""
    return payloads.map_batches(AHashExtractor, batch_format="pyarrow",
                                concurrency=concurrency)




def ahash_dup_pairs(payloads: "ray.data.Dataset",
                    max_hamming: int = 8) -> pa.Table:
    """Perceptual near-duplicate pairs: Hamming(aHash_a, aHash_b) <=
    ``max_hamming`` (id_a < id_b) — the multimodal analog of simhash
    near-dup. Integer-exact. Bounded all-pairs verify tier (hashes are 8
    bytes/item, collected once); at corpus scale use
    ``banded_ahash_dup_pairs`` (below) — the SAME exact pair set via
    disjoint-bit-band blocking + in-bucket verify."""
    hs = image_ahash(payloads).to_pandas().sort_values("item_id")
    ids = hs["item_id"].to_numpy(dtype=np.int64)
    h = hs["ahash"].to_numpy(dtype=np.int64).astype(np.uint64)
    out_a, out_b, out_d = [], [], []
    for i in range(len(ids) - 1):
        d = _popcount64(h[i] ^ h[i + 1:])
        sel = np.flatnonzero(d <= max_hamming)
        out_a.extend([int(ids[i])] * len(sel))
        out_b.extend(ids[i + 1 + sel].tolist())
        out_d.extend(d[sel].tolist())
    return pa.table({
        "id_a": pa.array(out_a, type=pa.int64()),
        "id_b": pa.array(out_b, type=pa.int64()),
        "hamming": pa.array(out_d, type=pa.int64()),
    })


def banded_ahash_dup_pairs(payloads: "ray.data.Dataset",
                           max_hamming: int = 8) -> pa.Table:
    """The scale path ``ahash_dup_pairs`` documents: the SAME exact pair set
    (Hamming <= max_hamming, id_a < id_b) via Hamming-LSH banding instead of
    a driver-side all-pairs sweep. Thin wrapper over the generic
    ``extras.dedup.banded_hamming_pairs`` (shared with ``simhash_dup_pairs``
    — one banding/verify implementation for every 64-bit fingerprint)."""
    from colbert_ray.extras.dedup import banded_hamming_pairs

    return banded_hamming_pairs(image_ahash(payloads), "ahash", "item_id",
                                max_hamming=max_hamming)


class FrameHashSampler(FrameSampler):
    """Sampled frames -> 64-bit per-frame aHash rows (one row per DISTINCT
    (item, frame hash) — a video repeating a frame contributes it once).
    Same all-integer bit rule as AHashExtractor, so the stub decode keeps
    the fingerprints oracle-checkable."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        ids = batch.column("item_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        out_id, out_h = [], []
        for item, p in zip(ids, payloads):
            total = self.decoder.n_frames(p)
            picks = list(range(0, total, self.stride))[: self.max_frames]
            seen = set()
            for fi in picks:
                h = ahash64(self.decoder.decode_frame(p, fi))
                if h not in seen:
                    seen.add(h)
                    out_id.append(int(item))
                    out_h.append(h)
        return pa.table({
            "item_id": pa.array(out_id, type=pa.int64()),
            "fhash": pa.array(np.asarray(out_h, dtype=np.int64)
                              if out_h else np.empty(0, dtype=np.int64)),
        })


def video_dup_pairs(
    ds: "ray.data.Dataset", min_shared: int = 4,
    stride: int = 4, max_frames: int = 8,
    concurrency: int = 2,
) -> "ray.data.Dataset":
    """Frame-fingerprint video dedup: pairs of videos sharing >=
    ``min_shared`` distinct sampled-frame aHashes — the standard
    near-dup-video signal (per-frame perceptual hash + hash-join), with
    NO all-pairs stage: fingerprint rows groupby(fhash), in-group pair
    expansion (bounded by the hash's duplication count), then ONE
    (id_a, id_b) count groupby. Videos never re-decode and payloads never
    shuffle — only 8-byte fingerprints move."""
    from colbert_ray.extras.dedup import shared_key_pairs

    fh = ds.map_batches(
        FrameHashSampler,
        fn_constructor_kwargs={"stride": stride, "max_frames": max_frames},
        batch_format="pyarrow", concurrency=concurrency,
        zero_copy_batch=True)
    # FrameHashSampler already emits DISTINCT (item, fhash) rows, the
    # helper's input contract
    return shared_key_pairs(fh, "fhash", "item_id", min_shared=min_shared)


AUDIO_FP_WINDOWS = 32


class AudioFingerprinter:
    """Actor-pool stage: 31-bit audio fingerprint — the energy-TREND
    descriptor (bit w = window w+1 louder than window w over
    ``AUDIO_FP_WINDOWS`` equal windows; the echoprint/chromaprint family's
    sign-of-difference rule). The comparison is on window SUM OF SQUARES
    (equal window lengths after zero-pad), so it is ALL-integer and the
    stub codec keeps it oracle-checkable."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        W = AUDIO_FP_WINDOWS
        ids = batch.column("item_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        out = np.empty(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            buf = p[: len(p) - len(p) % 2]
            x = (np.frombuffer(buf, dtype="<i2").astype(np.int64)
                 if buf else np.zeros(1, dtype=np.int64))
            pad = (-len(x)) % W
            ss = (np.pad(x, (0, pad)) ** 2).reshape(W, -1).sum(axis=1)
            bits = ss[1:] > ss[:-1]
            out[i] = int((bits.astype(np.int64)
                          << np.arange(W - 1, dtype=np.int64)).sum())
        return pa.table({
            "item_id": pa.array(ids.astype(np.int64)),
            "afp": pa.array(out),
        })


def audio_fingerprints(ds: "ray.data.Dataset",
                       concurrency: int = 2) -> "ray.data.Dataset":
    """(item_id, afp) 31-bit energy-trend fingerprints."""
    return ds.map_batches(AudioFingerprinter, batch_format="pyarrow",
                          concurrency=concurrency, zero_copy_batch=True)


def audio_dup_groups(ds: "ray.data.Dataset",
                     concurrency: int = 2) -> "ray.data.Dataset":
    """Exact-fingerprint audio dedup: (afp, n_items, rep_id = min item) for
    fingerprints shared by >= 2 items — ONE groupby over 8-byte rows (the
    exact-dedup shape; payloads never shuffle)."""
    import pandas as pd

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"afp": pd.Series(dtype=np.int64),
                                 "n_items": pd.Series(dtype=np.int64),
                                 "rep_id": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"afp": [int(g["afp"].iloc[0])],
                             "n_items": [len(g)],
                             "rep_id": [int(g["item_id"].min())]})

    schema = pa.schema([("afp", pa.int64()), ("n_items", pa.int64()),
                        ("rep_id", pa.int64())])

    return (audio_fingerprints(ds, concurrency=concurrency)
            .groupby("afp").map_groups(fold, batch_format="pandas")
            .map_batches(pin_schema(schema), batch_format="pyarrow"))
