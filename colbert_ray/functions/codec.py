"""Delta + varint posting-list codec — numpy-vectorized, no Python per-int loop.

Capability analog of the reference's residual compression
(``colbert/indexing/codecs/residual.py:186-202`` bit-packing via
``np.packbits`` and the decompress kernels ``residual.py:240-276``): the
lexical engine compresses posting lists instead of embedding residuals —
docids are sorted, delta-encoded and LEB128-varint packed; tfs are varint
packed directly. Decode is the vectorized inverse (the analog of
``decompress_residuals.cpp``).

Encoding: little-endian base-128; 7 payload bits per byte, MSB = continuation.
"""

from __future__ import annotations

import numpy as np

_MASK7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)


def _varint_encode_arr(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 array -> (uint8 byte array, bytes-per-value array)."""
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    if int(v.max()) >= (1 << 63):
        raise ValueError("varint values must be < 2^63")
    # number of 7-bit groups per value (>=1)
    nbits = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbits += (tmp != 0)
        tmp >>= np.uint64(7)
    total = int(nbits.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbits)
    starts = ends - nbits
    # fill group g (g = 0..max_groups-1): byte at starts+g for values with nbits > g
    max_groups = int(nbits.max())
    shifted = v.copy()
    for g in range(max_groups):
        sel = nbits > g
        pos = starts[sel] + g
        payload = (shifted[sel] & _MASK7).astype(np.uint8)
        more = (nbits[sel] - 1) > g
        out[pos] = payload | np.where(more, _CONT, np.uint8(0))
        shifted[sel] >>= np.uint64(7)
    return out, nbits


def varint_encode(values: np.ndarray) -> bytes:
    """uint64 array -> LEB128 bytes (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    out, _ = _varint_encode_arr(v)
    return out.tobytes()


def varint_encode_segmented(values: np.ndarray, run_starts: np.ndarray) -> list[bytes]:
    """Encode MANY runs in one vectorized pass.

    ``values`` is the concatenation of all runs' payloads; ``run_starts``
    are the value indices where each run begins. Returns one ``bytes`` per
    run — byte-identical to calling ``varint_encode`` per run, at a fraction
    of the per-call overhead (one pass over all values, then buffer slicing).
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return [b""] * len(run_starts)
    out, nbits = _varint_encode_arr(v)
    byte_ends = np.cumsum(nbits)
    run_byte_starts = np.where(run_starts > 0, byte_ends[run_starts - 1], 0)
    run_byte_ends = np.append(run_byte_starts[1:], len(out))
    buf = out.tobytes()
    return [buf[int(s):int(e)] for s, e in zip(run_byte_starts, run_byte_ends)]


def delta_gaps_segmented(docids: np.ndarray, run_starts: np.ndarray) -> np.ndarray:
    """Concatenated runs of strictly-increasing docids -> per-run delta gaps
    (gap at each run start = absolute first docid), vectorized."""
    d = np.ascontiguousarray(docids, dtype=np.int64)
    if d.size == 0:
        return np.empty(0, dtype=np.uint64)
    gaps = np.empty(d.shape, dtype=np.int64)
    gaps[0] = d[0]
    gaps[1:] = d[1:] - d[:-1]
    gaps[run_starts] = d[run_starts]
    if (np.delete(gaps, run_starts) <= 0).any():
        raise ValueError("docids must be strictly increasing within each run")
    return gaps.astype(np.uint64)


def varint_decode_segmented(buffers, counts: np.ndarray) -> np.ndarray:
    """Decode MANY runs in one pass: ``b''.join(buffers)`` then a single
    ``varint_decode``. Returns the concatenated values (split with counts)."""
    total = int(np.asarray(counts).sum())
    return varint_decode(b"".join(buffers), total)


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """LEB128 bytes -> uint64 array of ``count`` values (vectorized).

    Pass k (k >= 1) touches ONLY the values that actually have > k bytes, so
    decoding delta-gap streams (overwhelmingly 1-byte values) costs ~one
    pass over the byte array plus tiny follow-ups.
    """
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_last = (raw & _CONT) == 0
    starts_new = np.empty(len(raw), dtype=bool)
    starts_new[0] = True
    starts_new[1:] = is_last[:-1]
    value_starts = np.flatnonzero(starts_new)
    if len(value_starts) != count or not is_last[-1]:
        raise ValueError("corrupt varint stream")
    nbytes = np.diff(np.append(value_starts, len(raw)))
    out = (raw[value_starts] & np.uint8(0x7F)).astype(np.uint64)
    for k in range(1, int(nbytes.max())):
        idx = np.flatnonzero(nbytes > k)
        out[idx] |= (raw[value_starts[idx] + k] & np.uint8(0x7F)).astype(np.uint64) \
            << np.uint64(7 * k)
    return out


def delta_encode_docids(docids: np.ndarray) -> bytes:
    """Strictly-increasing int64 docids -> varint(first, then gaps)."""
    d = np.ascontiguousarray(docids, dtype=np.int64)
    if d.size == 0:
        return b""
    gaps = np.empty(d.shape, dtype=np.uint64)
    gaps[0] = np.uint64(d[0])
    if d.size > 1:
        diffs = np.diff(d)
        if (diffs <= 0).any():
            raise ValueError("docids must be strictly increasing")
        gaps[1:] = diffs.astype(np.uint64)
    return varint_encode(gaps)


def delta_decode_docids(buf: bytes, count: int) -> np.ndarray:
    gaps = varint_decode(buf, count).astype(np.int64)
    return np.cumsum(gaps)


def encode_tfs(tfs: np.ndarray) -> bytes:
    return varint_encode(np.ascontiguousarray(tfs, dtype=np.uint64))


def decode_tfs(buf: bytes, count: int) -> np.ndarray:
    return varint_decode(buf, count).astype(np.int64)
