"""Vectorized 64-bit FNV-1a over Arrow string arrays.

Replaces per-token ``hashlib`` Python loops in fingerprinting/simhash with:
dictionary-encode the token column (tokens repeat heavily, so the hash runs
over the batch's UNIQUE strings only), hash the dictionary bytes in a
position-major vectorized loop (<= max token length iterations), scatter
through the dictionary indices. FNV-1a is plain modular arithmetic, so the
DuckDB oracle can reproduce it exactly (HUGEINT mod 2^64) — unlike blake2b.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FNV_OFFSET = np.uint64(14695981039346656037)   # 0xcbf29ce484222325
FNV_PRIME = np.uint64(1099511628211)           # 0x100000001b3
U64_MOD = 1 << 64


def _fnv1a64_segments(offsets: np.ndarray, data: np.ndarray) -> np.ndarray:
    """FNV-1a of each byte segment ``data[offsets[i]:offsets[i+1]]``,
    vectorized column-by-column over byte positions."""
    n = len(offsets) - 1
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return h
    lens = np.diff(offsets)
    maxlen = int(lens.max()) if len(lens) else 0
    starts = offsets[:-1]
    for j in range(maxlen):
        active = lens > j
        hv = h[active]
        hv = (hv ^ data[starts[active] + j].astype(np.uint64)) * FNV_PRIME
        h[active] = hv
    return h


def fnv1a64_strings(arr) -> np.ndarray:
    """uint64 FNV-1a of every string's UTF-8 bytes (vectorized; uniques
    hashed once via dictionary encoding, scattered through indices)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    de = arr.dictionary_encode()
    d = de.dictionary
    # Arrow promotes >2GiB columns to large_string (int64 offsets); reading
    # the offset buffer with the wrong dtype silently corrupts every hash.
    if pa.types.is_large_string(d.type) or pa.types.is_large_binary(d.type):
        off_dtype = np.int64
    elif pa.types.is_string(d.type) or pa.types.is_binary(d.type):
        off_dtype = np.int32
    else:  # string_view etc. — no contiguous offset buffer; go via cast
        d = d.cast(pa.large_string())
        off_dtype = np.int64
    bufs = d.buffers()
    off0 = d.offset
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[off0: off0 + len(d) + 1]
    offsets = offsets.astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, dtype=np.uint8))
    uh = _fnv1a64_segments(offsets, data)
    idx = de.indices.to_numpy(zero_copy_only=False)
    return uh[idx]


def sql_fnv1a64_expr(term_expr: str) -> str:
    """DuckDB expression computing the same FNV-1a 64-bit hash of an ASCII
    string expression (HUGEINT arithmetic mod 2^64; xor touches only the low
    byte, so it is lifted to BIGINT).

    The engine hashes UTF-8 *bytes* while this twin hashes *codepoints*, so
    it is only correct for ASCII — the expression therefore errors loudly
    (DuckDB ``error()``) on any non-ASCII input instead of silently
    diverging from the engine's hash.
    """
    guarded = (
        f"(case when length({term_expr}) <> "
        f"octet_length(encode({term_expr})) "
        f"then error('non-ascii input to fnv1a64 SQL oracle') "
        f"else {term_expr} end)"
    )
    return (
        f"list_reduce(list_prepend({int(FNV_OFFSET)}::HUGEINT, "
        f"list_transform(generate_series(1, length({guarded})), "
        f"j -> ord(substr({guarded}, j, 1))::HUGEINT)), "
        f"(a, x) -> (((a - a % 256 + "
        f"xor((a % 256)::BIGINT, x::BIGINT)::HUGEINT) * "
        f"{int(FNV_PRIME)}::HUGEINT) % {U64_MOD}::HUGEINT))"
    )


# ---------------------------------------------------------------------------
# murmur3 64-bit finalizer (public-domain avalanche mixer)
# ---------------------------------------------------------------------------
# FNV-1a's raw bits are NOT uniformly distributed for short keys (the top
# bits in particular barely avalanche), which breaks any consumer that
# splits the hash into bit fields (HLL registers, LSH bands). fmix64 gives
# full avalanche and is plain modular arithmetic + xorshift, so the DuckDB
# oracle reproduces it exactly.

_FMIX_C1 = np.uint64(0xFF51AFD7ED558CCD)
_FMIX_C2 = np.uint64(0xC4CEB9FE1A85EC53)


def fmix64(h: np.ndarray) -> np.ndarray:
    """Vectorized murmur3 fmix64 over a uint64 array."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(33)
    h *= _FMIX_C1
    h ^= h >> np.uint64(33)
    h *= _FMIX_C2
    h ^= h >> np.uint64(33)
    return h


def _sql_xorshift33(expr: str) -> str:
    """DuckDB HUGEINT twin of ``x ^ (x >> 33)`` for 0 <= x < 2^64.

    ``x >> 33`` < 2^31, so the xor touches only the low 31 bits — both xor
    operands fit in BIGINT where DuckDB's ``xor`` is defined."""
    return (
        f"((({expr}) // {1 << 31}::HUGEINT) * {1 << 31}::HUGEINT"
        f" + xor((({expr}) % {1 << 31}::HUGEINT)::BIGINT,"
        f" (({expr}) // {1 << 33}::HUGEINT)::BIGINT)::HUGEINT)"
    )


def _sql_mulmod64(expr: str, c: int) -> str:
    """DuckDB twin of ``(x * c) mod 2^64``. HUGEINT is INT128, so the naive
    product of two ~2^64 values overflows; split the constant into 32-bit
    halves — every intermediate stays < 2^97."""
    c_hi, c_lo = c >> 32, c & 0xFFFFFFFF
    return (
        f"((({expr}) * {c_lo}::HUGEINT"
        f" + ((({expr}) * {c_hi}::HUGEINT) % {1 << 32}::HUGEINT)"
        f" * {1 << 32}::HUGEINT) % {U64_MOD}::HUGEINT)"
    )


def sql_fmix64_expr(expr: str) -> str:
    """DuckDB expression computing ``fmix64`` of a HUGEINT in [0, 2^64)."""
    s = _sql_xorshift33(expr)
    s = _sql_mulmod64(s, int(_FMIX_C1))
    s = _sql_xorshift33(s)
    s = _sql_mulmod64(s, int(_FMIX_C2))
    s = _sql_xorshift33(s)
    return s


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array of any shape (unpackbits on
    the byte view — portable across numpy versions without bitwise_count).
    The single shared implementation behind the Hamming-distance dedup
    paths (simhash/aHash pair mining)."""
    flat = np.ascontiguousarray(x.astype(np.uint64)).reshape(-1)
    out = np.unpackbits(flat.view(np.uint8).reshape(len(flat), 8),
                        axis=1).sum(axis=1).astype(np.int64)
    return out.reshape(x.shape)
