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
    if len(raw) == 0:
        raise ValueError("corrupt varint stream")   # count > 0, no bytes
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


# --------------------------------------------------------------------------
# PForDelta block codec (the north-star's second named compression scheme).
#
# Values are split into blocks of PFOR_BLOCK; each block stores the low
# ``w`` bits of every value as ``w`` 128-bit bit-planes (w = bit width of
# the block's ~90th-percentile value, so ≤ ~10% of values overflow) and the
# overflowing values as patched exceptions (position byte + u64 overflow
# ``v >> w``). Run layout is COLUMNAR so both encode and decode are
# numpy-vectorized over all blocks of all runs at once (no per-block
# Python loop):
#
#   widths[n_blocks]·u8 | n_exc[n_blocks]·u8 | planes (16·w bytes/block)
#   | exception positions·u8 | exception overflows (per-run LEB128
#   varint stream, each value = v >> w of its block)
#
# n_blocks is implied by the caller-provided value count. The last block
# of a run is zero-padded to PFOR_BLOCK inside the planes (decode slices
# the pad away), which keeps every plane exactly 16 bytes. Contract:
# values must be < 2^63 (same as the varint codec; all engine payloads
# are int64-derived). The guard is the varint encoder's own range check
# on the overflow stream, so it only fires for values that actually
# become exceptions — callers must not feed >= 2^63 values.
# --------------------------------------------------------------------------

PFOR_BLOCK = 128
_PFOR_EXC_COST = 4        # ~bytes per exception (1 pos + ~3 varint overflow)


def _pfor_nblocks(counts: np.ndarray) -> np.ndarray:
    return -(-counts // PFOR_BLOCK)


def _pfor_widths(V: np.ndarray) -> np.ndarray:
    """Per-block bit width minimizing plane bytes + estimated exception
    bytes. Uses float frexp for bit lengths — rounding can only OVERestimate
    a width (value still fits), never underestimate, so decode stays exact."""
    total_blocks = len(V)
    bl = np.frexp(V.astype(np.float64))[1]            # bit length per value
    key = (np.repeat(np.arange(total_blocks, dtype=np.int64), PFOR_BLOCK) * 66
           + bl.ravel())
    hist = np.bincount(key, minlength=total_blocks * 66).reshape(
        total_blocks, 66)
    # n_over[b, w] = #values with bit length > w  (w = 0..64)
    n_over = hist[:, ::-1].cumsum(axis=1)[:, ::-1][:, 1:]
    cost = ((PFOR_BLOCK // 8) * np.arange(65, dtype=np.int64)[None, :]
            + _PFOR_EXC_COST * n_over)
    return cost.argmin(axis=1).astype(np.uint8)


def pfor_encode_segmented(values: np.ndarray,
                          run_starts: np.ndarray) -> list[bytes]:
    """Encode MANY runs (concatenated ``values``, runs beginning at
    ``run_starts``) in one vectorized pass -> one ``bytes`` per run."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    run_starts = np.asarray(run_starts, dtype=np.int64)
    n_runs = len(run_starts)
    if n_runs == 0:
        return []
    counts = np.diff(np.append(run_starts, len(v)))
    nb = _pfor_nblocks(counts)
    total_blocks = int(nb.sum())
    if total_blocks == 0:
        return [b""] * n_runs
    block_base = np.zeros(n_runs, dtype=np.int64)
    np.cumsum(nb[:-1], out=block_base[1:])
    # scatter values into the zero-padded (total_blocks, PFOR_BLOCK) matrix
    V = np.zeros((total_blocks, PFOR_BLOCK), dtype=np.uint64)
    local = np.arange(len(v), dtype=np.int64) - np.repeat(run_starts, counts)
    blk = np.repeat(block_base, counts) + local // PFOR_BLOCK
    V[blk, local % PFOR_BLOCK] = v

    widths = _pfor_widths(V)
    plane_bytes = widths.astype(np.int64) * (PFOR_BLOCK // 8)
    # per-width-group plane packing + SPARSE exception collection (dense
    # (blocks, 128) exception matrices would add ~290MB per 32M-value
    # encode chunk; exceptions are <=~10% of values by construction)
    planes_parts: list[tuple[int, np.ndarray]] = []   # (width, packed rows)
    exc_blocks: list[np.ndarray] = []
    exc_pos: list[np.ndarray] = []
    exc_vals: list[np.ndarray] = []
    group_rows: dict[int, np.ndarray] = {}
    for w in np.unique(widths):
        w = int(w)
        rows = np.flatnonzero(widths == w)
        group_rows[w] = rows
        Vw = V[rows]
        if w == 0:
            gi, gp = np.nonzero(Vw)
            exc_blocks.append(rows[gi])
            exc_pos.append(gp)
            exc_vals.append(Vw[gi, gp])
            continue
        if w >= 64:
            low = Vw
        else:
            mask = np.uint64((1 << w) - 1)
            low = Vw & mask
            over = Vw >> np.uint64(w)
            gi, gp = np.nonzero(over)
            exc_blocks.append(rows[gi])
            exc_pos.append(gp)
            exc_vals.append(over[gi, gp])
        # pack plane-by-plane: w passes over a (n, PFOR_BLOCK) bit matrix
        # instead of one (n, w, PFOR_BLOCK) uint64 temporary
        packed = np.empty((len(rows), w, PFOR_BLOCK // 8), dtype=np.uint8)
        for i in range(w):
            bitplane = ((low >> np.uint64(i)) & np.uint64(1)).astype(np.uint8)
            packed[:, i, :] = np.packbits(bitplane, axis=1, bitorder="little")
        planes_parts.append((w, packed.reshape(len(rows), -1)))
    if exc_blocks:
        eb = np.concatenate(exc_blocks)
        ep = np.concatenate(exc_pos).astype(np.int64)
        ev = np.concatenate(exc_vals)
        # canonical order: by (block, in-block position)
        o = np.lexsort((ep, eb))
        eb, ep, ev = eb[o], ep[o], ev[o]
    else:
        eb = np.empty(0, dtype=np.int64)
        ep = np.empty(0, dtype=np.int64)
        ev = np.empty(0, dtype=np.uint64)
    n_exc = np.bincount(eb, minlength=total_blocks).astype(np.int64)

    # ---- assemble the five sections into one output byte array ----------
    run_plane_bytes = np.zeros(n_runs, dtype=np.int64)
    np.add.at(run_plane_bytes, np.repeat(np.arange(n_runs), nb), plane_bytes)
    run_exc = np.zeros(n_runs, dtype=np.int64)
    np.add.at(run_exc, np.repeat(np.arange(n_runs), nb), n_exc)
    ex_cum = np.zeros(total_blocks + 1, dtype=np.int64)
    np.cumsum(n_exc, out=ex_cum[1:])
    run_ex_base = ex_cum[block_base]
    # exception overflows as ONE varint stream per run (v >> w is small)
    exc_vb = varint_encode_segmented(ev, run_ex_base)
    exc_vb_len = np.array([len(b) for b in exc_vb], dtype=np.int64)

    run_len = 2 * nb + run_plane_bytes + run_exc + exc_vb_len
    run_off = np.zeros(n_runs + 1, dtype=np.int64)
    np.cumsum(run_len, out=run_off[1:])
    out = np.zeros(int(run_off[-1]), dtype=np.uint8)

    blk_run = np.repeat(np.arange(n_runs), nb)
    blk_local = np.arange(total_blocks) - np.repeat(block_base, nb)
    # widths + n_exc headers
    out[run_off[blk_run] + blk_local] = widths
    out[run_off[blk_run] + nb[blk_run] + blk_local] = n_exc.astype(np.uint8)
    # planes: global start of each block's planes
    pb_cum = np.zeros(total_blocks + 1, dtype=np.int64)
    np.cumsum(plane_bytes, out=pb_cum[1:])
    run_pb_base = pb_cum[block_base]
    blk_plane_start = (run_off[blk_run] + 2 * nb[blk_run]
                       + pb_cum[:-1] - run_pb_base[blk_run])
    for w, packed in planes_parts:
        rows = group_rows[w]
        pos = (blk_plane_start[rows][:, None]
               + np.arange(w * (PFOR_BLOCK // 8))[None, :])
        out[pos.ravel()] = packed.ravel()
    # exception positions, then the per-run varint overflow stream
    if len(eb):
        blk_pos_start = (run_off[blk_run] + 2 * nb[blk_run]
                         + run_plane_bytes[blk_run]
                         + ex_cum[:-1] - run_ex_base[blk_run])
        within = np.arange(len(eb)) - ex_cum[eb]   # exception rank in block
        out[blk_pos_start[eb] + within] = ep.astype(np.uint8)
        vb_cat = np.frombuffer(b"".join(exc_vb), dtype=np.uint8)
        run_val_start = run_off[:-1] + 2 * nb + run_plane_bytes + run_exc
        vb_base = np.zeros(n_runs, dtype=np.int64)
        np.cumsum(exc_vb_len[:-1], out=vb_base[1:])
        tgt = (np.repeat(run_val_start, exc_vb_len)
               + np.arange(len(vb_cat)) - np.repeat(vb_base, exc_vb_len))
        out[tgt] = vb_cat

    buf = out.tobytes()
    return [buf[int(run_off[r]):int(run_off[r + 1])] for r in range(n_runs)]


def pfor_encode(values: np.ndarray) -> bytes:
    """Single-run PForDelta encode (see pfor_encode_segmented)."""
    return pfor_encode_segmented(
        np.ascontiguousarray(values, dtype=np.uint64),
        np.zeros(1, dtype=np.int64))[0]


def pfor_decode_concat(buf: np.ndarray, cell_starts: np.ndarray,
                       counts: np.ndarray,
                       cell_ends: np.ndarray | None = None) -> np.ndarray:
    """Decode MANY PFor runs stored back-to-back in ``buf`` (uint8 array;
    run r spans ``[cell_starts[r], cell_ends[r])`` — defaults to contiguous
    cells — and holds ``counts[r]`` values) in one vectorized pass ->
    concatenated uint64 values."""
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    cell_starts = np.asarray(cell_starts, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    if cell_ends is None:
        cell_ends = np.append(cell_starts[1:], len(buf))
    cell_ends = np.asarray(cell_ends, dtype=np.int64)
    n_runs = len(cell_starts)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64)
    nb = _pfor_nblocks(counts)
    total_blocks = int(nb.sum())
    block_base = np.zeros(n_runs, dtype=np.int64)
    np.cumsum(nb[:-1], out=block_base[1:])
    blk_run = np.repeat(np.arange(n_runs), nb)
    blk_local = np.arange(total_blocks) - np.repeat(block_base, nb)

    # truncation guard: the two header sections must fit inside each cell
    if total_blocks and int((cell_starts + 2 * nb).max()) > len(buf):
        raise ValueError("corrupt pfor stream (truncated headers)")
    widths = buf[cell_starts[blk_run] + blk_local].astype(np.int64)
    n_exc = buf[cell_starts[blk_run] + nb[blk_run] + blk_local].astype(np.int64)
    plane_bytes = widths * (PFOR_BLOCK // 8)
    pb_cum = np.zeros(total_blocks + 1, dtype=np.int64)
    np.cumsum(plane_bytes, out=pb_cum[1:])
    run_pb_base = pb_cum[block_base]
    run_plane_bytes = np.append(pb_cum[block_base[1:]], pb_cum[-1]) - run_pb_base
    blk_plane_start = (cell_starts[blk_run] + 2 * nb[blk_run]
                       + pb_cum[:-1] - run_pb_base[blk_run])

    V = np.zeros((total_blocks, PFOR_BLOCK), dtype=np.uint64)
    for w in np.unique(widths):
        w = int(w)
        if w == 0:
            continue
        rows = np.flatnonzero(widths == w)
        pos = (blk_plane_start[rows][:, None]
               + np.arange(w * (PFOR_BLOCK // 8))[None, :])
        packed = buf[pos.ravel()].reshape(len(rows), w, PFOR_BLOCK // 8)
        vals = np.zeros((len(rows), PFOR_BLOCK), dtype=np.uint64)
        for i in range(w):
            bits = np.unpackbits(packed[:, i, :], axis=1, bitorder="little")
            vals |= bits.astype(np.uint64) << np.uint64(i)
        V[rows] = vals

    ex_cum = np.zeros(total_blocks + 1, dtype=np.int64)
    np.cumsum(n_exc, out=ex_cum[1:])
    run_ex_base = ex_cum[block_base]
    if int(ex_cum[-1]):
        blk_pos_start = (cell_starts[blk_run] + 2 * nb[blk_run]
                         + run_plane_bytes[blk_run]
                         + ex_cum[:-1] - run_ex_base[blk_run])
        run_exc = np.append(ex_cum[block_base[1:]], ex_cum[-1]) - run_ex_base
        eb = np.repeat(np.arange(total_blocks), n_exc)
        within = np.arange(int(ex_cum[-1])) - ex_cum[eb]
        ep = buf[blk_pos_start[eb] + within].astype(np.int64)
        # the varint overflow stream is each run's FINAL section
        run_val_start = cell_starts + 2 * nb + run_plane_bytes + run_exc
        vlens = cell_ends - run_val_start
        vb_base = np.zeros(len(vlens), dtype=np.int64)
        np.cumsum(vlens[:-1], out=vb_base[1:])
        src = (np.repeat(run_val_start, vlens)
               + np.arange(int(vlens.sum())) - np.repeat(vb_base, vlens))
        vals = varint_decode(buf[src].tobytes(), int(ex_cum[-1]))
        V[eb, ep] |= vals << widths[eb].astype(np.uint64)

    # slice away the per-run zero pad (only the last block of a run is short)
    flat = V.reshape(-1)
    out_pos = (np.repeat(block_base * PFOR_BLOCK, counts)
               + np.arange(total) - np.repeat(
                   np.concatenate([[0], np.cumsum(counts)[:-1]]), counts))
    return flat[out_pos]


def pfor_decode(buf: bytes, count: int) -> np.ndarray:
    """Single-run PForDelta decode (see pfor_decode_concat)."""
    return pfor_decode_concat(np.frombuffer(buf, dtype=np.uint8),
                              np.zeros(1, dtype=np.int64),
                              np.asarray([count], dtype=np.int64))


# ---- per-run codec dispatch (compaction / delta folding paths) -----------

def encode_docids_run(docids: np.ndarray, codec: str = "varint") -> bytes:
    """Strictly-increasing docids -> (first, gaps) in the given codec."""
    if codec in ("pfor", "ef"):
        d = np.ascontiguousarray(docids, dtype=np.int64)
        gaps = (delta_gaps_segmented(d, np.zeros(1, dtype=np.int64))
                if d.size else np.empty(0, dtype=np.uint64))
        return pfor_encode(gaps) if codec == "pfor" else ef_encode(gaps)
    return delta_encode_docids(docids)


def decode_docids_run(buf: bytes, count: int, codec: str = "varint") -> np.ndarray:
    if codec == "pfor":
        return np.cumsum(pfor_decode(buf, count).astype(np.int64))
    if codec == "ef":
        return np.cumsum(ef_decode(buf, count).astype(np.int64))
    return delta_decode_docids(buf, count)


def encode_tfs_run(tfs: np.ndarray, codec: str = "varint") -> bytes:
    if codec == "pfor":
        return pfor_encode(np.ascontiguousarray(tfs, dtype=np.uint64))
    if codec == "ef":
        return ef_encode(np.ascontiguousarray(tfs, dtype=np.uint64))
    return encode_tfs(tfs)


def decode_tfs_run(buf: bytes, count: int, codec: str = "varint") -> np.ndarray:
    if codec == "pfor":
        return pfor_decode(buf, count).astype(np.int64)
    if codec == "ef":
        return ef_decode(buf, count).astype(np.int64)
    return decode_tfs(buf, count)


# --------------------------------------------------------------------------
# Elias–Fano monotone codec (the third segment codec: "ef").
#
# The quasi-succinct posting representation (Elias 1974; Vigna, WSDM 2013
# "Quasi-succinct indices"): a strictly-increasing sequence of n values
# with top value ``last`` stores the low ``l = floor(log2(u/n))`` bits of
# every value verbatim and the high bits unary-coded in a bitvector where
# bit ``(v_j >> l) + j`` is set — ~2 + log2(u/n) bits per value, with the
# decode a single scan for set bits.
#
# Interface parity with varint/pfor: the cell payloads are the SAME values
# the other codecs see (delta gaps for docids, raw tfs). Internally the
# codec encodes the per-run PREFIX SUMS (gaps -> absolute docids, tfs ->
# cumulative freqs), which are strictly increasing by construction
# (gaps > 0 after the first, tf >= 1), and diffs them back on decode.
#
# Cell layout (bitorder little throughout):
#   [l: u8][lo: ceil(n*l/8) bytes][hi: ceil(((last >> l) + n)/8) bytes]
# Empty runs encode as b"". Contract: values < 2^63 (same as varint).
# --------------------------------------------------------------------------


def _exclusive_cumsum(a: np.ndarray) -> np.ndarray:
    out = np.zeros(len(a), dtype=np.int64)
    np.cumsum(a[:-1], out=out[1:])
    return out


def ef_encode_segmented(values: np.ndarray,
                        run_starts: np.ndarray) -> list[bytes]:
    """Encode MANY runs (concatenated interface values, runs beginning at
    ``run_starts``) -> one Elias–Fano cell per run. Fully vectorized: the
    lo/hi bit arrays are built globally with <= 63 masked passes and packed
    once; only the final per-run buffer slicing is a Python loop (the same
    shape as varint_encode_segmented)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    rs = np.asarray(run_starts, dtype=np.int64)
    n_runs = len(rs)
    if n_runs == 0:
        return []
    if v.size and int(v.max()) >= (1 << 63):
        raise ValueError("ef values must be < 2^63")
    counts = np.diff(np.append(rs, len(v)))
    ne = counts > 0
    # per-run prefix sums -> strictly increasing sequences
    cs = np.cumsum(v, dtype=np.uint64)
    base = np.zeros(n_runs, dtype=np.uint64)
    base[ne] = cs[rs[ne]] - v[rs[ne]]
    mono = cs - np.repeat(base, counts)
    # uint64 wrap guard: a run whose value SUM exceeds 2^64 breaks the
    # monotone prefix sequence (engine payloads never do — absolute docids
    # and run cfs are < 2^63 — but fail loudly rather than corrupt)
    if len(mono) > 1:
        bad = mono[1:] < mono[:-1]
        bad[rs[1:] - 1] = False        # run boundaries may step down
        if bad.any():
            raise ValueError("ef run value sum overflows uint64")
    run_ends = np.append(rs[1:], len(v))
    last = np.zeros(n_runs, dtype=np.uint64)
    last[ne] = mono[run_ends[ne] - 1]
    u = last + np.uint64(1)
    x = np.maximum(u // np.maximum(counts, 1).astype(np.uint64), np.uint64(1))
    # floor(log2(x)) via frexp; off-by-one from float rounding only changes
    # the split point (l is stored), never correctness
    l_arr = np.clip(np.frexp(x.astype(np.float64))[1] - 1, 0, 63) \
        .astype(np.int64)
    l_arr[~ne] = 0
    lo_bytes = (counts * l_arr + 7) // 8
    hi_bits = (last >> l_arr.astype(np.uint64)).astype(np.int64) + counts
    hi_bytes = np.where(ne, (hi_bits + 7) // 8, 0)

    j_local = np.arange(len(v), dtype=np.int64) - np.repeat(rs, counts)
    l_val = np.repeat(l_arr, counts)
    # ---- lo planes ----
    lo_bit_base = 8 * _exclusive_cumsum(lo_bytes)
    total_lo = int(8 * lo_bytes.sum())
    lob = b""
    if total_lo:
        lobits = np.zeros(total_lo, dtype=np.uint8)
        dest = np.repeat(lo_bit_base, counts) + j_local * l_val
        for k in range(int(l_arr.max())):
            sel = l_val > k
            lobits[dest[sel] + k] = (
                (mono[sel] >> np.uint64(k)) & np.uint64(1)).astype(np.uint8)
        lob = np.packbits(lobits, bitorder="little").tobytes()
    # ---- hi unary bitvector ----
    hi_bit_base = 8 * _exclusive_cumsum(hi_bytes)
    total_hi = int(8 * hi_bytes.sum())
    hib = b""
    if total_hi:
        hibits = np.zeros(total_hi, dtype=np.uint8)
        pos = (np.repeat(hi_bit_base, counts)
               + (mono >> l_val.astype(np.uint64)).astype(np.int64) + j_local)
        hibits[pos] = 1
        hib = np.packbits(hibits, bitorder="little").tobytes()
    lo_off = np.append(_exclusive_cumsum(lo_bytes), int(lo_bytes.sum()))
    hi_off = np.append(_exclusive_cumsum(hi_bytes), int(hi_bytes.sum()))
    hdr = l_arr.astype(np.uint8)
    return [
        (hdr[r:r + 1].tobytes()
         + lob[lo_off[r]:lo_off[r + 1]] + hib[hi_off[r]:hi_off[r + 1]])
        if counts[r] else b""
        for r in range(n_runs)
    ]


def ef_encode(values: np.ndarray) -> bytes:
    """Single-run Elias–Fano encode (see ef_encode_segmented)."""
    return ef_encode_segmented(values, np.zeros(1, dtype=np.int64))[0]


def ef_decode_concat(buf: np.ndarray, cell_starts: np.ndarray,
                     counts: np.ndarray,
                     cell_ends: np.ndarray | None = None) -> np.ndarray:
    """Decode MANY EF cells stored in ``buf`` (run r spans
    ``[cell_starts[r], cell_ends[r])`` with ``counts[r]`` values) in one
    vectorized pass -> the concatenated interface values (gaps / tfs)."""
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    cell_starts = np.asarray(cell_starts, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    n_runs = len(cell_starts)
    if cell_ends is None:
        cell_ends = np.append(cell_starts[1:], len(buf))
    cell_ends = np.asarray(cell_ends, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64)
    ne = counts > 0
    l_arr = np.zeros(n_runs, dtype=np.int64)
    l_arr[ne] = buf[cell_starts[ne]]
    if int(l_arr.max(initial=0)) > 63:
        raise ValueError("corrupt ef stream (l > 63)")
    lo_bytes = np.where(ne, (counts * l_arr + 7) // 8, 0)
    lo_start = cell_starts + 1
    hi_start = lo_start + lo_bytes
    if (ne & ((hi_start > cell_ends) | (cell_starts + 1 > cell_ends))).any():
        raise ValueError("corrupt ef stream (truncated cell)")

    bits = np.unpackbits(buf, bitorder="little")
    j_local = np.arange(total, dtype=np.int64) - np.repeat(
        _exclusive_cumsum(counts), counts)
    l_val = np.repeat(l_arr, counts)
    # ---- lo bits ----
    lo = np.zeros(total, dtype=np.uint64)
    src = np.repeat(8 * lo_start, counts) + j_local * l_val
    for k in range(int(l_arr.max(initial=0))):
        sel = l_val > k
        lo[sel] |= bits[src[sel] + k].astype(np.uint64) << np.uint64(k)
    # ---- hi unary: set-bit positions inside each cell's hi region ----
    delta = np.zeros(len(bits) + 1, dtype=np.int32)
    np.add.at(delta, 8 * hi_start[ne], 1)
    np.add.at(delta, 8 * cell_ends[ne], -1)
    region = np.cumsum(delta[:-1]) > 0
    setpos = np.flatnonzero(bits.astype(bool) & region)
    if len(setpos) != total:
        raise ValueError(
            f"corrupt ef stream ({len(setpos)} set bits, {total} values)")
    highs = (setpos
             - np.repeat(8 * hi_start, counts)
             - j_local).astype(np.uint64)
    mono = (highs << l_val.astype(np.uint64)) | lo
    # back to interface form: per-run first value + diffs
    out = np.empty(total, dtype=np.uint64)
    out[0] = mono[0]
    out[1:] = mono[1:] - mono[:-1]
    rs = _exclusive_cumsum(counts)[ne]
    out[rs] = mono[rs]
    return out


def ef_decode(buf: bytes, count: int) -> np.ndarray:
    """Single-run Elias–Fano decode (see ef_decode_concat)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    return ef_decode_concat(b, np.zeros(1, dtype=np.int64),
                            np.asarray([count], dtype=np.int64),
                            np.asarray([len(b)], dtype=np.int64))
