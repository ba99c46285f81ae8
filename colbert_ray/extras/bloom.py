"""Bloom-filter semi-join: broadcast filtering when the build side's exact
key set is too big to ship.

The repo's exact broadcast semi-joins (Q3 customer filter, benchmark
decontamination) ship the small side's full key set via ``ray.put``. At
100 TB the build side may itself be billions of keys — a Bloom bitset caps
the broadcast at a FIXED size (n_bits/8 bytes, e.g. 128 MB for 2^30 bits)
at the price of a bounded, DETERMINISTIC false-positive rate. Probe-side
rows that pass still need the real join for exactness — the bloom's job is
to drop the (1 - selectivity) bulk before the expensive exchange, the same
role the in-bucket estimate prefilter plays in MinHash-LSH.

``n_bits`` must be a power of two: positions are taken mod ``n_bits`` after
the uint64 arithmetic wraps mod 2^64, and the two mods commute only when
``n_bits`` divides 2^64 — which is what lets the SQL twin skip the
intermediate wrap.

Build shape: per-batch partial bitsets are emitted as non-zero
``(word_idx, word)`` rows (at most n_bits/64 per batch), OR-folded with one
tiny ``groupby(word_idx)`` — the corpus never moves. Probe shape: stateless
``map_batches`` against the broadcast bitset.

Determinism: positions are double hashing ``(h1 + j*h2) mod n_bits`` over
the FNV+fmix64 key hash (``functions/hashing.py``) — plain modular
arithmetic, so the DuckDB oracle reproduces membership (INCLUDING false
positives) bit-exactly. Bloom 1970 / Kirsch-Mitzenmacher double hashing are
public literature.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from colbert_ray.extras.sampling import _key_hash, sql_key_hash_expr


def _positions(b: pa.Table, key_col: str, n_bits: int, k: int) -> np.ndarray:
    """(n_rows, k) bit positions via Kirsch-Mitzenmacher double hashing."""
    h1 = _key_hash(b, key_col, seed=0)
    h2 = _key_hash(b, key_col, seed=1)
    j = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + j[None, :] * h2[:, None])
            % np.uint64(n_bits)).astype(np.int64)


def build_bloom(ds: "ray.data.Dataset", key_col: str,
                n_bits: int = 1 << 20, k: int = 5) -> np.ndarray:
    """Fold ``ds``'s keys into a Bloom bitset (uint64[n_bits/64]).

    Each batch reduces to its non-zero words; one groupby(word_idx) OR-fold
    later the driver assembles the fixed-size bitset (the only driver-side
    object, n_bits/8 bytes by construction)."""
    assert n_bits % 64 == 0 and (n_bits & (n_bits - 1)) == 0, \
        "n_bits must be a power of two (see module docstring)"

    def partial(b: pa.Table) -> pa.Table:
        pos = _positions(b, key_col, n_bits, k).ravel()
        words = np.zeros(n_bits // 64, dtype=np.uint64)
        np.bitwise_or.at(words, pos // 64,
                         np.uint64(1) << (pos % 64).astype(np.uint64))
        nz = np.flatnonzero(words)
        return pa.table({"word_idx": pa.array(nz, type=pa.int64()),
                         "word": pa.array(words[nz].view(np.int64))})

    def fold(g: pa.Table) -> pa.Table:
        w = np.bitwise_or.reduce(
            g.column("word").to_numpy(zero_copy_only=False).view(np.uint64))
        return pa.table({"word_idx": g.column("word_idx").slice(0, 1),
                         "word": pa.array([np.int64(w.view(np.int64))])})

    folded = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("word_idx").map_groups(fold, batch_format="pyarrow")
              .to_pandas())
    bits = np.zeros(n_bits // 64, dtype=np.uint64)
    bits[folded["word_idx"].to_numpy()] = \
        folded["word"].to_numpy().view(np.uint64)
    return bits


def bloom_semijoin(probe: "ray.data.Dataset", bits: np.ndarray,
                   key_col: str, k: int = 5) -> "ray.data.Dataset":
    """Keep probe rows whose key MAY be in the bloom (no false negatives;
    false positives at the configured rate). ``bits`` is broadcast once via
    ``ray.put`` and tested zero-copy inside every task."""
    n_bits = len(bits) * 64
    bits_ref = ray.put(bits)

    def keep(b: pa.Table) -> pa.Table:
        w = ray.get(bits_ref)
        pos = _positions(b, key_col, n_bits, k)
        hit = (w[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
        return b.filter(pa.array(hit.all(axis=1)))

    return probe.map_batches(keep, batch_format="pyarrow",
                             zero_copy_batch=True)


def anti_join(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
              on: str, right_on: str | None = None,
              n_bits: int = 1 << 20, k: int = 5,
              num_partitions: int = 8) -> "ray.data.Dataset":
    """Rows of ``left`` whose key appears NOWHERE in ``right`` (anti join).

    Tiered for scale: ``right``'s keys fold into a Bloom bitset (fixed-size
    broadcast). A bloom MISS is a definite non-match — no false negatives —
    so the bulk of a selective anti join streams straight through with zero
    shuffle. Only bloom-MAYBE rows (true matches + the bounded
    false-positive mass) enter the exchange: a hash-partitioned left_outer
    ``Dataset.join`` against right's DISTINCT keys, keeping null probes.
    ``on``/``right_on`` must be distinct column names (TPC-H style keys)."""
    right_on = right_on or on
    assert on != right_on, "anti_join needs distinct key column names"
    bits = build_bloom(right.select_columns([right_on]), right_on,
                       n_bits=n_bits, k=k)
    n_bits_eff = len(bits) * 64
    bits_ref = ray.put(bits)
    left_cols = left.schema().names

    def _hits(b: pa.Table) -> np.ndarray:
        w = ray.get(bits_ref)
        pos = _positions(b, on, n_bits_eff, k)
        hit = (w[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
        return hit.all(axis=1)

    def keep_miss(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(~_hits(b)))

    # two lineages over `left` (Ray Data streams can't fork): the definite
    # branch re-reads the source, but each branch's output is the small side
    # of its filter, so no exchange ever sees the full probe table
    definite = left.map_batches(keep_miss, batch_format="pyarrow",
                                zero_copy_batch=True)
    maybe = bloom_semijoin(left, bits, on, k=k)
    # distinct keys (one row per key) so the left_outer probe can't fan out
    rkeys = (right.select_columns([right_on])
             .groupby(right_on).count())
    joined = maybe.join(rkeys, join_type="left_outer",
                        num_partitions=num_partitions,
                        on=(on,), right_on=(right_on,))

    def null_probe(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_null(b.column("count()"))
        return b.filter(keep).select(left_cols)

    verified = joined.map_batches(null_probe, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return definite.union(verified)


def sql_bloom_semijoin(*, probe_table: str, probe_key: str,
                       build_table: str, build_key: str,
                       select: str, n_bits: int = 1 << 20,
                       k: int = 5, order_by: str) -> str:
    """DuckDB twin: recompute the build side's occupied bit set, then keep
    probe rows whose k positions are ALL occupied — reproducing the engine's
    false positives exactly."""
    bh1 = sql_key_hash_expr(build_key, seed=0)
    bh2 = sql_key_hash_expr(build_key, seed=1)
    ph1 = sql_key_hash_expr(probe_key, seed=0)
    ph2 = sql_key_hash_expr(probe_key, seed=1)
    return f"""
WITH js(j) AS (SELECT unnest(generate_series(0, {k - 1}))),
bh AS (SELECT ({bh1}) AS h1, ({bh2}) AS h2 FROM {build_table}),
occupied AS (SELECT DISTINCT ((h1 + j * h2) % {n_bits})::BIGINT AS p
             FROM bh CROSS JOIN js),
ph AS (SELECT *, ({ph1}) AS h1, ({ph2}) AS h2 FROM {probe_table}),
hits AS (SELECT ph.*, count(occupied.p) AS n_hit
         FROM ph CROSS JOIN js
         LEFT JOIN occupied
           ON ((ph.h1 + js.j * ph.h2) % {n_bits})::BIGINT = occupied.p
         GROUP BY ALL)
SELECT {select} FROM hits WHERE n_hit = {k}
ORDER BY {order_by}
"""
