"""Deterministic hash-based sampling and dataset splitting.

The way a 100-TB pipeline samples is NOT ``random_sample`` (irreproducible
across reruns/retries) but a pure function of a stable key: keep a row iff
``mix(hash(key), seed) < rate * 2^64``. That makes samples (a) reproducible
at any parallelism, (b) consistent across tables sharing the key, and
(c) disjoint/composable for train/val/test splits. Embarrassingly parallel —
a stateless ``map_batches`` filter, no shuffle, no driver state.

Hash = FNV-1a of the key string + seed, finalized with murmur3 fmix64
(``functions/hashing.py``) — plain modular arithmetic, so the DuckDB oracle
reproduces decisions bit-exactly (thresholds are embedded as the SAME
integer on both sides; no float comparison ever happens in the filter).
Reference capability analog: deterministic pid sampling / heldout splits
(reference ``utility/utils/save_metadata.py`` sampling helpers and the
msmarco dev-split tooling); the hash-gate design itself is standard public
practice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from colbert_ray.functions.hashing import (
    U64_MOD,
    fmix64,
    fnv1a64_strings,
    sql_fmix64_expr,
    sql_fnv1a64_expr,
)


def _thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """Cumulative integer bucket edges: label i owns [edge_{i-1}, edge_i).
    Computed ONCE in python and embedded verbatim on both engine and SQL
    sides — the float multiply happens here and nowhere else."""
    total = sum(fractions.values())
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    edges, acc = [], 0.0
    labels = list(fractions)
    for lab in labels[:-1]:
        acc += fractions[lab]
        edges.append((lab, min(U64_MOD, int(acc * U64_MOD))))
    edges.append((labels[-1], U64_MOD))
    return edges


def _key_hash(b: pa.Table, key_col: str, seed: int) -> np.ndarray:
    keys = b.column(key_col)
    if not (pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type)):
        keys = keys.cast(pa.string())
    h = fnv1a64_strings(keys)
    if seed:
        h = h + np.uint64(seed % U64_MOD)        # wraps mod 2^64
    return fmix64(h)


def sql_key_hash_expr(key_expr: str, seed: int = 0) -> str:
    """DuckDB twin of the sampling hash (FNV + seed + fmix64)."""
    h = sql_fnv1a64_expr(key_expr)
    if seed:
        h = f"(({h}) + {seed % U64_MOD}::HUGEINT) % {U64_MOD}::HUGEINT"
    return sql_fmix64_expr(h)


def sample_threshold(rate: float) -> int:
    """The integer hash gate for ``rate`` — computed once, embedded verbatim
    on both the engine and SQL sides (keep iff ``hash <= threshold``)."""
    return min(U64_MOD - 1, int(rate * U64_MOD))


def hash_sample(ds: "ray.data.Dataset", key_col: str, rate: float,
                seed: int = 0) -> "ray.data.Dataset":
    """Keep rows whose key-hash falls under ``rate`` — deterministic,
    parallelism-invariant, and consistent across any table keyed the same
    way. The integer threshold is fixed here; workers never do float math."""
    thresh = np.uint64(sample_threshold(rate))

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(_key_hash(b, key_col, seed) <= thresh))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def _smallest_n_per_group(codes: np.ndarray, h: np.ndarray,
                          keys: np.ndarray, n: int) -> np.ndarray:
    """Row indices of the n smallest (h, key) rows per group code —
    one lexsort + run-relative rank, no Python loop over groups."""
    order = np.lexsort((keys, h, codes))
    sc = codes[order]
    run_start = np.flatnonzero(np.concatenate([[True], sc[1:] != sc[:-1]]))
    rank = np.arange(len(sc)) - np.repeat(
        run_start, np.diff(np.concatenate([run_start, [len(sc)]])))
    return order[rank < n]


def stratified_sample(ds: "ray.data.Dataset", group_col: str, key_col: str,
                      n_per_group: int, seed: int = 0) -> "ray.data.Dataset":
    """Exactly ``n_per_group`` rows per group (fewer when the group is
    smaller): the n SMALLEST key-hashes win, ties broken by key. Because
    membership is a rank in a deterministic total order — not a float
    draw — the sample is identical at any parallelism and stable across
    reruns, like ``hash_sample``; unlike it, per-group quotas are exact.

    Scale shape: a stateless per-batch partial (each batch keeps at most n
    candidate rows per group it sees) so only ≤ n×groups rows per batch
    ride the single groupby shuffle; the per-group final selection re-ranks
    the tiny candidate union. Total shuffle bytes ~ groups × n × row_width,
    independent of corpus size."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        h = _key_hash(b, key_col, seed)
        genc = pc.dictionary_encode(b.column(group_col).combine_chunks())
        codes = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keys = b.column(key_col).to_numpy(zero_copy_only=False)
        idx = _smallest_n_per_group(codes, h, keys, n_per_group)
        return b.take(pa.array(np.sort(idx)))

    def final(g) -> "pa.Table":
        ga = pa.Table.from_pandas(g, preserve_index=False)
        h = _key_hash(ga, key_col, seed)
        keys = ga.column(key_col).to_numpy(zero_copy_only=False)
        idx = _smallest_n_per_group(
            np.zeros(ga.num_rows, dtype=np.int64), h, keys, n_per_group)
        return ga.take(pa.array(np.sort(idx))).to_pandas()

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(group_col)
            .map_groups(final, batch_format="pandas"))


def hash_split(ds: "ray.data.Dataset", key_col: str,
               fractions: dict[str, float], seed: int = 0,
               split_col: str = "split") -> "ray.data.Dataset":
    """Append a deterministic split label (e.g. train/val/test): the key
    hash is bucketed by cumulative integer edges, so the splits are exact
    partitions — disjoint, exhaustive, and stable under any re-run,
    re-partitioning or retry. Label i owns hashes in [edge_{i-1}, edge_i)."""
    edges = _thresholds(fractions)
    # h < edge  <=>  h <= edge-1; edge-1 <= 2^64-1 fits uint64 exactly, so
    # the bucket lookup is ONE integer searchsorted (side='left' finds the
    # first edge-1 >= h, i.e. the first edge > h)
    edges_m1 = np.array([e - 1 for _l, e in edges], dtype=np.uint64)
    labels = np.array([l for l, _e in edges])

    def tag(b: pa.Table) -> pa.Table:
        h = _key_hash(b, key_col, seed)
        idx = np.searchsorted(edges_m1, h, side="left")
        return b.append_column(split_col, pa.array(labels[idx]))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(ds: "ray.data.Dataset", key_col: str, weight_col: str,
                    n: int, seed: int = 0) -> "ray.data.Dataset":
    """Deterministic weighted sampling without replacement — Sequential
    Poisson Sampling (Ohlsson 1998): priority = u / w with u a key-hash
    uniform, keep the n SMALLEST priorities. Inclusion probability is
    ~proportional to weight; the same seed always draws the same sample.

    Exactness: priority is ONE IEEE division of the (identically rounded)
    hash-as-double by the weight — correctly-rounded on every platform, so
    the SQL twin reproduces membership bit-exactly. (An Efraimidis-Spirakis
    u^(1/w) rule would need libm exp/ln, which is not bit-portable.)

    Scale shape: each batch keeps its n smallest candidate rows (one
    argpartition), so the final exchange sees <= n x blocks rows, never the
    corpus; the driver folds a single tiny frame."""
    import ray as _ray

    def partial(b: pa.Table) -> pa.Table:
        h = _key_hash(b, key_col, seed).astype(np.float64)
        w = b.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        pr = h / np.maximum(w, 1e-300)
        kk = min(n, len(pr))
        # (priority, key) sort — an argpartition cut would break priority
        # ties (duplicate keys) arbitrarily per batch; keys should be unique
        # for a total order, matching the twin's ORDER BY priority, tie
        keys = b.column(key_col).to_numpy(zero_copy_only=False)
        sel = np.lexsort((keys, pr))[:kk]
        out = b.take(pa.array(np.sort(sel)))
        return out.append_column("priority", pa.array(pr[np.sort(sel)]))

    cand = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .to_pandas())
    keys = cand[key_col].to_numpy()
    order = np.lexsort((keys, cand["priority"].to_numpy()))[:n]
    out = cand.iloc[np.sort(order)].drop(columns=["priority"])
    return _ray.data.from_pandas(out.reset_index(drop=True))


def sql_weighted_sample(*, table: str, key_expr: str, weight_expr: str,
                        n: int, select: str, seed: int = 0,
                        tie_expr: str | None = None, order_by: str) -> str:
    """DuckDB twin: identical hash (over the engine's string cast of the
    key — pass ``key_expr`` as VARCHAR), identical single division, same
    (priority, tie) order; ``tie_expr`` defaults to ``key_expr`` and should
    be the RAW key column so ties sort like the engine's native dtype."""
    h = sql_key_hash_expr(key_expr, seed=seed)
    tie = tie_expr or key_expr
    return f"""
WITH pr AS (
  SELECT *, (({h})::DOUBLE / greatest({weight_expr}, 1e-300)) AS priority
  FROM {table}
)
SELECT {select} FROM (
  SELECT * FROM pr ORDER BY priority, {tie} LIMIT {n}
) ORDER BY {order_by}
"""


def temperature_mixture_weights(
    ds: "ray.data.Dataset", group_col: str = "lang",
    alpha_num: int = 1, alpha_den: int = 2,
) -> pa.Table:
    """Temperature-based mixture reweighting (the mC4/XLM-R alpha-sampling
    rule, Conneau et al. 2020): given per-group doc counts ``c_g``, the
    training mixture weight is ``w_g = c_g^alpha / sum_h c_h^alpha`` with
    ``alpha = alpha_num/alpha_den`` (< 1 upsamples the tail). Emits one
    row per group: ``(group, n_docs, weight, boost)`` where ``boost =
    w_g / (c_g / N)`` is the up/down-sampling factor vs natural mixing
    (round-6 floats; alpha as a ratio so both sides compute pow on the
    same rationals).

    Scale shape: ONE group-bounded count groupby; the fold is driver
    arithmetic over the groups table."""
    from ray.data.aggregate import Count as _Count

    cnt = (ds.select_columns([group_col])
           .groupby(group_col).aggregate(_Count(alias_name="n_docs"))
           .to_pandas().sort_values(group_col).reset_index(drop=True))
    if cnt.empty:
        return pa.table({group_col: pa.array([], type=pa.string()),
                         "n_docs": pa.array([], type=pa.int64()),
                         "weight": pa.array([], type=pa.float64()),
                         "boost": pa.array([], type=pa.float64())})
    c = cnt["n_docs"].to_numpy(dtype=np.float64)
    alpha = alpha_num / alpha_den
    pw = c ** alpha
    w = pw / pw.sum()
    nat = c / c.sum()
    return pa.table({
        group_col: pa.array(cnt[group_col].astype(str), type=pa.string()),
        "n_docs": pa.array(cnt["n_docs"].to_numpy(dtype=np.int64)),
        "weight": pa.array(np.round(w, 6)),
        "boost": pa.array(np.round(w / nat, 6)),
    })
