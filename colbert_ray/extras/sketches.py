"""Mergeable sketches for cluster-scale approximate analytics.

HyperLogLog distinct counting (Flajolet/Fusy/Gandouet/Meunier 2007): the
canonical "partial per block → tiny merge" shape. Each ``map_batches`` task
reduces its batch to at most ``groups x m`` register rows (m = 2^p, 1024 by
default), the ONLY shuffle moves those partials (never keys), and the final
per-group estimate folds 1024 registers on the driver-side of a tiny grouped
result. At 100 TB the exchange volume is O(n_groups x m x n_blocks) ints —
independent of row count and key cardinality.

Determinism: the key hash is the repo's vectorized FNV-1a
(``functions/hashing.py`` — plain modular arithmetic, so DuckDB reproduces
it exactly), register folding is integer max, and the estimator's harmonic
denominator is accumulated in EXACT integer arithmetic (Σ 2^(RHO_MAX-m) as a
python int) so the float division happens ONCE on both the engine and SQL
sides — the estimate is hash-exact SQL-twinnable, not just "approximately
equal". Reference capability analog: corpus/statistics aggregation
(reference colbert/indexing/collection_indexer.py statistics pass); the
sketch itself is public-literature HLL.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max

from colbert_ray.functions.hashing import (
    U64_MOD,
    fmix64,
    fnv1a64_strings,
    sql_fmix64_expr,
    sql_fnv1a64_expr,
)

DEFAULT_P = 10                      # 1024 registers, ~3.25% rel. std. error


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_estimate(registers: np.ndarray, p: int = DEFAULT_P) -> float:
    """Fold one group's register vector (int64[m], 0 = empty) into the HLL
    cardinality estimate, with the standard small-range linear-counting
    correction. The harmonic sum Σ 2^-M_j is computed as an exact integer
    Σ 2^(w_bits - M_j) (python int — exceeds int64 by design), so the
    division is a single deterministic float64 op."""
    m = 1 << p
    w_bits = 64 - p
    assert len(registers) == m
    # exact integer denominator, scaled by 2^w_bits
    denom_scaled = sum(int(1) << (w_bits - int(r)) for r in registers)
    est = _alpha(m) * m * m * float(2 ** w_bits) / float(denom_scaled)
    v = int(np.count_nonzero(registers == 0))
    if est <= 2.5 * m and v > 0:
        est = m * math.log(m / v)
    return est


def hll_partials(ds: "ray.data.Dataset", key_col: str,
                 group_col: str | None = None,
                 p: int = DEFAULT_P) -> "ray.data.Dataset":
    """Per-batch HLL register partials ``(group?, reg, rho)`` — at most
    ``n_groups_in_batch x m`` rows per batch regardless of batch size."""
    w_bits = 64 - p
    w_mask = np.uint64((1 << w_bits) - 1)

    def partial(b: pa.Table) -> pa.Table:
        keys = b.column(key_col)
        if not (pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type)):
            keys = keys.cast(pa.string())
        # fmix64 after FNV: raw FNV bits are not uniform for short keys,
        # and the register index is a BIT FIELD of the hash — it needs
        # full avalanche (functions/hashing.py fmix64)
        h = fmix64(fnv1a64_strings(keys))
        reg = (h >> np.uint64(w_bits)).astype(np.int64)
        w = h & w_mask
        # rho = leading-zero count of the w_bits window + 1
        #     = w_bits - bit_length(w) + 1;  bit_length via log2 is UNSAFE
        # for w >= 2^53, so compute it by exponent extraction on uint64
        bl = np.zeros(len(w), dtype=np.int64)
        nz = w != 0
        # float64 conversion is exact for the TOP bit position: compare
        # against the power-of-two ladder instead of trusting log2 rounding
        wv = w[nz]
        bits = np.zeros(len(wv), dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            step = wv >= (np.uint64(1) << np.uint64(shift))
            bits[step] += shift
            wv = np.where(step, wv >> np.uint64(shift), wv)
        bl[nz] = bits + 1
        rho = (w_bits - bl + 1).astype(np.int64)
        if group_col is None:
            # dense per-batch combine: one register vector for the batch
            regs = np.zeros(1 << p, dtype=np.int64)
            np.maximum.at(regs, reg, rho)
            used = np.flatnonzero(regs)
            return pa.table({"reg": pa.array(used, type=pa.int64()),
                             "rho": pa.array(regs[used], type=pa.int64())})
        grp = b.column(group_col).to_numpy(zero_copy_only=False)
        gu, gi = np.unique(grp, return_inverse=True)
        regs = np.zeros((len(gu), 1 << p), dtype=np.int64)
        np.maximum.at(regs, (gi, reg), rho)
        gidx, ridx = np.nonzero(regs)
        return pa.table({group_col: pa.array(gu[gidx]),
                         "reg": pa.array(ridx.astype(np.int64)),
                         "rho": pa.array(regs[gidx, ridx])})

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)


def hll_distinct(ds: "ray.data.Dataset", key_col: str,
                 group_col: str | None = None,
                 p: int = DEFAULT_P) -> "pa.Table":
    """Approximate distinct ``key_col`` count (per ``group_col`` when given).

    Returns a small Arrow table ``(group?, est_distinct, n_used_registers)``
    — est_distinct rounded to 4 decimals (repo float policy)."""
    parts = hll_partials(ds, key_col, group_col, p)
    gcols = ([group_col] if group_col else []) + ["reg"]
    folded = parts.groupby(gcols).aggregate(Max("rho", alias_name="rho"))

    # the folded register table is <= n_groups x m rows — driver-small
    t = folded.to_pandas()
    m = 1 << p
    out_g, out_e, out_u = [], [], []
    for gval, sub in (t.groupby(group_col) if group_col
                      else [(None, t)]):
        regs = np.zeros(m, dtype=np.int64)
        regs[sub["reg"].to_numpy()] = sub["rho"].to_numpy()
        out_g.append(gval)
        out_e.append(round(hll_estimate(regs, p), 4))
        out_u.append(len(sub))
    cols = {}
    if group_col:
        cols[group_col] = pa.array(out_g)
    cols["est_distinct"] = pa.array(out_e, type=pa.float64())
    cols["n_used_registers"] = pa.array(out_u, type=pa.int64())
    return pa.table(cols)


def sql_hll_distinct_expr(*, table: str, key_expr: str,
                          group_col: str | None = None,
                          p: int = DEFAULT_P) -> str:
    """DuckDB twin of :func:`hll_distinct` — same FNV hash, same integer
    register fold, same exact-integer harmonic denominator, same
    linear-counting branch; estimate rounded to 4 decimals."""
    from colbert_ray.functions.hashing import sql_fmix64_expr, sql_fnv1a64_expr

    m = 1 << p
    w_bits = 64 - p
    alpha = _alpha(m)
    fnv = sql_fnv1a64_expr(key_expr)
    gsel = f"{group_col}, " if group_col else ""
    gby = f"GROUP BY {group_col}" if group_col else ""
    gord = f"ORDER BY {group_col}" if group_col else ""
    # bit_length(w) in exact integer arithmetic: count powers of two <= w
    return f"""
WITH h0 AS (SELECT {gsel}{fnv} AS x FROM {table}),
h AS (SELECT {gsel}{sql_fmix64_expr('x')} AS h FROM h0),
r AS (SELECT {gsel}(h // {1 << w_bits}::HUGEINT)::BIGINT AS reg,
             h % {1 << w_bits}::HUGEINT AS w
      FROM h),
pw(b) AS (SELECT unnest(generate_series(0, {w_bits - 1}))),
rho AS (SELECT {gsel}reg,
               -- rho = w_bits - bit_length(w) + 1; bit_length via the
               -- power ladder (exact integers, no float log2)
               max(CASE WHEN w = 0 THEN {w_bits + 1}
                        ELSE {w_bits} + 1 - (SELECT count(*) FROM pw
                                             WHERE (2::HUGEINT ** pw.b) <= r.w)::BIGINT
                   END) AS rho
        FROM r GROUP BY {gsel}reg),
est AS (SELECT {gsel}
               count(*) AS n_used,
               -- ** yields DOUBLE; terms are 2^k, k <= {w_bits} (exact in
               -- float64) — cast back so the SUM itself is exact HUGEINT
               sum(CAST(2 ** ({w_bits} - rho) AS HUGEINT)) AS denom_used
        FROM rho {gby})
SELECT {gsel}
       CASE WHEN {alpha!r}::DOUBLE * {m} * {m} * {2 ** w_bits}::DOUBLE /
                 (denom_used + ({m} - n_used) * {1 << w_bits}::HUGEINT)::DOUBLE
                 <= 2.5 * {m} AND n_used < {m}
            THEN round({m} * ln({m}::DOUBLE / ({m} - n_used)), 4)
            ELSE round({alpha!r}::DOUBLE * {m} * {m} * {2 ** w_bits}::DOUBLE /
                       (denom_used + ({m} - n_used) * {1 << w_bits}::HUGEINT)::DOUBLE, 4)
       END AS est_distinct,
       n_used AS n_used_registers
FROM est {gord}
"""


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — frequency estimation
# ---------------------------------------------------------------------------
# Same mergeable-partial shape as HLL: each batch reduces to <= depth x width
# (d, bucket, count) rows, the only shuffle moves those partials, and the
# final sketch is a depth x width table. Estimates overcount (never under):
# est(k) = min over rows of the row's bucket count. All hashing is the
# repo's FNV-1a + fmix64 with an ADDITIVE per-row seed (d * golden mod 2^64)
# so the DuckDB twin reproduces every bucket — and hence every estimate —
# exactly.

CM_DEPTH = 3
CM_WIDTH = 64
_CM_GOLDEN = 0x9E3779B97F4A7C15


def _cm_seed(d: int) -> int:
    return (d * _CM_GOLDEN) % (1 << 64)


def cm_buckets(keys_u64: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) bucket index of each key hash in each sketch row."""
    out = np.empty((depth, len(keys_u64)), dtype=np.int64)
    for d in range(depth):
        h = fmix64(keys_u64 + np.uint64(_cm_seed(d)))
        out[d] = (h % np.uint64(width)).astype(np.int64)
    return out


def _as_string_u64(keys) -> np.ndarray:
    if not (pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type)):
        keys = keys.cast(pa.string())
    return fnv1a64_strings(keys)


def count_min_sketch(ds: "ray.data.Dataset", key_col: str,
                     depth: int = CM_DEPTH, width: int = CM_WIDTH) -> np.ndarray:
    """Build the (depth, width) int64 Count-Min table over ``key_col``."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        f = _as_string_u64(b.column(key_col))
        bk = cm_buckets(f, depth, width)
        ds_out, bs_out, cs_out = [], [], []
        for d in range(depth):
            c = np.bincount(bk[d], minlength=width)
            used = np.flatnonzero(c)
            ds_out.append(np.full(len(used), d, dtype=np.int64))
            bs_out.append(used.astype(np.int64))
            cs_out.append(c[used].astype(np.int64))
        return pa.table({"d": np.concatenate(ds_out) if ds_out else
                         np.empty(0, dtype=np.int64),
                         "bucket": np.concatenate(bs_out) if bs_out else
                         np.empty(0, dtype=np.int64),
                         "c_p": np.concatenate(cs_out) if cs_out else
                         np.empty(0, dtype=np.int64)})

    folded = (ds.select_columns([key_col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(["d", "bucket"])
              .aggregate(Sum("c_p", alias_name="c"))).to_pandas()
    sk = np.zeros((depth, width), dtype=np.int64)
    sk[folded["d"].to_numpy(), folded["bucket"].to_numpy()] = \
        folded["c"].to_numpy()
    return sk


def cm_estimate(sketch: np.ndarray, keys) -> np.ndarray:
    """Point-query the sketch for an Arrow string array / list of keys:
    int64 estimates (>= true counts, hash-exact deterministic)."""
    depth, width = sketch.shape
    if not isinstance(keys, (pa.Array, pa.ChunkedArray)):
        keys = pa.array([str(k) for k in keys], type=pa.string())
    f = _as_string_u64(keys)
    bk = cm_buckets(f, depth, width)
    ests = sketch[np.arange(depth)[:, None], bk]
    return ests.min(axis=0)


def sql_count_min_expr(*, table: str, key_expr: str, probe_cte: str,
                       probe_key_expr: str, depth: int = CM_DEPTH,
                       width: int = CM_WIDTH) -> str:
    """DuckDB twin: builds the same sketch over ``table`` and point-queries
    it for every row of ``probe_cte`` (a CTE named ``probe`` whose rows keep
    their columns; the estimate is added as ``cm_est``). Same FNV + additive
    seed + fmix64 + mod-width bucketing — estimates are hash-exact."""
    fnv = sql_fnv1a64_expr(key_expr)
    pfnv = sql_fnv1a64_expr(probe_key_expr)
    mod = U64_MOD

    def bucket(f_expr: str) -> str:
        seeded = f"((({f_expr}) + (d.d::HUGEINT * {_CM_GOLDEN}::HUGEINT) " \
                 f"% {mod}::HUGEINT) % {mod}::HUGEINT)"
        return f"({sql_fmix64_expr(seeded)} % {width}::HUGEINT)::BIGINT"

    return f"""
WITH dser(d) AS (SELECT unnest(generate_series(0, {depth - 1}))),
kf AS (SELECT {fnv} AS f FROM {table}),
sk AS (
  SELECT d.d AS d, {bucket('kf.f')} AS bucket, count(*)::BIGINT AS c
  FROM kf, dser d GROUP BY 1, 2
),
probe AS ({probe_cte}),
pb AS (
  SELECT probe.*, d.d AS d, {bucket(f'({pfnv})')} AS bucket
  FROM probe, dser d
)
SELECT joined.* EXCLUDE (d, bucket, c), min(c) AS cm_est
FROM (SELECT pb.*, sk.c FROM pb
      JOIN sk ON sk.d = pb.d AND sk.bucket = pb.bucket) joined
GROUP BY ALL
"""


# ---------------------------------------------------------------------------
# Exact heavy hitters in two streaming passes (frequent-items lemma)
# ---------------------------------------------------------------------------
# Classic candidates-then-count scheme (Misra-Gries 1982 family): pass 1
# keeps, per batch, only terms whose IN-BATCH token count c_b satisfies
# c_b * capacity > N_b (N_b = batch token total). Superset guarantee: if a
# term's GLOBAL count C satisfies C * capacity > N, then by the pigeonhole
# contrapositive (all c_b <= N_b/capacity would force C <= N/capacity) at
# least one batch crosses its local threshold — so the candidate union
# contains every true heavy hitter REGARDLESS of how Ray blocks the input.
# Pass 2 exact-counts only the (small, broadcast) candidate set, so the
# final output is EXACT and deterministic even though the intermediate
# candidate set depends on block boundaries. Exchange volume: pass 1 moves
# <= capacity rows per batch; pass 2 moves <= |candidates|+1 rows per batch
# — the corpus text never shuffles.


def _batch_term_counts(texts, cfg) -> tuple:
    """(unique term StringArray, int64 counts, batch token total) for one
    batch — tf-weighted bincount over dictionary-encoded flat terms."""
    from colbert_ray.functions.tokenizer import doc_term_frequencies

    dl, terms, tfs = doc_term_frequencies(texts, cfg)
    flat = terms.values
    w = tfs.values.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return flat, np.empty(0, dtype=np.int64), 0
    enc = flat.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = np.bincount(idx, weights=w, minlength=len(enc.dictionary)).astype(np.int64)
    return enc.dictionary, cnt, int(dl.sum())


def frequent_terms(ds: "ray.data.Dataset", text_col: str = "text",
                   capacity: int = 128) -> "pa.Table":
    """EXACT set of terms whose corpus-wide token count ``C`` satisfies
    ``C * capacity > N`` (N = total tokens), i.e. frequency > 1/capacity,
    via the two-pass candidates-then-count scheme above. Returns a small
    Arrow table ``(term, cnt)`` sorted by term."""
    from colbert_ray.config import EngineConfig

    cfg = EngineConfig()
    text_ds = ds.select_columns([text_col])

    def local_candidates(b: pa.Table) -> pa.Table:
        terms, cnt, total = _batch_term_counts(b.column(text_col), cfg)
        keep = cnt * capacity > total
        return pa.table({"term": terms.filter(pa.array(keep))})

    # candidate union is <= capacity rows/batch; groupby dedups it without
    # ever shuffling corpus rows
    cand = (text_ds.map_batches(local_candidates, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("term").count().to_pandas())
    if cand.empty:
        # no batch crossed its local threshold => no term can cross the
        # global one (the superset lemma) — skip pass 2 entirely
        return pa.table({"term": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    cand_terms = pa.array(sorted(cand["term"].tolist()), type=pa.string())
    n_cand = len(cand_terms)

    def exact_counts(b: pa.Table) -> pa.Table:
        # candidate-set counts + one sentinel row (idx -1) carrying the
        # batch token total, so N rides the same tiny exchange
        terms, cnt, total = _batch_term_counts(b.column(text_col), cfg)
        pos = pa.compute.index_in(terms, value_set=cand_terms)
        hit = pos.is_valid().to_numpy(zero_copy_only=False)
        idxs = pa.compute.fill_null(pos, 0).to_numpy(
            zero_copy_only=False).astype(np.int64)[hit]
        return pa.table({
            "term_idx": np.concatenate([idxs, [-1]]),
            "cnt_p": np.concatenate([cnt[hit], [total]]).astype(np.int64),
        })

    from ray.data.aggregate import Sum

    folded = (text_ds.map_batches(exact_counts, batch_format="pyarrow",
                                  zero_copy_batch=True)
              .groupby("term_idx")
              .aggregate(Sum("cnt_p", alias_name="cnt"))).to_pandas()
    by_idx = dict(zip(folded["term_idx"].astype(int), folded["cnt"].astype(int)))
    n_total = by_idx.pop(-1, 0)
    out_t, out_c = [], []
    for i in range(n_cand):
        c = by_idx.get(i, 0)
        if c * capacity > n_total:
            out_t.append(cand_terms[i].as_py())
            out_c.append(c)
    return pa.table({"term": pa.array(out_t, type=pa.string()),
                     "cnt": pa.array(out_c, type=pa.int64())})


def sql_frequent_terms_expr(*, table: str, text_col: str = "text",
                            capacity: int = 128) -> str:
    """DuckDB twin of :func:`frequent_terms` — the exact global definition
    (the two-pass scheme is an execution strategy, not a semantics change)."""
    from colbert_ray.config import EngineConfig
    from colbert_ray.functions.tokenizer import sql_tokenize_expr

    tok = sql_tokenize_expr(text_col, EngineConfig())
    return f"""
WITH toks AS (SELECT unnest({tok}) AS term FROM {table}),
tot AS (SELECT count(*)::BIGINT AS n FROM toks)
SELECT term, count(*)::BIGINT AS cnt
FROM toks GROUP BY term
HAVING count(*) * {capacity} > (SELECT n FROM tot)
ORDER BY term
"""


# ---------------------------------------------------------------------------
# fixed-width histogram + histogram quantiles (the deterministic, mergeable
# approximate-quantile sketch: per-batch bincount partials sum associatively,
# so the result is identical at any parallelism — and exactly SQL-expressible,
# unlike randomized t-digest/KLL)
# ---------------------------------------------------------------------------

def histogram(ds: "ray.data.Dataset", col: str, lo: float, hi: float,
              n_bins: int = 64) -> np.ndarray:
    """int64[n_bins + 2] counts over fixed-width bins of [lo, hi):
    slot 0 = underflow (< lo), slots 1..n_bins = bins, slot n_bins+1 =
    overflow (>= hi). Bin rule matches DuckDB width_bucket(v, lo, hi, n):
    bucket i covers [lo + (i-1)*w, lo + i*w).

    One streaming pass: each batch reduces to an (n_bins+2)-long partial
    (np.bincount over the bucket index), partials sum on the driver —
    a few hundred ints per batch regardless of data size."""
    w = (float(hi) - float(lo)) / n_bins

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        # width_bucket semantics: 0 underflow, n_bins+1 overflow
        idx = np.floor((v - lo) / w).astype(np.int64) + 1
        idx = np.clip(idx, 0, n_bins + 1)
        idx[v < lo] = 0
        idx[v >= hi] = n_bins + 1
        cnt = np.bincount(idx, minlength=n_bins + 2).astype(np.int64)
        return pa.table({"h": pa.array([cnt.tobytes()], type=pa.binary())})

    total = np.zeros(n_bins + 2, dtype=np.int64)
    for b in ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        for blob in b.column("h").to_pylist():
            total += np.frombuffer(blob, dtype=np.int64)
    return total


def histogram_quantiles(ds: "ray.data.Dataset", col: str, lo: float,
                        hi: float, qs: list[float],
                        n_bins: int = 64):
    """Histogram-sketch quantile estimates: for quantile q, the LOWER EDGE
    of the first bucket where the cumulative count reaches
    ceil(q * n_inside) (counting only values inside [lo, hi); under/overflow
    are reported separately). Max rank error = one bucket width by
    construction. Returns (list of (q, est), n_under, n_inside, n_over)."""
    h = histogram(ds, col, lo, hi, n_bins)
    inside = h[1:n_bins + 1]
    n_inside = int(inside.sum())
    cum = np.cumsum(inside)
    w = (float(hi) - float(lo)) / n_bins
    out = []
    for q in qs:
        if n_inside == 0:
            out.append((q, float(lo)))
            continue
        target = int(np.ceil(q * n_inside))
        target = max(target, 1)
        b = int(np.searchsorted(cum, target))      # first bucket reaching it
        out.append((q, float(lo) + b * w))
    return out, int(h[0]), n_inside, int(h[-1])
