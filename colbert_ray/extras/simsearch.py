"""Similarity search over an embedding column (``list<float>``).

- ``knn_cosine``: exact brute-force top-k — numpy matmul per batch against a
  broadcast query matrix (``ray.put`` once, read per actor), per-batch
  partial top-k, then a tiny per-query merge. The baseline/oracle path.
- ``ivf_knn``: IVF-bucketed approximate variant — deterministic centroids
  (seeded), assign via argmax cosine inside ``map_batches``, probe the top
  ``nprobe`` buckets per query. The scale path (reference capability analog:
  PLAID centroid candidate generation, ``candidate_generation.py:12-37``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-30)


def _stack(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col).combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return flat.reshape(-1, dim)


def knn_cosine(
    ds: "ray.data.Dataset",
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """Exact top-k cosine neighbors for each query vector.

    Output rows: (qid, vec_id, rank, cosine) — rank 1..k by
    (-cosine, vec_id), exact float64.
    """
    qm = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    ref = ray.put((qm, qids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q, qi = ray.get(ref)
        m = _normalize(_stack(batch, vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sims = q @ m.T                                    # (nq, nb)
        if exclude_self:
            mask = qi[:, None] == ids[None, :]
            sims = np.where(mask, -np.inf, sims)
        kk = min(k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        for r in range(sims.shape[0]):
            row = sims[r]
            # partial select per batch; exact merge happens in the reduce
            sel = np.argpartition(-row, kk - 1)[:kk] if len(row) > kk else np.arange(len(row))
            sel = sel[np.lexsort((ids[sel], -row[sel]))]
            out_q.append(np.full(len(sel), qi[r], dtype=np.int64))
            out_id.append(ids[sel])
            out_s.append(row[sel])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", id_col, "rank", "cosine"]]

    return (
        ds.select_columns([id_col, vec_col])
        .map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")
        .map_groups(merge_topk, batch_format="pandas")
    )


def kmeans_core(m: np.ndarray, n_centroids: int = 16, n_iter: int = 10,
                seed: int = 123) -> np.ndarray:
    """Pure-numpy seeded spherical k-means over an ALREADY-normalized float64
    matrix — shared by the Ray training path and the SQL-oracle centroid
    computation so both sides get bit-identical centroids."""
    rng = np.random.default_rng(seed)
    c = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(m @ c.T, axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, assign, m)
        counts = np.bincount(assign, minlength=len(c)).astype(np.float64)
        nonempty = counts > 0
        c = np.where(nonempty[:, None], sums, c)
        c = _normalize(c)
    return c


def train_kmeans_centroids(
    ds: "ray.data.Dataset",
    n_centroids: int = 16,
    vec_col: str = "embedding",
    train_size: int = 16384,
    n_iter: int = 10,
    seed: int = 123,
) -> np.ndarray:
    """Spherical k-means on a bounded sample (the reference trains its IVF
    centroids on a heldout sample with seed 123,
    ``collection_indexer.py:500-517``). Deterministic: seeded init from the
    first ``train_size`` rows (stable read order), fixed Lloyd iterations,
    empty clusters keep their previous centroid."""
    sample = ds.select_columns([vec_col]).limit(train_size).to_pandas()
    m = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    return kmeans_core(m, n_centroids, n_iter=n_iter, seed=seed)


def _assign_buckets(m_norm: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment on the ROUNDED cosine (float policy:
    6-decimal rounding before the argmax, ties to the lowest centroid id) so
    numpy and the DuckDB oracle make identical bucket decisions."""
    return np.argmax(np.round(m_norm @ centroids.T, 6), axis=1)


def _probe_buckets(qm: np.ndarray, centroids: np.ndarray,
                   nprobe: int) -> np.ndarray:
    """Top-``nprobe`` buckets per query on the ROUNDED cosine (stable sort:
    ties to the lowest centroid id) — same float policy as assignment."""
    d = np.round(qm @ centroids.T, 6)
    return np.argsort(-d, axis=1, kind="stable")[:, :nprobe]


def ivf_knn(
    ds: "ray.data.Dataset",
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """Approximate IVF top-k: TRAINED spherical-k-means centroids (seeded,
    deterministic), coarse-assign each vector to its nearest centroid in a
    map_batches pass, then score queries only against vectors in their
    ``nprobe`` closest buckets (PLAID centroid candidate-generation analog,
    ``candidate_generation.py:12-37``). Recall vs exact knn is gated in
    pytest (recall@5 >= 0.9 at nprobe=4 on the test embeddings)."""
    qm = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    if centroids is None:
        centroids = train_kmeans_centroids(ds, n_centroids, vec_col=vec_col)
    centroids = np.asarray(centroids, dtype=np.float64)
    probe = _probe_buckets(qm, centroids, nprobe)          # (nq, nprobe)
    ref = ray.put((qm, qids, centroids, probe))

    def bucket_score(batch: pa.Table) -> pa.Table:
        q, qi, cents, prb = ray.get(ref)
        m = _normalize(_stack(batch, vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        assign = _assign_buckets(m, cents)                 # coarse bucket
        out_q, out_id, out_s = [], [], []
        for r in range(q.shape[0]):
            sel = np.isin(assign, prb[r]) & (ids != qi[r])
            if not sel.any():
                continue
            sims = q[r] @ m[sel].T
            sids = ids[sel]
            kk = min(k, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk] if len(sims) > kk else np.arange(len(sims))
            top = top[np.lexsort((sids[top], -sims[top]))]
            out_q.append(np.full(len(top), qi[r], dtype=np.int64))
            out_id.append(sids[top])
            out_s.append(sims[top])
        if not out_q:
            return pa.table({"qid": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({"qid": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_id)),
                         "cosine": pa.array(np.concatenate(out_s))})

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", id_col, "rank", "cosine"]]

    return (
        ds.select_columns([id_col, vec_col])
        .map_batches(bucket_score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")
        .map_groups(merge_topk, batch_format="pandas")
    )


def build_ann_index(
    ds: "ray.data.Dataset",
    out_dir: str,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_size: int = 16384,
    seed: int = 123,
) -> dict:
    """Persist an IVF index: trained centroids + vectors written as parquet
    HIVE-PARTITIONED BY BUCKET, so a probe reads only its nprobe/n_centroids
    share of the data from storage (parquet partition pruning — the ANN
    analog of the BM25 build/serve split; at scale, re-assigning the corpus
    per query batch is the anti-pattern this replaces)."""
    import json

    import pyarrow.parquet as pq_

    centroids = train_kmeans_centroids(ds, n_centroids, vec_col=vec_col,
                                       train_size=train_size, seed=seed)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _normalize(_stack(batch, vec_col))
        bucket = _assign_buckets(m, c).astype(np.int32)
        # "bucket" becomes the hive partition (stripped from file rows);
        # "bucket_id" stays in the rows so leaf-directory reads keep it
        return pa.table({
            id_col: batch.column(id_col),
            vec_col: batch.column(vec_col),
            "bucket": pa.array(bucket),
            "bucket_id": pa.array(bucket.astype(np.int64)),
        })

    os.makedirs(out_dir, exist_ok=True)
    (ds.select_columns([id_col, vec_col])
       .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
       .write_parquet(os.path.join(out_dir, "buckets"),
                      partition_cols=["bucket"], mode="overwrite"))
    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    manifest = {"n_centroids": int(len(centroids)),
                "dim": int(centroids.shape[1]),
                "vec_col": vec_col, "id_col": id_col, "seed": seed}
    with open(os.path.join(out_dir, "ann_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def ann_search(
    index_dir: str,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
) -> "ray.data.Dataset":
    """Top-k over a persisted IVF index: only the union of every query's
    ``nprobe`` closest buckets is READ (hive partition filter — the other
    buckets never leave storage); scoring is the same broadcast-queries /
    per-batch-partial-top-k / tiny-merge shape as ``knn_cosine``."""
    import json

    with open(os.path.join(index_dir, "ann_manifest.json")) as f:
        man = json.load(f)
    id_col, vec_col = man["id_col"], man["vec_col"]
    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    qm = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    probe = _probe_buckets(qm, centroids, nprobe)
    needed = sorted({int(b) for row in probe for b in row})
    ref = ray.put((qm, qids, probe))

    # path-level partition pruning: only the probed buckets' files are
    # ever opened (absent buckets simply have no directory)
    import glob as _glob

    paths = [f for b in needed
             for f in sorted(_glob.glob(os.path.join(
                 index_dir, "buckets", f"bucket={b}", "*.parquet")))]
    ds = ray.data.read_parquet(paths)

    def score(batch: pa.Table) -> pa.Table:
        q, qi, prb = ray.get(ref)
        m = _normalize(_stack(batch, vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = batch.column("bucket_id").to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_id, out_s = [], [], []
        for r in range(q.shape[0]):
            sel = np.isin(bucket, prb[r]) & (ids != qi[r])
            if not sel.any():
                continue
            sims = q[r] @ m[sel].T
            sids = ids[sel]
            kk = min(k, len(sims))
            top = (np.argpartition(-sims, kk - 1)[:kk]
                   if len(sims) > kk else np.arange(len(sims)))
            top = top[np.lexsort((sids[top], -sims[top]))]
            out_q.append(np.full(len(top), qi[r], dtype=np.int64))
            out_id.append(sids[top])
            out_s.append(sims[top])
        if not out_q:
            return pa.table({"qid": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({"qid": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_id)),
                         "cosine": pa.array(np.concatenate(out_s))})

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", id_col, "rank", "cosine"]]

    return (ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
              .groupby("qid").map_groups(merge_topk, batch_format="pandas"))


def embedding_dup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.98,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_id: int | None = None,
) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= thr).

    Broadcast the (bounded) reference matrix, compare each batch against it —
    the embedding analog of jaccard near-dup."""
    if max_id is not None:
        ds = ds.filter(expr=f"{id_col} < {max_id}")
    ref_tbl = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = ref_tbl[id_col].to_numpy(dtype=np.int64)
    mat = _normalize(np.stack(ref_tbl[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        r_ids, r_m = ray.get(ref)
        m = _normalize(_stack(batch, vec_col))
        b_ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # threshold on the ROUNDED cosine (float policy: both engine and
        # oracle compare 6-decimal-rounded values, so summation-order ulps
        # cannot flip a pair's membership)
        sims = np.round(m @ r_m.T, 6)
        bi, ri = np.nonzero((sims >= threshold) & (b_ids[:, None] < r_ids[None, :]))
        return pa.table({"id_a": pa.array(b_ids[bi]),
                         "id_b": pa.array(r_ids[ri]),
                         "cosine": pa.array(sims[bi, ri])})

    return ds.select_columns([id_col, vec_col]).map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True
    )


def embedding_covariance(ds: "ray.data.Dataset",
                         col: str = "embedding") -> dict:
    """Distributed mean + population covariance of an embedding column —
    the PCA / whitening / drift-detection building block.

    Scale shape: each batch reduces to ONE d x d Gram partial + a sum
    vector + a count (emitted as (i, j, s) rows, d(d+1)/2 + d + 1 per
    batch); the only shuffle moves those partials and the driver folds a
    d x d matrix — corpus size never leaves the map side. Returns
    ``{"n", "mean" (d,), "cov" (d, d)}``; cov uses the textbook
    E[xy] - E[x]E[y] form (same expression as the SQL twin) rounded to 6
    decimals."""
    from ray.data.aggregate import Sum as RSum

    def partial(b: pa.Table) -> pa.Table:
        m = _stack(b, col)
        n, d = m.shape
        iu, ju = np.triu_indices(d)
        ss = (m.T @ m)[iu, ju]
        i_out = np.concatenate([iu, np.arange(d), [-1]])
        j_out = np.concatenate([ju, np.full(d, -1), [-1]])
        s_out = np.concatenate([ss, m.sum(axis=0), [float(n)]])
        return pa.table({"i": i_out.astype(np.int64),
                         "j": j_out.astype(np.int64),
                         "s": s_out.astype(np.float64)})

    t = (ds.select_columns([col])
         .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
         .groupby(["i", "j"]).aggregate(RSum("s", alias_name="s"))
         .to_pandas())
    i = t["i"].to_numpy()
    j = t["j"].to_numpy()
    s = t["s"].to_numpy()
    n = float(s[(i == -1) & (j == -1)][0])
    d = int(i.max()) + 1
    mean = np.zeros(d)
    sums = (i >= 0) & (j == -1)
    mean[i[sums]] = s[sums] / n
    cov = np.zeros((d, d))
    prods = (i >= 0) & (j >= 0)
    cov[i[prods], j[prods]] = s[prods] / n
    cov = np.triu(cov) + np.triu(cov, 1).T
    cov = np.round(cov - np.outer(mean, mean), 6)
    return {"n": int(n), "mean": mean, "cov": cov}


def pca_project(ds: "ray.data.Dataset", k: int,
                col: str = "embedding", id_col: str = "vec_id",
                moments: dict | None = None) -> "ray.data.Dataset":
    """Project embeddings onto their top-k principal components:
    (id_col, "pca" list<double>). The d x d eigendecomposition runs on the
    driver (d is the embedding width, never the corpus); the centered
    projection matrix is broadcast once via ``ray.put`` and the corpus
    STREAMS through a stateless matmul pass. Component sign is fixed
    deterministically (largest-|coeff| entry made positive) so output is
    reproducible across BLAS builds."""
    import ray as _ray

    mo = moments if moments is not None else embedding_covariance(ds, col)
    w, v = np.linalg.eigh(mo["cov"])
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]                          # (d, k)
    sign_fix = np.sign(comps[np.abs(comps).argmax(axis=0),
                             np.arange(comps.shape[1])])
    comps = comps * np.where(sign_fix == 0, 1.0, sign_fix)
    ref = _ray.put((mo["mean"], comps))

    def project(b: pa.Table) -> pa.Table:
        mean, c = _ray.get(ref)
        m = _stack(b, col)
        p = (m - mean) @ c
        return pa.table({id_col: b.column(id_col),
                         "pca": pa.array(list(map(list, p)),
                                         type=pa.list_(pa.float64()))})

    return ds.select_columns([id_col, col]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True)


def quantize_int8(ds: "ray.data.Dataset",
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> "ray.data.Dataset":
    """Per-vector symmetric int8 scalar quantization — the ANN scale path's
    4x storage/broadcast reduction: (id_col, q list<int8>, scale double).

    scale = max|x| / 127; q = floor(x/scale + 0.5) (half-up — chosen over
    numpy's half-to-even rint precisely because ``floor(v + 0.5)`` is
    reproducible in SQL, keeping the codes oracle-checkable bit-exactly).
    |q| <= 127 by construction; an all-zero vector gets q = 0, scale = 0.
    Stateless map_batches — the corpus streams."""

    def qb(b: pa.Table) -> pa.Table:
        m = _stack(b, vec_col)
        amax = np.abs(m).max(axis=1) if m.shape[1] else np.zeros(len(b))
        scale = amax / 127.0
        safe = np.where(scale == 0, 1.0, scale)
        q = np.floor(m / safe[:, None] + 0.5)
        q = np.where(scale[:, None] == 0.0, 0.0, q).astype(np.int8)
        return pa.table({id_col: b.column(id_col),
                         "q": pa.array(list(q), type=pa.list_(pa.int8())),
                         "scale": pa.array(scale, type=pa.float64())})

    return ds.select_columns([id_col, vec_col]).map_batches(
        qb, batch_format="pyarrow", zero_copy_batch=True)


def knn_cosine_q8(
    ds: "ray.data.Dataset",
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """Top-k QUANTIZED cosine neighbors: both sides are int8-quantized and
    the cosine is computed over the integer codes (the per-vector scale is
    positive, so it cancels out of the cosine exactly).

    Every arithmetic step is integer-exact in float64 (|q| <= 127, so dot
    products and squared norms are exact integers far below 2^53), and the
    final ``dot / (sqrt(n_a) * sqrt(n_b))`` uses the same operation order as
    the SQL twin — quantized scores are bit-reproducible, unlike the
    float-accumulation exact-kNN path. Zero-norm vectors are excluded (a
    zero code has no direction). Same partial-top-k / tiny-merge shape as
    ``knn_cosine``."""
    qm = np.asarray(query_vecs, dtype=np.float64)
    amax = np.abs(qm).max(axis=1)
    qscale = np.where(amax == 0, 1.0, amax / 127.0)
    qq = np.floor(qm / qscale[:, None] + 0.5)
    qq = np.where(amax[:, None] == 0.0, 0.0, qq)
    qnorm = np.sqrt((qq * qq).sum(axis=1))
    qids = np.asarray(query_ids, dtype=np.int64)
    ref = ray.put((qq, qnorm, qids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q, qn, qi = ray.get(ref)
        m = _stack(batch, vec_col)
        da = np.abs(m).max(axis=1) if m.shape[1] else np.zeros(len(batch))
        ds_ = np.where(da == 0, 1.0, da / 127.0)
        dq = np.floor(m / ds_[:, None] + 0.5)
        dq = np.where(da[:, None] == 0.0, 0.0, dq)
        dn = np.sqrt((dq * dq).sum(axis=1))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sims = (q @ dq.T) / (qn[:, None] * dn[None, :])
        sims = np.where((dn[None, :] == 0) | (qn[:, None] == 0), -np.inf, sims)
        if exclude_self:
            sims = np.where(qi[:, None] == ids[None, :], -np.inf, sims)
        kk = min(k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        for r in range(sims.shape[0]):
            row = sims[r]
            # full (-cosine, id) sort, NOT argpartition: quantized scores tie
            # easily (near-dups quantize identically), and an argpartition
            # cut would drop tie members arbitrarily — the id tie-break must
            # decide the cut exactly as the SQL twin's row_number does
            sel = np.lexsort((ids, -row))[:kk]
            sel = sel[np.isfinite(row[sel])]
            out_q.append(np.full(len(sel), qi[r], dtype=np.int64))
            out_id.append(ids[sel])
            out_s.append(row[sel])
        return pa.table({
            "qid": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "cosine": pa.array(np.concatenate(out_s)),
        })

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", id_col, "rank", "cosine"]]

    return (
        ds.select_columns([id_col, vec_col])
        .map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")
        .map_groups(merge_topk, batch_format="pandas")
    )


def mmr_diversify(
    ds: "ray.data.Dataset",
    candidates: "pd.DataFrame",
    k: int = 5,
    lam: float = 0.7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rel_col: str = "rel",
) -> "pd.DataFrame":
    """Maximal-marginal-relevance re-ranking of per-query candidate lists.

    ``candidates``: (qid, vec_id, rel) — rel is the ROUNDED (6 dp) query
    similarity. Float policy: the INPUTS (rel, pairwise sims) are rounded
    6 dp, the score itself is NOT re-rounded — both sides compute
    lam*rel - (1-lam)*maxsim from identical rounded doubles with identical
    IEEE arithmetic, so scores are bit-equal (a final round() would
    re-introduce the half-boundary ambiguity: 0.7 x a 6-dp decimal ends
    in ...5, where numpy rounds half-even and SQL half-away).
    Greedy MMR (Carbonell & Goldstein 1998):

        score(c) = lam * rel(c) - (1-lam) * max over selected s of sim(c, s)

    (empty selected set -> the subtrahend is 0). Scale shape: candidate
    sets are BOUNDED (n_queries x n_cand), so candidate vectors come back
    through a broadcast semi-join over the streaming embeddings table and
    the greedy loop runs on the driver over k x n_cand rounded floats —
    the corpus is never touched beyond the semi-join.
    """
    from colbert_ray.functions.util import broadcast_semi_join

    vec_rows = broadcast_semi_join(
        ds.select_columns([id_col, vec_col]),
        candidates["vec_id"].to_numpy(dtype=np.int64), id_col).to_pandas()
    vecs = _normalize(np.stack(
        vec_rows[vec_col].to_numpy()).astype(np.float64))
    row_of = {int(i): r for r, i in enumerate(vec_rows[id_col].to_numpy())}

    out = {"qid": [], "vec_id": [], "rank": [], "mmr_score": []}
    for qid, g in candidates.groupby("qid"):
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        rel = g[rel_col].to_numpy(dtype=np.float64)
        m = vecs[[row_of[int(i)] for i in ids]]
        sims = np.round(m @ m.T, 6)                 # rounded pairwise
        chosen: list[int] = []
        avail = np.ones(len(ids), dtype=bool)
        for r in range(min(k, len(ids))):
            if chosen:
                maxsim = sims[:, chosen].max(axis=1)
            else:
                maxsim = np.zeros(len(ids))
            score = lam * rel - (1.0 - lam) * maxsim
            # argmax by (score desc, vec_id asc) over available candidates
            best = max(np.flatnonzero(avail),
                       key=lambda i: (score[i], -int(ids[i])))
            chosen.append(best)
            avail[best] = False
            out["qid"].append(int(qid))
            out["vec_id"].append(int(ids[best]))
            out["rank"].append(r + 1)
            out["mmr_score"].append(float(score[best]))

    import pandas as pd

    res = pd.DataFrame(out)
    res["rank"] = res["rank"].astype(np.int64)
    return res.sort_values(["qid", "rank"]).reset_index(drop=True)


def rp_lsh_planes(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic Rademacher (+-1) hyperplanes from the shared fmix64
    hash — r[j,k] = +1 iff fmix64(j*dim + k + 1) is even. Integer planes
    over int8 codes keep every signature bit EXACT (no float dot whose
    summation order could flip a near-zero sign), and the construction is
    reproducible in SQL via sql_fmix64_expr."""
    from colbert_ray.functions.hashing import fmix64

    idx = np.arange(n_planes * dim, dtype=np.uint64) + np.uint64(1)
    bits = (fmix64(idx) & np.uint64(1)) == 0
    return np.where(bits, 1, -1).astype(np.int64).reshape(n_planes, dim)


def rp_lsh_dup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.9,
    n_planes: int = 32,
    n_bands: int = 8,
    max_id: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "pd.DataFrame":
    """Near-duplicate pairs via random-hyperplane LSH over int8-quantized
    codes — the embedding complement of MinHash+LSH (the brief's
    "LSH-bucketed variant as the scale path"):

    1. stream: per batch, quantize (the bit-exact half-up int8 rule) and
       sign-hash against the +-1 planes — INTEGER dots, so signatures are
       exact; emit (band, key, vec_id) rows only;
    2. bucket groupby: same (band, key) -> candidate pairs (a < b);
    3. verify candidates with the quantized cosine (same dot/(sqrt*sqrt)
       operation order as knn_cosine_q8 — bit-reproducible) >= threshold.

    Like MinHash, recall is probabilistic (banding); the pytest gate
    measures it against the exact all-pairs ground truth. ``max_id``
    bounds the verify broadcast (the embedding_dup_pairs convention);
    at scale the verify becomes a join against the codes table keyed by
    candidate id — the shape is already pair-driven.
    Output: (id_a, id_b, cosine_r) sorted, exact-distinct.
    """
    import pandas as pd

    bits_per_band = n_planes // n_bands
    assert bits_per_band * n_bands == n_planes

    def _codes(b: pa.Table):
        m = _stack(b, vec_col)
        amax = np.abs(m).max(axis=1) if m.shape[1] else np.zeros(len(b))
        scale = amax / 127.0
        safe = np.where(scale == 0, 1.0, scale)
        q = np.floor(m / safe[:, None] + 0.5)
        return np.where(scale[:, None] == 0.0, 0.0, q)

    planes_cache: dict[int, np.ndarray] = {}   # planes built per seen dim

    def sig(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if max_id is not None:
            keep = ids < max_id
            b = b.filter(pa.array(keep))
            ids = ids[keep]
        if len(ids) == 0:
            return pa.table({"band": pa.array([], type=pa.int64()),
                             "key": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64())})
        q = _codes(b)
        dim = q.shape[1]
        pl = planes_cache.get(dim)
        if pl is None:
            pl = rp_lsh_planes(n_planes, dim)
            planes_cache[dim] = pl
        dots = q @ pl.T.astype(np.float64)       # integer-valued exactly
        bits = (dots > 0).astype(np.int64)       # (n, n_planes)
        weights = 1 << np.arange(bits_per_band, dtype=np.int64)
        keys = bits.reshape(len(ids), n_bands, bits_per_band) @ weights
        band = np.tile(np.arange(n_bands, dtype=np.int64), len(ids))
        return pa.table({
            "band": pa.array(band),
            "key": pa.array(keys.reshape(-1)),
            id_col: pa.array(np.repeat(ids, n_bands)),
        })

    def bucket_pairs(g: "pd.DataFrame") -> "pd.DataFrame":
        ids = np.sort(g[id_col].to_numpy(dtype=np.int64))
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    pairs = (ds.select_columns([id_col, vec_col])
             .map_batches(sig, batch_format="pyarrow")
             .groupby(["band", "key"])
             .map_groups(bucket_pairs, batch_format="pandas")
             .to_pandas().drop_duplicates(["id_a", "id_b"]))
    if pairs.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64),
                             "cosine_r": pd.Series([], dtype=np.float64)})

    # verify: quantized cosine over the candidates' codes (bounded side)
    from colbert_ray.functions.util import broadcast_semi_join

    need = np.concatenate([pairs["id_a"].to_numpy(dtype=np.int64),
                           pairs["id_b"].to_numpy(dtype=np.int64)])
    rows = broadcast_semi_join(ds.select_columns([id_col, vec_col]),
                               need, id_col).to_pandas()
    order = np.argsort(rows[id_col].to_numpy())
    rows = rows.iloc[order]
    q = _codes(pa.Table.from_pandas(rows, preserve_index=False))
    rid = rows[id_col].to_numpy(dtype=np.int64)
    norm = np.sqrt((q * q).sum(axis=1))
    pos = {int(i): r for r, i in enumerate(rid)}
    ra = np.array([pos[int(i)] for i in pairs["id_a"]])
    rb = np.array([pos[int(i)] for i in pairs["id_b"]])
    dots = (q[ra] * q[rb]).sum(axis=1)
    ok = (norm[ra] > 0) & (norm[rb] > 0)
    cos = np.where(ok, dots / (norm[ra] * norm[rb]), -np.inf)
    keep = cos >= threshold
    out = pd.DataFrame({
        "id_a": pairs["id_a"].to_numpy(dtype=np.int64)[keep],
        "id_b": pairs["id_b"].to_numpy(dtype=np.int64)[keep],
        "cosine_r": np.round(cos[keep], 6),
    })
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# product quantization (PQ) + asymmetric-distance (ADC) search
# (reference capability analog: residual compression of embeddings,
# residual_codec training/encode; here the classic Jegou et al. PQ form —
# subvector codebooks + per-query lookup tables)
# ---------------------------------------------------------------------------

_PQ_SUBSPACES = 8
_PQ_CENTROIDS = 16


def train_pq_codebook(m: np.ndarray, n_subspaces: int = _PQ_SUBSPACES,
                      n_centroids: int = _PQ_CENTROIDS, n_iter: int = 10,
                      seed: int = 123) -> np.ndarray:
    """(M, K, dsub) PQ codebook — per-subspace L2 Lloyd k-means, pure seeded
    numpy (shared by the Ray path and the SQL-oracle literal generation so
    both sides hold bit-identical centroids; empty clusters keep their
    previous centroid)."""
    m = np.asarray(m, dtype=np.float64)
    n, dim = m.shape
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces}")
    dsub = dim // n_subspaces
    kk = min(n_centroids, n)
    rng = np.random.default_rng(seed)
    book = np.empty((n_subspaces, kk, dsub), dtype=np.float64)
    for s in range(n_subspaces):
        sub = m[:, s * dsub:(s + 1) * dsub]
        c = sub[rng.choice(n, size=kk, replace=False)]
        for _ in range(n_iter):
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, sub)
            counts = np.bincount(assign, minlength=kk).astype(np.float64)
            c = np.where((counts > 0)[:, None],
                         sums / np.maximum(counts, 1.0)[:, None], c)
        book[s] = c
    return book


def _pq_dists(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, K) euclidean distances ROUNDED to 6 decimals (float policy —
    mirrors the oracle's round(list_distance(...), 6), so code assignment
    and ADC lookup tables cannot flip on summation-order ulps)."""
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return np.round(np.sqrt(d2), 6)


def pq_encode(ds: "ray.data.Dataset", codebook: np.ndarray,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> "ray.data.Dataset":
    """Encode each vector into M int8 subspace codes: per subspace, the
    argmin of the ROUNDED euclidean distance to the K centroids (first-min
    = lowest-centroid-id tie-break, same as the oracle's ORDER BY d, cid).

    Output: (id, codes fixed_size_list<int8>[M]) — the 64-float vector
    becomes M bytes (8 here, a 32x compression), which is what rides any
    downstream shuffle or index; the codebook travels once via ray.put."""
    book_ref = ray.put(np.asarray(codebook, dtype=np.float64))

    def enc(batch: pa.Table) -> pa.Table:
        book = ray.get(book_ref)
        m = _stack(batch, vec_col)
        n_sub, _, dsub = book.shape
        codes = np.empty((len(m), n_sub), dtype=np.int8)
        for s in range(n_sub):
            d = _pq_dists(m[:, s * dsub:(s + 1) * dsub], book[s])
            codes[:, s] = np.argmin(d, axis=1)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), type=pa.int8()), n_sub)
        return pa.table({id_col: batch.column(id_col), "codes": arr})

    return ds.select_columns([id_col, vec_col]).map_batches(
        enc, batch_format="pyarrow", zero_copy_batch=True)


def pq_adc_knn(
    codes_ds: "ray.data.Dataset",
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    codebook: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """Asymmetric-distance top-k over PQ codes: per query a (M, K) lookup
    table of ROUNDED euclidean distances query-subvector -> centroid; the
    ADC distance of a coded vector is the rounded sum of its M table
    entries. Rank 1..k by (adc asc, id).

    Scale shape: queries + codebook broadcast once; each batch does a pure
    LUT-gather (no float vector math per candidate), partial top-k per
    batch, tiny per-query merge — same streaming pattern as knn_cosine but
    over 8-byte codes instead of 256-byte vectors."""
    qm = np.asarray(query_vecs, dtype=np.float64)
    qids = np.asarray(query_ids, dtype=np.int64)
    book = np.asarray(codebook, dtype=np.float64)
    n_sub, _, dsub = book.shape
    lut = np.stack([_pq_dists(qm[:, s * dsub:(s + 1) * dsub], book[s])
                    for s in range(n_sub)], axis=1)      # (nq, M, K)
    ref = ray.put((lut, qids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        lut_, qi = ray.get(ref)
        arr = batch.column("codes").combine_chunks()
        codes = arr.flatten().to_numpy(zero_copy_only=False).reshape(
            -1, n_sub).astype(np.int64)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # (nq, nb): gather each subspace's LUT row at the vector's code
        adc = np.zeros((len(qi), len(ids)), dtype=np.float64)
        for s in range(n_sub):
            adc += lut_[:, s, :][:, codes[:, s]]
        adc = np.round(adc, 6)
        if exclude_self:
            adc = np.where(qi[:, None] == ids[None, :], np.inf, adc)
        kk = min(k, adc.shape[1])
        out_q, out_id, out_d = [], [], []
        for r in range(adc.shape[0]):
            row = adc[r]
            sel = (np.argpartition(row, kk - 1)[:kk]
                   if len(row) > kk else np.arange(len(row)))
            sel = sel[np.lexsort((ids[sel], row[sel]))]
            keep = np.isfinite(row[sel])
            sel = sel[keep]
            out_q.append(np.full(len(sel), qi[r], dtype=np.int64))
            out_id.append(ids[sel])
            out_d.append(row[sel])
        return pa.table({
            "qid": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "adc": pa.array(np.concatenate(out_d)),
        })

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adc", id_col], ascending=[True, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", id_col, "rank", "adc"]]

    return (codes_ds.map_batches(partial_topk, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby("qid")
            .map_groups(merge_topk, batch_format="pandas"))


def train_ivfpq(m: np.ndarray, n_coarse: int = 4,
                n_subspaces: int = _PQ_SUBSPACES,
                n_centroids: int = _PQ_CENTROIDS,
                seed: int = 123) -> tuple[np.ndarray, np.ndarray]:
    """IVF-PQ training (the reference's residual-compression architecture:
    coarse centroid + compressed residual, ``residual_codec.py`` analog):
    (1) coarse L2 k-means over the raw vectors (``train_pq_codebook`` with
    ONE subspace = plain Lloyd, same seeded routine both sides share);
    (2) per-subspace PQ k-means over the RESIDUALS ``v - coarse[assign]``.
    Pure seeded numpy — the SQL oracle inlines the identical constants.
    Returns (coarse (C, dim), book (M, K, dsub))."""
    m = np.asarray(m, dtype=np.float64)
    coarse = train_pq_codebook(m, 1, n_coarse, seed=seed)[0]      # (C, dim)
    assign = np.argmin(_pq_dists(m, coarse), axis=1)
    resid = m - coarse[assign]
    book = train_pq_codebook(resid, n_subspaces, n_centroids, seed=seed + 1)
    return coarse, book


def _ivfpq_combined(coarse: np.ndarray, book: np.ndarray) -> np.ndarray:
    """(C, M, K, dsub) FOLDED centroids: coarse-slice + residual centroid.
    ``||(v - c)_s - b_k|| == ||v_s - (c_s + b_k)||`` in real arithmetic; by
    computing ``c_s + b_k`` FIRST (one addition, identical on both sides)
    the engine and the SQL twin evaluate the exact same float expression —
    residuals are never materialized anywhere."""
    n_sub, kk, dsub = book.shape
    c_slices = coarse.reshape(len(coarse), n_sub, 1, dsub)
    return c_slices + book[None]          # broadcast add -> (C, M, K, dsub)


def ivfpq_encode(ds: "ray.data.Dataset", coarse: np.ndarray,
                 book: np.ndarray, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> "ray.data.Dataset":
    """Encode vectors into (id, bucket, codes fsl<int8>[M]): bucket =
    argmin ROUNDED L2 to the coarse centroids (lowest-id tie-break, the
    ``_pq_dists`` float policy); codes = per-subspace argmin rounded L2 of
    the vector SLICE against the folded ``combined[bucket]`` centroids.
    64 floats -> 1 bucket id + M bytes; constants broadcast once."""
    combined = _ivfpq_combined(np.asarray(coarse, dtype=np.float64),
                               np.asarray(book, dtype=np.float64))
    ref = ray.put((np.asarray(coarse, dtype=np.float64), combined))
    n_sub, dsub = book.shape[0], book.shape[2]

    def enc(batch: pa.Table) -> pa.Table:
        coarse_, comb = ray.get(ref)
        m = _stack(batch, vec_col)
        bucket = np.argmin(_pq_dists(m, coarse_), axis=1)
        codes = np.empty((len(m), n_sub), dtype=np.int8)
        for b in np.unique(bucket):
            rows = np.flatnonzero(bucket == b)
            for s in range(n_sub):
                d = _pq_dists(m[rows, s * dsub:(s + 1) * dsub], comb[b, s])
                codes[rows, s] = np.argmin(d, axis=1)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), type=pa.int8()), n_sub)
        return pa.table({id_col: batch.column(id_col),
                         "bucket": pa.array(bucket.astype(np.int32)),
                         "codes": arr})

    return ds.select_columns([id_col, vec_col]).map_batches(
        enc, batch_format="pyarrow", zero_copy_batch=True)


def ivfpq_search(
    codes_ds: "ray.data.Dataset",
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    coarse: np.ndarray,
    book: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """IVF-PQ ADC top-k: per query probe the ``nprobe`` nearest coarse
    buckets (rounded L2, id tie-break), build the (M, K) LUT against each
    probed bucket's FOLDED centroids, and score only rows whose bucket is
    probed — a pure LUT-gather per batch, rank 1..k by (adc ASC, id ASC).

    Scale shape: queries/probes/LUTs broadcast once (nq × nprobe × M × K
    doubles); each batch touches only its probed-bucket rows; partial
    top-k per batch + tiny per-query merge. At cluster scale the codes
    dataset would be hive-partitioned by bucket for path-level pruning
    exactly like ``build_ann_index`` — here buckets interleave inside
    batches, the filter is the vectorized membership test."""
    qm = np.asarray(query_vecs, dtype=np.float64)
    qids = np.asarray(query_ids, dtype=np.int64)
    coarse = np.asarray(coarse, dtype=np.float64)
    combined = _ivfpq_combined(coarse, np.asarray(book, dtype=np.float64))
    n_sub, dsub = book.shape[0], book.shape[2]
    dq = _pq_dists(qm, coarse)
    probes = np.argsort(dq, axis=1, kind="stable")[:, :nprobe]   # (nq, P)
    # lut[q, p, s, k] = rounded L2 of query slice vs combined[probes[q,p], s, k]
    lut = np.empty((len(qm), nprobe, n_sub, combined.shape[2]))
    for qi in range(len(qm)):
        for p in range(nprobe):
            for s in range(n_sub):
                lut[qi, p, s] = _pq_dists(
                    qm[qi:qi + 1, s * dsub:(s + 1) * dsub],
                    combined[probes[qi, p], s])[0]
    ref = ray.put((lut, probes, qids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        lut_, probes_, qi = ray.get(ref)
        arr = batch.column("codes").combine_chunks()
        codes = arr.flatten().to_numpy(zero_copy_only=False).reshape(
            -1, n_sub).astype(np.int64)
        buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        out_q, out_id, out_d = [], [], []
        for r in range(len(qi)):
            # rows whose bucket is probed by query r, and which probe slot
            slot = np.full(len(ids), -1, dtype=np.int64)
            for p in range(probes_.shape[1]):
                slot[buckets == probes_[r, p]] = p
            rows = np.flatnonzero(slot >= 0)
            if exclude_self:
                rows = rows[ids[rows] != qi[r]]
            if not len(rows):
                continue
            adc = np.zeros(len(rows), dtype=np.float64)
            for s in range(n_sub):
                adc += lut_[r, slot[rows], s, codes[rows, s]]
            adc = np.round(adc, 6)
            kk = min(k, len(rows))
            sel = (np.argpartition(adc, kk - 1)[:kk]
                   if len(rows) > kk else np.arange(len(rows)))
            sel = sel[np.lexsort((ids[rows][sel], adc[sel]))]
            out_q.append(np.full(len(sel), qi[r], dtype=np.int64))
            out_id.append(ids[rows][sel])
            out_d.append(adc[sel])
        if not out_q:
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             "adc": pa.array([], type=pa.float64())})
        return pa.table({"qid": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_id)),
                         "adc": pa.array(np.concatenate(out_d))})

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adc", id_col], ascending=[True, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", id_col, "rank", "adc"]]

    return (codes_ds.map_batches(partial_topk, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby("qid")
            .map_groups(merge_topk, batch_format="pandas"))


def label_centroids(ds: "ray.data.Dataset", vec_col: str = "embedding",
                    label_col: str = "label") -> pd.DataFrame:
    """Grouped vector mean: per-label centroid of an embedding column.

    Scale shape: each batch reduces to (label, dim, partial_sum,
    partial_count) rows via one np.add.at — |labels|x|dim| rows per batch,
    never raw vectors — summed by ONE groupby; the tiny (labels x dim)
    result finishes on the driver with the rounded mean (float policy)."""
    from ray.data.aggregate import Sum as RSum

    def partial(b: pa.Table) -> pa.Table:
        m = _stack(b, vec_col)
        lab = b.column(label_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        uu, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(uu), m.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv).astype(np.int64)
        n_lab, dim = sums.shape
        return pa.table({
            "label": pa.array(np.repeat(uu, dim), type=pa.int64()),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), n_lab)),
            "s_p": pa.array(sums.ravel(), type=pa.float64()),
            "n_p": pa.array(np.repeat(cnt, dim), type=pa.int64())})

    agg = (ds.select_columns([label_col, vec_col])
           .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
           .groupby(["label", "dim"])
           .aggregate(RSum("s_p", alias_name="s"),
                      RSum("n_p", alias_name="n"))
           .to_pandas())
    agg["mean_r"] = np.round(agg["s"].to_numpy(dtype=np.float64)
                             / agg["n"].to_numpy(dtype=np.float64), 6)
    agg["n"] = agg["n"].astype(np.int64)
    return (agg[["label", "dim", "mean_r", "n"]]
            .sort_values(["label", "dim"]).reset_index(drop=True))


def mutual_knn_pairs(
    ds: "ray.data.Dataset",
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_id: int | None = None,
) -> pa.Table:
    """Reciprocal-nearest-neighbor pairs: (id_a < id_b) such that b is in
    a's top-k cosine neighbors AND a is in b's — the mutual-kNN criterion
    used for high-precision embedding dedup / bitext mining (stricter than
    a one-sided threshold; breaks the hub problem). Neighbor ranking on the
    ROUNDED cosine (float policy), ties by neighbor id ascending; self
    excluded.

    Bounded verify tier (broadcast reference matrix, per-batch partial
    top-k like knn_cosine); the mutual join happens on the driver over
    <= n*k candidate rows. At corpus scale use ``mutual_knn_pairs_ivf``
    (below) — IVF blocking + a shuffle-shaped reciprocity join, nothing
    O(n) on the driver."""
    if max_id is not None:
        ds = ds.filter(expr=f"{id_col} < {max_id}")
    ref_tbl = ds.select_columns([id_col, vec_col]).to_pandas()
    r_ids = ref_tbl[id_col].to_numpy(dtype=np.int64)
    mat = _normalize(np.stack(ref_tbl[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((r_ids, mat))

    def topk(batch: pa.Table) -> pa.Table:
        ids_r, m_r = ray.get(ref)
        m = _normalize(_stack(batch, vec_col))
        b_ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        sims = np.round(m @ m_r.T, 6)
        sims[b_ids[:, None] == ids_r[None, :]] = -np.inf   # exclude self
        # rank by (-cosine, neighbor id): lexsort per row
        order = np.lexsort((np.broadcast_to(ids_r, sims.shape), -sims),
                           axis=1)[:, :k]
        src = np.repeat(b_ids, min(k, sims.shape[1]))
        nbr = ids_r[order].ravel()
        cos = np.take_along_axis(sims, order, axis=1).ravel()
        keep = np.isfinite(cos)
        return pa.table({"src": pa.array(src[keep]),
                         "nbr": pa.array(nbr[keep]),
                         "cosine": pa.array(cos[keep])})

    cand = (ds.select_columns([id_col, vec_col])
            .map_batches(topk, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas())
    edges = set(zip(cand["src"], cand["nbr"]))
    cos_of = {(s, n): c for s, n, c in
              zip(cand["src"], cand["nbr"], cand["cosine"])}
    out_a, out_b, out_c = [], [], []
    for (s, n) in sorted(edges):
        if s < n and (n, s) in edges:
            out_a.append(int(s))
            out_b.append(int(n))
            out_c.append(float(cos_of[(s, n)]))
    return pa.table({"id_a": pa.array(out_a, type=pa.int64()),
                     "id_b": pa.array(out_b, type=pa.int64()),
                     "cosine_r": pa.array(out_c, type=pa.float64())})


def mutual_knn_pairs_ivf(
    ds: "ray.data.Dataset",
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> pa.Table:
    """The IVF-blocked SCALE path ``mutual_knn_pairs`` documents: the same
    reciprocal-top-k criterion with neighbor search restricted to each
    vector's ``nprobe`` nearest coarse buckets, and the mutual join run as
    a SHUFFLE instead of a driver-side set.

    100-TB shape — nothing is O(n) on any single node:
    1. one map_batches emits each vector once per role: MEMBER row in its
       assigned bucket, PROBE row in each of its nprobe buckets (vectors
       ride the exchange; bucket fan-out is 1 + nprobe);
    2. ``groupby(bucket)``: per-bucket probe x member cosine (rounded, self
       excluded) -> per-src partial top-k (a member lives in exactly ONE
       bucket, so (src, nbr) appears at most once globally — no dedup);
    3. ``groupby(src)``: merge the <= nprobe partials to the global top-k
       under the same (-cosine_r, nbr) order as the bounded tier;
    4. the mutual check is a ``groupby`` on the unordered pair key keeping
       pairs seen from BOTH directions — the only driver-side object is the
       final (true reciprocal pairs) table.

    Exactly equal to ``mutual_knn_pairs`` whenever every vector's true
    top-k lives inside its probed buckets (asserted at n_centroids=1 in
    pytest; recall-gated at realistic settings). Skewed buckets degrade
    step 2 toward quadratic in the hot bucket — tune n_centroids so
    ~n/n_centroids stays batch-sized, the standard IVF balance knob."""
    if centroids is None:
        centroids = train_kmeans_centroids(ds, n_centroids, vec_col=vec_col)
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def emit_roles(batch: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        m = _normalize(_stack(batch, vec_col))
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n, dim = m.shape
        assign = _assign_buckets(m, cents).astype(np.int32)
        probes = _probe_buckets(m, cents, nprobe).astype(np.int32)
        buckets = np.concatenate([assign, probes.ravel()])
        role = np.concatenate([np.zeros(n, dtype=np.int8),
                               np.ones(n * probes.shape[1], dtype=np.int8)])
        rid = np.concatenate([ids, np.repeat(ids, probes.shape[1])])
        vecs = np.concatenate([m, np.repeat(m, probes.shape[1], axis=0)])
        return pa.table({
            "bucket": pa.array(buckets),
            "role": pa.array(role),
            id_col: pa.array(rid),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), type=pa.float64()), dim),
        })

    cand_empty = pd.DataFrame({"src": pd.Series(dtype=np.int64),
                               "nbr": pd.Series(dtype=np.int64),
                               "cosine_r": pd.Series(dtype=np.float64)})

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        mem = g[g["role"] == 0]
        prb = g[g["role"] == 1]
        if mem.empty or prb.empty:
            return cand_empty
        mm = np.stack(mem["vec"].to_numpy()).astype(np.float64)
        mids = mem[id_col].to_numpy(dtype=np.int64)
        pm = np.stack(prb["vec"].to_numpy()).astype(np.float64)
        pids = prb[id_col].to_numpy(dtype=np.int64)
        sims = np.round(pm @ mm.T, 6)
        sims[pids[:, None] == mids[None, :]] = -np.inf     # self excluded
        kk = min(k, sims.shape[1])
        order = np.lexsort((np.broadcast_to(mids, sims.shape), -sims),
                           axis=1)[:, :kk]
        cos = np.take_along_axis(sims, order, axis=1).ravel()
        keep = np.isfinite(cos)
        return pd.DataFrame({"src": np.repeat(pids, kk)[keep],
                             "nbr": mids[order].ravel()[keep],
                             "cosine_r": cos[keep]})

    def src_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine_r", "nbr"],
                          ascending=[False, True]).head(k)
        return g[["src", "nbr", "cosine_r"]]

    def pair_key(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        n_ = batch.column("nbr").to_numpy(zero_copy_only=False)
        return pa.table({
            "id_a": pa.array(np.minimum(s, n_)),
            "id_b": pa.array(np.maximum(s, n_)),
            "cosine_r": batch.column("cosine_r"),
        })

    pair_empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                               "id_b": pd.Series(dtype=np.int64),
                               "cosine_r": pd.Series(dtype=np.float64)})

    def mutual(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:             # reciprocal = edge present BOTH ways
            return pair_empty
        return g.iloc[:1][["id_a", "id_b", "cosine_r"]]

    out = (ds.select_columns([id_col, vec_col])
           .map_batches(emit_roles, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("bucket")
           .map_groups(bucket_topk, batch_format="pandas")
           .groupby("src")
           .map_groups(src_topk, batch_format="pandas")
           .map_batches(pair_key, batch_format="pyarrow")
           .groupby(["id_a", "id_b"])
           .map_groups(mutual, batch_format="pandas")
           .to_pandas())
    if "id_a" not in out.columns:
        out = pair_empty
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.table({
        "id_a": pa.array(out["id_a"].to_numpy(dtype=np.int64)),
        "id_b": pa.array(out["id_b"].to_numpy(dtype=np.int64)),
        "cosine_r": pa.array(out["cosine_r"].to_numpy(dtype=np.float64)),
    })
