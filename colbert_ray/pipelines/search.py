"""Query pipeline: queries Dataset -> ranking Dataset via a scorer actor pool.

Analog of ``Searcher.search_all`` (``colbert/searcher.py:84-125``) — but
where the reference loops queries sequentially on one process
(``searcher.py:90-99``), here queries are rows of a Dataset fanned out over
a ``map_batches`` actor pool; each actor holds the loaded index
(``IndexScorer`` analog, T3). Output schema matches the reference ranking
``(qid, pid, rank, score)`` (``colbert/data/ranking.py:63-72``) with
``content_sha256`` carried for the per-row invariant.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from colbert_ray.config import EngineConfig
from colbert_ray.state.index import BM25Scorer

# one decoded index per (index_dir, metadata mtime) per driver process —
# decoded ONCE, then shared zero-copy with all scorer actors via ray.put.
# Keyed ALSO on the Ray job id: an ObjectRef does not survive
# ray.shutdown()/ray.init(), so a cache hit across sessions would hand the
# actors a dangling ref. Bounded like decoded.py's _PROC_CACHE.
_INDEX_CACHE: dict = {}
_INDEX_CACHE_MAX = 4


def _shared_index_ref(index_dir: str, docid_range=None, load_sha=True):
    import os

    import ray as _ray

    from colbert_ray.state.decoded import DecodedIndex

    try:
        job = _ray.get_runtime_context().get_job_id()
    except Exception:
        job = None
    key = (os.path.abspath(index_dir),
           os.path.getmtime(os.path.join(index_dir, "metadata.json")),
           tuple(docid_range) if docid_range else None, bool(load_sha), job)
    ref = _INDEX_CACHE.get(key)
    if ref is None:
        ref = _ray.put(DecodedIndex.load(index_dir, docid_range=docid_range,
                                         load_sha=load_sha))
        while len(_INDEX_CACHE) >= _INDEX_CACHE_MAX:
            _INDEX_CACHE.pop(next(iter(_INDEX_CACHE)))
        _INDEX_CACHE[key] = ref
    return ref


def _ranking_schema(with_sha: bool) -> pa.Schema:
    """The scorer's output schema — single source for empty-result tables."""
    return pa.schema(
        [("qid", pa.int64()), ("docid", pa.int64()),
         ("rank", pa.int32()), ("score", pa.float64())]
        + ([("content_sha256", pa.string())] if with_sha else []))


def search(
    queries: "ray.data.Dataset | pa.Table",
    index_dir: str,
    k: int = 10,
    *,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int | None = None,
    with_sha: bool = True,
    prune: bool | None = None,
    prune_strategy: str | None = None,
    docid_filter=None,
    docid_range: tuple[int, int] | None = None,
    parent_base: int | None = None,
    ranker: str = "bm25",
    mu: float | None = None,
) -> "ray.data.Dataset":
    """Top-k retrieval over the index for every query row (qid, query).

    ``ranker``: "bm25" (default) or "ql" — Dirichlet query-likelihood with
    smoothing parameter ``mu`` (functions/ql.py) over the SAME index.

    ``docid_filter``: optional sorted int64 array (or list) of allowed
    docids, applied to every query — the engine-level form of the
    reference's per-search ``filter_fn`` pid hook (``searcher.py:76-99``,
    ``index_storage.py:95-101``; SURVEY §2.10). Broadcast once.
    ``prune_strategy``: "maxscore" | "bmw" (both exact; defaults to the
    index config's choice).
    ``parent_base``: max-passage mode (M12+K7) — rows become top-k PARENT
    documents (docid // parent_base) ranked by their best passage's score;
    the per-passage match set never leaves the scorer actors. Requires
    ``with_sha=False``.
    """
    cfg = EngineConfig()
    from colbert_ray.state.serve import serve_valid

    # serve-artifact path: actors mmap-open the index themselves (page cache
    # shared per node; shard restriction inside the actor reads ~1/N) — the
    # driver never decodes or broadcasts the index. Fallback (no artifact):
    # decode once in the driver process and share zero-copy via ray.put.
    if serve_valid(index_dir):
        index_kwargs = {"index_dir": index_dir, "docid_range": docid_range}
    else:
        index_kwargs = {"index_ref": _shared_index_ref(
            index_dir, docid_range, load_sha=with_sha)}
    n_actors = concurrency if isinstance(concurrency, int) else concurrency[-1]
    # leave >=1 CPU for non-actor tasks: an actor pool that reserves every
    # CPU starves upstream AllToAll/read tasks and deadlocks the executor
    try:
        import ray as _ray

        avail = int(_ray.cluster_resources().get("CPU", n_actors + 1))
        n_actors = max(1, min(n_actors, avail - 1))
    except Exception:
        pass
    # the clamp must also cap the tuple's MIN — (min > max) is invalid
    concurrency = n_actors if isinstance(concurrency, int) else \
        (min(concurrency[0], n_actors), n_actors)
    n_blocks = max(1, n_actors * 2)
    if isinstance(queries, pa.Table):
        # split driver-side (no repartition task needed) so every actor
        # draws work even for a small query table
        rows = queries.num_rows
        step = -(-rows // n_blocks) or 1
        queries = ray.data.from_arrow(
            [queries.slice(i, step) for i in range(0, rows, step)] or [queries]
        )
    else:
        queries = queries.repartition(n_blocks)
    return queries.map_batches(
        BM25Scorer,
        fn_constructor_kwargs={
            **index_kwargs,
            "k": k,
            "with_sha": with_sha,
            "prune": prune,
            "prune_strategy": prune_strategy,
            "docid_filter": docid_filter,
            "parent_base": parent_base,
            "ranker": ranker,
            "mu": mu,
        },
        batch_format="pyarrow",
        batch_size=batch_size or cfg.score_batch_size,
        concurrency=concurrency,
    )


def search_table(
    queries: "ray.data.Dataset | pa.Table", index_dir: str, k: int = 10, **kw
) -> pa.Table:
    """Convenience: materialized ranking table sorted by (qid, rank)."""
    ds = search(queries, index_dir, k, **kw)
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    if "qid" not in t.column_names:  # no query produced any hit
        return _ranking_schema(kw.get("with_sha", True)).empty_table()
    import pyarrow.compute as pc

    order = pc.sort_indices(
        t, sort_keys=[("qid", "ascending"), ("rank", "ascending")]
    )
    return t.take(order)


def search_job(
    queries: "ray.data.Dataset | pa.Table",
    index_dir: str,
    out_dir: str,
    k: int = 10,
    n_shards: int = 8,
    *,
    n_actors: int = 4,
    with_sha: bool = True,
    prune_strategy: str | None = None,
) -> dict:
    """Resumable batch-search job: qid-range-sharded partitioned output.

    The ranking is written as ``out_dir/shard=<i>/ranking.parquet`` — one
    qid range per shard, each with a manifest keyed on (that shard's query
    rows, the index identity, k) — so an interrupted or failed job skips
    finished shards on rerun (the brief's resumable-output contract; the
    search-side analog of the build's per-partition segment manifests).
    One persistent SearchSession serves all shards (actor spawn + index
    open paid once). Returns {"shards": n, "skipped": [...], "ran": [...]}.
    """
    import hashlib
    import json

    import pyarrow.parquet as _pq

    from colbert_ray.stages.manifests import atomic_write_json

    if not isinstance(queries, pa.Table):
        queries_tbl = pa.Table.from_pandas(queries.to_pandas(),
                                           preserve_index=False)
    else:
        queries_tbl = queries
    import pyarrow.compute as pc

    order = pc.sort_indices(queries_tbl, sort_keys=[("qid", "ascending")])
    queries_tbl = queries_tbl.take(order)
    rows = queries_tbl.num_rows
    n_shards = max(1, min(n_shards, rows or 1))
    step = -(-rows // n_shards)

    with open(os.path.join(index_dir, "metadata.json")) as f:
        meta = json.load(f)
    index_key = f'{meta.get("semantic_hash")}:{meta.get("inputs_hash")}'

    def shard_key(tbl: pa.Table) -> str:
        # with_sha changes the output schema — a rerun with a different
        # value must not skip shards written under the other shape.
        # \x01 separates pairs (';' can occur inside query text, which
        # would let distinct query sets collide to one key).
        blob = (index_key + f":k={k}:sha={int(with_sha)}:" + "\x01".join(
            f"{q}\x00{t}" for q, t in zip(tbl.column("qid").to_pylist(),
                                          tbl.column("query").to_pylist())))
        return hashlib.sha256(blob.encode()).hexdigest()[:16]

    # a previous run with MORE shards (or other queries) may have left
    # stale shard=i directories beyond this plan — a consumer reading
    # out_dir/shard=*/ranking.parquet would mix old rows into the result
    import glob
    import re
    import shutil as _shutil

    stale = []
    for d in glob.glob(os.path.join(out_dir, "shard=*")):
        m = re.fullmatch(r"shard=(\d+)", os.path.basename(d))
        if m and int(m.group(1)) >= n_shards:
            _shutil.rmtree(d, ignore_errors=True)
            stale.append(int(m.group(1)))

    ran, skipped = [], []
    sess = None
    try:
        for i in range(n_shards):
            shard_tbl = queries_tbl.slice(i * step, step)
            if shard_tbl.num_rows == 0:
                continue
            sdir = os.path.join(out_dir, f"shard={i}")
            mpath = os.path.join(sdir, "manifest.json")
            key = shard_key(shard_tbl)
            if os.path.exists(mpath):
                try:
                    with open(mpath) as f:
                        m = json.load(f)
                    fpath = os.path.join(sdir, m.get("file", ""))
                    if (m.get("key") == key and os.path.exists(fpath)
                            and os.path.getsize(fpath) == m.get("bytes", -1)):
                        skipped.append(i)
                        continue
                except (OSError, ValueError):
                    pass
            if sess is None:
                # prune_strategy is NOT part of shard_key: both strategies
                # are exact, so outputs are interchangeable across reruns
                sess = SearchSession(index_dir, k=k, n_actors=n_actors,
                                     with_sha=with_sha,
                                     prune_strategy=prune_strategy)
            result = sess.search_table(shard_tbl)
            os.makedirs(sdir, exist_ok=True)
            fpath = os.path.join(sdir, "ranking.parquet")
            _pq.write_table(result, fpath + ".tmp")
            os.replace(fpath + ".tmp", fpath)
            atomic_write_json(mpath, {
                "key": key, "file": "ranking.parquet",
                "bytes": os.path.getsize(fpath),
                "n_queries": shard_tbl.num_rows, "n_rows": result.num_rows,
            })
            ran.append(i)
    finally:
        if sess is not None:
            sess.close()
    return {"shards": n_shards, "ran": ran, "skipped": skipped,
            "stale_removed": stale,
            "out_dir": out_dir}


class SearchSession:
    """Persistent scorer actor pool for repeated query batches — the
    long-lived ``Searcher`` analog (``colbert/searcher.py:30-60``: load
    once, answer many). ``search()`` spawns a fresh Ray Data pool per call
    (right for one big batch job); a session keeps N ``BM25Scorer`` actors
    alive so actor spawn + index open are paid ONCE across calls — the
    serving topology. With the serve artifact, each actor mmap-opens the
    index (page cache shared per node).
    """

    def __init__(self, index_dir: str, k: int = 10, n_actors: int = 4,
                 with_sha: bool = True, prune: bool | None = None,
                 prune_strategy: str | None = None,
                 docid_range: tuple[int, int] | None = None,
                 parent_base: int | None = None):
        import ray as _ray

        from colbert_ray.state.serve import serve_valid

        self.k = k
        self.with_sha = with_sha
        kwargs = {"k": k, "with_sha": with_sha, "prune": prune,
                  "prune_strategy": prune_strategy,
                  "docid_range": docid_range, "parent_base": parent_base}
        if serve_valid(index_dir):
            kwargs["index_dir"] = index_dir
        else:
            kwargs["index_ref"] = _shared_index_ref(
                index_dir, docid_range, load_sha=with_sha)
            kwargs["index_dir"] = None
        # clamp like search(): n_actors num_cpus=1 actors beyond the CPU
        # count would pend forever and search_table would round-robin
        # futures onto never-created actors (deadlock on small hosts)
        try:
            avail = int(_ray.cluster_resources().get("CPU", n_actors + 1))
            n_actors = max(1, min(n_actors, avail - 1))
        except Exception:
            pass

        @_ray.remote(num_cpus=1)
        class _ScorerActor:
            def __init__(self, kw):
                from colbert_ray.state.index import BM25Scorer

                self.scorer = BM25Scorer(**kw)

            def score(self, tbl: pa.Table) -> pa.Table:
                return self.scorer(tbl)

        self.actors = [_ScorerActor.remote(kwargs) for _ in range(n_actors)]

    def search_table(self, queries: pa.Table) -> pa.Table:
        """Top-k for every (qid, query) row; sorted by (qid, rank)."""
        import pyarrow.compute as pc
        import ray as _ray

        rows = queries.num_rows
        n = len(self.actors)
        step = -(-rows // n) or 1
        futs = [
            self.actors[i % n].score.remote(queries.slice(i * step, step))
            for i in range(-(-rows // step))
        ]
        parts = [t for t in _ray.get(futs) if t.num_rows]
        if not parts:
            return _ranking_schema(self.with_sha).empty_table()
        t = pa.concat_tables(parts, promote_options="default")
        order = pc.sort_indices(
            t, sort_keys=[("qid", "ascending"), ("rank", "ascending")])
        return t.take(order)

    def close(self) -> None:
        import ray as _ray

        for a in self.actors:
            _ray.kill(a)
        self.actors = []


def search_sharded(
    queries: "ray.data.Dataset | pa.Table",
    index_dir: str,
    k: int = 10,
    n_shards: int = 2,
    *,
    concurrency: int | tuple[int, int] = 2,
    with_sha: bool = True,
    **kw,
) -> "ray.data.Dataset":
    """Docid-range-sharded serving: every shard's actor pool holds only its
    docid range's postings (the multi-node topology — one shard per node);
    per-shard exact top-k, then a tiny ``groupby(qid)`` merge re-ranks by
    (-score, docid). Global statistics make per-shard scores exact, so the
    result is BIT-IDENTICAL to unsharded search (SURVEY §3.2 Ray shape;
    cross-shard merge = K7/K2).
    """
    import json
    import os

    import numpy as np
    import pandas as pd

    with open(os.path.join(index_dir, "metadata.json")) as f:
        n_docs_total = int(json.load(f)["n_docs"])
    # shard bounds must span the DOCID SPACE, not the row count: an index
    # built with an explicit docid_col (e.g. pid = parent*base + idx for
    # passage corpora) is sparse, and n_docs-based bounds would route ~all
    # postings to the +inf last shard. The serve artifact's doclens length
    # is max_docid+1 (an O(header) mmap open); fall back to docmeta
    # row-group stats, then to n_docs.
    hi = max(n_docs_total, 1)
    from colbert_ray.state import serve as _serve

    try:
        if _serve.serve_valid(index_dir):
            import numpy as _np

            dl = _np.load(os.path.join(index_dir, _serve.SERVE_DIR,
                                       _serve.ARRAY_FILES["doclens"]),
                          mmap_mode="r")
            hi = max(hi, int(dl.shape[0]))
        else:
            import glob as _glob

            mf = sorted(_glob.glob(
                os.path.join(index_dir, "docmeta", "*.parquet")))
            if mf:
                hi = max(hi, _serve._max_docid_from_stats(mf) + 1)
    except OSError:
        pass
    # equal-width ranges over the base corpus; the LAST shard's upper bound
    # is +inf so delta-appended docids (> n_docs) route there instead of
    # falling outside every shard
    bounds = np.linspace(0, hi, n_shards + 1).astype(np.int64)
    bounds[-1] = np.iinfo(np.int64).max
    if isinstance(queries, pa.Table):
        queries_tbl = queries
    else:
        queries_tbl = pa.Table.from_pandas(queries.to_pandas(), preserve_index=False)
    parts = [
        search(queries_tbl, index_dir, k=k, concurrency=concurrency,
               with_sha=with_sha, docid_range=(int(bounds[i]), int(bounds[i + 1])),
               **kw)
        for i in range(n_shards)
    ]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    parent_mode = kw.get("parent_base") is not None

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        if parent_mode:
            # a parent's pids are contiguous, so a docid-range boundary can
            # split one parent across (at most two) shards: max-merge its
            # per-shard maxes before the top-k (exact: max of maxes)
            qid = g["qid"].iloc[0]
            g = g.groupby("docid", as_index=False)["score"].max()
            g.insert(0, "qid", qid)
        g = g.sort_values(["score", "docid"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        if parent_mode:
            g = g[["qid", "docid", "rank", "score"]]
        return g

    return ds.groupby("qid").map_groups(merge_topk, batch_format="pandas")


def search_after(index_dir: str, query: str, k: int = 10,
                 after: tuple[float, int] | None = None,
                 cfg: "EngineConfig | None" = None,
                 scorer=None) -> tuple[pa.Table, tuple[float, int] | None]:
    """Cursor pagination — the Elasticsearch ``search_after`` analog.

    Results are ordered by the engine's ROUNDED float policy
    (-round(score, 6), docid); ``after`` is the (score_r, docid) of the
    last row of the previous page and the next page contains the k rows
    STRICTLY after it in that total order. Returns (page, next_cursor)
    where next_cursor is the last row's key (None when the page is
    empty). Stateless and deterministic: any page can be re-fetched from
    its cursor alone — no server-side scroll context, which is what makes
    this safe on a multi-node serving tier (any replica can serve any
    page).

    Cost note (same trade ES makes): every page scores all matching docs
    and skips by sort key; the win is never re-materializing or shipping
    earlier pages. Pass ``scorer`` to amortize the index open across
    pages (one BM25Scorer per actor/session); its ``docid_filter`` is
    honored. NOTE: page 1 must come from this function too
    (``after=None``) — the plain ``search_table`` path orders by RAW
    float64 score, so a cursor built from its last row can drop or
    duplicate a rounded-score tie that straddles the page boundary.
    """
    import numpy as np

    from colbert_ray.functions.bm25 import topk_with_ties
    from colbert_ray.functions.tokenizer import tokenize_query

    scorer = scorer or BM25Scorer(index_dir, k=max(1, k), with_sha=False)
    if scorer.ranker != "bm25":
        raise ValueError("search_after supports ranker='bm25' only")
    cfg = cfg or scorer.idx.cfg
    empty = pa.table({"docid": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64()),
                      "score_r": pa.array([], type=pa.float64())})
    # k <= 0 -> empty page, like the other result-shaping functions
    # (collapse_search / min_should_match_search / rescore_search); without
    # this, topk_with_ties(sr, d, 0) indexes order[-1] on an empty selection
    if k <= 0:
        return empty, None
    tids = scorer.idx.lookup_terms(tokenize_query(query, cfg)[0])
    if not len(tids):
        return empty, None
    d, s = scorer._all_match_scores(tids, docid_filter=scorer.docid_filter)
    sr = np.round(s, 6)
    if after is not None:
        a_s, a_d = float(after[0]), int(after[1])
        keep = (sr < a_s) | ((sr == a_s) & (d > a_d))
        d, sr = d[keep], sr[keep]
    dd, ss, rr = topk_with_ties(sr, d, k)
    if not len(dd):
        return empty, None
    page = pa.table({"docid": pa.array(dd, type=pa.int64()),
                     "rank": pa.array(rr, type=pa.int64()),
                     "score_r": pa.array(ss, type=pa.float64())})
    return page, (float(ss[-1]), int(dd[-1]))


def _docmeta_lookup(index_dir: str, field: str, docids) -> pa.Array:
    """Values of a docmeta ``field`` aligned to ``docids`` — a
    predicate-pushed read (``isin`` filter over the docid-partitioned
    docmeta files: only row groups holding the requested docids page in).
    Shared by collapse_search and function_score_search."""
    import glob

    import numpy as np
    import pyarrow.dataset as pads

    files = sorted(glob.glob(os.path.join(index_dir, "docmeta",
                                          "*.parquet")))
    if not files:
        raise ValueError("index has no docmeta/ — this operation needs an "
                         "index built with meta_cols")
    dset = pads.dataset(files)
    if field not in dset.schema.names:
        raise ValueError(f"unknown field {field!r}; docmeta has "
                         f"{sorted(set(dset.schema.names) - {'docid'})}")
    if not len(docids):
        return pa.array([], type=dset.schema.field(field).type)
    meta = dset.to_table(columns=["docid", field],
                         filter=pads.field("docid").isin(pa.array(docids)))
    # overlay delta docmeta (docs added via IndexUpdater live under
    # deltas/*/docmeta.parquet until compaction — same overlay direction
    # as DecodedIndex._load_sha); deltas written without this field still
    # read as NULL, preserving the missing-value semantics below
    delta_files = sorted(glob.glob(os.path.join(
        index_dir, "deltas", "delta_*", "docmeta.parquet")))
    if delta_files:
        parts = [meta]
        for f in delta_files:
            dd = pads.dataset(f)
            if field in dd.schema.names:
                dt = dd.to_table(columns=["docid", field],
                                 filter=pads.field("docid").isin(
                                     pa.array(docids)))
                if dt.num_rows:
                    parts.append(dt)
        if len(parts) > 1:
            meta = pa.concat_tables(parts, promote_options="default")
    md = meta.column("docid").to_numpy(zero_copy_only=False)
    morder = np.argsort(md)
    md_sorted = md[morder]
    docids = np.asarray(docids, dtype=np.int64)
    if len(md_sorted):
        pos_c = np.clip(np.searchsorted(md_sorted, docids), 0,
                        len(md_sorted) - 1)
        take = morder[pos_c]
        valid = md_sorted[pos_c] == docids
    else:
        take = np.zeros(len(docids), dtype=np.int64)
        valid = np.zeros(len(docids), dtype=bool)
    # docids with no base-docmeta row (delta-added docs keep their meta
    # under deltas/*/docmeta.parquet) read as NULL — a missing field
    # value, never a neighbor's value or an IndexError
    return meta.column(field).combine_chunks().take(
        pa.array(take, mask=~valid))


def collapse_search(index_dir: str, query: str, field: str, k: int = 10,
                    cfg: "EngineConfig | None" = None,
                    scorer=None) -> pa.Table:
    """Field collapsing — the Elasticsearch ``collapse`` analog: the top-k
    matching docs with at most ONE hit per distinct value of a docmeta
    ``field``; each hit carries its group's total match count.

    Semantics (the engine's rounded float policy throughout): a group's
    representative is its best doc by (-round(score, 6), docid); groups
    rank by their representative's key. Docs with a NULL field value do
    not collapse (each is its own group — ES's missing-value behavior).

    Scale shape: scoring is posting-driven (no corpus scan) and the
    docmeta read is predicate-pushed to only the MATCHING docids (an
    ``isin`` filter over the docid-partitioned docmeta files, so only row
    groups holding matches page in). Per-docid-shard collapse merges
    exactly: group representative = best of the shard representatives,
    group_count = sum of shard counts.
    """
    import numpy as np
    import pyarrow.compute as pc

    from colbert_ray.functions.tokenizer import tokenize_query

    scorer = scorer or BM25Scorer(index_dir, k=max(1, k), with_sha=False)
    if scorer.ranker != "bm25":
        raise ValueError("collapse_search supports ranker='bm25' only")
    cfg = cfg or scorer.idx.cfg
    empty_vals = _docmeta_lookup(index_dir, field, np.array([], np.int64))
    empty = pa.table({"docid": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64()),
                      "score_r": pa.array([], type=pa.float64()),
                      field: empty_vals,
                      "group_count": pa.array([], type=pa.int64())})
    tids = scorer.idx.lookup_terms(tokenize_query(query, cfg)[0])
    if not len(tids) or k <= 0:
        return empty
    d, s = scorer._all_match_scores(tids, docid_filter=scorer.docid_filter)
    if not len(d):
        return empty
    sr = np.round(s, 6)
    vals = _docmeta_lookup(index_dir, field, d)
    # group codes: dictionary-encode the field values; NULLs become
    # singleton groups (unique codes past the dictionary)
    enc = pc.dictionary_encode(vals)
    null_mask = np.asarray(pc.is_null(vals).to_numpy(
        zero_copy_only=False), dtype=bool)
    codes = np.asarray(enc.indices.fill_null(0)
                       .to_numpy(zero_copy_only=False), dtype=np.int64)
    if null_mask.any():
        codes[null_mask] = len(enc.dictionary) + np.arange(
            int(null_mask.sum()), dtype=np.int64)
    counts = np.bincount(codes)
    rorder = np.lexsort((d, -sr))            # the engine ranking order
    first_pos = np.unique(codes[rorder], return_index=True)[1]
    sel = rorder[np.sort(first_pos)[:k]]     # reps, in rank order, cut k
    return pa.table({
        "docid": pa.array(d[sel], type=pa.int64()),
        "rank": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64)),
        "score_r": pa.array(sr[sel], type=pa.float64()),
        field: vals.take(pa.array(sel)),
        "group_count": pa.array(counts[codes[sel]].astype(np.int64)),
    })


def function_score_search(index_dir: str, query: str,
                          field: str = "doclen",
                          factor: float = 1.0, k: int = 10,
                          cfg: "EngineConfig | None" = None,
                          scorer=None) -> pa.Table:
    """Function-score query — the Elasticsearch ``field_value_factor``
    analog (modifier ``ln1p``, boost_mode ``multiply``): every matching
    doc is rescored as ``round(base_r * factor * ln(1 + field), 6)``
    where ``field`` is a NUMERIC docmeta column, then top-k by
    (-score_r, docid).

    Scale shape: identical to collapse_search — posting-driven scoring,
    predicate-pushed docmeta read of only the matching docids. NULL
    field values contribute factor 0 (the doc keeps score 0.0), mirroring
    a ``missing: 0`` setting.
    """
    import numpy as np

    from colbert_ray.functions.tokenizer import tokenize_query

    scorer = scorer or BM25Scorer(index_dir, k=max(1, k), with_sha=False)
    if scorer.ranker != "bm25":
        raise ValueError("function_score_search supports ranker='bm25' "
                         "only")
    cfg = cfg or scorer.idx.cfg
    empty = pa.table({"docid": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64()),
                      "score_r": pa.array([], type=pa.float64()),
                      "base_r": pa.array([], type=pa.float64()),
                      field: pa.array([], type=pa.float64())})
    tids = scorer.idx.lookup_terms(tokenize_query(query, cfg)[0])
    if not len(tids) or k <= 0:
        return empty
    d, s = scorer._all_match_scores(tids, docid_filter=scorer.docid_filter)
    if not len(d):
        return empty
    base_r = np.round(s, 6)
    vals = _docmeta_lookup(index_dir, field, d)
    if not (pa.types.is_integer(vals.type)
            or pa.types.is_floating(vals.type)):
        raise ValueError(f"field {field!r} is {vals.type}; "
                         f"function_score needs a numeric docmeta column")
    v = np.asarray(vals.fill_null(0).to_numpy(zero_copy_only=False),
                   dtype=np.float64)
    # ln(1 + v), NOT log1p: the SQL twin computes ln(1 + field) and the
    # two can differ in the last ulp — keep the IEEE op sequence identical
    score_r = np.round(base_r * factor * np.log(1.0 + v), 6)
    order = np.lexsort((d, -score_r))[:k]
    return pa.table({
        "docid": pa.array(d[order], type=pa.int64()),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        "score_r": pa.array(score_r[order], type=pa.float64()),
        "base_r": pa.array(base_r[order], type=pa.float64()),
        field: pa.array(v[order], type=pa.float64()),
    })


def min_should_match_search(index_dir: str, query: str, m: int = 2,
                            k: int = 10,
                            cfg: "EngineConfig | None" = None,
                            scorer=None) -> pa.Table:
    """``minimum_should_match`` — the Elasticsearch/Lucene knob between
    pure OR (m=1, plain BM25) and pure AND (m = n query terms): only docs
    matching at least ``m`` DISTINCT query terms rank. Returns
    (docid, rank, score_r, n_match) under the engine's rounded policy.

    Shape: the candidate set is one posting rollup with a vectorized
    count filter (``phrase.disjunctive_docs`` — O(sum df), index-only),
    then the standard restricted scoring pass; no corpus scan.
    """
    import numpy as np

    from colbert_ray.functions.tokenizer import tokenize_query
    from colbert_ray.pipelines.phrase import disjunctive_docs

    scorer = scorer or BM25Scorer(index_dir, k=max(1, k), with_sha=False)
    if scorer.ranker != "bm25":
        raise ValueError("min_should_match_search supports ranker='bm25' "
                         "only")
    cfg = cfg or scorer.idx.cfg
    empty = pa.table({"docid": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64()),
                      "score_r": pa.array([], type=pa.float64()),
                      "n_match": pa.array([], type=pa.int64())})
    terms = tokenize_query(query, cfg)[0]
    tids = scorer.idx.lookup_terms(terms)
    if not len(tids) or k <= 0:
        return empty
    cand_t = disjunctive_docs(index_dir, list(terms),
                              min_should_match=max(1, m))
    if cand_t.num_rows == 0:
        return empty
    cand = cand_t.column("doc_id").to_numpy(zero_copy_only=False)
    n_match = cand_t.column("n_match").to_numpy(zero_copy_only=False)
    if scorer.docid_filter is not None:
        if not len(scorer.docid_filter):
            return empty
        pos = np.clip(np.searchsorted(scorer.docid_filter, cand), 0,
                      len(scorer.docid_filter) - 1)
        keep = scorer.docid_filter[pos] == cand
        cand, n_match = cand[keep], n_match[keep]
        if not len(cand):
            return empty
    d, s = scorer._all_match_scores(tids, docid_filter=cand)
    sr = np.round(s, 6)
    # every candidate matches >= m >= 1 terms, so d == cand (both sorted)
    nm = n_match[np.searchsorted(cand, d)]
    order = np.lexsort((d, -sr))[:k]
    return pa.table({
        "docid": pa.array(d[order], type=pa.int64()),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        "score_r": pa.array(sr[order], type=pa.float64()),
        "n_match": pa.array(nm[order].astype(np.int64)),
    })


def _round6_half_away(x: float) -> float:
    """Round to 6 decimals HALF-AWAY-FROM-ZERO for non-negative x,
    reproducing DuckDB's double round() (std::round(x*1e6)/1e6) exactly:
    the fractional part of the scaled double is compared against 0.5 after
    an exact floor subtraction, so dyadic quotients on the midpoint (e.g.
    2.0078125) round UP like SQL, where Python/numpy's half-even rounds
    down — the one divergence class integer/integer averages can hit."""
    import math

    t = x * 1e6
    f = math.floor(t)
    return (f + (1.0 if t - f >= 0.5 else 0.0)) / 1e6


def match_stats(index_dir: str, query: str,
                cfg: "EngineConfig | None" = None,
                scorer=None) -> pa.Table:
    """Stats aggregation over a query's FULL match set — the ES
    ``track_total_hits`` + stats-agg analog, computed entirely from the
    index (posting rollup + the doclens array; no corpus scan): one row
    (total_hits, max_score_r, sum_doclen, avg_doclen). Aggregates are
    chosen to be float-policy-safe across the SQL twin: counts and
    doclen sums are integer-exact, max is a single rounded value; a
    float AVG over thousands of scores could land on a 7th-digit
    rounding boundary where numpy (half-even) and SQL (half-away)
    disagree, so it is deliberately not offered. avg_doclen IS offered
    but is the one dyadic-rational risk case (an integer/integer
    quotient like 257/128 = 2.0078125 sits exactly on the midpoint), so
    it is rounded HALF-AWAY on the engine side via ``_round6_half_away``
    — bit-identical to DuckDB's ``round(x, 6)`` = std::round(x*1e6)/1e6."""
    import numpy as np

    from colbert_ray.functions.tokenizer import tokenize_query

    scorer = scorer or BM25Scorer(index_dir, k=1, with_sha=False)
    if scorer.ranker != "bm25":
        raise ValueError("match_stats supports ranker='bm25' only")
    cfg = cfg or scorer.idx.cfg
    empty = pa.table({"total_hits": pa.array([0], type=pa.int64()),
                      "max_score_r": pa.array([0.0], type=pa.float64()),
                      "sum_doclen": pa.array([0], type=pa.int64()),
                      "avg_doclen": pa.array([0.0], type=pa.float64())})
    tids = scorer.idx.lookup_terms(tokenize_query(query, cfg)[0])
    if not len(tids):
        return empty
    d, s = scorer._all_match_scores(tids, docid_filter=scorer.docid_filter)
    if not len(d):
        return empty
    sr = np.round(s, 6)
    sum_dl = int(np.asarray(
        scorer.idx.doclens[d - scorer.idx.docid_base],
        dtype=np.int64).sum())
    return pa.table({
        "total_hits": pa.array([len(d)], type=pa.int64()),
        "max_score_r": pa.array([round(float(sr.max()), 6)],
                                type=pa.float64()),
        "sum_doclen": pa.array([sum_dl], type=pa.int64()),
        "avg_doclen": pa.array([_round6_half_away(sum_dl / len(d))],
                               type=pa.float64()),
    })


def sampled_matches(index_dir: str, query: str, rate: float = 0.1,
                    seed: int = 0,
                    cfg: "EngineConfig | None" = None,
                    scorer=None) -> pa.Table:
    """Deterministic sample of a query's match set — the reproducible
    form of ES's seeded ``random_score``: a matching doc survives iff its
    docid's FNV-1a+fmix64 hash falls under ``rate`` (the same integer
    hash gate as ``extras/sampling.hash_sample``, so samples are
    parallelism-invariant, shuffle-free AND consistent across queries:
    the same docids survive every gate — the property that makes
    hash-sampled eval sets comparable between runs). Returns
    (docid, score_r) in docid order.
    """
    import numpy as np
    import pyarrow.compute as pc

    from colbert_ray.extras.sampling import sample_threshold
    from colbert_ray.functions.hashing import U64_MOD, fmix64, fnv1a64_strings
    from colbert_ray.functions.tokenizer import tokenize_query

    scorer = scorer or BM25Scorer(index_dir, k=1, with_sha=False)
    if scorer.ranker != "bm25":
        raise ValueError("sampled_matches supports ranker='bm25' only")
    cfg = cfg or scorer.idx.cfg
    empty = pa.table({"docid": pa.array([], type=pa.int64()),
                      "score_r": pa.array([], type=pa.float64())})
    tids = scorer.idx.lookup_terms(tokenize_query(query, cfg)[0])
    if not len(tids):
        return empty
    d, s = scorer._all_match_scores(tids, docid_filter=scorer.docid_filter)
    if not len(d):
        return empty
    h = fnv1a64_strings(pc.cast(pa.array(d), pa.string()))
    if seed:
        h = h + np.uint64(seed % U64_MOD)
    keep = fmix64(h) <= np.uint64(sample_threshold(rate))
    d, sr = d[keep], np.round(s[keep], 6)
    return pa.table({"docid": pa.array(d, type=pa.int64()),
                     "score_r": pa.array(sr, type=pa.float64())})
