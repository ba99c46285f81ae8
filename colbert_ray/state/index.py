"""Exact BM25 scorer — the query-serving state (T3).

Analog of the reference's ``IndexScorer`` / ``IndexLoader`` stack
(``colbert/search/index_loader.py:13-66``, ``index_storage.py:20-30``):
the index is opened ONCE per query-serving actor (actor-pool ``__init__``
mmap-opens the serve artifact via ``DecodedIndex.load_cached``), then
reused across query batches. Candidate pruning is exact BLOCK-MAX MaxScore
(the classical analog of PLAID's two-stage centroid pruning,
``index_storage.py:111-194`` / ``filter_pids.cpp:27-170`` — ours is
provably lossless for top-k).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from colbert_ray.functions.bm25 import topk_with_ties
from colbert_ray.functions.tokenizer import tokenize_query
from colbert_ray.functions.util import search_defaults_for_k


class BM25Scorer:
    """Actor-pool batch scorer: query rows in -> ranking rows out.

    Used as ``queries.map_batches(BM25Scorer, fn_constructor_kwargs=...,
    concurrency=N)`` (T3 analog). The index is a ``DecodedIndex`` — either
    loaded from ``index_dir`` or received ZERO-COPY as a Ray object ref
    (``index_ref``), so every actor on a node shares one decoded copy
    (the mmap-shared-index analog, ``residual_embeddings.py:31-54``).

    Scoring is exact float64 TAAT: per-document contributions are
    scatter-added in ascending term_id order (== lexicographic term order)
    with tf-saturation precomputed per posting -> bit-identical to the
    oracle at any parallelism level. ``docid_filter`` is the analog of the
    reference's ``filter_fn`` pid hook (``searcher.py:76-99``).
    """

    # dense accumulator path is used while the per-shard docid space fits
    # comfortably in a worker heap; beyond that, candidate-based (sparse)
    DENSE_MAX_DOCIDS = 8_000_000
    # class-level defaults so directly-constructed instances (tests use
    # __new__ to skip index loading) score as plain BM25
    ranker = "bm25"
    mu = 2000.0

    def __init__(self, index_dir: str | None = None, k: int = 10,
                 prune: bool | None = None, with_sha: bool = True,
                 index_ref=None, docid_filter=None,
                 docid_range: tuple[int, int] | None = None,
                 prune_strategy: str | None = None,
                 parent_base: int | None = None,
                 ranker: str = "bm25", mu: float | None = None):
        from colbert_ray.state.decoded import DecodedIndex

        if ranker not in ("bm25", "ql"):
            raise ValueError(f"unknown ranker {ranker!r} (bm25|ql)")
        if ranker == "ql":
            if parent_base is not None:
                raise ValueError("ranker='ql' + parent_base not supported")

        if parent_base is not None:
            if with_sha:
                raise ValueError(
                    "parent_base returns PARENT ids (docid // parent_base), "
                    "which have no content sha — pass with_sha=False")
            if int(parent_base) < 1:
                raise ValueError(f"parent_base must be >= 1, got {parent_base}")

        if index_ref is not None:
            import ray as _ray

            self.idx = _ray.get(index_ref)   # zero-copy numpy views
        else:
            # per-actor open: with the serve artifact this is an mmap open
            # (milliseconds; page cache shared across actors on a node) and
            # docid_range restriction copies only the shard's ~1/N postings
            self.idx = DecodedIndex.load_cached(
                index_dir, docid_range=docid_range, load_sha=with_sha)
        if ranker == "ql" and docid_range is not None:
            # materialize the lazy cf sidecar now (restriction defers the
            # global tf scan so BM25-only shards never pay it); a restricted
            # index with NO global cf source must fail loudly — shard-local
            # cf would corrupt the global p(t|C)
            ensure = getattr(self.idx, "ensure_cf_by_term", None)
            cf = ensure() if ensure is not None else getattr(
                self.idx, "cf_by_term", None)
            if cf is None:
                raise ValueError("ranker='ql' on a docid_range shard needs "
                                 "the global cf_by_term sidecar (rebuild the "
                                 "serve artifact or reload via "
                                 "DecodedIndex.load)")
        self.k = k
        self.prune = self.idx.cfg.prune if prune is None else prune
        self.prune_strategy = (self.idx.cfg.prune_strategy
                               if prune_strategy is None else prune_strategy)
        # k-dependent execution defaults (K5, searcher.py:127-148 analog):
        # oversample scales the MaxScore candidate budget; prefer_dense picks
        # the fallback accumulator. Both affect SPEED only — every path is
        # exact, so results are identical for any defaults.
        self.defaults = search_defaults_for_k(k)
        self.with_sha = with_sha
        self.docid_filter = (
            np.sort(np.asarray(docid_filter, dtype=np.int64))
            if docid_filter is not None else None
        )
        self.parent_base = parent_base
        self.ranker = ranker
        from colbert_ray.functions.ql import DEFAULT_MU

        self.mu = float(DEFAULT_MU if mu is None else mu)
        self._cf_cache: dict[int, float] = {}
        self._dense = (self.defaults["prefer_dense"]
                       and len(self.idx.doclens) <= self.DENSE_MAX_DOCIDS)
        # introspection counters (tests/bench assert pruning actually fires)
        self.stats = {"blocks_skipped": 0, "maxscore_bailouts": 0,
                      "bmw_regions_skipped": 0, "bmw_bailouts": 0}

    @property
    def reader(self):   # transitional alias used by callers wanting metadata
        return self.idx

    def score_query(self, text: str, k: int | None = None,
                    docid_filter: np.ndarray | None = None):
        """-> (docids, scores, ranks) for one query. Exact top-k."""
        k = self.k if k is None else int(k)
        if k <= 0:      # k=0 is a valid request for zero rows; negative too
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.int32))
        if docid_filter is None:
            docid_filter = self.docid_filter
        idx = self.idx
        tids = idx.lookup_terms(tokenize_query(text, idx.cfg)[0])
        if len(tids) == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.int32))

        if self.ranker == "ql":
            cand, scores = self._ql_all_match_scores(tids, docid_filter)
            return topk_with_ties(scores, cand, k)

        # --- exact block-max MaxScore (K4 analog, lossless) --------------
        # candidates come only from "essential" lists (descending upper
        # bound idf*max_tfsat) until the remaining lists' UB sum is provably
        # below the current k-th best exact score; non-essential (head)
        # lists are then PROBED per candidate (binary search into their
        # sorted postings) instead of scanned. Tombstoned / filtered-out
        # docids are excluded at candidate generation (they must never
        # rank, so dropping them is exact). Bails out to the dense scatter
        # path when the candidate set grows too large to win.
        if self.prune and len(tids) > 1:
            if self.prune_strategy == "bmw":
                res = self._bmw_query(tids, k, docid_filter=docid_filter)
            else:
                res = self._maxscore_query(tids, k, docid_filter=docid_filter)
            if res is not None:
                return res

        cand, scores = self._all_match_scores(tids, docid_filter)
        return topk_with_ties(scores, cand, k)

    def _all_match_scores(self, tids: np.ndarray,
                          docid_filter: np.ndarray | None):
        """(candidate docids sorted ascending, exact float64 scores) over
        ALL matching docids — the pre-top-k form shared by score_query's
        dense/sparse fallback paths and the max-passage reduction. Same
        summation order as before the refactor (ascending term_id), so
        scores are bit-identical."""
        idx = self.idx
        if self._dense:
            # accumulator is SHARD-sized (docid_base offset): a 1/N docid
            # shard allocates 1/N of the dense array, not the global space
            base = idx.docid_base
            scores_dense = np.zeros(len(idx.doclens), dtype=np.float64)
            # ascending term_id => fixed per-doc summation order
            for tid in tids:
                d, ts = idx.postings_slice(int(tid))
                scores_dense[d - base] += idx.idf_by_term_id[tid] * ts
            if len(idx.tombstones):
                # range-guard: IndexUpdater accepts arbitrary ids; a stale
                # out-of-range tombstone must not crash (or, negative, wrap
                # around and zero a DIFFERENT doc's score)
                t = idx.tombstones
                t = t[(t >= base) & (t < base + len(scores_dense))]
                scores_dense[t - base] = 0.0       # removed never rank
            cand = np.flatnonzero(scores_dense) + base
            if docid_filter is not None:
                cand = cand[np.isin(cand, docid_filter)]
            return cand, scores_dense[cand - base]

        # ---- sparse path: candidate union + searchsorted accumulate ----
        posts = [idx.postings_slice(int(t)) for t in tids]
        if docid_filter is not None:
            masks = [np.isin(d, docid_filter) for d, _ in posts]
            posts = [(d[m], ts[m]) for (d, ts), m in zip(posts, masks)]
        nonempty = [d for d, _ in posts if len(d)]
        if not nonempty:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        cand = np.unique(np.concatenate(nonempty))
        if len(idx.tombstones):
            cand = cand[~np.isin(cand, idx.tombstones)]
        scores = np.zeros(len(cand), dtype=np.float64)
        for (d, ts), tid in zip(posts, tids):
            if len(d) == 0:
                continue
            pos = np.searchsorted(cand, d)
            # membership mask: tombstoned/filtered docids are absent from
            # cand and must not scatter into neighbours' slots
            pos_c = np.minimum(pos, len(cand) - 1)
            hit = cand[pos_c] == d
            scores[pos_c[hit]] += idx.idf_by_term_id[tid] * ts[hit]
        return cand, scores

    def explain(self, text: str, docids) -> "pa.Table":
        """Lucene-explain analog: the per-term scoring breakdown for the
        given docids — one row per (query term, docid) match with the term's
        served df, idf, raw tf, and the exact float64 contribution
        ``idf * tfsat`` that ``score_query`` sums. Tombstoned docids are
        excluded (they never rank); terms or docids without a posting simply
        contribute no row. Emitted in ascending (term_id, docid) order —
        the scorer's own summation order."""
        import pyarrow as pa

        idx = self.idx
        req = np.unique(np.asarray(docids, dtype=np.int64))
        if len(idx.tombstones):
            req = req[~np.isin(req, idx.tombstones)]
        terms = tokenize_query(text, idx.cfg)[0]
        out: dict[str, list] = {c: [] for c in (
            "term", "docid", "tf", "df", "idf", "contribution")}
        if len(req) and terms and len(idx.dict_terms):
            t_arr = np.asarray(terms, dtype=object)
            pos = np.searchsorted(idx.dict_terms, t_arr)
            pos_c = np.clip(pos, 0, len(idx.dict_terms) - 1)
            hit = idx.dict_terms[pos_c] == t_arr
            found = [(int(idx.dict_term_ids[p]), str(t), int(p))
                     for t, p, ok in zip(t_arr, pos_c, hit) if ok]
            for tid, term, p in sorted(found):   # ascending term_id
                d, tsat = idx.postings_slice(tid)
                if len(d) == 0:
                    continue
                _, tfs = idx.postings_slice_raw(tid)
                sel = np.minimum(np.searchsorted(d, req), len(d) - 1)
                m = d[sel] == req
                if not m.any():
                    continue
                i = sel[m]
                idf = float(idx.idf_by_term_id[tid])
                out["term"].extend([term] * int(m.sum()))
                out["docid"].extend(req[m].tolist())
                out["tf"].extend(np.asarray(tfs[i], dtype=np.int64).tolist())
                out["df"].extend([int(idx.dict_dfs[p])] * int(m.sum()))
                out["idf"].extend([idf] * int(m.sum()))
                out["contribution"].extend((idf * tsat[i]).tolist())
        return pa.table({
            "term": pa.array(out["term"], type=pa.string()),
            "docid": pa.array(out["docid"], type=pa.int64()),
            "tf": pa.array(out["tf"], type=pa.int64()),
            "df": pa.array(out["df"], type=pa.int64()),
            "idf": pa.array(out["idf"], type=pa.float64()),
            "contribution": pa.array(out["contribution"], type=pa.float64()),
        })

    def score_query_parent_max(self, text: str, k: int | None = None):
        """Max-passage retrieval (M12 + the K7 max-passage merge,
        ``utility/rankings/dev_subsample.py``-style doc ranking): score ALL
        matching passages exactly, reduce max per PARENT document
        (parent = docid // parent_base), return top-k parents by
        (-max score, parent). The full passage match set never leaves the
        actor — output is bounded by k, replacing the k=10^6 driver-side
        materialization (VERDICT r3 watch item #5). On a docid-range shard
        the reduction is per-shard; a cross-shard merge that maxes per
        parent is exact because max(per-shard maxes) == global max (pids
        of one parent are contiguous, so at most two shards split one
        parent)."""
        k = self.k if k is None else int(k)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
                 np.empty(0, dtype=np.int32))
        if k <= 0:
            return empty
        idx = self.idx
        tids = idx.lookup_terms(tokenize_query(text, idx.cfg)[0])
        if len(tids) == 0:
            return empty
        cand, scores = self._all_match_scores(tids, self.docid_filter)
        if len(cand) == 0:
            return empty
        # cand is sorted ascending and pid = parent * base + passage_idx,
        # so parents are NONDECREASING: per-parent max is one reduceat
        parents = cand // self.parent_base
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(parents)) + 1])
        pmax = np.maximum.reduceat(scores, starts)
        return topk_with_ties(pmax, parents[starts], k)

    def _ql_all_match_scores(self, tids: np.ndarray,
                             docid_filter: np.ndarray | None):
        """Dirichlet query-likelihood over the SAME index (functions/ql.py;
        the pluggable-scorer analog of the reference choosing its scoring
        backend over one stored index, ``index_storage.py:35-52``).

        Candidates = union of the query terms' posting lists; per-candidate
        score = sum of matching-term contributions accumulated in ascending
        term_id order (float64, the determinism contract) + the
        |q|*ln(mu/(dl+mu)) length tail. cf_t is the served posting content's
        term frequency sum; n_tokens is the frozen build-time total
        (stats.json), mirroring BM25's frozen idf/avgdl under deltas."""
        from colbert_ray.functions.ql import ql_length_norm, ql_term_contrib

        idx = self.idx
        mu = self.mu
        posts = [idx.postings_slice_raw(int(t)) for t in tids]
        # cf is GLOBAL (the collection model): preferably the vocab-sized
        # cf_by_term sidecar, which restriction/fold keep global — that is
        # what makes docid_range-sharded QL exact. The on-demand served-
        # postings sum is the unsharded-only fallback (pre-cf artifacts).
        ensure = getattr(idx, "ensure_cf_by_term", None)
        cf_arr = (ensure() if ensure is not None
                  else getattr(idx, "cf_by_term", None))
        cache = self.__dict__.setdefault("_cf_cache", {})
        cfs = []
        for tid, (d, tf) in zip(tids, posts):
            c = cache.get(int(tid))
            if c is None:
                c = (float(cf_arr[int(tid)]) if cf_arr is not None
                     else float(np.asarray(tf, dtype=np.int64).sum()))
                cache[int(tid)] = c
            cfs.append(c)
        if docid_filter is not None:
            masks = [np.isin(d, docid_filter) for d, _ in posts]
            posts = [(d[m], tf[m]) for (d, tf), m in zip(posts, masks)]
        nonempty = [d for d, _ in posts if len(d)]
        if not nonempty:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        cand = np.unique(np.concatenate(nonempty))
        if len(idx.tombstones):
            cand = cand[~np.isin(cand, idx.tombstones)]
        if len(cand) == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        scores = np.zeros(len(cand), dtype=np.float64)
        for (d, tf), cf in zip(posts, cfs):        # ascending term_id
            if len(d) == 0 or cf <= 0:
                continue
            pos = np.searchsorted(cand, d)
            pos_c = np.minimum(pos, len(cand) - 1)
            hit = cand[pos_c] == d
            scores[pos_c[hit]] += ql_term_contrib(
                tf[hit], cf, idx.total_tokens, mu)
        dl = idx.doclens[cand - idx.docid_base]
        scores += ql_length_norm(dl, len(tids), mu)
        return cand, scores

    def _maxscore_query(self, tids: np.ndarray, k: int,
                        docid_filter: np.ndarray | None = None):
        """Exact block-max MaxScore (K4 two-stage analog,
        ``index_storage.py:111-194`` / ``filter_pids.cpp:27-170``).

        Lists are merged in descending upper-bound (idf * max_tfsat) order;
        each candidate is exact-scored ONCE over all query terms (ascending
        term_id — the oracle's summation order). Once k candidates exist,
        the running kth exact score θ prunes at BLOCK granularity: a block j
        of the current list only contributes new candidates if
        ``idf * block_max_tfsat[j] + tail_ub`` can still reach θ (tail_ub =
        UB sum of the not-yet-merged lists). Skipped docs are provably below
        θ - eps ≤ final kth - eps, so the result is lossless; the eps margin
        absorbs float summation-order ulps. Returns None to bail to the
        dense scatter path when candidates would exceed the cap.
        """
        idx = self.idx
        cand_cap = max(self.defaults["oversample"] * 4 * k,
                       len(idx.doclens) // 8)
        # cheap selectivity precheck: with no small list there is nothing to
        # gain over one dense scatter pass — bail before doing any work
        dfs = idx.posting_offsets[tids + 1] - idx.posting_offsets[tids]
        if int(dfs.min()) > cand_cap:
            self.stats["maxscore_bailouts"] += 1
            return None
        ubs = idx.idf_by_term_id[tids] * idx.max_tfsat_by_term[tids]
        order = np.argsort(-ubs, kind="stable")
        bs = idx.cfg.posting_block_size
        cand = np.empty(0, dtype=np.int64)      # sorted by docid
        scores = np.empty(0, dtype=np.float64)  # exact, aligned with cand
        theta = -np.inf
        for m in range(len(order)):
            t = int(tids[order[m]])
            ub_t = float(ubs[order[m]])
            tail_ub = float(ubs[order[m + 1:]].sum())
            eps = 1e-12 * max(1.0, abs(theta)) if np.isfinite(theta) else 0.0
            if np.isfinite(theta) and ub_t + tail_ub < theta - eps:
                break        # no unseen doc can reach the top-k any more
            s, e = int(idx.posting_offsets[t]), int(idx.posting_offsets[t + 1])
            d_all = idx.posting_docids[s:e]
            if np.isfinite(theta) and idx.block_offsets is not None and e > s:
                # block-max skip: only blocks that can still beat θ yield
                # NEW candidates (docs already in cand are fully scored)
                bo, bh = int(idx.block_offsets[t]), int(idx.block_offsets[t + 1])
                bmax = np.asarray(idx.block_max_tfsat[bo:bh])
                good = np.flatnonzero(
                    idx.idf_by_term_id[t] * bmax + tail_ub >= theta - eps)
                if len(good) < bh - bo:
                    self.stats["blocks_skipped"] += int(bh - bo - len(good))
                    if len(good) == 0:
                        continue
                    starts = s + good * bs
                    ends = np.minimum(starts + bs, e)
                    pos = self._gather_ranges(starts, ends)
                    d_all = idx.posting_docids[pos]
            # keep only unseen docids (candidates are scored exactly once)
            if len(cand):
                p = np.searchsorted(cand, d_all)
                pc = np.minimum(p, len(cand) - 1)
                d_new = d_all[cand[pc] != d_all]
            else:
                d_new = np.asarray(d_all)
            # excluded docs never rank -> dropping them at candidate
            # generation is exact (they can't contribute to θ either,
            # which only makes θ smaller = pruning more conservative)
            if len(idx.tombstones) and len(d_new):
                d_new = d_new[~np.isin(d_new, idx.tombstones)]
            if docid_filter is not None and len(d_new):
                d_new = d_new[np.isin(d_new, docid_filter)]
            if len(cand) + len(d_new) > cand_cap:
                self.stats["maxscore_bailouts"] += 1
                return None                      # dense scatter is cheaper
            if len(d_new):
                s_new = self._score_cand(tids, d_new)
                cand = np.concatenate([cand, d_new])
                scores = np.concatenate([scores, s_new])
                o2 = np.argsort(cand, kind="stable")
                cand, scores = cand[o2], scores[o2]
            if len(cand) >= k:
                theta = float(
                    np.partition(scores, len(scores) - k)[len(scores) - k])
        if len(cand) == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.int32))
        return topk_with_ties(scores, cand, k)

    @staticmethod
    def _gather_ranges(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
        """Flat positions covered by [starts[i], ends[i]) ranges, vectorized."""
        counts = ends - starts
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64)
        base = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=base[1:])
        return (np.repeat(starts, counts)
                + np.arange(total, dtype=np.int64) - np.repeat(base, counts))

    def _bmw_query(self, tids: np.ndarray, k: int,
                   docid_filter: np.ndarray | None = None):
        """Exact block-max WAND (the north-star's named algorithm; Ding &
        Suel 2011, vectorized region-at-a-time instead of cursor-at-a-time).

        All query terms' block boundaries are merged into DISJOINT docid
        REGIONS; because every term's block boundaries are region boundaries,
        a region lies inside exactly ONE block per term, so the per-term
        block-max contribution is a constant over each region — WAND's
        pivot test (sum of the aligned block maxima at the candidate docid
        vs θ) becomes a per-region precomputed table instead of a cursor
        merge. Lists are then consumed in descending global-UB order; a doc
        FIRST appearing in list i and region r is bounded by the region-tail
        ``suffix[i][r] = Σ_{j≥i} idf_j · block_max_j(r)`` (it misses lists
        0..i-1 by definition), so when that tail can't reach θ the whole
        (list, region) pair is skipped without touching its postings. This
        is strictly tighter than the MaxScore path's global-tail bound
        (``idf_i·bmax_i(block) + Σ_j>i global_UB_j``): WAND aligns ALL
        tails to the candidate's region. Each candidate is exact-scored
        ONCE over all terms (ascending term_id — the oracle's summation
        order); eps absorbs float summation-order ulps → provably lossless.
        Tombstoned / filtered docids are dropped at candidate generation
        (they may only LOWER θ = more conservative pruning). Returns None
        to bail to the dense/sparse fallback when the candidate set would
        exceed the cap or block metadata is absent.
        """
        idx = self.idx
        if idx.block_offsets is None:
            return None
        cand_cap = max(self.defaults["oversample"] * 4 * k,
                       len(idx.doclens) // 8)
        dfs = idx.posting_offsets[tids + 1] - idx.posting_offsets[tids]
        if int(dfs.min()) > cand_cap:
            self.stats["bmw_bailouts"] += 1
            return None
        idfs = idx.idf_by_term_id[tids]
        lasts_t, bmaxs_t = [], []
        for t in tids:
            bo, bh = int(idx.block_offsets[t]), int(idx.block_offsets[t + 1])
            lasts_t.append(np.asarray(idx.block_last_docid[bo:bh]))
            bmaxs_t.append(np.asarray(idx.block_max_tfsat[bo:bh]))
        nonempty = [l for l in lasts_t if len(l)]
        if not nonempty:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.int32))
        # region r covers docids in [region_lo[r], region_hi[r])
        bounds = np.unique(np.concatenate(nonempty))
        n_reg = len(bounds)
        # the pivot table is T x n_reg float64s; on a shard whose head
        # terms span millions of blocks that working set can't win over a
        # dense scatter pass — bail before allocating it (per-shard block
        # counts on a docid-sharded deployment keep n_reg small; this
        # guard is for unsharded giants)
        if n_reg * len(tids) > 8_000_000:
            self.stats["bmw_bailouts"] += 1
            return None
        region_lo = np.empty(n_reg, dtype=np.int64)
        region_lo[0] = 0
        region_lo[1:] = bounds[:-1] + 1
        region_hi = bounds + 1
        # per-(term, region): block-max contribution + posting-position range
        contrib = np.zeros((len(tids), n_reg), dtype=np.float64)
        lo_pos = np.empty((len(tids), n_reg), dtype=np.int64)
        hi_pos = np.empty((len(tids), n_reg), dtype=np.int64)
        for i, (idf_t, last_t, bmax_t) in enumerate(
                zip(idfs, lasts_t, bmaxs_t)):
            s, e = int(idx.posting_offsets[tids[i]]), \
                int(idx.posting_offsets[tids[i] + 1])
            d_t = idx.posting_docids[s:e]
            lo_pos[i] = s + np.searchsorted(d_t, region_lo)
            hi_pos[i] = s + np.searchsorted(d_t, region_hi)
            if len(last_t):
                j = np.searchsorted(last_t, bounds, side="left")
                valid = j < len(last_t)
                contrib[i, valid] = idf_t * bmax_t[j[valid]]

        # consume lists in descending global-UB order; suffix[i][r] is the
        # WAND pivot bound for docs first appearing in list i, region r
        ubs = idfs * idx.max_tfsat_by_term[tids]
        order = np.argsort(-ubs, kind="stable")
        suffix = contrib[order][::-1].cumsum(axis=0)[::-1]
        cand = np.empty(0, dtype=np.int64)      # sorted by docid
        scores = np.empty(0, dtype=np.float64)  # exact, aligned with cand
        theta = -np.inf
        for i in range(len(order)):
            m = int(order[i])
            eps = 1e-12 * max(1.0, abs(theta)) if np.isfinite(theta) else 0.0
            if np.isfinite(theta):
                good = np.flatnonzero(suffix[i] >= theta - eps)
                self.stats["bmw_regions_skipped"] += int(n_reg - len(good))
                if len(good) == 0:
                    continue
            else:
                good = np.arange(n_reg)
            pos = self._gather_ranges(lo_pos[m][good], hi_pos[m][good])
            d_all = idx.posting_docids[pos] if len(pos) else \
                np.empty(0, dtype=np.int64)
            # keep only unseen docids (candidates are scored exactly once)
            if len(cand) and len(d_all):
                p = np.searchsorted(cand, d_all)
                pc = np.minimum(p, len(cand) - 1)
                d_new = d_all[cand[pc] != d_all]
            else:
                d_new = d_all
            if len(idx.tombstones) and len(d_new):
                d_new = d_new[~np.isin(d_new, idx.tombstones)]
            if docid_filter is not None and len(d_new):
                d_new = d_new[np.isin(d_new, docid_filter)]
            if len(cand) + len(d_new) > cand_cap:
                self.stats["bmw_bailouts"] += 1
                return None                      # dense scatter is cheaper
            if len(d_new):
                s_new = self._score_cand(tids, d_new)
                cand = np.concatenate([cand, d_new])
                scores = np.concatenate([scores, s_new])
                o2 = np.argsort(cand, kind="stable")
                cand, scores = cand[o2], scores[o2]
            if len(cand) >= k:
                theta = float(
                    np.partition(scores, len(scores) - k)[len(scores) - k])
        if len(cand) == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.int32))
        return topk_with_ties(scores, cand, k)

    def _score_cand(self, tids: np.ndarray, cand: np.ndarray) -> np.ndarray:
        """Exact scores of ``cand`` over all terms, ascending term_id order;
        each list is PROBED at the candidate positions (both sides sorted)."""
        idx = self.idx
        scores = np.zeros(len(cand), dtype=np.float64)
        for tid in tids:                        # tids are sorted ascending
            d, ts = idx.postings_slice(int(tid))
            if len(d) == 0:
                continue
            pos = np.searchsorted(d, cand)
            pos_c = np.minimum(pos, len(d) - 1)
            hit = d[pos_c] == cand
            if hit.any():
                scores[hit] += idx.idf_by_term_id[tid] * ts[pos_c[hit]]
        return scores

    def score_weighted_terms(self, terms: list[str], weights: list[float],
                             k: int | None = None):
        """Exact weighted-term scoring: score(d) = sum_t w_t * idf_t *
        tfsat(t,d) — the RM3-expanded-query form (pipelines/expand.py).
        Terms are resolved individually so each keeps its weight; OOV
        terms drop. Accumulation ascending term_id (determinism contract);
        pruning bounds assume w=1 so this always takes the exact
        candidate-union path."""
        k = self.k if k is None else int(k)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
                 np.empty(0, dtype=np.int32))
        if k <= 0:
            return empty
        idx = self.idx
        pairs = []
        for t, w in zip(terms, weights):
            tid = idx.lookup_terms([t])
            if len(tid):
                pairs.append((int(tid[0]), float(w)))
        if not pairs:
            return empty
        pairs.sort()                              # ascending term_id
        posts = [idx.postings_slice(tid) for tid, _ in pairs]
        if self.docid_filter is not None:
            masks = [np.isin(d, self.docid_filter) for d, _ in posts]
            posts = [(d[m], ts[m]) for (d, ts), m in zip(posts, masks)]
        nonempty = [d for d, _ in posts if len(d)]
        if not nonempty:
            return empty
        cand = np.unique(np.concatenate(nonempty))
        if len(idx.tombstones):
            cand = cand[~np.isin(cand, idx.tombstones)]
        if len(cand) == 0:
            return empty
        scores = np.zeros(len(cand), dtype=np.float64)
        for (d, ts), (tid, w) in zip(posts, pairs):
            if len(d) == 0:
                continue
            pos = np.searchsorted(cand, d)
            pos_c = np.minimum(pos, len(cand) - 1)
            hit = cand[pos_c] == d
            scores[pos_c[hit]] += w * idx.idf_by_term_id[tid] * ts[hit]
        return topk_with_ties(scores, cand, k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "terms" in batch.column_names:       # weighted-query batch form
            return self._call_weighted(batch)
        qids = batch.column("qid").to_pylist()
        texts = batch.column("query").to_pylist()
        score_fn = (self.score_query_parent_max
                    if self.parent_base is not None else self.score_query)
        out_qid, out_docid, out_rank, out_score = [], [], [], []
        for qid, text in zip(qids, texts):
            d, s, rk = score_fn(text)
            out_qid.append(np.full(len(d), qid, dtype=np.int64))
            out_docid.append(d)
            out_score.append(s)
            out_rank.append(rk)
        if out_qid:
            qid_a = np.concatenate(out_qid)
            docid_a = np.concatenate(out_docid).astype(np.int64)
            rank_a = np.concatenate(out_rank).astype(np.int32)
            score_a = np.concatenate(out_score)
        else:
            qid_a = np.empty(0, dtype=np.int64)
            docid_a = np.empty(0, dtype=np.int64)
            rank_a = np.empty(0, dtype=np.int32)
            score_a = np.empty(0, dtype=np.float64)
        cols = {
            "qid": pa.array(qid_a),
            "docid": pa.array(docid_a),
            "rank": pa.array(rank_a),
            "score": pa.array(score_a),
        }
        if self.with_sha:
            sha = (
                self.reader.sha_for(docid_a)
                if len(docid_a)
                else np.empty(0, dtype=object)
            )
            cols["content_sha256"] = pa.array(list(sha), type=pa.string())
        return pa.table(cols)

    def _call_weighted(self, batch: pa.Table) -> pa.Table:
        """Batch form for weighted queries: columns qid int64,
        terms list<string>, weights list<double> -> ranking rows."""
        if self.parent_base is not None:
            # weighted scoring has no parent-max reduction; silently
            # returning passage-level docids would betray the caller
            raise ValueError("weighted-query batches do not support "
                             "parent_base (max-passage) mode")
        qids = batch.column("qid").to_pylist()
        terms_l = batch.column("terms").to_pylist()
        weights_l = batch.column("weights").to_pylist()
        out_qid, out_docid, out_rank, out_score = [], [], [], []
        for qid, terms, weights in zip(qids, terms_l, weights_l):
            d, s, rk = self.score_weighted_terms(terms, weights)
            out_qid.append(np.full(len(d), qid, dtype=np.int64))
            out_docid.append(d)
            out_score.append(s)
            out_rank.append(rk)
        qid_a = (np.concatenate(out_qid) if out_qid
                 else np.empty(0, dtype=np.int64))
        docid_a = (np.concatenate(out_docid).astype(np.int64) if out_docid
                   else np.empty(0, dtype=np.int64))
        rank_a = (np.concatenate(out_rank).astype(np.int32) if out_rank
                  else np.empty(0, dtype=np.int32))
        score_a = (np.concatenate(out_score) if out_score
                   else np.empty(0, dtype=np.float64))
        cols = {
            "qid": pa.array(qid_a),
            "docid": pa.array(docid_a),
            "rank": pa.array(rank_a),
            "score": pa.array(score_a),
        }
        if self.with_sha:
            sha = (self.reader.sha_for(docid_a) if len(docid_a)
                   else np.empty(0, dtype=object))
            cols["content_sha256"] = pa.array(list(sha), type=pa.string())
        return pa.table(cols)
