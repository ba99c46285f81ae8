"""Index artifacts reader + exact BM25 scorer (the query-serving state).

Analog of the reference's ``IndexScorer`` / ``IndexLoader`` stack
(``colbert/search/index_loader.py:13-66``, ``index_storage.py:20-30``):
loaded ONCE per query-serving actor (actor-pool ``__init__``), then reused
across query batches. Posting runs are decoded on demand (decompress
analog, ``residual.py:240-276``); candidate pruning is an exact MaxScore
bound (the classical analog of PLAID's two-stage centroid pruning,
``index_storage.py:111-194`` — ours is provably lossless for top-k).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from colbert_ray.config import EngineConfig
from colbert_ray.functions.bm25 import idf, tf_saturation, topk_with_ties
from colbert_ray.functions.codec import decode_tfs, delta_decode_docids
from colbert_ray.functions.tokenizer import tokenize_query


class IndexReader:
    """mmap-style loader of dictionary + doclens + posting segments."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "metadata.json")) as f:
            self.meta = json.load(f)
        self.cfg = EngineConfig.from_dict(self.meta["config"])
        self.n_docs = int(self.meta["n_docs"])
        self.avgdl = float(self.meta["avgdl"])

        # dictionary: sorted term array -> (term_id, df)
        dt = pads.dataset(os.path.join(index_dir, "dictionary")).to_table(
            columns=["term", "term_id", "df"]
        )
        order = np.argsort(dt.column("term").to_numpy(zero_copy_only=False), kind="stable")
        self.dict_terms = dt.column("term").to_numpy(zero_copy_only=False)[order]
        self.dict_term_ids = dt.column("term_id").to_numpy(zero_copy_only=False)[order]
        self.dict_dfs = dt.column("df").to_numpy(zero_copy_only=False)[order]

        # doc metadata: doclen (+ sha256) addressed by docid
        docs = pads.dataset(os.path.join(index_dir, "docs")).to_table(
            columns=["docid", "doclen", "content_sha256"]
        )
        docids = docs.column("docid").to_numpy(zero_copy_only=False)
        self._max_docid = int(docids.max()) if len(docids) else -1
        self.doclens = np.zeros(self._max_docid + 1, dtype=np.int64)
        self.doclens[docids] = docs.column("doclen").to_numpy(zero_copy_only=False)
        sha = np.asarray(docs.column("content_sha256").to_numpy(zero_copy_only=False))
        self.sha256 = np.empty(self._max_docid + 1, dtype=object)
        self.sha256[docids] = sha

        # posting runs: term_id -> row indices (salt-ordered) into run arrays
        seg_files = sorted(glob.glob(os.path.join(index_dir, "segments", "part_*.parquet")))
        tables = [pq.read_table(f) for f in seg_files]
        seg = pa.concat_tables(tables) if tables else None
        if seg is not None and seg.num_rows:
            tid = seg.column("term_id").to_numpy(zero_copy_only=False)
            salt = seg.column("salt").to_numpy(zero_copy_only=False)
            order = np.lexsort((salt, tid))
            self.run_term_ids = tid[order]
            self.run_n = seg.column("n").to_numpy(zero_copy_only=False)[order]
            docb = seg.column("docids_bin")
            tfb = seg.column("tfs_bin")
            self.run_docids_bin = [docb[int(i)].as_py() for i in order]
            self.run_tfs_bin = [tfb[int(i)].as_py() for i in order]
            self.run_max_tfsat = seg.column("max_tfsat").to_numpy(zero_copy_only=False)[order]
        else:
            self.run_term_ids = np.empty(0, dtype=np.int64)
            self.run_n = np.empty(0, dtype=np.int64)
            self.run_docids_bin = []
            self.run_tfs_bin = []
            self.run_max_tfsat = np.empty(0, dtype=np.float64)

    def lookup_terms(self, terms: list[str]):
        """terms -> (term_id, df) arrays; OOV terms dropped (df=0 contributes 0
        in the reference convention as well — absent posting list)."""
        if not terms:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        t = np.asarray(terms, dtype=object)
        pos = np.searchsorted(self.dict_terms, t)
        pos_c = np.clip(pos, 0, len(self.dict_terms) - 1)
        hit = (len(self.dict_terms) > 0) & (self.dict_terms[pos_c] == t)
        return self.dict_term_ids[pos_c[hit]], self.dict_dfs[pos_c[hit]]

    def postings(self, term_id: int) -> tuple[np.ndarray, np.ndarray]:
        """Decoded (docids, tfs) for one term — salted runs concatenated in
        salt order (docid-range salting => already globally docid-sorted)."""
        lo = np.searchsorted(self.run_term_ids, term_id, side="left")
        hi = np.searchsorted(self.run_term_ids, term_id, side="right")
        if hi == lo:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        docid_parts, tf_parts = [], []
        for i in range(lo, hi):
            n = int(self.run_n[i])
            docid_parts.append(delta_decode_docids(self.run_docids_bin[i], n))
            tf_parts.append(decode_tfs(self.run_tfs_bin[i], n))
        return np.concatenate(docid_parts), np.concatenate(tf_parts)

    def term_max_tfsat(self, term_id: int) -> float:
        lo = np.searchsorted(self.run_term_ids, term_id, side="left")
        hi = np.searchsorted(self.run_term_ids, term_id, side="right")
        return float(self.run_max_tfsat[lo:hi].max()) if hi > lo else 0.0


class BM25Scorer:
    """Actor-pool batch scorer: query rows in -> ranking rows out.

    Used as ``queries.map_batches(BM25Scorer, fn_constructor_kwargs=...,
    concurrency=N)`` (T3 analog). Scoring is exact float64 TAAT, per-doc
    contributions accumulated in ascending term_id order (== lexicographic
    term order) -> bit-identical to the oracle at any parallelism.
    """

    def __init__(self, index_dir: str, k: int = 10, prune: bool | None = None,
                 with_sha: bool = True):
        self.reader = IndexReader(index_dir)
        self.k = k
        cfg = self.reader.cfg
        self.prune = cfg.prune if prune is None else prune
        self.with_sha = with_sha

    def score_query(self, text: str, k: int | None = None,
                    docid_filter: np.ndarray | None = None):
        """-> (docids, scores, ranks) for one query. Exact top-k.

        ``docid_filter``: optional sorted docid whitelist — the analog of the
        reference's ``filter_fn`` pid hook (``searcher.py:76-99``,
        ``index_storage.py:95-101``).
        """
        k = k or self.k
        r = self.reader
        term_ids, dfs = r.lookup_terms(tokenize_query(text, r.cfg)[0])
        if len(term_ids) == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.int32))
        order = np.argsort(term_ids)          # ascending term_id == sorted term
        term_ids, dfs = term_ids[order], dfs[order]
        idfs = idf(dfs.astype(np.float64), r.n_docs)

        posts = [r.postings(int(t)) for t in term_ids]
        if docid_filter is not None:
            for i, (d, f) in enumerate(posts):
                m = np.isin(d, docid_filter)
                posts[i] = (d[m], f[m])

        # --- exact MaxScore candidate selection ------------------------
        # A doc appearing ONLY in posting lists with UB sum < theta (the
        # current k-th best exact score over the candidate set) cannot enter
        # the top-k. Grow the candidate set by descending term upper bound
        # until the tail bound proves no outside doc can qualify; every
        # candidate's score is always computed exactly over ALL terms, so
        # results are identical to brute force (K4 analog, lossless).
        if self.prune and len(term_ids) > 1:
            ubs = np.array(
                [i * r.term_max_tfsat(int(t)) for t, i in zip(term_ids, idfs)]
            )
            ub_order = np.argsort(-ubs, kind="stable")
            cand = np.empty(0, dtype=np.int64)
            m = 0
            while m < len(ub_order):
                j = ub_order[m]
                cand = np.union1d(cand, posts[j][0])
                m += 1
                tail_ub = float(ubs[ub_order[m:]].sum())
                if len(cand) >= k:
                    scores = self._score_candidates(cand, posts, idfs)
                    kth = np.partition(scores, len(scores) - k)[len(scores) - k]
                    if tail_ub < kth:
                        break
                elif tail_ub == 0.0:
                    break
        else:
            nonempty = [d for d, _ in posts if len(d)]
            cand = (np.unique(np.concatenate(nonempty)) if nonempty
                    else np.empty(0, dtype=np.int64))
        if len(cand) == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.int32))

        scores = self._score_candidates(cand, posts, idfs)
        return topk_with_ties(scores, cand, k)

    def _score_candidates(self, cand: np.ndarray, posts, idfs) -> np.ndarray:
        """Exact float64 scores of ``cand`` — accumulated in ascending
        term_id order (``posts``/``idfs`` are term_id-sorted), the fixed
        summation order shared with the oracle."""
        r = self.reader
        scores = np.zeros(len(cand), dtype=np.float64)
        for (docids_t, tfs_t), t_idf in zip(posts, idfs):
            if len(docids_t) == 0:
                continue
            pos = np.searchsorted(cand, docids_t)
            pos_c = np.clip(pos, 0, len(cand) - 1)
            hit = cand[pos_c] == docids_t
            if not hit.any():
                continue
            d, f = docids_t[hit], tfs_t[hit]
            contrib = t_idf * tf_saturation(f, r.doclens[d], r.avgdl, r.cfg.k1, r.cfg.b)
            # hit positions are unique (docids strictly increasing per run)
            scores[pos_c[hit]] += contrib
        return scores

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("qid").to_pylist()
        texts = batch.column("query").to_pylist()
        out_qid, out_docid, out_rank, out_score = [], [], [], []
        for qid, text in zip(qids, texts):
            d, s, rk = self.score_query(text)
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
                self.reader.sha256[docid_a]
                if len(docid_a)
                else np.empty(0, dtype=object)
            )
            cols["content_sha256"] = pa.array(list(sha), type=pa.string())
        return pa.table(cols)
