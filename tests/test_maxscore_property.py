"""Randomized exactness property tests for the block-max MaxScore path.

The scorer's pruning must be LOSSLESS: for any corpus shape (Zipfian df,
skewed tf, any block alignment) and any query, prune=True must return
bit-identical (docids, float64 scores, ranks) to brute force. These tests
build DecodedIndex instances directly from synthetic posting arrays (no
Ray, no disk) so hundreds of random cases run in seconds — the adversarial
counterpart of the engineered block-skip test in test_serve.py.
"""

import numpy as np
import pytest

from colbert_ray.config import EngineConfig
from colbert_ray.functions.bm25 import idf as idf_fn
from colbert_ray.functions.bm25 import tf_saturation
from colbert_ray.state.decoded import DecodedIndex, _segment_max
from colbert_ray.state.index import BM25Scorer


def synth_index(rng: np.random.Generator, n_docs: int, n_terms: int,
                block_size: int = 8) -> DecodedIndex:
    """Random index: per-term df ~ Zipf-ish, docids random subsets, tf
    skewed so block maxima vary."""
    cfg = EngineConfig(posting_block_size=block_size)
    doclens = rng.integers(5, 200, size=n_docs).astype(np.int64)
    avgdl = float(doclens.mean())
    terms = np.array([f"t{i:03d}" for i in range(n_terms)], dtype=object)

    offsets = [0]
    docids_all, tfs_all = [], []
    dfs = np.empty(n_terms, dtype=np.int64)
    for t in range(n_terms):
        df = int(np.clip(rng.zipf(1.3), 1, n_docs))
        d = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tf = np.clip(rng.zipf(1.5, size=df), 1, 60).astype(np.int32)
        dfs[t] = df
        docids_all.append(d)
        tfs_all.append(tf)
        offsets.append(offsets[-1] + df)
    posting_offsets = np.array(offsets, dtype=np.int64)
    posting_docids = np.concatenate(docids_all)
    posting_tfs = np.concatenate(tfs_all)
    tfsat = tf_saturation(posting_tfs.astype(np.float64),
                          doclens[posting_docids].astype(np.float64),
                          avgdl, cfg.k1, cfg.b)
    idf = np.zeros(n_terms)
    idf[np.arange(n_terms)] = idf_fn(dfs.astype(np.float64), n_docs)
    idx = DecodedIndex(
        cfg=cfg, n_docs=n_docs, avgdl=avgdl,
        dict_terms=terms, dict_term_ids=np.arange(n_terms, dtype=np.int64),
        dict_dfs=dfs, idf_by_term_id=idf,
        posting_offsets=posting_offsets, posting_docids=posting_docids,
        posting_tfs=posting_tfs, posting_tfsat=tfsat,
        max_tfsat_by_term=_segment_max(tfsat, posting_offsets),
        doclens=doclens, sha256=None, tombstones=np.empty(0, dtype=np.int64),
    )
    idx._build_block_arrays()
    return idx


def make_scorer(idx: DecodedIndex, k: int, prune: bool,
                strategy: str = "maxscore") -> BM25Scorer:
    sc = BM25Scorer.__new__(BM25Scorer)
    sc.idx = idx
    sc.k = k
    sc.prune = prune
    sc.prune_strategy = strategy
    from colbert_ray.functions.util import search_defaults_for_k

    sc.defaults = search_defaults_for_k(k)
    sc.with_sha = False
    sc.docid_filter = None
    sc._dense = len(idx.doclens) <= BM25Scorer.DENSE_MAX_DOCIDS
    sc.stats = {"blocks_skipped": 0, "maxscore_bailouts": 0,
                "bmw_regions_skipped": 0, "bmw_bailouts": 0}
    return sc


@pytest.mark.parametrize("seed", range(30))
def test_pruned_equals_brute_force_random(seed):
    rng = np.random.default_rng(seed)
    idx = synth_index(rng, n_docs=int(rng.integers(40, 400)),
                      n_terms=int(rng.integers(5, 40)),
                      block_size=int(rng.choice([4, 8, 16])))
    k = int(rng.integers(1, 12))
    pruned = make_scorer(idx, k, prune=True)
    brute = make_scorer(idx, k, prune=False)
    n_terms = len(idx.dict_terms)
    for _ in range(6):
        nq = int(rng.integers(1, min(6, n_terms) + 1))
        q = " ".join(rng.choice(idx.dict_terms, size=nq, replace=False))
        d_p, s_p, r_p = pruned.score_query(q)
        d_b, s_b, r_b = brute.score_query(q)
        np.testing.assert_array_equal(d_p, d_b)
        np.testing.assert_array_equal(s_p, s_b)   # exact float64
        np.testing.assert_array_equal(r_p, r_b)


def test_k_zero_and_negative_return_empty():
    rng = np.random.default_rng(77)
    idx = synth_index(rng, n_docs=100, n_terms=10)
    sc = make_scorer(idx, 10, prune=True)
    q = " ".join(idx.dict_terms[:3])
    for bad_k in (0, -3):
        d, s, r = sc.score_query(q, k=bad_k)
        assert len(d) == len(s) == len(r) == 0


def test_out_of_range_tombstone_does_not_crash_dense_path():
    """IndexUpdater accepts arbitrary ids; a stale out-of-range (or
    negative) tombstone must neither crash the dense path nor zero a
    DIFFERENT doc via wrap-around."""
    rng = np.random.default_rng(78)
    idx = synth_index(rng, n_docs=100, n_terms=10)
    base = make_scorer(idx, 5, prune=False)
    q = " ".join(idx.dict_terms[:4])
    d0, s0, _ = base.score_query(q)
    idx.tombstones = np.array([150, -7], dtype=np.int64)  # both out of range
    d1, s1, _ = base.score_query(q)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_array_equal(s0, s1)


@pytest.mark.parametrize("seed", range(30))
def test_bmw_equals_brute_force_random(seed):
    """The block-max WAND strategy is lossless too — bit-identical
    (docids, float64 scores, ranks) to brute force on random corpora."""
    rng = np.random.default_rng(20000 + seed)
    idx = synth_index(rng, n_docs=int(rng.integers(40, 400)),
                      n_terms=int(rng.integers(5, 40)),
                      block_size=int(rng.choice([4, 8, 16])))
    k = int(rng.integers(1, 12))
    bmw = make_scorer(idx, k, prune=True, strategy="bmw")
    brute = make_scorer(idx, k, prune=False)
    n_terms = len(idx.dict_terms)
    for _ in range(6):
        nq = int(rng.integers(1, min(6, n_terms) + 1))
        q = " ".join(rng.choice(idx.dict_terms, size=nq, replace=False))
        d_p, s_p, r_p = bmw.score_query(q)
        d_b, s_b, r_b = brute.score_query(q)
        np.testing.assert_array_equal(d_p, d_b)
        np.testing.assert_array_equal(s_p, s_b)   # exact float64
        np.testing.assert_array_equal(r_p, r_b)


@pytest.mark.parametrize("seed", range(10))
def test_bmw_equals_brute_with_tombstones_and_filters(seed):
    rng = np.random.default_rng(30000 + seed)
    n_docs = int(rng.integers(60, 300))
    idx = synth_index(rng, n_docs=n_docs, n_terms=int(rng.integers(6, 30)))
    k = int(rng.integers(1, 10))
    mode = seed % 3
    tomb = np.sort(rng.choice(n_docs, size=n_docs // 5, replace=False)
                   ).astype(np.int64) if mode in (0, 2) else None
    filt = np.sort(rng.choice(n_docs, size=max(1, n_docs // 3), replace=False)
                   ).astype(np.int64) if mode in (1, 2) else None
    if tomb is not None:
        idx.tombstones = tomb
    bmw = make_scorer(idx, k, prune=True, strategy="bmw")
    brute = make_scorer(idx, k, prune=False)
    for _ in range(5):
        nq = int(rng.integers(2, min(5, len(idx.dict_terms)) + 1))
        q = " ".join(rng.choice(idx.dict_terms, size=nq, replace=False))
        d_p, s_p, r_p = bmw.score_query(q, docid_filter=filt)
        d_b, s_b, r_b = brute.score_query(q, docid_filter=filt)
        np.testing.assert_array_equal(d_p, d_b)
        np.testing.assert_array_equal(s_p, s_b)
        np.testing.assert_array_equal(r_p, r_b)


def test_bmw_regions_actually_skipped():
    """Engineered corpus where one doc dominates: BMW must skip regions
    (pruning fires) while staying exact — the analog of
    test_serve.py's block-skip assertion for MaxScore."""
    rng = np.random.default_rng(7)
    idx = synth_index(rng, n_docs=600, n_terms=12, block_size=4)
    # inflate one doc's tf contribution on every term so θ rises fast
    bmw = make_scorer(idx, 3, prune=True, strategy="bmw")
    brute = make_scorer(idx, 3, prune=False)
    skipped = 0
    for _ in range(20):
        nq = int(rng.integers(3, 7))
        q = " ".join(rng.choice(idx.dict_terms,
                                size=min(nq, len(idx.dict_terms)),
                                replace=False))
        d_p, s_p, _ = bmw.score_query(q)
        d_b, s_b, _ = brute.score_query(q)
        np.testing.assert_array_equal(d_p, d_b)
        np.testing.assert_array_equal(s_p, s_b)
    skipped = bmw.stats["bmw_regions_skipped"]
    assert skipped > 0, "BMW never skipped a region on a Zipf corpus"


@pytest.mark.parametrize("seed", range(10))
def test_restrict_equals_filtered_full(seed):
    """Shard restriction property: a shard's postings are exactly the full
    index's postings filtered to [lo, hi), and shard scoring equals the
    full scorer's scores for docs in range."""
    rng = np.random.default_rng(1000 + seed)
    n_docs = int(rng.integers(50, 300))
    idx_full = synth_index(rng, n_docs=n_docs,
                           n_terms=int(rng.integers(5, 25)))
    lo = int(rng.integers(0, n_docs // 2))
    hi = int(rng.integers(lo + 1, n_docs + 1))

    import copy

    idx_shard = copy.deepcopy(idx_full)
    idx_shard._restrict_to_docid_range(lo, hi)
    in_range = (idx_full.posting_docids >= lo) & (idx_full.posting_docids < hi)
    np.testing.assert_array_equal(idx_shard.posting_docids,
                                  idx_full.posting_docids[in_range])
    np.testing.assert_array_equal(idx_shard.posting_tfsat,
                                  idx_full.posting_tfsat[in_range])

    full = make_scorer(idx_full, k=n_docs, prune=False)
    shard = make_scorer(idx_shard, k=n_docs, prune=False)
    q = " ".join(rng.choice(idx_full.dict_terms,
                            size=min(4, len(idx_full.dict_terms)),
                            replace=False))
    d_f, s_f, _ = full.score_query(q)
    d_s, s_s, _ = shard.score_query(q)
    mask = (d_f >= lo) & (d_f < hi)
    # same docs, identical float64 scores (global statistics)
    order_f = np.argsort(d_f[mask])
    order_s = np.argsort(d_s)
    np.testing.assert_array_equal(d_f[mask][order_f], d_s[order_s])
    np.testing.assert_array_equal(s_f[mask][order_f], s_s[order_s])


@pytest.mark.parametrize("seed", range(15))
def test_pruned_equals_brute_with_tombstones_and_filters(seed):
    """Pruning stays exact when tombstones or docid filters exclude docs
    (exclusion happens at candidate generation)."""
    rng = np.random.default_rng(5000 + seed)
    n_docs = int(rng.integers(60, 300))
    idx = synth_index(rng, n_docs=n_docs, n_terms=int(rng.integers(6, 30)))
    k = int(rng.integers(1, 10))
    mode = seed % 3
    tomb = np.sort(rng.choice(n_docs, size=n_docs // 5, replace=False)
                   ).astype(np.int64) if mode in (0, 2) else None
    filt = np.sort(rng.choice(n_docs, size=max(1, n_docs // 3), replace=False)
                   ).astype(np.int64) if mode in (1, 2) else None
    if tomb is not None:
        idx.tombstones = tomb
    pruned = make_scorer(idx, k, prune=True)
    brute = make_scorer(idx, k, prune=False)
    for _ in range(5):
        nq = int(rng.integers(2, min(5, len(idx.dict_terms)) + 1))
        q = " ".join(rng.choice(idx.dict_terms, size=nq, replace=False))
        d_p, s_p, r_p = pruned.score_query(q, docid_filter=filt)
        d_b, s_b, r_b = brute.score_query(q, docid_filter=filt)
        np.testing.assert_array_equal(d_p, d_b)
        np.testing.assert_array_equal(s_p, s_b)
        np.testing.assert_array_equal(r_p, r_b)
        if tomb is not None and len(d_p):
            assert not np.isin(d_p, tomb).any()
        if filt is not None and len(d_p):
            assert np.isin(d_p, filt).all()
