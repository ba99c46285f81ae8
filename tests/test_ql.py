"""Exactness tests for the Dirichlet query-likelihood ranker.

QL must match a naive per-document brute force (pure-python log sums) on
random synthetic indexes — the same adversarial harness as the MaxScore
property tests — and tombstones / docid_filter must behave as in BM25.
"""

import math

import numpy as np
import pytest

from colbert_ray.functions.ql import DEFAULT_MU
from colbert_ray.state.index import BM25Scorer
from tests.test_maxscore_property import make_scorer, synth_index


def make_ql_scorer(idx, k: int, mu: float = DEFAULT_MU) -> BM25Scorer:
    sc = make_scorer(idx, k, prune=False)
    sc.ranker = "ql"
    sc.mu = mu
    # synth_index doesn't populate total_tokens; the ranker treats it as
    # the collection token count
    idx.total_tokens = int(idx.doclens.sum())
    return sc


def naive_ql(idx, terms: list[str], mu: float, k: int):
    """Per-document python-float brute force over the posting arrays."""
    n_tokens = int(idx.doclens.sum())
    tids = idx.lookup_terms(terms)
    cand: dict[int, float] = {}
    for tid in tids:
        s, e = idx.posting_offsets[tid], idx.posting_offsets[tid + 1]
        cf = float(idx.posting_tfs[s:e].astype(np.int64).sum())
        for d, tf in zip(idx.posting_docids[s:e], idx.posting_tfs[s:e]):
            cand[int(d)] = cand.get(int(d), 0.0) + math.log1p(
                float(tf) * n_tokens / (mu * cf))
    scored = []
    for d, m in cand.items():
        if len(idx.tombstones) and d in set(idx.tombstones.tolist()):
            continue
        dl = float(idx.doclens[d])
        scored.append((d, m + len(tids) * math.log(mu / (dl + mu))))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


@pytest.mark.parametrize("seed", range(12))
def test_ql_matches_naive_brute_force(seed):
    rng = np.random.default_rng(1000 + seed)
    idx = synth_index(rng, n_docs=int(rng.integers(40, 300)),
                      n_terms=int(rng.integers(5, 30)))
    k = int(rng.integers(1, 10))
    sc = make_ql_scorer(idx, k)
    n_terms = len(idx.dict_terms)
    for _ in range(5):
        nq = int(rng.integers(1, min(5, n_terms) + 1))
        terms = list(rng.choice(idx.dict_terms, size=nq, replace=False))
        d, s, r = sc.score_query(" ".join(terms))
        want = naive_ql(idx, terms, sc.mu, k)
        assert list(d) == [w[0] for w in want]
        np.testing.assert_allclose(s, [w[1] for w in want], rtol=1e-12)
        assert list(r) == list(range(1, len(want) + 1))


def test_ql_tombstones_and_filter():
    rng = np.random.default_rng(7)
    idx = synth_index(rng, n_docs=120, n_terms=8)
    idx.total_tokens = int(idx.doclens.sum())
    sc = make_ql_scorer(idx, k=20)
    q = " ".join(idx.dict_terms[:4])
    d0, s0, _ = sc.score_query(q)
    assert len(d0) > 2
    # tombstone the top hit: it must vanish, rest unchanged in order
    idx.tombstones = np.array([d0[0]], dtype=np.int64)
    d1, s1, _ = sc.score_query(q)
    assert d0[0] not in d1
    np.testing.assert_array_equal(d1[: len(d0) - 1], d0[1:])
    # docid_filter restricts candidates
    idx.tombstones = np.empty(0, dtype=np.int64)
    keep = np.sort(d0[::2]).astype(np.int64)
    d2, s2, _ = sc.score_query(q, docid_filter=keep)
    assert set(d2) <= set(keep.tolist())


def test_ql_rejects_parent_and_unknown_modes(tmp_path):
    with pytest.raises(ValueError):
        BM25Scorer(index_dir=str(tmp_path), ranker="ql", with_sha=False,
                   parent_base=100)
    with pytest.raises(ValueError):
        BM25Scorer(index_dir=str(tmp_path), ranker="nope")


def test_ql_sharded_needs_cf_sidecar(ray_session):
    """docid_range QL is only exact with the GLOBAL cf_by_term sidecar:
    an externally-restricted index object without it must be rejected
    (shard-local cf would corrupt the collection model)."""
    import ray

    rng = np.random.default_rng(5)
    idx = synth_index(rng, n_docs=60, n_terms=6)
    idx.total_tokens = int(idx.doclens.sum())
    idx.cf_by_term = None
    ref = ray.put(idx)
    with pytest.raises(ValueError, match="cf_by_term"):
        BM25Scorer(index_ref=ref, ranker="ql", with_sha=False,
                   docid_range=(0, 30))


def test_weighted_terms_matches_plain_when_weight_one():
    rng = np.random.default_rng(321)
    from tests.test_maxscore_property import make_scorer, synth_index

    idx = synth_index(rng, n_docs=150, n_terms=12)
    sc = make_scorer(idx, k=15, prune=False)
    terms = list(idx.dict_terms[:4])
    d0, s0, r0 = sc.score_query(" ".join(terms))
    d1, s1, r1 = sc.score_weighted_terms(terms, [1.0] * len(terms))
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_array_equal(s0, s1)     # bit-identical float64


def test_weighted_terms_scales_contributions():
    rng = np.random.default_rng(99)
    from tests.test_maxscore_property import make_scorer, synth_index

    idx = synth_index(rng, n_docs=100, n_terms=6)
    sc = make_scorer(idx, k=1000, prune=False)
    t0, t1 = idx.dict_terms[0], idx.dict_terms[1]
    # single-term runs give per-term exact contributions
    da, sa, _ = sc.score_weighted_terms([t0], [1.0])
    db, sb, _ = sc.score_weighted_terms([t1], [1.0])
    dw, sw, _ = sc.score_weighted_terms([t0, t1], [2.0, 0.5])
    want = {}
    for d, s in zip(da, sa):
        want[d] = want.get(d, 0.0) + 2.0 * s
    for d, s in zip(db, sb):
        want[d] = want.get(d, 0.0) + 0.5 * s
    got = dict(zip(dw.tolist(), sw.tolist()))
    assert set(got) == set(want)
    for d in got:
        assert abs(got[d] - want[d]) < 1e-12


def test_weighted_terms_oov_and_empty():
    rng = np.random.default_rng(5)
    from tests.test_maxscore_property import make_scorer, synth_index

    idx = synth_index(rng, n_docs=50, n_terms=5)
    sc = make_scorer(idx, k=5, prune=False)
    d, s, r = sc.score_weighted_terms(["notaterm", "alsonot"], [1.0, 1.0])
    assert len(d) == 0
    d2, s2, _ = sc.score_weighted_terms(
        [idx.dict_terms[0], "notaterm"], [1.0, 9.9])
    d3, s3, _ = sc.score_weighted_terms([idx.dict_terms[0]], [1.0])
    np.testing.assert_array_equal(d2, d3)
    np.testing.assert_array_equal(s2, s3)


def test_weighted_batch_rejects_parent_base():
    rng = np.random.default_rng(13)
    from tests.test_maxscore_property import make_scorer, synth_index

    import pyarrow as pa

    idx = synth_index(rng, n_docs=50, n_terms=5)
    sc = make_scorer(idx, k=5, prune=False)
    sc.parent_base = 100
    batch = pa.table({
        "qid": pa.array([1], type=pa.int64()),
        "terms": pa.array([[str(idx.dict_terms[0])]],
                          type=pa.list_(pa.string())),
        "weights": pa.array([[1.0]], type=pa.list_(pa.float64())),
    })
    with pytest.raises(ValueError):
        sc._call_weighted(batch)
