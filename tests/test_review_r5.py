"""Round-5 review regressions: fan-out HTTP status classes, lazy cf
sidecar on restricted pre-cf artifacts, bounded giant-term segment sums,
and SplitDoclens ndarray-semantics edge cases."""

import json as _json
import os
import threading
import urllib.error
import urllib.parse
import urllib.request

import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    import ray

    if not ray.is_initialized():
        pytest.skip("needs the session ray fixture")
    from colbert_ray.config import EngineConfig
    from colbert_ray.fixtures import ensure_fixture
    from colbert_ray.pipelines.build import build_index

    root = str(tmp_path_factory.mktemp("r5review"))
    corpus_dir, queries_path = ensure_fixture(root, 300, 20)
    index_dir = os.path.join(root, "index")
    build_index(corpus_dir, index_dir,
                EngineConfig(salt_max_run=50, num_term_partitions=4))
    return corpus_dir, queries_path, index_dir


def _get(port, q, extra=""):
    url = (f"http://127.0.0.1:{port}/api/search?k=5"
           f"&query={urllib.parse.quote(q)}{extra}")
    with urllib.request.urlopen(url, timeout=30) as r:
        return _json.loads(r.read())


def test_segment_sum_chunked_giant_term():
    """A single term whose df exceeds the slab must still sum exactly —
    and via the slab-pieces branch, not an O(df) materialize+cumsum."""
    from colbert_ray.state.decoded import _segment_sum_chunked

    rng = np.random.default_rng(7)
    # segments: small, GIANT (3.7x slab), empty, small
    lens = [5, 3700, 0, 11]
    values = rng.integers(1, 7, size=sum(lens)).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    got = _segment_sum_chunked(values, offsets, slab=1000)
    want = np.array([values[s:e].astype(np.int64).sum()
                     for s, e in zip(offsets[:-1], offsets[1:])])
    assert np.array_equal(got, want)
    # degenerate: every segment bigger than a tiny slab
    got2 = _segment_sum_chunked(values, offsets, slab=2)
    assert np.array_equal(got2, want)


def test_split_doclens_negative_and_bool_index():
    from colbert_ray.state.decoded import SplitDoclens

    base = np.array([10, 20, 30], dtype=np.int64)
    ext = np.array([40, 50], dtype=np.int64)
    sd = SplitDoclens(base, ext)
    dense = np.concatenate([base, ext])
    # negative scalar indexes the OVERALL array, not the base
    assert sd[-1] == dense[-1] == 50
    assert sd[-5] == dense[-5] == 10
    with pytest.raises(IndexError):
        sd[5]
    with pytest.raises(IndexError):
        sd[-6]
    # negative fancy indices
    assert np.array_equal(sd[np.array([-1, 0, -2])], dense[[-1, 0, -2]])
    # boolean masks select positions
    mask = np.array([True, False, True, False, True])
    assert np.array_equal(sd[mask], dense[mask])
    with pytest.raises(IndexError):
        sd[np.array([True, False])]


def test_restricted_precf_artifact_defers_cf_scan(built):
    """A docid_range load of a PRE-cf serve artifact must not scan
    posting_tfs at startup (BM25-only shard servers never need cf); the
    lazy ensure_cf_by_term() must still produce the exact GLOBAL cf so
    sharded QL equals unsharded QL."""
    from colbert_ray.state.decoded import DecodedIndex, _segment_sum_chunked

    _, queries_path, index_dir = built
    full = DecodedIndex.load_cached(index_dir, load_sha=False)
    want_cf = _segment_sum_chunked(np.asarray(full.posting_tfs),
                                   np.asarray(full.posting_offsets))
    cf_path = os.path.join(index_dir, "serve", "cf_by_term.npy")
    assert os.path.exists(cf_path)
    saved = open(cf_path, "rb").read()
    try:
        os.remove(cf_path)
        os.utime(os.path.join(index_dir, "metadata.json"))  # drop load cache
        n = len(full.doclens)
        shard = DecodedIndex.load(index_dir, docid_range=(0, n // 2),
                                  load_sha=False)
        # deferred: no cf yet, pending stash present
        assert shard.cf_by_term is None
        assert shard._cf_pending is not None
        got = shard.ensure_cf_by_term()
        assert np.array_equal(np.asarray(got), want_cf)
        assert shard._cf_pending is None
        # QL on the lazily-materialized shard == unsharded QL
        from colbert_ray.state.index import BM25Scorer

        q = pq.read_table(queries_path).column("query").to_pylist()[0]
        os.utime(os.path.join(index_dir, "metadata.json"))
        lo_s = BM25Scorer(index_dir, k=5, with_sha=False, ranker="ql",
                          docid_range=(0, n // 2))
        hi_s = BM25Scorer(index_dir, k=5, with_sha=False, ranker="ql",
                          docid_range=(n // 2, 2 ** 62))
        os.utime(os.path.join(index_dir, "metadata.json"))
        full_s = BM25Scorer(index_dir, k=5, with_sha=False, ranker="ql")
        d_lo, s_lo, _ = lo_s.score_query(q, k=5)
        d_hi, s_hi, _ = hi_s.score_query(q, k=5)
        rows = sorted(zip(list(s_lo) + list(s_hi), list(d_lo) + list(d_hi)),
                      key=lambda t: (-t[0], t[1]))[:5]
        d_f, s_f, _ = full_s.score_query(q, k=5)
        assert [d for _, d in rows] == list(d_f)
        assert [s for s, _ in rows] == pytest.approx(list(s_f), abs=0.0)
    finally:
        with open(cf_path, "wb") as f:
            f.write(saved)
        os.utime(os.path.join(index_dir, "metadata.json"))


def test_server_dsl_ranker_ql_is_400_and_shard_4xx_propagates(built):
    """dsl=1&ranker=ql must 400 (not silently run BM25-scored DSL) on both
    the solo server and the fan-out; shard-side client errors (phrase atom,
    DSL syntax) surface from the fan-out as 400, not 502; fix=1 on a query
    that corrects to nothing returns 200 with an empty page on both."""
    from colbert_ray.state.decoded import DecodedIndex
    from colbert_ray.server import make_fanout, make_server

    _, queries_path, index_dir = built
    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    n = len(idx.doclens)
    q0 = pq.read_table(queries_path).column("query").to_pylist()[0]
    servers = []
    try:
        solo = make_server(index_dir, port=0, k=5, with_sha=False)
        threading.Thread(target=solo.serve_forever, daemon=True).start()
        servers.append(solo)
        for rng_ in ((0, n // 2), (n // 2, 2 ** 62)):
            h = make_server(index_dir, port=0, k=5, with_sha=False,
                            docid_range=rng_)
            threading.Thread(target=h.serve_forever, daemon=True).start()
            servers.append(h)
        front = make_fanout(
            [f"http://127.0.0.1:{h.server_address[1]}"
             for h in servers[1:]], port=0, k=5)
        threading.Thread(target=front.serve_forever, daemon=True).start()
        servers.append(front)
        sport, fport = solo.server_address[1], front.server_address[1]

        # dsl + ranker=ql: 400 everywhere, never a silent BM25-DSL run
        for port in (sport, fport):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _get(port, q0, "&dsl=1&ranker=ql")
            assert ei.value.code == 400
        # shard-side client errors -> 400 from the fan-out (was 502)
        for bad_q, extra in (('"a phrase"', "&dsl=1"), ("((", "&dsl=1")):
            for port in (sport, fport):
                with pytest.raises(urllib.error.HTTPError) as ei:
                    _get(port, bad_q, extra)
                assert ei.value.code == 400, (bad_q, port)
        # fix=1 correcting to nothing: 200 + empty topk, fan-out == solo
        got = _get(fport, "!!!", "&fix=1")
        want = _get(sport, "!!!", "&fix=1")
        assert got["topk"] == want["topk"] == []
        assert got["corrected_query"] == want["corrected_query"] == ""
    finally:
        for h in servers:
            h.shutdown()
