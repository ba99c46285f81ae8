"""Serve-artifact tests: mmap fast path vs segment decode, shard-pruned
reads, staleness invalidation (the out-of-core serving contract)."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from colbert_ray.config import EngineConfig
from colbert_ray.fixtures import ensure_fixture
from colbert_ray.pipelines.build import build_index
from colbert_ray.pipelines.search import search_sharded, search_table
from colbert_ray.state.decoded import DecodedIndex
from colbert_ray.state.serve import open_arrays, serve_valid

CFG = EngineConfig(salt_max_run=30, num_term_partitions=8)
N_DOCS = 400


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve_fix"))
    corpus_dir, queries_path = ensure_fixture(root, N_DOCS, 20)
    index_dir = os.path.join(root, "index")
    build_index(corpus_dir, index_dir, CFG)
    return corpus_dir, queries_path, index_dir


def test_artifact_written_and_valid(built):
    _, _, index_dir = built
    assert serve_valid(index_dir)
    arrays = open_arrays(index_dir)
    with open(os.path.join(index_dir, "metadata.json")) as f:
        meta = json.load(f)
    assert int(arrays["posting_offsets"][-1]) == meta["n_postings"]
    assert len(arrays["max_tfsat"]) == meta["n_terms"]
    # arrays open as read-only memmaps (no full read at open time)
    assert isinstance(arrays["posting_docids"], np.memmap)


def test_mmap_load_equals_segment_decode(built):
    _, queries_path, index_dir = built
    mm = DecodedIndex.load(index_dir)
    assert isinstance(mm.posting_docids, np.memmap)

    # force the fallback: hide the manifest
    man = os.path.join(index_dir, "serve", "manifest.json")
    os.rename(man, man + ".hidden")
    try:
        dec = DecodedIndex.load(index_dir)
        assert not isinstance(dec.posting_docids, np.memmap)
        np.testing.assert_array_equal(np.asarray(mm.posting_offsets),
                                      dec.posting_offsets)
        np.testing.assert_array_equal(np.asarray(mm.posting_docids),
                                      dec.posting_docids)
        np.testing.assert_array_equal(np.asarray(mm.posting_tfsat),
                                      dec.posting_tfsat)
        np.testing.assert_array_equal(np.asarray(mm.max_tfsat_by_term),
                                      dec.max_tfsat_by_term)
        np.testing.assert_array_equal(np.asarray(mm.block_offsets),
                                      dec.block_offsets)
        np.testing.assert_array_equal(np.asarray(mm.block_last_docid),
                                      dec.block_last_docid)
        np.testing.assert_array_equal(np.asarray(mm.block_max_tfsat),
                                      dec.block_max_tfsat)
    finally:
        os.rename(man + ".hidden", man)


def test_search_identical_on_both_paths(built):
    _, queries_path, index_dir = built
    queries = pq.read_table(queries_path).slice(0, 10)
    via_mmap = search_table(queries, index_dir, k=10).to_pandas()
    man = os.path.join(index_dir, "serve", "manifest.json")
    os.rename(man, man + ".hidden")
    # metadata mtime is the load cache key; bump so the fallback reloads
    os.utime(os.path.join(index_dir, "metadata.json"))
    try:
        via_decode = search_table(queries, index_dir, k=10).to_pandas()
    finally:
        os.rename(man + ".hidden", man)
        os.utime(os.path.join(index_dir, "metadata.json"))
    pd.testing.assert_frame_equal(via_mmap, via_decode)


def test_shard_restriction_reads_about_one_nth(built):
    """A 1/N docid shard must materialize ~1/N of the postings (shard-pruned
    segment read: the full index is never resident on a shard's node)."""
    _, _, index_dir = built
    full = DecodedIndex.load(index_dir, load_sha=False)
    total = int(full.posting_offsets[-1])
    n_shards = 4
    hi = len(full.doclens)
    bounds = np.linspace(0, hi, n_shards + 1).astype(np.int64)
    seen = 0
    for i in range(n_shards):
        shard = DecodedIndex.load(
            index_dir, docid_range=(int(bounds[i]), int(bounds[i + 1])),
            load_sha=False)
        n_shard = int(shard.posting_offsets[-1])
        seen += n_shard
        assert not isinstance(shard.posting_docids, np.memmap)
        # equal-width docid ranges on a uniform corpus: each shard holds
        # roughly total/n_shards postings (generous 2x bound)
        assert n_shard <= 2 * total / n_shards
        lo_, hi_ = int(bounds[i]), int(bounds[i + 1])
        assert ((shard.posting_docids >= lo_)
                & (shard.posting_docids < hi_)).all()
    assert seen == total   # shards partition the postings exactly


def test_shard_doc_arrays_are_one_nth(built):
    """A 1/N docid shard's per-doc arrays (doclens, sha256) must cover only
    its own range — resident doc metadata ~1/N of the corpus, not a
    whole-corpus array per shard actor (VERDICT r2 #4)."""
    _, _, index_dir = built
    full = DecodedIndex.load(index_dir, load_sha=True)
    n = len(full.doclens)
    lo, hi = n // 4, n // 2
    shard = DecodedIndex.load(index_dir, docid_range=(lo, hi), load_sha=True)
    assert shard.docid_base == lo
    assert len(shard.doclens) == hi - lo
    assert len(shard.sha256) == hi - lo
    # absolute-docid accessor agrees with the full index
    probe = np.arange(lo, hi, dtype=np.int64)
    np.testing.assert_array_equal(shard.sha_for(probe), full.sha_for(probe))
    np.testing.assert_array_equal(np.asarray(shard.doclens),
                                  np.asarray(full.doclens[lo:hi]))


def test_segmented_searchsorted_matches_numpy():
    """The vectorized all-terms bisection must equal per-segment
    np.searchsorted for random segment layouts and probe values."""
    from colbert_ray.state.decoded import _segmented_searchsorted

    rng = np.random.default_rng(7)
    for _ in range(20):
        n_seg = int(rng.integers(1, 50))
        lens = rng.integers(0, 40, size=n_seg)
        offs = np.zeros(n_seg + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        d = np.concatenate(
            [np.sort(rng.integers(0, 1000, size=int(c))) for c in lens]
            or [np.empty(0, dtype=np.int64)]).astype(np.int64)
        v = int(rng.integers(-5, 1005))
        got = _segmented_searchsorted(d, offs[:-1], offs[1:], v)
        want = np.array([offs[t] + np.searchsorted(d[offs[t]:offs[t + 1]], v)
                         for t in range(n_seg)], dtype=np.int64)
        np.testing.assert_array_equal(got, want)


def test_gather_binary_matches_python_join():
    """Buffer-level binary concatenation must equal the per-element
    bytes join it replaced, for plain and offset-sliced arrays."""
    import pyarrow as pa

    from colbert_ray.state.decoded import _gather_binary

    rng = np.random.default_rng(11)
    vals = [rng.bytes(int(rng.integers(0, 30))) for _ in range(200)]
    arr = pa.array(vals, type=pa.binary())
    for a in (arr, arr.slice(37, 120)):
        order = rng.permutation(len(a))
        got = _gather_binary(a, order).tobytes()
        want = b"".join(a[int(i)].as_py() for i in order)
        assert got == want
    la = pa.array(vals, type=pa.large_binary())
    order = rng.permutation(len(la))
    assert _gather_binary(la, order).tobytes() == \
        b"".join(la[int(i)].as_py() for i in order)


def test_sharded_search_bit_identical(built):
    _, queries_path, index_dir = built
    queries = pq.read_table(queries_path).slice(0, 8)
    unsharded = search_table(queries, index_dir, k=10, with_sha=False).to_pandas()
    sharded = (
        search_sharded(queries, index_dir, k=10, n_shards=3, with_sha=False)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        unsharded[["qid", "docid", "rank", "score"]].reset_index(drop=True),
        sharded[["qid", "docid", "rank", "score"]].reset_index(drop=True),
    )


def test_segment_rewrite_invalidates_artifact(built, tmp_path_factory):
    """Any segment rewrite (prune/coalesce) must stale the token."""
    root = str(tmp_path_factory.mktemp("serve_inval"))
    corpus_dir, _ = ensure_fixture(root, 100, 5)
    index_dir = os.path.join(root, "index")
    build_index(corpus_dir, index_dir, CFG)
    assert serve_valid(index_dir)
    seg = sorted(glob.glob(os.path.join(index_dir, "segments", "part_*.parquet")))[0]
    t = pq.read_table(seg)
    pq.write_table(t, seg)   # rewrite: same content, new size/mtime
    assert not serve_valid(index_dir)


def test_block_max_skipping_fires_and_is_exact(tmp_path_factory):
    """Engineered corpus where θ lands BETWEEN the long list's block maxima:
    'alpha' (df=5: 2 short/high-score docs + 3 long/low-score docs) merges
    first and sets θ at the 3rd-best score; 'zebra' (df=200) has a max
    tfsat (three tf=40 docs near the tail) ABOVE θ — so term-level MaxScore
    cannot drop the list — while its ordinary blocks fall below θ and must
    be skipped at BLOCK granularity (K4 two-stage). Results must equal brute
    force exactly."""
    import pyarrow as pa

    from colbert_ray.state.index import BM25Scorer

    root = str(tmp_path_factory.mktemp("bmx"))
    n = 400

    def filler(i, count):
        return " ".join(f"f{i}x{j}" for j in range(count))

    texts = []
    for i in range(n):
        if i < 2:                      # alpha, short (high tfsat)
            texts.append("alpha " + filler(i, 24))
        elif i < 5:                    # alpha, very long (low tfsat) -> θ
            texts.append("alpha " + filler(i, 299))
        elif 50 <= i < 247:            # zebra ordinary postings (block-skip)
            texts.append("zebra " + filler(i, 34))
        elif 340 <= i < 343:           # zebra heavy-hitters (keep ub high)
            texts.append(" ".join(["zebra"] * 40) + " " + filler(i, 4))
        else:                          # background docs
            texts.append(filler(i, 25))
    corpus = pa.table({
        "repo": pa.array(["r"] * n),
        "path": pa.array([f"{i:04d}.py" for i in range(n)]),
        "commit": pa.array(["c"] * n),
        "lang": pa.array(["py"] * n),
        "content": pa.array(texts),
    })
    cpath = os.path.join(root, "corpus.parquet")
    pq.write_table(corpus, cpath)
    index_dir = os.path.join(root, "index")
    cfg = EngineConfig(salt_max_run=1000, num_term_partitions=4,
                       posting_block_size=16)
    build_index(cpath, index_dir, cfg)

    pruned = BM25Scorer(index_dir, k=3, prune=True, with_sha=False)
    brute = BM25Scorer(index_dir, k=3, prune=False, with_sha=False)
    d_p, s_p, r_p = pruned.score_query("alpha zebra")
    d_b, s_b, r_b = brute.score_query("alpha zebra")
    np.testing.assert_array_equal(d_p, d_b)
    np.testing.assert_array_equal(s_p, s_b)   # exact float64, not approx
    np.testing.assert_array_equal(r_p, r_b)
    assert pruned.stats["blocks_skipped"] > 0
    assert pruned.stats["maxscore_bailouts"] == 0


def test_chunked_segment_encode_identical(built, tmp_path_factory):
    """A tiny max_encode_postings budget forces E2 chunking (several
    part_*.cNN.parquet files per partition, a term's salted runs split
    across chunks) — search results and the serve artifact must be
    identical to the unchunked build."""
    corpus_dir, queries_path, index_dir = built
    root = str(tmp_path_factory.mktemp("chunked"))
    idx2 = os.path.join(root, "index")
    cfg2 = EngineConfig(salt_max_run=30, num_term_partitions=8,
                        max_encode_postings=100)
    build_index(corpus_dir, idx2, cfg2)
    chunk_files = glob.glob(os.path.join(idx2, "segments", "part_*.c*.parquet"))
    assert chunk_files, "budget of 100 postings must force chunking"
    queries = pq.read_table(queries_path).slice(0, 10)
    a = search_table(queries, index_dir, k=10).to_pandas()
    b = search_table(queries, idx2, k=10).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # serve arrays identical across layouts
    m1, m2 = DecodedIndex.load(index_dir), DecodedIndex.load(idx2)
    np.testing.assert_array_equal(np.asarray(m1.posting_docids),
                                  np.asarray(m2.posting_docids))
    np.testing.assert_array_equal(np.asarray(m1.posting_offsets),
                                  np.asarray(m2.posting_offsets))
    np.testing.assert_array_equal(np.asarray(m1.block_max_tfsat),
                                  np.asarray(m2.block_max_tfsat))


def test_load_sha_skips_docmeta_strings(built):
    _, _, index_dir = built
    idx = DecodedIndex.load(index_dir, load_sha=False)
    assert idx.sha256 is None
    idx2 = DecodedIndex.load(index_dir, load_sha=True)
    assert idx2.sha256 is not None and idx2.sha256[0]


def test_http_server_endpoint(built):
    """T5 serving analog: the HTTP endpoint answers with the same ranking
    as the in-process scorer, caches repeats, and 400s bad input."""
    import json as _json
    import threading
    import urllib.request

    from colbert_ray.server import make_server
    from colbert_ray.state.index import BM25Scorer

    _, queries_path, index_dir = built
    httpd = make_server(index_dir, port=0, k=10)   # port 0 = ephemeral
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        query = pq.read_table(queries_path).column("query").to_pylist()[0]
        url = (f"http://127.0.0.1:{port}/api/search?"
               f"query={urllib.request.quote(query)}&k=5")
        with urllib.request.urlopen(url, timeout=30) as r:
            body = _json.loads(r.read())
        assert body["k"] == 5 and len(body["topk"]) <= 5
        scorer = BM25Scorer(index_dir, k=5)
        d, s, rk = scorer.score_query(query)
        assert [row["docid"] for row in body["topk"]] == d.tolist()
        assert [row["score"] for row in body["topk"]] == s.tolist()
        assert all(row["content_sha256"] for row in body["topk"])
        # repeat hits the LRU cache
        with urllib.request.urlopen(url, timeout=30) as r:
            _json.loads(r.read())
        assert httpd.cached_search.cache_info().hits >= 1
        # bad input -> 400
        import urllib.error
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/search?k=5", timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_search_session_matches_batch_search(built):
    """Persistent-actor session (Searcher analog) returns the same ranking
    as the per-call Ray Data pool, across repeated calls."""
    from colbert_ray.pipelines.search import SearchSession

    _, queries_path, index_dir = built
    queries = pq.read_table(queries_path).slice(0, 10)
    want = search_table(queries, index_dir, k=10).to_pandas()
    sess = SearchSession(index_dir, k=10, n_actors=3)
    try:
        got1 = sess.search_table(queries).to_pandas()
        got2 = sess.search_table(queries).to_pandas()   # reuse, no respawn
    finally:
        sess.close()
    pd.testing.assert_frame_equal(
        got1[want.columns].reset_index(drop=True), want)
    pd.testing.assert_frame_equal(got2, got1)


def test_auto_partition_heuristic(built, tmp_path_factory):
    """A2 heuristic: the effective partition count grows with corpus size
    (pure function of total_tokens), the segment layout follows it, and
    results are identical to a fixed-partition build. Changing the
    partitioning knobs must NOT invalidate the cached tokenize phase."""
    corpus_dir, queries_path, index_dir = built
    root = str(tmp_path_factory.mktemp("autop"))
    idx2 = os.path.join(root, "index")
    cfg2 = EngineConfig(salt_max_run=30, num_term_partitions=8,
                        postings_per_partition=2_000)
    build_index(corpus_dir, idx2, cfg2)
    meta = json.load(open(os.path.join(idx2, "metadata.json")))
    total = meta["total_tokens"]
    p_eff = max(8, -(-total // 2_000))
    assert p_eff > 8
    assert meta["num_term_partitions"] == p_eff
    queries = pq.read_table(queries_path).slice(0, 10)
    a = search_table(queries, index_dir, k=10).to_pandas()
    b = search_table(queries, idx2, k=10).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # partition-knob change resumes from the cached tokenize
    cfg3 = EngineConfig(salt_max_run=30, num_term_partitions=8,
                        postings_per_partition=4_000)
    report = build_index(corpus_dir, idx2, cfg3)
    assert "tokenize" not in report["phases"]
    assert "segments" in report["phases"]
    c = search_table(queries, idx2, k=10).to_pandas()
    pd.testing.assert_frame_equal(a, c)


def test_search_job_resumable_sharded_output(built, tmp_path_factory):
    """Resumable batch search: qid-sharded partitioned parquet output with
    per-shard manifests; a rerun skips finished shards and a damaged shard
    is the only one recomputed; concatenated output equals direct search."""
    from colbert_ray.pipelines.search import search_job

    _, queries_path, index_dir = built
    queries = pq.read_table(queries_path)
    out = str(tmp_path_factory.mktemp("job"))
    rep1 = search_job(queries, index_dir, out, k=10, n_shards=4,
                      n_actors=2, with_sha=False)
    assert sorted(rep1["ran"]) == [0, 1, 2, 3] and not rep1["skipped"]
    rep2 = search_job(queries, index_dir, out, k=10, n_shards=4,
                      n_actors=2, with_sha=False)
    assert sorted(rep2["skipped"]) == [0, 1, 2, 3] and not rep2["ran"]
    # damage one shard -> only it reruns
    import shutil as _sh
    _sh.rmtree(os.path.join(out, "shard=2"))
    rep3 = search_job(queries, index_dir, out, k=10, n_shards=4,
                      n_actors=2, with_sha=False)
    assert rep3["ran"] == [2] and sorted(rep3["skipped"]) == [0, 1, 3]
    got = (
        pd.concat([pq.read_table(os.path.join(out, f"shard={i}",
                                              "ranking.parquet")).to_pandas()
                   for i in range(4)])
        .sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    want = search_table(queries, index_dir, k=10, with_sha=False).to_pandas()
    pd.testing.assert_frame_equal(got, want)
    # with_sha changes the OUTPUT SHAPE: a rerun with a different value must
    # recompute every shard (not skip under the old manifests) and the new
    # output must carry the sha column everywhere
    rep4 = search_job(queries, index_dir, out, k=10, n_shards=4,
                      n_actors=2, with_sha=True)
    assert sorted(rep4["ran"]) == [0, 1, 2, 3] and not rep4["skipped"]
    for i in range(4):
        t = pq.read_table(os.path.join(out, f"shard={i}", "ranking.parquet"))
        assert "content_sha256" in t.schema.names
    # shrinking n_shards must REMOVE the now-stale extra shard dirs — a
    # consumer globbing out/shard=*/ must never mix old rows in
    rep5 = search_job(queries, index_dir, out, k=10, n_shards=2,
                      n_actors=2, with_sha=True)
    assert sorted(rep5["stale_removed"]) == [2, 3]
    assert not os.path.exists(os.path.join(out, "shard=2"))
    got2 = (
        pd.concat([pq.read_table(os.path.join(out, f"shard={i}",
                                              "ranking.parquet")).to_pandas()
                   for i in range(2)])
        .sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    want2 = (search_table(queries, index_dir, k=10, with_sha=True)
             .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, want2)


def test_coalesce_chunked_index(built, tmp_path_factory):
    """Coalescing an index whose partitions were written as chunk files
    must preserve every query result (chunked runs merge like salted runs)."""
    from colbert_ray.stages.compact import coalesce_segments

    corpus_dir, queries_path, _ = built
    root = str(tmp_path_factory.mktemp("coal_chunk"))
    idx = os.path.join(root, "index")
    build_index(corpus_dir, idx, EngineConfig(
        salt_max_run=30, num_term_partitions=8, max_encode_postings=100))
    assert glob.glob(os.path.join(idx, "segments", "part_*.c*.parquet"))
    queries = pq.read_table(queries_path).slice(0, 10)
    before = search_table(queries, idx, k=10).to_pandas()
    coalesce_segments(idx, merge_salts=True)
    files = [f for f in os.listdir(os.path.join(idx, "segments"))
             if f.endswith(".parquet")]
    assert files == ["part_00000.parquet"]
    after = search_table(queries, idx, k=10).to_pandas()
    pd.testing.assert_frame_equal(before, after)


def test_http_fanout_frontend_merges_exactly(built):
    """The fan-out front end (one /api/search URL over N shard servers)
    must return the unsharded scorer's ranking bit-identically, assign
    ranks 1..k, cache repeats, and 502 when a shard is down."""
    import json as _json
    import threading
    import urllib.error
    import urllib.request

    from colbert_ray.server import make_fanout, make_server
    from colbert_ray.state.index import BM25Scorer

    _, queries_path, index_dir = built
    full = BM25Scorer(index_dir, k=5, with_sha=False)
    n = len(full.idx.doclens)
    servers, frontend = [], None
    try:
        urls = []
        for rng_ in ((0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, 2 ** 62)):
            h = make_server(index_dir, port=0, k=5, with_sha=False,
                            docid_range=rng_)
            threading.Thread(target=h.serve_forever, daemon=True).start()
            servers.append(h)
            urls.append(f"http://127.0.0.1:{h.server_address[1]}")
        frontend = make_fanout(urls, port=0, k=5)
        threading.Thread(target=frontend.serve_forever, daemon=True).start()
        fport = frontend.server_address[1]
        for query in pq.read_table(queries_path).column("query").to_pylist()[:5]:
            url = (f"http://127.0.0.1:{fport}/api/search?"
                   f"query={urllib.request.quote(query)}&k=5")
            with urllib.request.urlopen(url, timeout=30) as r:
                body = _json.loads(r.read())
            assert body["n_shards"] == 3
            got = [(r_["docid"], r_["score"]) for r_ in body["topk"]]
            assert [r_["rank"] for r_ in body["topk"]] == \
                list(range(1, len(got) + 1))
            d, s, _ = full.score_query(query)
            want = [(int(a), float(b)) for a, b in zip(d, s)]
            assert got == want[:5]
        # repeat hits the front-end cache
        with urllib.request.urlopen(url, timeout=30) as r:
            _json.loads(r.read())
        assert frontend.cached_search.cache_info().hits >= 1
        # kill one shard -> fresh (uncached) query returns 502, not a hang
        servers[0].shutdown()
        servers[0].server_close()
        bad = (f"http://127.0.0.1:{fport}/api/search?"
               f"query=definitely+novel+query+zz&k=5")
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTP 502")
        except urllib.error.HTTPError as e:
            assert e.code == 502
    finally:
        for h in servers[1:]:
            h.shutdown()
        if frontend is not None:
            frontend.shutdown()


def test_http_sharded_topology_merges_exactly(built):
    """The documented multi-node serving topology: one HTTP server per
    docid shard (docid_range), client-side merge by (-score, docid) —
    must equal the unsharded scorer exactly."""
    import json as _json
    import threading
    import urllib.request

    from colbert_ray.server import make_server
    from colbert_ray.state.index import BM25Scorer

    _, queries_path, index_dir = built
    full = BM25Scorer(index_dir, k=5, with_sha=False)
    n = len(full.idx.doclens)
    servers = []
    try:
        for rng_ in ((0, n // 2), (n // 2, 2 ** 62)):
            h = make_server(index_dir, port=0, k=5, with_sha=False,
                            docid_range=rng_)
            threading.Thread(target=h.serve_forever, daemon=True).start()
            servers.append(h)
        for query in pq.read_table(queries_path).column("query").to_pylist()[:5]:
            rows = []
            for h in servers:
                port = h.server_address[1]
                url = (f"http://127.0.0.1:{port}/api/search?"
                       f"query={urllib.request.quote(query)}&k=5")
                with urllib.request.urlopen(url, timeout=30) as r:
                    rows += _json.loads(r.read())["topk"]
            rows.sort(key=lambda r: (-r["score"], r["docid"]))
            got = [(r["docid"], r["score"]) for r in rows[:5]]
            d, s, _ = full.score_query(query)
            want = [(int(a), float(b)) for a, b in zip(d, s)]
            assert got == want
    finally:
        for h in servers:
            h.shutdown()


def test_resolve_flush_env_and_multinode(monkeypatch):
    """Flush policy (VERDICT r3 #6): env 1/0 overrides; auto mode flushes
    iff the cluster has >1 alive node (simulated here) — and the decision
    is made on the DRIVER, threaded through the layout tuples, never read
    from env inside worker tasks (ADVICE r3)."""
    import ray

    from colbert_ray.state.serve import _resolve_flush

    monkeypatch.setenv("COLBERT_RAY_SERVE_FLUSH", "1")
    assert _resolve_flush() is True
    monkeypatch.setenv("COLBERT_RAY_SERVE_FLUSH", "0")
    assert _resolve_flush() is False
    monkeypatch.delenv("COLBERT_RAY_SERVE_FLUSH")
    monkeypatch.setattr(ray, "nodes",
                        lambda: [{"Alive": True}, {"Alive": True}])
    assert _resolve_flush() is True
    monkeypatch.setattr(ray, "nodes",
                        lambda: [{"Alive": True}, {"Alive": False}])
    assert _resolve_flush() is False


def test_doclens_distributed_fill_and_flush_path(built, tmp_path_factory,
                                                 monkeypatch):
    """The serve artifact's doclens is filled by per-docmeta-file tasks into
    a zero memmap (no dense O(n_docs) array on any process — VERDICT r3 #5);
    a forced-flush rebuild (the multi-node path) produces byte-identical
    arrays."""
    import shutil

    from colbert_ray.state.serve import ARRAY_FILES, write_serve_artifact

    _, _, index_dir = built
    sdir = os.path.join(index_dir, "serve")
    want = {k: np.asarray(np.load(os.path.join(sdir, v), mmap_mode="r")).copy()
            for k, v in ARRAY_FILES.items()}
    # doclens matches docmeta exactly (fill covered every doc)
    import pyarrow.dataset as pads
    docs = pads.dataset(os.path.join(index_dir, "docmeta")).to_table(
        columns=["docid", "doclen"]).to_pandas()
    np.testing.assert_array_equal(
        want["doclens"][docs["docid"].to_numpy()], docs["doclen"].to_numpy())

    root = str(tmp_path_factory.mktemp("serve_flush"))
    idx2 = os.path.join(root, "index")
    shutil.copytree(index_dir, idx2)
    monkeypatch.setenv("COLBERT_RAY_SERVE_FLUSH", "1")
    write_serve_artifact(idx2)
    sdir2 = os.path.join(idx2, "serve")
    for k, v in ARRAY_FILES.items():
        np.testing.assert_array_equal(
            want[k], np.asarray(np.load(os.path.join(sdir2, v), mmap_mode="r")),
            err_msg=k)


def test_shard_doclens_stays_lazy_memmap(built):
    """On the mmap fast path a docid shard's doclens must remain a memmap
    VIEW of its range — length hi-lo, no dense whole-corpus copy resident
    in the shard actor (VERDICT r3 #5: per-doc arrays ~1/N per shard)."""
    _, _, index_dir = built
    full = DecodedIndex.load(index_dir, load_sha=False)
    assert isinstance(full.doclens, np.memmap)
    n = len(full.doclens)
    lo, hi = n // 4, n // 2
    shard = DecodedIndex.load(index_dir, docid_range=(lo, hi), load_sha=False)
    assert isinstance(shard.doclens, np.memmap)   # slice of the mmap, lazy
    assert len(shard.doclens) == hi - lo
    np.testing.assert_array_equal(np.asarray(shard.doclens),
                                  np.asarray(full.doclens[lo:hi]))


def test_http_server_ql_ranker(built):
    """Per-request ranker=ql serves Dirichlet QL from the same index."""
    import json
    import threading
    import urllib.request

    from colbert_ray.server import make_server

    _, _, index_dir = built
    httpd = make_server(index_dir, port=0, k=5, with_sha=False)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def get(url):
            with urllib.request.urlopen(url) as r:
                return json.loads(r.read())

        base = f"http://127.0.0.1:{port}/api/search?query=def+main&k=5"
        bm = get(base)
        ql = get(base + "&ranker=ql")
        assert bm["ranker"] == "bm25" and ql["ranker"] == "ql"
        assert len(ql["topk"]) > 0
        # different models -> scores differ even when ranks agree
        assert bm["topk"][0]["score"] != ql["topk"][0]["score"]
        # bad ranker -> 400
        import urllib.error
        try:
            get(base + "&ranker=nope")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_explain_breakdown_sums_to_exact_score(built):
    """BM25Scorer.explain (Lucene-explain analog): per-(term, docid) rows
    whose contributions, summed in the emitted order (ascending term_id —
    the scorer's own summation order), reproduce score_query's float64
    scores bit-exactly; df/idf match the served dictionary."""
    from colbert_ray.state.index import BM25Scorer

    _, queries_path, index_dir = built
    qdf = pq.read_table(queries_path).to_pandas()
    scorer = BM25Scorer(index_dir, k=N_DOCS, with_sha=False, prune=False)
    checked_rows = 0
    for text in qdf["query"].head(5):
        docids, scores, _ = scorer.score_query(text, k=10)
        if len(docids) == 0:
            continue
        t = scorer.explain(text, docids).to_pandas()
        assert set(t["docid"]) == set(int(d) for d in docids)
        # emitted order IS ascending (term-block, docid) — verify, then
        # sum sequentially per docid in that order for bit-exact equality
        by_doc: dict[int, float] = {}
        for d, c in zip(t["docid"], t["contribution"]):
            by_doc[int(d)] = by_doc.get(int(d), 0.0) + float(c)
        for d, s in zip(docids, scores):
            assert by_doc[int(d)] == float(s), (d, by_doc[int(d)], s)
        # df column equals the served dictionary df for that term
        idx = scorer.idx
        pos = np.searchsorted(idx.dict_terms, t["term"].to_numpy(dtype=object))
        assert (idx.dict_dfs[pos] == t["df"].to_numpy()).all()
        # idf * tfsat == contribution, column-wise
        np.testing.assert_array_equal(
            t["idf"].to_numpy() * (t["contribution"].to_numpy()
                                   / t["idf"].to_numpy()),
            t["contribution"].to_numpy())
        checked_rows += len(t)
    assert checked_rows > 0

    # no-match / OOV edges: zero rows, stable schema
    empty = scorer.explain("zzzzqqqxx", [0, 1]).to_pandas()
    assert len(empty) == 0
    assert list(empty.columns) == ["term", "docid", "tf",
                                   "df", "idf", "contribution"]
    none = scorer.explain(qdf["query"].iloc[0], []).to_pandas()
    assert len(none) == 0


def test_explain_excludes_tombstoned_docids(built, tmp_path_factory):
    import shutil

    from colbert_ray.state.index import BM25Scorer
    from colbert_ray.state.updates import IndexUpdater

    _, queries_path, index_dir = built
    qdf = pq.read_table(queries_path).to_pandas()
    text = qdf["query"].iloc[0]
    base = BM25Scorer(index_dir, k=10, with_sha=False)
    docids, _, _ = base.score_query(text)
    if len(docids) == 0:
        pytest.skip("query has no matches in fixture")
    victim = int(docids[0])

    root = str(tmp_path_factory.mktemp("explain_tomb"))
    idx2 = os.path.join(root, "index")
    shutil.copytree(index_dir, idx2)
    IndexUpdater(idx2).remove_docids([victim])
    t = BM25Scorer(idx2, k=10, with_sha=False).explain(
        text, docids).to_pandas()
    assert victim not in set(t["docid"])
    assert len(set(t["docid"])) == len(set(int(d) for d in docids)) - 1


def test_http_server_dsl_mode(built):
    import json as _json
    import threading
    import urllib.error
    import urllib.parse
    import urllib.request

    from colbert_ray.server import make_server

    _, queries_path, index_dir = built
    httpd = make_server(index_dir, port=0, k=5, with_sha=False)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def get(q, extra=""):
            url = (f"http://127.0.0.1:{port}/api/search?"
                   f"query={urllib.parse.quote(q)}&k=5&dsl=1{extra}")
            with urllib.request.urlopen(url) as r:
                return _json.loads(r.read())

        # pull a real term from the served dictionary
        idx = DecodedIndex.load_cached(index_dir, load_sha=False)
        t1 = str(idx.dict_terms[len(idx.dict_terms) // 2])
        res = get(f"{t1} OR zzzzqqq")
        assert res["ranker"] == "dsl" and len(res["topk"]) > 0
        # boolean NOT shrinks or holds the result set
        res2 = get(f"{t1} AND NOT {t1}")
        assert res2["topk"] == []
        # phrase atoms 400 (need a corpus pass)
        try:
            get('"two words"')
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # syntax error 400
        try:
            get("NOT lonely")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_http_suggest_endpoint(built):
    import json as _json
    import threading
    import urllib.parse
    import urllib.request

    from colbert_ray.server import make_server

    _, _, index_dir = built
    httpd = make_server(index_dir, port=0, k=5, with_sha=False)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        idx = DecodedIndex.load_cached(index_dir, load_sha=False)
        prefix = str(idx.dict_terms[0])[:2]
        url = (f"http://127.0.0.1:{port}/api/suggest?"
               f"prefix={urllib.parse.quote(prefix)}&k=5")
        with urllib.request.urlopen(url) as r:
            res = _json.loads(r.read())
        assert res["suggestions"]
        assert all(s["term"].startswith(prefix) for s in res["suggestions"])
        dfs = [s["df"] for s in res["suggestions"]]
        assert dfs == sorted(dfs, reverse=True) or len(set(dfs)) < len(dfs)
        # an uppercase prefix must suggest what its lowercase form does
        # (the dictionary is lowercase; /api/search lowers the same input)
        up = (f"http://127.0.0.1:{port}/api/suggest?"
              f"prefix={urllib.parse.quote(prefix.upper())}&k=5")
        with urllib.request.urlopen(up) as r:
            res_up = _json.loads(r.read())
        assert res_up["suggestions"] == res["suggestions"]
        # non-positive k -> 400, not a near-full dictionary dump
        import urllib.error
        for bad_k in ("0", "-1"):
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/api/suggest?"
                    f"prefix={urllib.parse.quote(prefix)}&k={bad_k}")
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        httpd.shutdown()


def test_fanout_ql_dsl_fix_exact(built):
    """The last three fan-out modes (ranker=ql, dsl=, fix=) are EXACT on
    docid-range shards: QL scores ride the global cf_by_term sidecar, DSL
    candidate sets are clipped per shard (they partition the global set),
    and the did-you-mean correction is dictionary-global. Each merged
    response must equal the unsharded server's, field for field."""
    import json as _json
    import threading
    import urllib.error
    import urllib.parse
    import urllib.request

    from colbert_ray.server import make_fanout, make_server

    _, queries_path, index_dir = built
    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    n = len(idx.doclens)
    queries = pq.read_table(queries_path).column("query").to_pylist()[:3]
    servers = []
    try:
        solo = make_server(index_dir, port=0, k=5, with_sha=False)
        threading.Thread(target=solo.serve_forever, daemon=True).start()
        servers.append(solo)
        for rng_ in ((0, n // 3), (n // 3, 2 * n // 3),
                     (2 * n // 3, 2 ** 62)):
            h = make_server(index_dir, port=0, k=5, with_sha=False,
                            docid_range=rng_)
            threading.Thread(target=h.serve_forever, daemon=True).start()
            servers.append(h)
        front = make_fanout(
            [f"http://127.0.0.1:{h.server_address[1]}"
             for h in servers[1:]], port=0, k=5)
        threading.Thread(target=front.serve_forever, daemon=True).start()
        servers.append(front)

        def get(port, q, extra=""):
            url = (f"http://127.0.0.1:{port}/api/search?k=5"
                   f"&query={urllib.parse.quote(q)}{extra}")
            with urllib.request.urlopen(url, timeout=30) as r:
                return _json.loads(r.read())

        sport, fport = solo.server_address[1], front.server_address[1]
        # --- ranker=ql ---
        for q in queries:
            got = get(fport, q, "&ranker=ql")
            want = get(sport, q, "&ranker=ql")
            assert got["topk"] == want["topk"], f"ql mismatch for {q!r}"
            assert got["ranker"] == "ql"
        # --- dsl= (terms, OR, NOT, wildcard — global-dictionary atoms) ---
        t1 = str(idx.dict_terms[len(idx.dict_terms) // 2])
        t2 = str(idx.dict_terms[len(idx.dict_terms) // 3])
        pfx = next(str(t) for t in idx.dict_terms if len(str(t)) >= 4)[:3]
        for q in (f"{t1} OR {t2}", f"{t1} AND NOT {t2}",
                  f"{pfx}* OR {t2}"):
            got = get(fport, q, "&dsl=1")
            want = get(sport, q, "&dsl=1")
            assert got["topk"] == want["topk"], f"dsl mismatch for {q!r}"
        # --- fix= (composes with plain and count like the single server) ---
        term = next(str(t) for t in idx.dict_terms if len(str(t)) >= 5)
        typo = term[:2] + term[3:]
        got = get(fport, typo, "&fix=1")
        want = get(sport, typo, "&fix=1")
        assert got["corrected_query"] == want["corrected_query"]
        assert got["topk"] == want["topk"]
        gc = get(fport, typo, "&fix=1&count=1")
        wc = get(sport, typo, "&fix=1&count=1")
        for key in ("total_hits", "max_score_r", "sum_doclen",
                    "avg_doclen", "corrected_query"):
            assert gc[key] == wc[key], key
        # --- genuinely-invalid inputs still 400 ---
        for extra in ("&ranker=nope", "&ranker=ql&collapse=lang",
                      "&fix=1&dsl=1", "&dsl=1&count=1", "&after=zzz",
                      "&collapse=lang&boost_field=doclen"):
            try:
                get(fport, queries[0], extra)
                raise AssertionError(f"expected HTTP 400 for {extra}")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        for h in servers:
            h.shutdown()


def test_fanout_suggest_exact_global_df(built):
    """Fan-out /api/suggest: per-shard dfs (docid-range postings) SUM to
    the exact global df, so the merged suggestions equal the unsharded
    suggest_terms output."""
    import json as _json
    import threading
    import urllib.parse
    import urllib.request

    from colbert_ray.pipelines.phrase import suggest_terms
    from colbert_ray.server import make_fanout, make_server

    _, _, index_dir = built
    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    n = len(idx.doclens)
    prefix = str(idx.dict_terms[0])[:1]
    servers = []
    try:
        for rng_ in ((0, n // 2), (n // 2, 2 ** 62)):
            h = make_server(index_dir, port=0, k=5, with_sha=False,
                            docid_range=rng_)
            threading.Thread(target=h.serve_forever, daemon=True).start()
            servers.append(h)
        front = make_fanout(
            [f"http://127.0.0.1:{h.server_address[1]}" for h in servers],
            port=0, k=5)
        threading.Thread(target=front.serve_forever, daemon=True).start()
        servers.append(front)
        url = (f"http://127.0.0.1:{front.server_address[1]}/api/suggest?"
               f"prefix={urllib.parse.quote(prefix)}&k=7")
        with urllib.request.urlopen(url, timeout=30) as r:
            got = _json.loads(r.read())["suggestions"]
        want = suggest_terms(index_dir, prefix, k=7).to_pylist()
        assert got == want
    finally:
        for h in servers:
            h.shutdown()


def test_http_search_after_pagination(built):
    """after= cursor pagination on the HTTP surface: page 1 via an EMPTY
    after= (same rounded sort key as later pages — a cursor built from the
    raw-score plain response can drop/duplicate rounded ties), pages chain
    via next_after without overlap, and bad cursors 400."""
    import json as _json
    import threading
    import urllib.error
    import urllib.request

    from colbert_ray.server import make_server

    _, queries_path, index_dir = built
    httpd = make_server(index_dir, port=0, k=10)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        query = pq.read_table(queries_path).column("query").to_pylist()[0]
        base = (f"http://127.0.0.1:{port}/api/search?"
                f"query={urllib.request.quote(query)}&k=3")
        with urllib.request.urlopen(base + "&after=", timeout=30) as r:
            p1 = _json.loads(r.read())
        assert p1["next_after"] and "," in p1["next_after"]
        assert all("score_r" in row for row in p1["topk"])
        with urllib.request.urlopen(base + "&after=" + p1["next_after"],
                                    timeout=30) as r:
            p2 = _json.loads(r.read())
        ids1 = {row["docid"] for row in p1["topk"]}
        ids2 = {row["docid"] for row in p2["topk"]}
        assert ids2 and not ids1 & ids2
        assert p2["next_after"] is None or "," in p2["next_after"]
        # page 1 + page 2 == the first 6 of one big page (same total order)
        with urllib.request.urlopen(
                base.replace("k=3", "k=6") + "&after=", timeout=30) as r:
            big = _json.loads(r.read())
        assert ([row["docid"] for row in p1["topk"] + p2["topk"]]
                == [row["docid"] for row in big["topk"]])
        # the plain (raw-score) response carries no cursor
        with urllib.request.urlopen(base, timeout=30) as r:
            plain = _json.loads(r.read())
        assert "next_after" not in plain
        # malformed cursor / dsl combination -> 400
        for bad in ("&after=zzz", "&after=1.0,2&dsl=1"):
            try:
                urllib.request.urlopen(base + bad, timeout=30)
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        httpd.shutdown()


def test_http_collapse_and_function_score(built):
    """collapse= and boost_field= on /api/search: results match the
    library calls exactly; mode combinations and bad fields 400."""
    import json as _json
    import threading
    import urllib.error
    import urllib.parse
    import urllib.request

    from colbert_ray.pipelines.search import (
        collapse_search,
        function_score_search,
    )
    from colbert_ray.server import make_server

    _, queries_path, index_dir = built
    httpd = make_server(index_dir, port=0, k=10)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        query = pq.read_table(queries_path).column("query").to_pylist()[0]
        base = (f"http://127.0.0.1:{port}/api/search?"
                f"query={urllib.parse.quote(query)}&k=5")
        with urllib.request.urlopen(base + "&collapse=lang",
                                    timeout=30) as r:
            col = _json.loads(r.read())
        assert col["ranker"] == "collapse"
        want = collapse_search(index_dir, query, "lang", k=5).to_pylist()
        assert col["topk"] == want
        langs = [row["lang"] for row in col["topk"]]
        assert len(langs) == len(set(langs))
        with urllib.request.urlopen(
                base + "&boost_field=doclen&boost_factor=2.0",
                timeout=30) as r:
            fs = _json.loads(r.read())
        assert fs["ranker"] == "function_score"
        want = function_score_search(index_dir, query, field="doclen",
                                     factor=2.0, k=5).to_pylist()
        assert fs["topk"] == want
        for bad in ("&collapse=nosuchfield",
                    "&boost_field=lang",              # non-numeric
                    "&collapse=lang&boost_field=doclen",
                    "&collapse=lang&dsl=1",
                    "&boost_field=doclen&after=",
                    "&collapse=lang&ranker=ql",
                    "&boost_field=doclen&boost_factor=zz"):
            try:
                urllib.request.urlopen(base + bad, timeout=30)
                raise AssertionError(f"expected HTTP 400 for {bad}")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        httpd.shutdown()


def test_fanout_search_after_exact(built):
    """Fan-out after= pagination: one GLOBAL cursor drives every shard
    (global stats => global rounded sort key), so merged pages equal the
    unsharded pager's pages exactly, and chaining covers the full
    ranking without gaps or duplicates."""
    import json as _json
    import threading
    import urllib.parse
    import urllib.request

    from colbert_ray.pipelines.search import search_after
    from colbert_ray.server import make_fanout, make_server

    _, queries_path, index_dir = built
    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    n = len(idx.doclens)
    query = pq.read_table(queries_path).column("query").to_pylist()[0]
    servers = []
    try:
        for rng_ in ((0, n // 3), (n // 3, 2 * n // 3),
                     (2 * n // 3, 2 ** 62)):
            h = make_server(index_dir, port=0, k=4, with_sha=False,
                            docid_range=rng_)
            threading.Thread(target=h.serve_forever, daemon=True).start()
            servers.append(h)
        front = make_fanout(
            [f"http://127.0.0.1:{h.server_address[1]}" for h in servers],
            port=0, k=4)
        threading.Thread(target=front.serve_forever, daemon=True).start()
        servers.append(front)
        base = (f"http://127.0.0.1:{front.server_address[1]}/api/search?"
                f"query={urllib.parse.quote(query)}&k=4")
        # walk three pages through the fan-out; compare each to the
        # unsharded library pager
        cursor = None
        lib_cursor = None
        for _page in range(3):
            url = base + "&after=" + (urllib.parse.quote(cursor)
                                      if cursor else "")
            with urllib.request.urlopen(url, timeout=30) as r:
                got = _json.loads(r.read())
            lib_page, lib_cursor = search_after(
                index_dir, query, k=4, after=lib_cursor)
            assert [row["docid"] for row in got["topk"]] \
                == lib_page.column("docid").to_pylist()
            assert [row["score_r"] for row in got["topk"]] \
                == lib_page.column("score_r").to_pylist()
            cursor = got["next_after"]
            assert (cursor is None) == (lib_cursor is None)
            if cursor is None:
                break
    finally:
        for h in servers:
            h.shutdown()


def test_http_count_mode(built):
    """count=1 returns the full-match-set stats (track_total_hits
    analog), equal to the library match_stats; mode mixing 400s."""
    import json as _json
    import threading
    import urllib.error
    import urllib.parse
    import urllib.request

    from colbert_ray.pipelines.search import match_stats
    from colbert_ray.server import make_server

    _, queries_path, index_dir = built
    httpd = make_server(index_dir, port=0, k=10)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        query = pq.read_table(queries_path).column("query").to_pylist()[0]
        base = (f"http://127.0.0.1:{port}/api/search?"
                f"query={urllib.parse.quote(query)}")
        with urllib.request.urlopen(base + "&count=1", timeout=30) as r:
            got = _json.loads(r.read())
        want = match_stats(index_dir, query).to_pylist()[0]
        assert got["total_hits"] == want["total_hits"] > 0
        assert got["max_score_r"] == want["max_score_r"]
        assert "topk" not in got
        for bad in ("&count=1&dsl=1", "&count=1&after=",
                    "&count=1&ranker=ql"):
            try:
                urllib.request.urlopen(base + bad, timeout=30)
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        httpd.shutdown()


def test_http_fix_mode_did_you_mean(built):
    """fix=1: OOV terms are corrected to their best ED-1 dictionary
    neighbor before search; the reply carries corrected_query and equals
    searching the corrected text directly."""
    import json as _json
    import threading
    import urllib.error
    import urllib.parse
    import urllib.request

    _, _, index_dir = built
    from colbert_ray.server import make_server

    httpd = make_server(index_dir, port=0, k=5, with_sha=False)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        idx = DecodedIndex.load_cached(index_dir, load_sha=False)
        term = next(str(t) for t in idx.dict_terms if len(str(t)) >= 5)
        typo = term[:2] + term[3:]                # one-char deletion
        base = f"http://127.0.0.1:{port}/api/search?k=5"

        def get(q, extra=""):
            url = (base + f"&query={urllib.parse.quote(q)}" + extra)
            with urllib.request.urlopen(url, timeout=30) as r:
                return _json.loads(r.read())

        fixed = get(typo, "&fix=1")
        assert term in fixed["corrected_query"].split()
        direct = get(fixed["corrected_query"])
        assert fixed["topk"] == direct["topk"]
        # count mode composes with fix
        cnt = get(typo, "&fix=1&count=1")
        assert cnt["corrected_query"] == fixed["corrected_query"]
        assert cnt["total_hits"] > 0
        # dsl + fix -> 400
        try:
            get(typo, "&fix=1&dsl=1")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_fanout_count_exact(built):
    """Fan-out count=1: shard stats ADD exactly (docid-range shards
    partition the match set), equal to the unsharded match_stats."""
    import json as _json
    import threading
    import urllib.parse
    import urllib.request

    from colbert_ray.pipelines.search import match_stats
    from colbert_ray.server import make_fanout, make_server

    _, queries_path, index_dir = built
    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    n = len(idx.doclens)
    query = pq.read_table(queries_path).column("query").to_pylist()[0]
    servers = []
    try:
        for rng_ in ((0, n // 2), (n // 2, 2 ** 62)):
            h = make_server(index_dir, port=0, k=5, with_sha=False,
                            docid_range=rng_)
            threading.Thread(target=h.serve_forever, daemon=True).start()
            servers.append(h)
        front = make_fanout(
            [f"http://127.0.0.1:{h.server_address[1]}" for h in servers],
            port=0, k=5)
        threading.Thread(target=front.serve_forever, daemon=True).start()
        servers.append(front)
        url = (f"http://127.0.0.1:{front.server_address[1]}/api/search?"
               f"query={urllib.parse.quote(query)}&count=1")
        with urllib.request.urlopen(url, timeout=30) as r:
            got = _json.loads(r.read())
        want = match_stats(index_dir, query).to_pylist()[0]
        for key in ("total_hits", "max_score_r", "sum_doclen",
                    "avg_doclen"):
            assert got[key] == want[key]
    finally:
        for h in servers:
            h.shutdown()


def test_fanout_collapse_and_boost_exact(built):
    """Fan-out collapse (two-phase: shard reps -> union best -> counts
    summed) and boost_field (plain union merge on per-doc global scores)
    both equal the unsharded library results exactly."""
    import json as _json
    import threading
    import urllib.parse
    import urllib.request

    from colbert_ray.pipelines.search import (
        collapse_search,
        function_score_search,
    )
    from colbert_ray.server import make_fanout, make_server

    _, queries_path, index_dir = built
    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    n = len(idx.doclens)
    queries = pq.read_table(queries_path).column("query").to_pylist()[:3]
    servers = []
    try:
        for rng_ in ((0, n // 3), (n // 3, 2 * n // 3),
                     (2 * n // 3, 2 ** 62)):
            h = make_server(index_dir, port=0, k=5, with_sha=False,
                            docid_range=rng_)
            threading.Thread(target=h.serve_forever, daemon=True).start()
            servers.append(h)
        front = make_fanout(
            [f"http://127.0.0.1:{h.server_address[1]}" for h in servers],
            port=0, k=5)
        threading.Thread(target=front.serve_forever, daemon=True).start()
        servers.append(front)
        base = f"http://127.0.0.1:{front.server_address[1]}/api/search?k=5"
        for q in queries:
            qq = f"&query={urllib.parse.quote(q)}"
            with urllib.request.urlopen(base + qq + "&collapse=lang",
                                        timeout=30) as r:
                got = _json.loads(r.read())["topk"]
            want = collapse_search(index_dir, q, "lang", k=5).to_pylist()
            assert got == want, f"collapse mismatch for {q!r}"
            with urllib.request.urlopen(
                    base + qq + "&boost_field=doclen&boost_factor=1.5",
                    timeout=30) as r:
                got = _json.loads(r.read())["topk"]
            want = function_score_search(index_dir, q, field="doclen",
                                         factor=1.5, k=5).to_pylist()
            assert got == want, f"boost mismatch for {q!r}"
            # NUMERIC collapse field: group_counts values ride the URL as
            # strings and must be re-coerced shard-side, not count 0
            with urllib.request.urlopen(base + qq + "&collapse=doclen",
                                        timeout=30) as r:
                got = _json.loads(r.read())["topk"]
            want = collapse_search(index_dir, q, "doclen",
                                   k=5).to_pylist()
            assert got == want, f"numeric collapse mismatch for {q!r}"
            assert any(row["group_count"] > 1 for row in want), \
                "fixture too weak: no doclen group with >1 match"
        # combined modes 400 on the front end like on the shards
        import urllib.error
        for bad in ("&collapse=lang&count=1", "&count=1&after=",
                    "&collapse=lang&after="):
            try:
                urllib.request.urlopen(
                    base + f"&query={urllib.parse.quote(queries[0])}"
                    + bad, timeout=30)
                raise AssertionError(f"expected HTTP 400 for {bad}")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        for h in servers:
            h.shutdown()


def test_group_counts_bogus_integer_value_counts_zero(built):
    """An unparseable value= for an INTEGER docmeta field must report 0,
    not the NULL-field group's count (None used to key into the Counter)."""
    import json as _json
    import threading
    import urllib.parse
    import urllib.request

    from colbert_ray.server import make_server

    _, queries_path, index_dir = built
    httpd = make_server(index_dir, port=0, k=10)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        query = pq.read_table(queries_path).column("query").to_pylist()[0]
        idx = DecodedIndex.load_cached(index_dir, load_sha=False)
        real = int(idx.doclens[idx.doclens > 0][0])
        url = (f"http://127.0.0.1:{port}/api/group_counts?"
               f"query={urllib.parse.quote(query)}&field=doclen"
               f"&value=notanint&value={real}")
        with urllib.request.urlopen(url, timeout=30) as r:
            counts = _json.loads(r.read())["counts"]
        assert counts["notanint"] == 0
        assert str(real) in counts
    finally:
        httpd.shutdown()
