"""End-to-end conformance: the Ray engine must be rank-identical (docids AND
float64 scores) to the single-process oracle, with the sha256 per-row
invariant preserved; an index built at parallelism 1 vs 4 must be logically
identical (reference patterns: e2e_test.py + index_coalesce_test.py)."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from colbert_ray.config import EngineConfig
from colbert_ray.fixtures import generate_corpus, generate_queries
from colbert_ray.oracle import OracleIndex, assign_docids_oracle
from colbert_ray.pipelines.build import build_index
from colbert_ray.pipelines.search import search_table

N_DOCS, N_QUERIES = 300, 40
# tiny salt_max_run + few partitions => salting and multi-run terms are
# exercised even on the small fixture (FIXTURES.md §5)
CFG = EngineConfig(salt_max_run=20, num_term_partitions=8)


@pytest.fixture(scope="module")
def built(small_fixture, tmp_path_factory):
    corpus_dir, queries_path = small_fixture
    index_dir = str(tmp_path_factory.mktemp("idx"))
    report = build_index(corpus_dir, index_dir, CFG)
    return corpus_dir, queries_path, index_dir, report


@pytest.fixture(scope="module")
def oracle():
    corpus = assign_docids_oracle(generate_corpus(N_DOCS))
    return corpus, OracleIndex.build(corpus, CFG)


def test_metadata_counts(built, oracle):
    *_, report = built
    corpus, oi = oracle
    md = report["metadata"]
    assert md["n_docs"] == N_DOCS
    assert md["n_terms"] == len(oi.postings)
    assert md["avgdl"] == pytest.approx(oi.avgdl, abs=0)
    assert md["n_postings"] == sum(len(v) for v in oi.postings.values())


def test_salting_exercised(built):
    """Head terms must be split into multiple salted runs."""
    _, _, index_dir, report = built
    seg = pa.concat_tables(
        pq.read_table(f) for f in glob.glob(os.path.join(index_dir, "segments", "*.parquet"))
    )
    assert report["metadata"]["n_runs"] > report["metadata"]["n_terms"]
    salts = seg.column("salt").to_numpy(zero_copy_only=False)
    assert salts.max() > 0


def test_rank_identical_to_oracle(built, oracle):
    _, queries_path, index_dir, _ = built
    _, oi = oracle
    queries = pq.read_table(queries_path)
    got = (
        search_table(queries, index_dir, k=10)
        .select(["qid", "docid", "rank", "score"]).to_pandas()
        .sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    want = (
        oi.search_all(queries, k=10).to_pandas()
        .sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)  # exact float64


def test_rank_identical_k100_and_pruning_exact(built, oracle):
    _, queries_path, index_dir, _ = built
    queries = pq.read_table(queries_path).slice(0, 10)
    pruned = search_table(queries, index_dir, k=100, prune=True)
    brute = search_table(queries, index_dir, k=100, prune=False)
    pd.testing.assert_frame_equal(pruned.to_pandas(), brute.to_pandas())


def test_sha256_invariant_end_to_end(built):
    """content sha256 travels corpus -> index -> ranking rows unchanged."""
    import hashlib

    corpus_dir, queries_path, index_dir, _ = built
    corpus = assign_docids_oracle(generate_corpus(N_DOCS))
    truth = {
        int(d): hashlib.sha256(c.encode()).hexdigest()
        for d, c in zip(
            corpus.column("docid").to_pylist(), corpus.column("content").to_pylist()
        )
    }
    res = search_table(pq.read_table(queries_path), index_dir, k=10)
    for d, sha in zip(res.column("docid").to_pylist(),
                      res.column("content_sha256").to_pylist()):
        assert truth[d] == sha


def test_duplicate_content_distinct_docids(built):
    """Two docs share content (sha collision by design): both indexable,
    distinct docids (docids, not hashes, key the index — FIXTURES.md §5)."""
    _, _, index_dir, _ = built
    docs = pa.concat_tables(
        pq.read_table(f) for f in glob.glob(os.path.join(index_dir, "docmeta", "*.parquet"))
    )
    df = docs.select(["docid", "content_sha256"]).to_pandas()
    dup = df[df.duplicated("content_sha256", keep=False)]
    assert len(dup) >= 2
    assert dup["docid"].is_unique


def test_parallelism_equivalence(small_fixture, tmp_path_factory):
    """Index built with different block structure must be logically identical
    (coalesce-test pattern): same segments content, same docids."""
    corpus_dir, _ = small_fixture
    cfg1 = EngineConfig(salt_max_run=20, num_term_partitions=8, tokenize_batch_size=16)
    cfg2 = EngineConfig(salt_max_run=20, num_term_partitions=8, tokenize_batch_size=4096)
    d1 = str(tmp_path_factory.mktemp("idxp1"))
    d2 = str(tmp_path_factory.mktemp("idxp2"))
    build_index(corpus_dir, d1, cfg1)
    build_index(corpus_dir, d2, cfg2)

    def load_segments(d):
        seg = pa.concat_tables(
            pq.read_table(f) for f in sorted(glob.glob(os.path.join(d, "segments", "*.parquet")))
        ).to_pandas()
        return seg.sort_values(["term_id", "salt"]).reset_index(drop=True)

    s1, s2 = load_segments(d1), load_segments(d2)
    pd.testing.assert_frame_equal(s1, s2)   # byte-identical posting runs

    def load_docids(d):
        t = pa.concat_tables(
            pq.read_table(f, columns=["repo", "path", "docid"])
            for f in sorted(glob.glob(os.path.join(d, "docmeta", "*.parquet")))
        ).to_pandas()
        return t.sort_values("docid").reset_index(drop=True)

    pd.testing.assert_frame_equal(load_docids(d1), load_docids(d2))


def test_docid_filter_hook(built, oracle):
    """filter_fn analog (searcher.py:76-99): restrict search to a docid
    whitelist; scores keep FULL-corpus statistics, so the filtered top-k
    equals the oracle's unfiltered ranking post-filtered."""
    _, queries_path, index_dir, _ = built
    corpus, oi = oracle
    allowed = np.array(sorted(
        d for d, lang in zip(corpus.column("docid").to_pylist(),
                             corpus.column("lang").to_pylist())
        if lang == "python"
    ), dtype=np.int64)
    queries = pq.read_table(queries_path).slice(0, 10)
    got = (
        search_table(queries, index_dir, k=10, with_sha=False,
                     docid_filter=allowed)
        .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    assert got["docid"].isin(allowed).all()
    want_rows = []
    for qid, text in zip(queries.column("qid").to_pylist(),
                         queries.column("query").to_pylist()):
        full = oi.search(text, k=N_DOCS)
        kept = [(qid, d, s) for d, _, s in full if d in set(allowed.tolist())][:10]
        want_rows.extend(
            (q, d, r + 1, s) for r, (q, d, s) in enumerate(kept)
        )
    want = pd.DataFrame(want_rows, columns=["qid", "docid", "rank", "score"])
    pd.testing.assert_frame_equal(
        got.astype({"rank": np.int64}),
        want.astype({"rank": np.int64}),
        check_dtype=False,
    )


def test_docid_join_strategy_equivalent(small_fixture, tmp_path_factory):
    """docid_map_strategy='join' (the multi-node scale path using
    Dataset.join) must produce the same docids and segments as 'broadcast'."""
    corpus_dir, _ = small_fixture
    cfg_b = EngineConfig(salt_max_run=20, num_term_partitions=8,
                         docid_map_strategy="broadcast")
    cfg_j = EngineConfig(salt_max_run=20, num_term_partitions=8,
                         docid_map_strategy="join")
    db = str(tmp_path_factory.mktemp("idx_bcast"))
    dj = str(tmp_path_factory.mktemp("idx_join"))
    build_index(corpus_dir, db, cfg_b)
    build_index(corpus_dir, dj, cfg_j)

    def segs(d):
        t = pa.concat_tables(
            pq.read_table(f)
            for f in sorted(glob.glob(os.path.join(d, "segments", "*.parquet")))
        ).to_pandas()
        return t.sort_values(["term_id", "salt"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(segs(db), segs(dj))

    def meta(d):
        t = pa.concat_tables(
            pq.read_table(f, columns=["repo", "path", "docid"])
            for f in sorted(glob.glob(os.path.join(d, "docmeta", "*.parquet")))
        ).to_pandas()
        return t.sort_values("docid").reset_index(drop=True)

    pd.testing.assert_frame_equal(meta(db), meta(dj))


@pytest.mark.parametrize("codec", ["pfor", "ef"])
def test_alt_codec_build_search_identical(built, small_fixture,
                                          tmp_path_factory, codec):
    """Alternative segment codecs (PForDelta bit-plane blocks; Elias-Fano
    quasi-succinct) change segment FILE bytes only: the build must return
    frame-equal rankings to the varint build on every query, through both
    the serve-artifact mmap path and the segment-decode fallback, and must
    survive coalescing."""
    corpus_dir, queries_path, varint_idx, _ = built
    cfg = EngineConfig(salt_max_run=20, num_term_partitions=8,
                       segment_codec=codec)
    pfor_idx = str(tmp_path_factory.mktemp(f"idx_{codec}"))
    build_index(corpus_dir, pfor_idx, cfg)
    queries = pq.read_table(queries_path)
    cols = ["qid", "docid", "rank", "score"]

    def ranked(d):
        return (search_table(queries, d, k=10, with_sha=False).to_pandas()
                [cols].sort_values(["qid", "rank"]).reset_index(drop=True))

    base = ranked(varint_idx)
    pd.testing.assert_frame_equal(ranked(pfor_idx), base)

    # segment-decode fallback (serve artifact removed) decodes pfor too
    import shutil

    shutil.rmtree(os.path.join(pfor_idx, "serve"))
    os.utime(os.path.join(pfor_idx, "metadata.json"))
    pd.testing.assert_frame_equal(ranked(pfor_idx), base)

    # coalesce re-encodes runs with the index codec; results unchanged
    from colbert_ray.stages.compact import coalesce_segments

    coalesce_segments(pfor_idx)
    os.utime(os.path.join(pfor_idx, "metadata.json"))
    pd.testing.assert_frame_equal(ranked(pfor_idx), base)


def test_sharded_search_bit_identical(built):
    """Docid-range sharded serving (multi-node topology) must reproduce the
    unsharded ranking exactly — per-shard scores use GLOBAL statistics and
    the qid merge re-ranks by (-score, docid)."""
    from colbert_ray.pipelines.search import search_sharded

    _, queries_path, index_dir, _ = built
    queries = pq.read_table(queries_path)
    flat = (
        search_table(queries, index_dir, k=10, with_sha=False)
        .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    shard = (
        search_sharded(queries, index_dir, k=10, n_shards=3, with_sha=False)
        .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        flat[["qid", "docid", "rank", "score"]],
        shard[["qid", "docid", "rank", "score"]],
        check_dtype=False,
    )


def test_lang_overrides_end_to_end(small_fixture, tmp_path_factory):
    """Per-language tokenizer plugins (SURVEY §7.1 M9) through the full
    build: docs of the overridden lang index unsplit camelCase terms, other
    langs are unchanged, and changing the plugin table re-tokenizes (the
    pre-tokenize hash covers it)."""
    corpus_dir, _ = small_fixture
    import pyarrow.dataset as pads

    langs = pads.dataset(corpus_dir).to_table(columns=["lang"])
    some_lang = langs.column("lang").to_pylist()[0]
    cfg = EngineConfig(
        salt_max_run=20, num_term_partitions=8,
        lang_overrides={some_lang: {"split_camel_case": False}})
    d = str(tmp_path_factory.mktemp("idx_lang"))
    report = build_index(corpus_dir, d, cfg)
    assert report["phases"]           # fresh build ran

    from colbert_ray.state.decoded import DecodedIndex

    idx = DecodedIndex.load(d)
    terms = set(idx.dict_terms.tolist())
    # fixture corpora contain camelCase identifiers in every lang; with the
    # override, unsplit lowercase forms must exist in the dictionary
    unsplit = [t for t in terms if len(t) > 10 and t.isalpha()]
    assert unsplit, "override produced no unsplit long identifiers"

    # same corpus WITHOUT overrides: a different pre-tokenize artifact
    # (resume must not reuse the overridden tokenize)
    d2 = str(tmp_path_factory.mktemp("idx_nolang"))
    build_index(corpus_dir, d2,
                EngineConfig(salt_max_run=20, num_term_partitions=8))
    idx2 = DecodedIndex.load(d2)
    assert set(idx2.dict_terms.tolist()) != terms

    # the overridden index still answers queries
    res = search_table(
        pa.table({"qid": pa.array([0], type=pa.int64()),
                  "query": pa.array(["buffer data"])}), d, k=5)
    assert res.num_rows > 0


def test_bmw_strategy_identical_through_pipeline(built):
    """prune_strategy='bmw' must be frame-equal to the default MaxScore
    path through the public search pipeline (both are exact)."""
    _, queries_path, index_dir, _ = built
    queries = pq.read_table(queries_path)
    cols = ["qid", "docid", "rank", "score"]
    base = (search_table(queries, index_dir, k=10, with_sha=False)
            .to_pandas()[cols].reset_index(drop=True))
    bmw = (search_table(queries, index_dir, k=10, with_sha=False,
                        prune_strategy="bmw")
           .to_pandas()[cols].reset_index(drop=True))
    pd.testing.assert_frame_equal(bmw, base)


def test_oov_and_empty_queries(built):
    _, _, index_dir, _ = built
    queries = pa.table({"qid": pa.array([0, 1], type=pa.int64()),
                        "query": pa.array(["zzzznotaterm", "...!!!..."])})
    res = search_table(queries, index_dir, k=10)
    assert res.num_rows == 0


def test_parent_max_matches_bruteforce(tmp_path_factory):
    """Max-passage mode (parent_base): top-k PARENTS by best-passage score,
    reduced inside the scorer, must equal the brute-force groupby-max over
    an unbounded search; sharded parent search max-merges identically; and
    parent_base + with_sha is rejected (parent ids have no sha)."""
    from colbert_ray.pipelines.search import search_sharded
    from colbert_ray.state.index import BM25Scorer

    root = str(tmp_path_factory.mktemp("pmax"))
    rng = np.random.default_rng(31)
    BASE = 1000
    rows = []
    # 60 parents x 1-5 passages with overlapping vocab so maxima differ
    vocab = [f"w{i}" for i in range(40)]
    for parent in range(60):
        for pi in range(int(rng.integers(1, 6))):
            words = rng.choice(vocab, size=12)
            rows.append((parent * BASE + pi, parent, pi, " ".join(words)))
    t = pa.table({
        "pid": pa.array([r[0] for r in rows], type=pa.int64()),
        "doc_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "passage_idx": pa.array([r[2] for r in rows], type=pa.int64()),
        "text": pa.array([r[3] for r in rows]),
    })
    src = os.path.join(root, "passages.parquet")
    pq.write_table(t, src)
    idx = os.path.join(root, "index")
    build_index(src, idx, CFG, content_col="text", key_cols=(),
                meta_cols=("doc_id", "passage_idx"), docid_col="pid")
    qt = pa.table({
        "qid": pa.array(list(range(8)), type=pa.int64()),
        "query": pa.array([f"w{i} w{i+3} w{i+11}" for i in range(8)]),
    })
    # brute force: every matching passage, groupby parent max, top-5
    full = search_table(qt, idx, k=10**6, with_sha=False).to_pandas()
    full["parent"] = full["docid"] // BASE
    want_rows = []
    for qid, g in full.groupby("qid"):
        m = g.groupby("parent", as_index=False)["score"].max()
        m = m.sort_values(["score", "parent"],
                          ascending=[False, True]).head(5)
        for rk, (_, r) in enumerate(m.iterrows(), 1):
            want_rows.append((qid, int(r["parent"]), rk, r["score"]))
    want = pd.DataFrame(want_rows, columns=["qid", "docid", "rank", "score"])
    got = (search_table(qt, idx, k=5, with_sha=False, parent_base=BASE)
           .to_pandas())
    got["rank"] = got["rank"].astype(np.int64)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"rank": np.int64}).reset_index(drop=True))
    # sharded parent-max merge equals unsharded (boundary-split parents)
    sh = (search_sharded(qt, idx, k=5, n_shards=3, with_sha=False,
                         parent_base=BASE)
          .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True))
    sh["rank"] = sh["rank"].astype(np.int64)
    pd.testing.assert_frame_equal(
        sh[["qid", "docid", "rank", "score"]],
        want.astype({"rank": np.int64}).reset_index(drop=True))
    with pytest.raises(ValueError, match="parent_base"):
        BM25Scorer(idx, k=5, with_sha=True, parent_base=BASE)
