"""Incremental-update tests (reference pattern:
``colbert/tests/index_updater_test.py``): add docs -> searchable; remove
docs -> gone; changes persist across reload; compaction refreshes stats and
equals a clean build."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines.build import build_index
from colbert_ray.state.decoded import DecodedIndex
from colbert_ray.state.index import BM25Scorer
from colbert_ray.state.updates import IndexUpdater

CFG = EngineConfig(salt_max_run=20, num_term_partitions=8)
MAGIC = "xylophonequark"          # term that exists only in added docs


@pytest.fixture()
def built_index(small_fixture, tmp_path_factory):
    corpus_dir, _ = small_fixture
    d = str(tmp_path_factory.mktemp("idx_upd"))
    build_index(corpus_dir, d, CFG)
    return d


def _added_docs():
    return pa.table(
        {
            "repo": pa.array(["orgX/new"] * 2),
            "path": pa.array(["a.py", "b.py"]),
            "commit": pa.array(["0" * 40] * 2),
            "lang": pa.array(["python"] * 2),
            "content": pa.array(
                [f"{MAGIC} {MAGIC} mergeSort buffer", f"{MAGIC} filter the data"]
            ),
        }
    )


def test_add_then_search_finds_new_docs(built_index):
    up = IndexUpdater(built_index)
    new_ids = up.add_documents(_added_docs())
    assert len(new_ids) == 2
    scorer = BM25Scorer(built_index, k=5)
    d, s, r = scorer.score_query(MAGIC)
    assert set(d.tolist()) == set(new_ids.tolist())
    assert s[0] > s[1]                       # tf=2 doc outranks tf=1 doc
    # existing (head) terms also score the new docs — they appear in the
    # full match list (their rank is legitimately low: head-term idf ~0.08)
    d2, _, _ = scorer.score_query("mergeSort buffer", k=10_000)
    assert int(new_ids[0]) in d2.tolist()


@pytest.mark.parametrize("codec", ["pfor", "ef"])
def test_add_then_search_alt_codec(small_fixture, tmp_path_factory, codec):
    """Delta write + fold must round-trip through the index's segment codec
    (deltas are encoded by encode_runs with cfg.segment_codec)."""
    corpus_dir, _ = small_fixture
    d = str(tmp_path_factory.mktemp(f"idx_upd_{codec}"))
    cfg = EngineConfig(salt_max_run=20, num_term_partitions=8,
                       segment_codec=codec)
    build_index(corpus_dir, d, cfg)
    up = IndexUpdater(d)
    new_ids = up.add_documents(_added_docs())
    scorer = BM25Scorer(d, k=5)
    docs, scores, _ = scorer.score_query(MAGIC)
    assert set(docs.tolist()) == set(new_ids.tolist())
    assert scores[0] > scores[1]


def test_remove_tombstones_docs(built_index):
    up = IndexUpdater(built_index)
    new_ids = up.add_documents(_added_docs())
    up.remove_docids([int(new_ids[0])])
    scorer = BM25Scorer(built_index, k=5)
    d, _, _ = scorer.score_query(MAGIC)
    assert int(new_ids[0]) not in d.tolist()
    assert int(new_ids[1]) in d.tolist()


def test_updates_persist_across_reload(built_index):
    up = IndexUpdater(built_index)
    new_ids = up.add_documents(_added_docs())
    up.remove_docids([int(new_ids[1])])
    # fresh loader (new process analog)
    idx = DecodedIndex.load(built_index)
    assert len(idx.tombstones) == 1
    scorer = BM25Scorer(built_index, k=5)
    d, _, _ = scorer.score_query(MAGIC)
    assert d.tolist() == [int(new_ids[0])]


def test_frozen_stats_until_compaction(built_index):
    """avgdl/n_docs stay frozen on add (reference reuses its codec); a
    pre-existing query's scores for OLD docs are unchanged by the add."""
    scorer_before = BM25Scorer(built_index, k=5)
    d0, s0, _ = scorer_before.score_query("mergeSort")
    up = IndexUpdater(built_index)
    up.add_documents(_added_docs())
    scorer_after = BM25Scorer(built_index, k=5)
    d1, s1, _ = scorer_after.score_query("indexQuery parse")  # unrelated terms
    dd, ss, _ = scorer_after.score_query("mergeSort")
    old = [i for i, d in enumerate(dd.tolist()) if d in d0.tolist()]
    # old docs' per-doc scores unchanged (frozen idf/avgdl)
    m0 = dict(zip(d0.tolist(), s0.tolist()))
    for i in old:
        assert ss[i] == pytest.approx(m0[dd[i]], abs=0)


def test_compaction_equals_clean_build(small_fixture, tmp_path_factory):
    corpus_dir, _ = small_fixture
    d_inc = str(tmp_path_factory.mktemp("idx_inc"))
    build_index(corpus_dir, d_inc, CFG)
    up = IndexUpdater(d_inc)
    up.add_documents(_added_docs())

    # combined corpus: original fixture + the added docs appended
    import glob

    combined_dir = str(tmp_path_factory.mktemp("combined"))
    for i, f in enumerate(sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))):
        os.symlink(f, os.path.join(combined_dir, f"part-{i:05d}.parquet"))
    pq.write_table(_added_docs(), os.path.join(combined_dir, "part-zz-new.parquet"))

    up.compact(combined_dir)
    d_clean = str(tmp_path_factory.mktemp("idx_clean2"))
    build_index(combined_dir, d_clean, CFG)

    s_inc = BM25Scorer(d_inc, k=10)
    s_clean = BM25Scorer(d_clean, k=10)
    for q in (MAGIC, "mergeSort buffer", "the data filter"):
        a = s_inc.score_query(q)
        b = s_clean.score_query(q)
        assert a[0].tolist() == b[0].tolist()
        assert a[1].tolist() == b[1].tolist()    # exact float equality
    # deltas cleared
    assert not glob.glob(os.path.join(d_inc, "deltas", "delta_*"))


def test_ql_ranker_over_updated_index(built_index):
    """Dirichlet QL over a delta+tombstone view: added docs rank for their
    new term, tombstoned docs never rank, cf comes from the served
    (folded) postings."""
    upd = IndexUpdater(built_index)
    new_ids = upd.add_documents(_added_docs(), content_col="content")
    sc = BM25Scorer(built_index, k=10, with_sha=False, ranker="ql")
    d, s, r = sc.score_query(MAGIC)
    assert set(new_ids[:1]) <= set(d.tolist())   # magic docs rank
    # tombstone the top magic doc; QL must drop it
    upd.remove_docids([int(d[0])])
    os.utime(os.path.join(built_index, "metadata.json"))
    sc2 = BM25Scorer(built_index, k=10, with_sha=False, ranker="ql")
    d2, _, _ = sc2.score_query(MAGIC)
    assert int(d[0]) not in d2.tolist()
    # cf over folded postings: magic's cf is the sum of added tfs (3)
    idx = sc2.idx
    tid = idx.lookup_terms([MAGIC])
    assert len(tid) == 1
    _, tfs = idx.postings_slice_raw(int(tid[0]))
    assert int(np.asarray(tfs, dtype=np.int64).sum()) == 3


def test_remove_by_query(built_index, ray_session):
    """Delete-by-query: the DSL match set is tombstoned, searches stop
    returning it, a second identical delete removes nothing (live-view
    evaluation), and corpus-pass atoms are rejected."""
    import pyarrow as pa2

    from colbert_ray.pipelines.querylang import dsl_search
    from colbert_ray.pipelines.search import search_table

    up = IndexUpdater(built_index)
    # pick a real term from the dictionary so the match set is non-empty
    idx = DecodedIndex.load_cached(built_index, load_sha=False)
    term = str(idx.dict_terms[len(idx.dict_terms) // 2])
    victims = dsl_search(built_index, None, term,
                         k=10**9).column("docid").to_pylist()
    assert victims
    removed = up.remove_by_query(term)
    assert sorted(removed.tolist()) == sorted(victims)
    os.utime(os.path.join(built_index, "metadata.json"))
    qt = pa2.table({"qid": pa2.array([0], type=pa2.int64()),
                    "query": pa2.array([term])})
    after = search_table(qt, built_index, k=10, with_sha=False)
    assert after.num_rows == 0
    # idempotent on the live view
    assert up.remove_by_query(term).size == 0
    with pytest.raises(ValueError, match="corpus pass"):
        up.remove_by_query('"two words"')


def test_update_by_query(ray_session, tmp_path):
    """Update-by-query: matching docs are tombstoned and their transformed
    text re-added as delta docs; searches see the new text and not the
    old; non-matching docs are untouched."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2
    import ray.data

    from colbert_ray.pipelines.search import search_table

    texts = ["alpha stale content", "beta stale content",
             "gamma fresh already", "alpha another stale"]
    t = pa2.table({
        "doc_id": pa2.array([1, 2, 3, 4], type=pa2.int64()),
        "text": pa2.array(texts, type=pa2.string()),
    })
    src = str(tmp_path / "d.parquet")
    pq2.write_table(t, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, CFG, content_col="text", key_cols=(),
                meta_cols=(), docid_col="doc_id")
    up = IndexUpdater(idx)
    mapping = up.update_by_query(
        ray.data.read_parquet(src), "alpha AND stale",
        lambda xs: [x.replace("stale", "refreshed") for x in xs]).to_pandas()
    assert sorted(mapping["old_docid"]) == [1, 4]
    assert len(set(mapping["new_docid"]) & {1, 2, 3, 4}) == 0
    os.utime(os.path.join(idx, "metadata.json"))
    qt = pa2.table({"qid": pa2.array([0, 1], type=pa2.int64()),
                    "query": pa2.array(["refreshed", "stale"])})
    res = search_table(qt, idx, k=10, with_sha=False).to_pandas()
    got_refreshed = set(res[res["qid"] == 0]["docid"])
    got_stale = set(res[res["qid"] == 1]["docid"])
    assert got_refreshed == set(mapping["new_docid"])
    assert got_stale == {2}                     # doc 2 untouched
    with pytest.raises(ValueError, match="corpus pass"):
        up.update_by_query(ray.data.read_parquet(src), '"a b"',
                           lambda xs: xs)


def test_delta_docmeta_overlay_collapse_and_boost(built_index):
    """Docs added via IndexUpdater keep metadata under
    deltas/*/docmeta.parquet; collapse_search / function_score_search must
    overlay it (not read NULL): same overlay direction as _load_sha."""
    from colbert_ray.pipelines.search import (
        collapse_search,
        function_score_search,
    )

    up = IndexUpdater(built_index)
    new_ids = up.add_documents(_added_docs())
    # both delta docs carry lang="python": ONE collapse group of 2, not
    # two NULL-field singletons
    got = collapse_search(built_index, MAGIC, "lang", k=10).to_pandas()
    assert len(got) == 1
    assert int(got["group_count"].iloc[0]) == 2
    assert int(got["docid"].iloc[0]) in {int(i) for i in new_ids}
    # doclen is in the delta docmeta too: boost_field scores > 0 (a NULL
    # field value would zero delta docs out until compaction)
    fs = function_score_search(built_index, MAGIC, field="doclen",
                               k=10).to_pandas()
    assert set(fs["docid"]) == {int(i) for i in new_ids}
    assert (fs["score_r"] > 0).all()


def test_delta_fold_keeps_mmap_base_lazy(built_index):
    """Folding a delta into a serve-artifact (mmap) index must attach an
    O(n_delta) extension, NOT copy O(n_docs) doclens into heap — the
    10^9-doc updated-serving memory shape."""
    from colbert_ray.state.decoded import SplitDoclens

    up = IndexUpdater(built_index)
    new_ids = up.add_documents(_added_docs())
    idx = DecodedIndex.load(built_index, load_sha=False)
    assert isinstance(idx.doclens, SplitDoclens)
    assert isinstance(idx.doclens.base, np.memmap)   # untouched, lazy
    assert len(idx.doclens.ext) == len(new_ids)
    # indexing parity with a dense fold
    dense = np.asarray(idx.doclens)
    probe = np.array([0, 1, len(dense) - 2, len(dense) - 1], dtype=np.int64)
    assert (idx.doclens[probe] == dense[probe]).all()
    assert idx.doclens[len(dense) - 1] == dense[-1]
    assert len(idx.doclens) == len(dense)
    # scoring over the split array still finds the delta docs
    scorer = BM25Scorer(built_index, k=5)
    d, s, _ = scorer.score_query(MAGIC)
    assert set(d.tolist()) == {int(i) for i in new_ids}


def test_segment_decode_fallback_bound(built_index, monkeypatch):
    """The non-mmap fallback materializes dense per-doc arrays in one heap;
    the documented bound must turn a silent OOM into a clear error."""
    import shutil

    from colbert_ray.state import decoded as dec

    shutil.rmtree(os.path.join(built_index, "serve"), ignore_errors=True)
    os.utime(os.path.join(built_index, "metadata.json"))
    monkeypatch.setattr(dec, "_MAX_DECODE_DOCS", 3)
    with pytest.raises(ValueError, match="COLBERT_RAY_MAX_DECODE_DOCS"):
        DecodedIndex.load(built_index, load_sha=False)
    monkeypatch.setattr(dec, "_MAX_DECODE_DOCS", 100_000_000)
    idx = DecodedIndex.load(built_index, load_sha=False)   # fallback works
    assert len(idx.doclens) > 3
