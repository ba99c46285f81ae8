"""Tests for readers/writers, the evaluation harness, ranked-list merge,
splits, passage splitting, and segment compaction (coalesce-equivalence:
reference pattern ``colbert/tests/index_coalesce_test.py``)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines import evaluate as ev
from colbert_ray.sources import readers, writers
from colbert_ray.stages.passages import split_documents


def _ranking_table():
    # qid 0: docs 1,2,3 ranked; qid 1: docs 4,5
    return pa.table({
        "qid": pa.array([0, 0, 0, 1, 1], type=pa.int64()),
        "docid": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "rank": pa.array([1, 2, 3, 1, 2], type=pa.int32()),
        "score": pa.array([3.0, 2.0, 1.0, 9.0, 8.0]),
    })


def _qrels_table():
    # qid 0: relevant {2}; qid 1: relevant {9} (never retrieved);
    # qid 7: judged but never ranked
    return pa.table({
        "qid": pa.array([0, 1, 7], type=pa.int64()),
        "docid": pa.array([2, 9, 1], type=pa.int64()),
    })


class TestMetrics:
    def test_mrr_recall_success(self):
        m = ev.ranking_metrics(
            ray.data.from_arrow(_ranking_table()),
            ray.data.from_arrow(_qrels_table()),
            mrr_at=10, recall_at=(5,), success_at=(1, 5),
        )
        # 3 judged qids; only qid0 hits (rank 2) -> mrr = (1/2)/3
        assert m["mrr@10"][0] == pytest.approx(0.5 / 3)
        assert m["recall@5"][0] == pytest.approx(1.0 / 3)
        assert m["success@1"][0] == 0.0
        assert m["success@5"][0] == pytest.approx(1.0 / 3)
        assert m["n_judged"][0] == 3

    def test_merge_rankings_tie_break(self):
        a = ray.data.from_arrow(_ranking_table())
        b = ray.data.from_arrow(pa.table({
            "qid": pa.array([0, 1], type=pa.int64()),
            "docid": pa.array([10, 4], type=pa.int64()),   # docid 4 dup
            "rank": pa.array([1, 1], type=pa.int32()),
            "score": pa.array([3.0, 9.5]),
        }))
        merged = ev.merge_rankings([a, b], depth=3).to_pandas()
        q0 = merged[merged.qid == 0].sort_values("rank")
        # tie 3.0/3.0 between docid 1 and 10 -> lower docid first (K2)
        assert q0["docid"].tolist() == [1, 10, 2]
        q1 = merged[merged.qid == 1].sort_values("rank")
        assert q1["docid"].tolist() == [4, 5]
        assert q1["score"].tolist() == [9.5, 8.0]   # dedup keeps best score row

    def test_translate_and_softmax(self):
        r = ev.translate_ranking(
            ray.data.from_arrow(_ranking_table()), {1: 100, 4: 400}
        ).to_pandas()
        assert set(r["docid"]) == {100, 2, 3, 400, 5}
        probs = ev.scores_to_probs(_ranking_table()).to_pandas()
        assert probs.groupby("qid")["prob"].sum().round(9).tolist() == [1.0, 1.0]

    def test_split_deterministic(self):
        ds = ray.data.range(100)
        a1, b1 = ev.split_dataset(ds, [0.8, 0.2], seed=7)
        a2, b2 = ev.split_dataset(ray.data.range(100), [0.8, 0.2], seed=7)
        assert sorted(r["id"] for r in a1.take_all()) == sorted(r["id"] for r in a2.take_all())
        assert a1.count() + b1.count() == 100


class TestReadersWriters:
    def test_queries_tsv_roundtrip(self, tmp_path):
        t = pa.table({"qid": pa.array([1, 2], type=pa.int64()),
                      "query": pa.array(["hello world", "foo bar"])})
        p = writers.write_queries_tsv(t, str(tmp_path / "queries.tsv"))
        back = readers.read_queries(p).to_pandas().sort_values("qid")
        assert back["query"].tolist() == ["hello world", "foo bar"]

    def test_ranking_tsv_roundtrip_with_meta(self, tmp_path):
        p = writers.write_ranking_tsv(_ranking_table(), str(tmp_path / "r.tsv"), k=3)
        assert os.path.exists(p + ".meta")
        back = readers.read_ranking(p).to_pandas()
        assert len(back) == 5
        assert list(back.columns) == ["qid", "docid", "rank", "score"]

    def test_qrels_reader_dedups(self):
        t = pa.table({"qid": pa.array([1, 1], type=pa.int64()),
                      "docid": pa.array([5, 5], type=pa.int64())})
        out = readers.read_qrels(ray.data.from_arrow(t)).to_pandas()
        assert len(out) == 1

    def test_queries_reader_asserts_unique(self):
        t = pa.table({"qid": pa.array([1, 1], type=pa.int64()),
                      "query": pa.array(["a", "b"])})
        with pytest.raises(AssertionError):
            readers.read_queries(ray.data.from_arrow(t))

    def test_annotate_ranking_labels(self):
        corpus = ray.data.from_arrow(pa.table({
            "docid": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "repo": pa.array(list("abcde")),
            "path": pa.array(list("vwxyz")),
            "lang": pa.array(["py"] * 5),
        }))
        out = ev.annotate_ranking(
            ray.data.from_arrow(_ranking_table()), corpus,
            qrels=ray.data.from_arrow(_qrels_table()),
        ).to_pandas().sort_values(["qid", "rank"])
        assert out["repo"].tolist() == ["a", "b", "c", "d", "e"]
        assert out["label"].tolist() == [False, True, False, False, False]

    def test_annotate_empty_ranking_and_dangling_docids(self):
        """r5 regression: an EMPTY ranking (Ray to_pandas drops the schema
        at zero rows) and a ranking whose docids all miss the corpus must
        annotate to empty / NaN rows, not KeyError in the semi-join."""
        corpus = ray.data.from_arrow(pa.table({
            "docid": pa.array([1, 2], type=pa.int64()),
            "repo": pa.array(["a", "b"]),
            "path": pa.array(["x", "y"]),
            "lang": pa.array(["py", "py"]),
        }))
        empty = ray.data.from_arrow(pa.table({
            "qid": pa.array([], type=pa.int64()),
            "docid": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int32()),
            "score": pa.array([], type=pa.float64()),
        }))
        assert ev.annotate_ranking(empty, corpus).count() == 0
        dangling = ray.data.from_arrow(pa.table({
            "qid": pa.array([0], type=pa.int64()),
            "docid": pa.array([99], type=pa.int64()),
            "rank": pa.array([1], type=pa.int32()),
            "score": pa.array([1.0]),
        }))
        out = ev.annotate_ranking(dangling, corpus).to_pandas()
        assert len(out) == 1 and pd.isna(out["repo"].iloc[0])
        # annotate_exact_match: same helper, text column side
        em_corpus = ray.data.from_arrow(pa.table({
            "docid": pa.array([1], type=pa.int64()),
            "content": pa.array(["hello world"]),
        }))
        em = ev.annotate_exact_match(dangling, em_corpus,
                                     {0: ["hello"]}).to_pandas()
        assert len(em) == 1 and not em["answer_em"].iloc[0]
        assert ev.annotate_exact_match(empty, em_corpus, {}).count() == 0


class TestAnswerEM:
    def test_normalize_and_em(self):
        assert ev.normalize_answer("The  Quick-Brown FOX!") == "quick brown fox"
        assert ev.normalize_answer("Élan") == "elan"
        corpus = ray.data.from_arrow(pa.table({
            "docid": pa.array([1, 2], type=pa.int64()),
            "content": pa.array(["The quick brown fox jumps", "nothing here"]),
        }))
        ranking = ray.data.from_arrow(pa.table({
            "qid": pa.array([0, 0], type=pa.int64()),
            "docid": pa.array([1, 2], type=pa.int64()),
            "rank": pa.array([1, 2], type=pa.int32()),
            "score": pa.array([2.0, 1.0]),
        }))
        out = ev.annotate_exact_match(
            ranking, corpus, {0: ["Quick,  BROWN fox"]}
        ).to_pandas().sort_values("docid")
        assert out["answer_em"].tolist() == [True, False]


class TestPassages:
    def test_split_with_overlap_and_wraparound(self):
        text = " ".join(f"w{i}" for i in range(10))
        ds = ray.data.from_arrow(pa.table({
            "docid": pa.array([0, 1], type=pa.int64()),
            "content": pa.array([text, "short doc"]),
        }))
        out = split_documents(ds, max_words=4, overlap=1).to_pandas()
        p0 = out[out.docid == 0].sort_values("passage_idx")["content"].tolist()
        assert p0[0] == "w0 w1 w2 w3"
        assert p0[1] == "w3 w4 w5 w6"
        # final window wraps back to exactly max_words
        assert p0[-1].split()[-1] == "w9" and len(p0[-1].split()) == 4
        assert out[out.docid == 1]["content"].tolist() == ["short doc"]


class TestPruning:
    def test_stop_term_pruning_semantics(self, small_fixture, tmp_path_factory):
        """Pruned (ultra-common) terms stop matching; untouched terms keep
        their posting lists (M11 lossy-shrink analog)."""
        from colbert_ray.pipelines.build import build_index
        from colbert_ray.stages.prune import prune_index
        from colbert_ray.state.decoded import DecodedIndex

        corpus_dir, _ = small_fixture
        d = str(tmp_path_factory.mktemp("idx_prune"))
        build_index(corpus_dir, d, EngineConfig(salt_max_run=20, num_term_partitions=8))
        before = DecodedIndex.load(d)
        rep = prune_index(d, max_df_ratio=0.5)
        assert rep["n_terms_pruned"] > 0 and rep["n_postings_dropped"] > 0
        after = DecodedIndex.load(d)
        # a known head term ('the' appears in most docs) is gone
        tid = after.lookup_terms(["the"])
        assert len(tid) == 0 or len(after.postings_slice(int(tid[0]))[0]) == 0
        # a rare term's postings are untouched
        rare = before.dict_terms[np.argmin(before.dict_dfs)]
        t_b = before.lookup_terms([rare])[0]
        t_a = after.lookup_terms([rare])[0]
        assert (before.postings_slice(int(t_b))[0]
                == after.postings_slice(int(t_a))[0]).all()

    def test_pruned_last_term_still_loads(self, small_fixture, tmp_path_factory):
        """Dropping the runs of the HIGHEST term_id (lexicographically last
        term) must not break loading: max_tfsat reduceat over the trailing
        empty segment was out-of-bounds before the nonempty-terms guard."""
        import glob

        from colbert_ray.pipelines.build import build_index
        from colbert_ray.state.decoded import DecodedIndex
        from colbert_ray.state.index import BM25Scorer

        corpus_dir, _ = small_fixture
        d = str(tmp_path_factory.mktemp("idx_prune_last"))
        build_index(corpus_dir, d, EngineConfig(salt_max_run=20,
                                                num_term_partitions=8))
        before = DecodedIndex.load(d)
        last_tid = int(before.dict_term_ids.max())
        last_term = before.dict_terms[before.dict_term_ids == last_tid][0]
        for f in sorted(glob.glob(os.path.join(d, "segments", "part_*.parquet"))):
            t = pq.read_table(f)
            tid = t.column("term_id").to_numpy(zero_copy_only=False)
            if (tid == last_tid).any():
                pq.write_table(t.filter(pa.array(tid != last_tid)), f + ".tmp")
                os.replace(f + ".tmp", f)
        os.utime(os.path.join(d, "metadata.json"))
        after = DecodedIndex.load(d)                 # must not raise
        assert float(after.max_tfsat_by_term[last_tid]) == 0.0
        # other terms' bounds are unchanged (no off-by-one-segment smear)
        others = np.arange(last_tid)
        np.testing.assert_array_equal(after.max_tfsat_by_term[others],
                                      before.max_tfsat_by_term[others])
        # the pruned term no longer matches; a query over it still works
        sc = BM25Scorer(index_dir=d, k=5)
        docids, _, _ = sc.score_query(str(last_term))
        assert len(docids) == 0


class TestCompaction:
    def test_coalesced_index_answers_identically(self, small_fixture, tmp_path_factory):
        from colbert_ray.pipelines.build import build_index
        from colbert_ray.pipelines.search import search_table
        from colbert_ray.stages.compact import coalesce_segments

        corpus_dir, queries_path = small_fixture
        cfg = EngineConfig(salt_max_run=20, num_term_partitions=8)
        d = str(tmp_path_factory.mktemp("idx_coal"))
        build_index(corpus_dir, d, cfg)
        queries = pq.read_table(queries_path)
        before = search_table(queries, d, k=10).to_pandas()
        seg_files_before = len(os.listdir(os.path.join(d, "segments")))
        coalesce_segments(d, merge_salts=True)
        files = [f for f in os.listdir(os.path.join(d, "segments"))
                 if f.endswith(".parquet")]
        assert files == ["part_00000.parquet"]
        after = search_table(queries, d, k=10).to_pandas()
        pd.testing.assert_frame_equal(before, after)   # logical equivalence
        assert seg_files_before > 1


class TestSplitByQueryset:
    def test_split_partitions_and_drops_unlisted(self):
        """J7: rows route to their queryset; qids in no set are dropped;
        the two splits partition the listed rows exactly."""
        ranking = ray.data.from_arrow(_ranking_table())
        out = ev.split_ranking_by_queryset(
            ranking, {"dev": [0], "test": [1, 99]})
        dev = out["dev"].to_pandas()
        test = out["test"].to_pandas()
        assert set(dev["qid"]) == {0} and len(dev) == 3
        assert set(test["qid"]) == {1} and len(test) == 2
        only = ev.split_ranking_by_queryset(ranking, {"none": [42]})
        assert len(only["none"].to_pandas()) == 0


class TestQueriesJsonl:
    def test_queries_jsonl_question_answers(self, tmp_path):
        """S3 first-class JSONL reader: the reference's QA-queries format
        {qid, question, answers} (queries.py:54-67) maps question->query
        and carries answers through for EM evaluation."""
        import json as _json

        p = str(tmp_path / "queries.jsonl")
        rows = [
            {"qid": 7, "question": "who wrote hamlet",
             "answers": ["Shakespeare", "William Shakespeare"]},
            {"qid": 9, "question": "capital of france", "answers": ["Paris"]},
        ]
        with open(p, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        df = readers.read_queries(p).to_pandas().sort_values("qid")
        assert df["qid"].tolist() == [7, 9]
        assert df["qid"].dtype == "int64"
        assert df["query"].tolist() == ["who wrote hamlet",
                                        "capital of france"]
        assert list(df["answers"].iloc[0]) == ["Shakespeare",
                                               "William Shakespeare"]

    def test_queries_jsonl_duplicate_qid_asserts(self, tmp_path):
        import json as _json

        p = str(tmp_path / "dup.jsonl")
        with open(p, "w") as f:
            for r in ({"qid": 1, "question": "a"}, {"qid": 1, "question": "b"}):
                f.write(_json.dumps(r) + "\n")
        with pytest.raises(AssertionError):
            readers.read_queries(p)

    def test_queries_jsonl_searchable(self, tmp_path):
        """JSONL queries feed search_table unchanged (extra answers column
        must not break the scorer input contract)."""
        import json as _json

        from colbert_ray.config import EngineConfig
        from colbert_ray.fixtures import ensure_fixture
        from colbert_ray.pipelines.build import build_index
        from colbert_ray.pipelines.search import search_table

        root = str(tmp_path)
        corpus_dir, queries_path = ensure_fixture(root, 80, 4)
        idx = os.path.join(root, "index")
        build_index(corpus_dir, idx,
                    EngineConfig(salt_max_run=30, num_term_partitions=4))
        qt = pq.read_table(queries_path)
        p = str(tmp_path / "q.jsonl")
        with open(p, "w") as f:
            for qid, q in zip(qt.column("qid").to_pylist(),
                              qt.column("query").to_pylist()):
                f.write(_json.dumps({"qid": qid, "question": q,
                                     "answers": ["x"]}) + "\n")
        want = search_table(qt, idx, k=5, with_sha=False).to_pandas()
        got = search_table(
            readers.read_queries(p).select_columns(["qid", "query"]),
            idx, k=5, with_sha=False).to_pandas()
        pd.testing.assert_frame_equal(
            got.sort_values(["qid", "rank"]).reset_index(drop=True),
            want.sort_values(["qid", "rank"]).reset_index(drop=True))


def test_reciprocal_rank_fusion_math_and_ties():
    import pandas as pd

    from colbert_ray.pipelines.evaluate import reciprocal_rank_fusion

    a = pd.DataFrame({"qid": [1, 1, 2], "docid": [10, 11, 20],
                      "rank": [1, 2, 1]})
    b = pd.DataFrame({"qid": [1, 1, 2], "docid": [11, 12, 21],
                      "rank": [1, 2, 1]})
    out = reciprocal_rank_fusion([a, b], k=10)
    got = {(r.qid, r.docid): r.fused for r in out.itertuples()}
    assert abs(got[(1, 11)] - (1 / 62 + 1 / 61)) < 1e-15   # in both lists
    assert abs(got[(1, 10)] - 1 / 61) < 1e-15
    assert abs(got[(1, 12)] - 1 / 62) < 1e-15
    # doc 11 fused > doc 10 fused -> ranks 1,2,3 for qid 1
    q1 = out[out.qid == 1]
    assert list(q1.docid) == [11, 10, 12]
    assert list(q1["rank"]) == [1, 2, 3]
    # equal fused (docs 20/21 symmetric across systems) -> docid tie-break
    q2 = out[out.qid == 2]
    assert list(q2.docid) == [20, 21]
