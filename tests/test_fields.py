"""BM25F field-weighted retrieval (extras/fields.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from colbert_ray.config import EngineConfig
from colbert_ray.extras.fields import FieldSpec, bm25f_rank, field_split
from colbert_ray.functions.tokenizer import doc_term_frequencies

CFG = EngineConfig()


def _docs_ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


class TestFieldSplit:
    def test_title_body_token_slices(self):
        rows = [
            (0, "Alpha beta gamma delta epsilon zeta eta theta"),
            (1, "one two"),                    # shorter than title_len
            (2, ""),                           # empty doc
            (3, "camelCaseToken under_score x y z w q"),
        ]
        out = (field_split(_docs_ds(rows), title_len=5, cfg=CFG)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(out.columns) == ["doc_id", "title", "body"]
        assert out.loc[0, "title"] == "alpha beta gamma delta epsilon"
        assert out.loc[0, "body"] == "zeta eta theta"
        assert out.loc[1, "title"] == "one two"
        assert out.loc[1, "body"] == ""
        assert out.loc[2, "title"] == "" and out.loc[2, "body"] == ""
        # camelCase/underscore splitting happens BEFORE the slice
        assert out.loc[3, "title"] == "camel case token under score"

    def test_retokenization_identity(self):
        """Re-tokenizing a joined field reproduces the token slice exactly —
        the property the SQL twin's toks[1:T] slicing relies on."""
        rows = [(i, t) for i, t in enumerate([
            "SparkSQL fastJoin mergeSort bigTable scanPlan x1 y2 z3",
            "a bb ccc dddd eeeee ffffff g",
            "the quick brown fox jumps over the lazy dog",
        ])]
        split = (field_split(_docs_ds(rows), title_len=4, cfg=CFG)
                 .to_pandas().sort_values("doc_id").reset_index(drop=True))
        for _, r in split.iterrows():
            orig = _docs_ds(rows).to_pandas().set_index("doc_id")
            _, terms, tfs = doc_term_frequencies(
                pa.array([orig.loc[r["doc_id"], "text"]]), CFG)
            full = sorted(terms.flatten().to_pylist())
            _, t_terms, t_tfs = doc_term_frequencies(
                pa.array([r["title"], r["body"]]), CFG)
            rejoined = sorted(t_terms.flatten().to_pylist())
            # multiset equality across the two fields vs the full doc
            def multiset(ts, fs):
                return sorted(
                    (t, f) for t, f in zip(ts.flatten().to_pylist(),
                                           fs.flatten().to_pylist()))
            assert sorted(set(rejoined)) == sorted(set(full))


class TestBM25F:
    def _brute(self, rows, queries, title_len, fields, k1):
        """Independent numpy re-derivation of the BM25F math."""
        from colbert_ray.functions.tokenizer import tokenize_query

        def toks(s):
            _, t, f = doc_term_frequencies(pa.array([s]), CFG)
            out = {}
            for term, tf in zip(t.flatten().to_pylist(),
                                f.flatten().to_pylist()):
                out[term] = tf
            return out

        split = (field_split(_docs_ds(rows), title_len=title_len, cfg=CFG)
                 .to_pandas().set_index("doc_id"))
        per_field = {}
        for spec in fields:
            per_field[spec.col] = {d: toks(split.loc[d, spec.col])
                                   for d, _ in rows}
        dls = {c: {d: sum(v.values()) for d, v in per_field[c].items()}
               for c in per_field}
        avgdl = {c: sum(dls[c].values()) / len(rows) for c in dls}
        n = len(rows)
        res = {}
        for qid, text in queries:
            terms = tokenize_query(text, CFG)[0]
            for d, _ in rows:
                s = 0.0
                for t in terms:
                    df = sum(1 for dd, _ in rows
                             if any(t in per_field[c][dd] for c in per_field))
                    if df == 0:
                        continue
                    tfn = 0.0
                    for spec in fields:
                        tf = per_field[spec.col][d].get(t, 0)
                        B = 1 - spec.b + spec.b * dls[spec.col][d] / avgdl[spec.col]
                        tfn += spec.weight * tf / B
                    if tfn > 0:
                        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                        s += idf * tfn / (k1 + tfn)
                if s > 0:
                    res[(qid, d)] = round(s, 6)
        return res

    def test_matches_bruteforce(self):
        rows = [
            (0, "hash join merge sort hash table scan plan"),
            (1, "join merge window agg stream filter row"),
            (2, "sort sort sort merge merge join batch data"),
            (3, "stream window agg the a of slow query"),
            (4, "tiny"),
        ]
        queries = [(0, "hash join"), (1, "merge sort stream"), (2, "zzz")]
        fields = [FieldSpec("title", 2.0, 0.6), FieldSpec("body", 1.0, 0.75)]
        split = field_split(_docs_ds(rows), title_len=3, cfg=CFG)
        got = (bm25f_rank(split, queries, fields, k=10, cfg=CFG)
               .to_pandas().sort_values(["qid", "rank"]))
        want = self._brute(rows, queries, 3, fields, CFG.k1)
        assert len(got) == len(want)
        for _, r in got.iterrows():
            assert want[(r["qid"], r["docid"])] == pytest.approx(
                r["score_r"], abs=2e-6)
        # ranks follow (rounded score desc, docid asc) within qid
        for qid in got["qid"].unique():
            g = got[got["qid"] == qid]
            key = list(zip(-g["score_r"], g["docid"]))
            assert key == sorted(key)

    def test_title_weight_changes_ranking(self):
        """A term sitting in the title must outrank the same term in the
        body when the title weight dominates (sanity of the field combine)."""
        rows = [
            (0, "needle filler filler filler filler haystack straw dust"),
            (1, "filler filler filler filler filler needle straw dust"),
        ]
        fields = [FieldSpec("title", 5.0, 0.5), FieldSpec("body", 1.0, 0.75)]
        split = field_split(_docs_ds(rows), title_len=5, cfg=CFG)
        got = (bm25f_rank(split, [(0, "needle")], fields, k=2, cfg=CFG)
               .to_pandas().sort_values("rank"))
        assert list(got["docid"]) == [0, 1]
        assert got.iloc[0]["score_r"] > got.iloc[1]["score_r"]

    def test_oov_query_empty(self):
        rows = [(0, "alpha beta"), (1, "gamma delta")]
        fields = [FieldSpec("title", 2.0, 0.6), FieldSpec("body", 1.0, 0.75)]
        split = field_split(_docs_ds(rows), title_len=1, cfg=CFG)
        got = bm25f_rank(split, [(0, "zzznotaterm")], fields, k=5,
                         cfg=CFG).to_pandas()
        assert len(got) == 0
