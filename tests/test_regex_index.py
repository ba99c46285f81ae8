"""Index-accelerated regex search (pipelines/regex_index.py): required-
literal extraction soundness, path selection, and the defining property —
index path == full scan, exactly, on corpora designed to stress the
literal->token bridge (camelCase splits, punctuation, near-miss tokens)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from colbert_ray.config import EngineConfig
from colbert_ray.extras.textstats import regex_match_stats
from colbert_ray.pipelines.build import build_index
from colbert_ray.pipelines.regex_index import (
    regex_plan,
    regex_search,
    required_literals,
)

CFG = EngineConfig()


class TestRequiredLiterals:
    def test_alternation_union(self):
        assert required_literals(r"(join|sort)\s+\w+") == ["join", "sort"]

    def test_concat_picks_a_guarantee(self):
        got = required_literals(r"hash\s*join")
        assert got in (["hash"], ["join"])    # either element is sound

    def test_no_literal_returns_none(self):
        assert required_literals(r"\d+") is None
        assert required_literals(r"[a-z]{8}") is None

    def test_unselective_branch_poisons(self):
        # one branch has no >=3-char literal -> no pruning guarantee
        assert required_literals(r"(join|x)") is None

    def test_ignorecase_disables(self):
        assert required_literals(r"(?i)join") is None
        assert required_literals(r"a(?i:join)b") is None

    def test_optional_does_not_count(self):
        # u? is optional; the guaranteed run is 'colo'
        assert required_literals(r"colou?r") == ["colo"]
        assert required_literals(r"(join)?") is None

    def test_repeat_min_one_counts(self):
        assert required_literals(r"(merge){2,}") == ["merge"]
        assert required_literals(r"(merge)*") is None

    def test_negative_lookahead_not_used(self):
        # 'def' is inside (?!...) and must NOT become a requirement
        got = required_literals(r"abc(?!def)ghi")
        assert got in (["abc"], ["ghi"])

    def test_invalid_pattern_none(self):
        assert required_literals(r"(unclosed") is None


@pytest.fixture(scope="module")
def camel_corpus(tmp_path_factory):
    rng = np.random.default_rng(13)
    words = ["HashJoin", "sortMerge", "scan", "filter", "aggregate",
             "GroupBy", "join", "sort", "xyz", "q7", "prehashed"]
    texts = [" ".join(rng.choice(words, size=rng.integers(2, 30)))
             for _ in range(200)]
    root = str(tmp_path_factory.mktemp("rex"))
    path = os.path.join(root, "documents.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(200), type=pa.int64()),
                             "text": pa.array(texts)}), path)
    idx = os.path.join(root, "idx")
    build_index(path, idx, CFG, content_col="text", key_cols=(),
                meta_cols=(), docid_col="doc_id")
    return path, idx


class TestRegexSearch:
    PATTERNS = [
        r"(join|sort)\s+\w+",     # alternation -> two probes
        r"Hash[A-Z]?\w*",         # camelCase literal spans a split
        r"sortMerge scan",        # literal crosses a space
        r"\bscan\b",              # word boundary; 'prehashed' must not match
        r"q7 (xyz|join)",         # falls back: best literal 'q7' too short
        r"\d+",                   # falls back: no literal at all
    ]

    def test_index_equals_scan(self, camel_corpus):
        path, idx = camel_corpus
        for pat in self.PATTERNS:
            a = (regex_match_stats(ray.data.read_parquet(path), pat)
                 .to_pandas().sort_values("doc_id").reset_index(drop=True))
            b = (regex_search(idx, ray.data.read_parquet(path), pat, CFG)
                 .to_pandas().sort_values("doc_id").reset_index(drop=True))
            pd.testing.assert_frame_equal(a, b)

    def test_plan_paths(self, camel_corpus):
        _, idx = camel_corpus
        plan = regex_plan(idx, r"(join|sort)\s+\w+", CFG)
        assert plan["path"] == "index"
        assert plan["pieces"] == ["join", "sort"]
        assert plan["n_candidates"] > 0
        assert regex_plan(idx, r"\d+", CFG)["path"] == "scan"
        assert regex_plan(idx, r"(?i)join", CFG)["path"] == "scan"

    def test_pruning_actually_prunes(self, camel_corpus):
        """The candidate set must be a strict subset of the corpus for a
        selective pattern — otherwise the 'index' path is a no-op."""
        _, idx = camel_corpus
        plan = regex_plan(idx, r"xyz xyz xyz", CFG)
        assert plan["path"] == "index"
        assert 0 < plan["n_candidates"] < 200

    def test_zero_candidates_short_circuits(self, camel_corpus):
        path, idx = camel_corpus
        out = regex_search(idx, ray.data.read_parquet(path),
                           r"zzznotaterm\d*", CFG).to_pandas()
        assert len(out) == 0

    def test_min_token_len_guard(self, camel_corpus):
        """With min_token_len > 1 the index is lossy for short tokens —
        the plan must refuse to prune."""
        _, idx = camel_corpus
        cfg2 = EngineConfig(min_token_len=2)
        assert regex_plan(idx, r"(join|sort)\s+\w+", cfg2)["path"] == "scan"
