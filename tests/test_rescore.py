"""Two-stage rescoring (rescore_search): blend math and window semantics
vs a naive brute force, span correctness, OOV/edge behavior."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines.rescore import rescore_search
from colbert_ray.pipelines.search import search_table

CFG = EngineConfig(num_term_partitions=4)

TEXTS = [
    "alpha beta gamma",                        # tight span 3
    "alpha filler filler beta filler gamma",   # span 6... (computed)
    "gamma beta alpha",                        # order-free span 3
    "alpha beta",                              # missing gamma -> no bonus
    "beta gamma filler filler filler alpha",   # loose span
    "alpha alpha beta beta gamma gamma",       # repeats tighten the span
    "alpha",                                   # single term
    "delta epsilon",                           # no query terms
    "filler alpha filler beta gamma filler",
    "gamma alpha beta",
]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("rescore_fix")
    t = pa.table({
        "doc_id": pa.array(list(range(1, len(TEXTS) + 1)),
                           type=pa.int64()),
        "text": pa.array(TEXTS, type=pa.string()),
    })
    src = str(root / "docs.parquet")
    pq.write_table(t, src)
    idx = str(root / "idx")
    from colbert_ray.pipelines.build import build_index
    build_index(src, idx, CFG, content_col="text", key_cols=(),
                meta_cols=(), docid_col="doc_id")
    return src, idx


def _naive_span(tokens, words):
    best = None
    n = len(tokens)
    for i in range(n):
        for j in range(i, n):
            win = tokens[i:j + 1]
            if all(w in win for w in words):
                if best is None or (j - i + 1) < best:
                    best = j - i + 1
                break
    return best


def _expected(idx, q, k, window, weight):
    from colbert_ray.functions.tokenizer import tokenize_query
    words = sorted(set(tokenize_query(q, CFG)[0]))
    qt = pa.table({"qid": pa.array([0], type=pa.int64()),
                   "query": pa.array([q])})
    full = search_table(qt, idx, k=1000, with_sha=False).to_pandas()
    full["base_r"] = full["score"].round(6)
    full = full.sort_values(["base_r", "docid"],
                            ascending=[False, True]).head(window)
    rows = []
    for _, r in full.iterrows():
        toks = TEXTS[int(r["docid"]) - 1].split()
        span = _naive_span(toks, words)
        span = 0 if span is None else span
        bonus = weight / span if span > 0 else 0.0
        rows.append({"docid": int(r["docid"]),
                     "score_r": round(r["base_r"] + bonus, 6),
                     "base_r": r["base_r"], "span": span})
    out = (pd.DataFrame(rows)
           .sort_values(["score_r", "docid"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    out.insert(1, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    out["span"] = out["span"].astype(np.int64)
    return out[["docid", "rank", "score_r", "base_r", "span"]]


@pytest.mark.parametrize("q,k,window,weight", [
    ("alpha beta gamma", 5, 50, 2.0),
    ("alpha beta gamma", 3, 4, 10.0),    # tight window excludes docs
    ("alpha", 5, 50, 1.5),               # single term: span 1 everywhere
    ("beta gamma", 10, 50, 3.0),
])
def test_rescore_matches_brute_force(ray_session, built, q, k, window,
                                     weight):
    src, idx = built
    corpus = ray.data.read_parquet(src)
    got = rescore_search(idx, corpus, q, k=k, window=window,
                         weight=weight, cfg=CFG).to_pandas()
    want = _expected(idx, q, k, window, weight)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_rescore_window_bounds_stage2(ray_session, built):
    """A doc outside the stage-1 window must never appear, even though a
    huge weight would rank it first if rescored."""
    src, idx = built
    corpus = ray.data.read_parquet(src)
    small = rescore_search(idx, corpus, "alpha beta gamma", k=10,
                           window=2, weight=1000.0, cfg=CFG).to_pandas()
    assert len(small) == 2        # only the window docs are returned


def test_rescore_oov_and_guards(ray_session, built):
    src, idx = built
    corpus = ray.data.read_parquet(src)
    assert rescore_search(idx, corpus, "zzznope", cfg=CFG).num_rows == 0
    assert rescore_search(idx, corpus, "alpha", k=0, cfg=CFG).num_rows == 0
    from colbert_ray.state.index import BM25Scorer
    with pytest.raises(ValueError, match="bm25"):
        rescore_search(idx, corpus, "alpha", cfg=CFG,
                       scorer=BM25Scorer(idx, with_sha=False,
                                         ranker="ql"))
