"""search_after cursor pagination: page concatenation equals one big
top-k, cursors are stateless/re-fetchable, boundary ties split on docid."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines.build import build_index
from colbert_ray.pipelines.search import search_after, search_table

CFG = EngineConfig(num_term_partitions=4)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("page_fix")
    # 12 docs; several identical docs force rounded-score ties so the
    # docid tie-break crosses page boundaries
    texts = (["alpha beta gamma"] * 4
             + ["alpha beta", "alpha gamma", "beta gamma delta",
                "alpha", "beta", "gamma delta", "delta", "epsilon"])
    t = pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    src = str(root / "docs.parquet")
    pq.write_table(t, src)
    idx = str(root / "idx")
    build_index(src, idx, CFG, content_col="text", key_cols=(),
                meta_cols=(), docid_col="doc_id")
    return idx


def _all_pages(idx, q, page_size):
    pages, cursor = [], None
    while True:
        page, cursor = search_after(idx, q, k=page_size, after=cursor,
                                    cfg=CFG)
        if page.num_rows == 0:
            break
        pages.append(page)
        if page.num_rows < page_size:
            break
    return pages


def test_pages_concatenate_to_full_ranking(ray_session, built):
    q = "alpha beta gamma"
    pages = _all_pages(built, q, 3)
    got = pa.concat_tables(pages)
    qt = pa.table({"qid": pa.array([0], type=pa.int64()),
                   "query": pa.array([q])})
    full = search_table(qt, built, k=100, with_sha=False).to_pandas()
    # engine float policy: full ranking re-ranked by (-(round), docid)
    full["score_r"] = full["score"].round(6)
    full = full.sort_values(["score_r", "docid"],
                            ascending=[False, True]).reset_index(drop=True)
    assert got.column("docid").to_pylist() == full["docid"].tolist()
    assert got.column("score_r").to_pylist() == full["score_r"].tolist()
    # page-local ranks restart at 1
    assert pages[1].column("rank").to_pylist()[0] == 1


def test_cursor_is_stateless_refetch(ray_session, built):
    q = "alpha beta"
    p1, c1 = search_after(built, q, k=4, cfg=CFG)
    p2a, _ = search_after(built, q, k=4, after=c1, cfg=CFG)
    p2b, _ = search_after(built, q, k=4, after=c1, cfg=CFG)
    assert p2a.equals(p2b)
    assert not set(p1.column("docid").to_pylist()) \
        & set(p2a.column("docid").to_pylist())


def test_scorer_filter_honored_and_ql_rejected(ray_session, built):
    from colbert_ray.state.index import BM25Scorer
    allowed = np.array([1, 2, 3, 4, 5], dtype=np.int64)
    sc = BM25Scorer(built, with_sha=False, docid_filter=allowed)
    page, _ = search_after(built, "alpha beta", k=20, cfg=CFG, scorer=sc)
    assert page.num_rows > 0
    assert set(page.column("docid").to_pylist()) <= set(allowed.tolist())
    with pytest.raises(ValueError, match="bm25"):
        search_after(built, "alpha", k=5, cfg=CFG,
                     scorer=BM25Scorer(built, with_sha=False, ranker="ql"))


def test_oov_and_exhausted(ray_session, built):
    page, cur = search_after(built, "zzznope", k=5, cfg=CFG)
    assert page.num_rows == 0 and cur is None
    # walk past the end: cursor chain terminates
    pages = _all_pages(built, "epsilon", 5)
    assert len(pages) == 1 and pages[0].num_rows == 1


def test_k_nonpositive_returns_empty(ray_session, built):
    # k <= 0 must short-circuit to an empty page like the other
    # result-shaping functions, not IndexError inside topk_with_ties
    for k in (0, -3):
        page, cur = search_after(built, "alpha", k=k, cfg=CFG)
        assert page.num_rows == 0 and cur is None
