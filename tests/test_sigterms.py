"""Significant-terms aggregation: JLH math and fg/bg dfs vs a pandas
brute force, determinism of the (-score, term) cut, OOV behavior."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines.sigterms import significant_terms

CFG = EngineConfig(num_term_partitions=4)

TEXTS = [
    "alpha beta shared",
    "alpha gamma shared niche",
    "alpha niche niche",
    "beta shared common",
    "common common filler",
    "common filler other",
    "filler other words",
    "words other common",
]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("sig_fix")
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


def _expected(q, k):
    from colbert_ray.functions.tokenizer import tokenize_query
    qterms = set(tokenize_query(q, CFG)[0])
    docs = [sorted(set(t.split())) for t in TEXTS]
    fg_docs = [ts for ts in docs if qterms & set(ts)]
    n_fg, n_docs = len(fg_docs), len(docs)
    fg = pd.Series([t for ts in fg_docs for t in ts]).value_counts()
    bg = pd.Series([t for ts in docs for t in ts]).value_counts()
    rows = []
    for term, f in fg.items():
        a = np.float64(f) / np.float64(n_fg)
        b = np.float64(bg[term]) / np.float64(n_docs)
        rows.append({"term": term, "fg_df": int(f), "bg_df": int(bg[term]),
                     "score_r": float(np.round((a - b) * a / b, 6))})
    out = pd.DataFrame(rows).sort_values(
        ["score_r", "term"], ascending=[False, True]).head(k)
    out = out.reset_index(drop=True)
    out["fg_df"] = out["fg_df"].astype(np.int64)
    out["bg_df"] = out["bg_df"].astype(np.int64)
    return out


@pytest.mark.parametrize("q,k", [("alpha", 10), ("alpha beta", 5),
                                 ("common", 3), ("niche", 100)])
def test_sigterms_matches_brute_force(ray_session, built, q, k):
    src, idx = built
    got = significant_terms(idx, ray.data.read_parquet(src), q,
                            k=k, cfg=CFG).to_pandas()
    want = _expected(q, k)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    # query terms themselves surface with the highest lift
    assert got.iloc[0]["score_r"] >= got["score_r"].max() - 1e-12


def test_sigterms_oov_and_guards(ray_session, built):
    src, idx = built
    corpus = ray.data.read_parquet(src)
    assert significant_terms(idx, corpus, "zzznope",
                             cfg=CFG).num_rows == 0
    assert significant_terms(idx, corpus, "alpha", k=0,
                             cfg=CFG).num_rows == 0


def test_doc_term_vectors_matches_brute_force(ray_session, built):
    from colbert_ray.pipelines.termvec import doc_term_vectors

    src, idx = built
    got = doc_term_vectors(idx, ray.data.read_parquet(src),
                           [1, 3, 5], cfg=CFG).to_pandas()
    rows = []
    all_docs = [sorted(set(t.split())) for t in TEXTS]
    for d in (1, 3, 5):
        toks = TEXTS[d - 1].split()
        for term in sorted(set(toks)):
            rows.append({"docid": d, "term": term,
                         "tf": toks.count(term),
                         "df": sum(term in ts for ts in all_docs)})
    want = pd.DataFrame(rows)
    for c in ("docid", "tf", "df"):
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    # empty request and unknown docids
    assert doc_term_vectors(idx, ray.data.read_parquet(src), [],
                            cfg=CFG).num_rows == 0
    assert doc_term_vectors(idx, ray.data.read_parquet(src), [99999],
                            cfg=CFG).num_rows == 0
