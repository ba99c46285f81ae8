"""Randomized differential test for the result-shaping modes: on a seeded
random corpus, search_after pages, collapse groups, minimum_should_match
sets and function-score blends must all agree with one brute-force model
built from the full raw ranking."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines.build import build_index
from colbert_ray.pipelines.search import (
    collapse_search,
    function_score_search,
    min_should_match_search,
    search_after,
    search_table,
)

CFG = EngineConfig(num_term_partitions=4)
VOCAB = ["apple", "berry", "cedar", "delta", "ember", "frost", "grove"]
LANG_POOL = ["en", "fr", "de", None]
N_DOCS = 60
SEED = 20260819


@pytest.fixture(scope="module")
def rnd(tmp_path_factory):
    rng = np.random.default_rng(SEED)
    texts, langs = [], []
    for _ in range(N_DOCS):
        n = int(rng.integers(1, 9))
        texts.append(" ".join(rng.choice(VOCAB, size=n)))
        langs.append(LANG_POOL[int(rng.integers(0, len(LANG_POOL)))])
    root = tmp_path_factory.mktemp("props_fix")
    t = pa.table({
        "doc_id": pa.array(list(range(1, N_DOCS + 1)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })
    src = str(root / "docs.parquet")
    pq.write_table(t, src)
    idx = str(root / "idx")
    build_index(src, idx, CFG, content_col="text", key_cols=(),
                meta_cols=("lang",), docid_col="doc_id")
    return idx, texts, langs


def _model(idx, q):
    """Full rounded ranking + per-doc metadata, the shared brute model."""
    qt = pa.table({"qid": pa.array([0], type=pa.int64()),
                   "query": pa.array([q])})
    full = search_table(qt, idx, k=10_000, with_sha=False).to_pandas()
    full["score_r"] = full["score"].round(6)
    return full.sort_values(["score_r", "docid"],
                            ascending=[False, True]).reset_index(drop=True)


def test_modes_agree_with_one_model(ray_session, rnd):
    idx, texts, langs = rnd
    rng = np.random.default_rng(SEED + 1)
    queries = [" ".join(rng.choice(VOCAB, size=int(rng.integers(1, 4)),
                                   replace=False))
               for _ in range(8)]
    for q in queries:
        model = _model(idx, q)
        qterms = set(q.split())
        if model.empty:
            continue
        # --- pagination: pages concatenate to the model exactly -------
        got_ids, cursor, guard = [], None, 0
        while True:
            page, cursor = search_after(idx, q, k=7, after=cursor, cfg=CFG)
            got_ids += page.column("docid").to_pylist()
            guard += 1
            if cursor is None or page.num_rows < 7 or guard > 50:
                break
        assert got_ids == model["docid"].tolist()
        # --- minimum_should_match: exact set + order -------------------
        for m in (1, 2, 3):
            want = model[[len(qterms & set(texts[d - 1].split())) >= m
                          for d in model["docid"]]]
            got = min_should_match_search(idx, q, m=m, k=10_000, cfg=CFG)
            assert got.column("docid").to_pylist() == want["docid"].tolist()
        # --- collapse: first-per-group + group sizes --------------------
        grp = [langs[d - 1] if langs[d - 1] is not None else f"~{d}"
               for d in model["docid"]]
        sizes: dict = {}
        for g in grp:
            sizes[g] = sizes.get(g, 0) + 1
        seen, want_reps, want_counts = set(), [], []
        for d, g in zip(model["docid"], grp):
            if g not in seen:
                seen.add(g)
                want_reps.append(d)
                want_counts.append(sizes[g])
        got = collapse_search(idx, q, "lang", k=10_000, cfg=CFG)
        assert got.column("docid").to_pylist() == want_reps
        assert got.column("group_count").to_pylist() == want_counts
        # --- function-score: recomputed blend order ---------------------
        dl = model["docid"].map(lambda d: float(len(texts[d - 1].split())))
        blend = (model["score_r"] * 1.25 * np.log(1.0 + dl)).round(6)
        want_fs = (pd.DataFrame({"docid": model["docid"], "s": blend})
                   .sort_values(["s", "docid"], ascending=[False, True]))
        got = function_score_search(idx, q, field="doclen", factor=1.25,
                                    k=10_000, cfg=CFG)
        assert got.column("docid").to_pylist() == want_fs["docid"].tolist()
        assert got.column("score_r").to_pylist() == want_fs["s"].tolist()
