"""Field collapsing (collapse_search): representative/count semantics vs
a pandas brute force over the full ranking, NULL singleton groups,
unknown-field errors, k cut."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines.build import build_index
from colbert_ray.pipelines.search import collapse_search, search_table

CFG = EngineConfig(num_term_partitions=4)

LANGS = ["en", "fr", "en", None, "de", "fr", "en", None, "de", "en",
         "fr", "de"]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("collapse_fix")
    texts = (["alpha beta gamma"] * 4
             + ["alpha beta", "alpha gamma", "beta gamma delta",
                "alpha", "beta", "gamma delta", "delta", "epsilon"])
    t = pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(LANGS, type=pa.string()),
    })
    src = str(root / "docs.parquet")
    pq.write_table(t, src)
    idx = str(root / "idx")
    build_index(src, idx, CFG, content_col="text", key_cols=(),
                meta_cols=("lang",), docid_col="doc_id")
    return idx


def _expected(idx, q, k):
    """Brute force: full ranking via search_table, lang from the fixture,
    first-per-group in rounded rank order + group sizes."""
    qt = pa.table({"qid": pa.array([0], type=pa.int64()),
                   "query": pa.array([q])})
    full = search_table(qt, idx, k=1000, with_sha=False).to_pandas()
    if full.empty:
        return full
    full["score_r"] = full["score"].round(6)
    full = full.sort_values(["score_r", "docid"],
                            ascending=[False, True]).reset_index(drop=True)
    full["lang"] = [LANGS[d - 1] for d in full["docid"]]
    # NULL langs never collapse: give each its own key (pandas may have
    # turned None into NaN, so test identity via isinstance)
    full["grp"] = [lg if isinstance(lg, str) else f"__null__{d}"
                   for d, lg in zip(full["docid"], full["lang"])]
    counts = full.groupby("grp")["docid"].transform("size")
    full["group_count"] = counts.astype(np.int64)
    reps = full[~full["grp"].duplicated()].head(k).reset_index(drop=True)
    reps["rank"] = np.arange(1, len(reps) + 1, dtype=np.int64)
    return reps[["docid", "rank", "score_r", "lang", "group_count"]]


@pytest.mark.parametrize("q,k", [("alpha beta gamma", 3),
                                 ("alpha beta gamma", 100),
                                 ("delta", 5), ("epsilon", 2)])
def test_collapse_matches_brute_force(ray_session, built, q, k):
    got = collapse_search(built, q, "lang", k=k).to_pandas()
    want = _expected(built, q, k)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    # at most one hit per non-null lang
    nn = got[got["lang"].notna()]
    assert nn["lang"].is_unique


def test_null_field_values_do_not_collapse(ray_session, built):
    # docs 4 and 8 (lang NULL) both match 'alpha' -> both may appear
    got = collapse_search(built, "alpha", "lang", k=100).to_pandas()
    null_rows = got[got["lang"].isna()]
    assert set(null_rows["docid"]) == {4, 8}
    assert (null_rows["group_count"] == 1).all()


def test_errors_and_empty(ray_session, built):
    with pytest.raises(ValueError, match="unknown field"):
        collapse_search(built, "alpha", "nosuchfield")
    assert collapse_search(built, "zzznope", "lang").num_rows == 0
    assert collapse_search(built, "alpha", "lang", k=0).num_rows == 0


def test_function_score_matches_brute_force(ray_session, built):
    from colbert_ray.pipelines.search import function_score_search

    factor = 1.5
    got = function_score_search(built, "alpha beta gamma",
                                field="doclen", factor=factor,
                                k=100).to_pandas()
    qt = pa.table({"qid": pa.array([0], type=pa.int64()),
                   "query": pa.array(["alpha beta gamma"])})
    full = search_table(qt, built, k=1000, with_sha=False).to_pandas()
    full["base_r"] = full["score"].round(6)
    texts = ["alpha beta gamma"] * 4 + [
        "alpha beta", "alpha gamma", "beta gamma delta", "alpha",
        "beta", "gamma delta", "delta", "epsilon"]
    full["doclen"] = [float(len(texts[d - 1].split()))
                      for d in full["docid"]]
    full["score_r"] = (full["base_r"] * factor
                       * np.log(1.0 + full["doclen"])).round(6)
    full = full.sort_values(["score_r", "docid"],
                            ascending=[False, True]).reset_index(drop=True)
    full["rank"] = np.arange(1, len(full) + 1, dtype=np.int64)
    want = full[["docid", "rank", "score_r", "base_r", "doclen"]]
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    # longer docs outrank equal-base shorter docs under the ln(1+dl) boost
    assert (got["score_r"] >= got["score_r"].shift(-1).fillna(-1)).all()


def test_function_score_guards(ray_session, built):
    from colbert_ray.pipelines.search import function_score_search

    with pytest.raises(ValueError, match="numeric"):
        function_score_search(built, "alpha", field="lang")
    with pytest.raises(ValueError, match="unknown field"):
        function_score_search(built, "alpha", field="nope")
    assert function_score_search(built, "zzznope").num_rows == 0


def test_collapse_delta_docs_read_null_field(ray_session, built, tmp_path):
    """Delta-added docs whose add_documents call did NOT supply a metadata
    column read NULL for it (singleton group, never a neighbor's value or
    a crash) — but columns the delta docmeta DOES carry (doclen always;
    any user meta supplied to add_documents) are overlaid and must score."""
    import os
    import shutil

    from colbert_ray.pipelines.search import function_score_search
    from colbert_ray.state.updates import IndexUpdater

    idx2 = str(tmp_path / "idx_delta")
    shutil.copytree(built, idx2)
    new_ids = IndexUpdater(idx2).add_documents(
        pa.table({"text": pa.array(["alpha beta gamma zulu"])}),
        content_col="text")
    os.utime(os.path.join(idx2, "metadata.json"))
    got = collapse_search(idx2, "zulu alpha", "lang", k=100).to_pandas()
    row = got[got["docid"] == new_ids[0]]
    assert len(row) == 1
    assert row["lang"].isna().all()
    assert (row["group_count"] == 1).all()
    # doclen IS in the delta docmeta: the overlay must surface it, so the
    # boost factor is ln(1 + doclen) > 0 (it silently scored 0.0 before
    # the deltas/*/docmeta.parquet overlay in _docmeta_lookup)
    fs = function_score_search(idx2, "zulu", field="doclen",
                               k=10).to_pandas()
    frow = fs[fs["docid"] == new_ids[0]]
    assert len(frow) == 1 and (frow["score_r"] > 0.0).all()
    assert (frow["doclen"] == 4.0).all()


def test_min_should_match_brute_force(ray_session, built):
    from colbert_ray.pipelines.search import min_should_match_search

    texts = ["alpha beta gamma"] * 4 + [
        "alpha beta", "alpha gamma", "beta gamma delta", "alpha",
        "beta", "gamma delta", "delta", "epsilon"]
    qterms = {"alpha", "beta", "gamma"}
    qt = pa.table({"qid": pa.array([0], type=pa.int64()),
                   "query": pa.array(["alpha beta gamma"])})
    full = search_table(qt, built, k=1000, with_sha=False).to_pandas()
    full["score_r"] = full["score"].round(6)
    full["n_match"] = [len(qterms & set(texts[d - 1].split()))
                       for d in full["docid"]]
    for m in (1, 2, 3):
        got = min_should_match_search(built, "alpha beta gamma", m=m,
                                      k=100).to_pandas()
        want = (full[full["n_match"] >= m]
                .sort_values(["score_r", "docid"],
                             ascending=[False, True])
                .reset_index(drop=True))
        assert got["docid"].tolist() == want["docid"].tolist()
        assert got["score_r"].tolist() == want["score_r"].tolist()
        assert got["n_match"].tolist() == want["n_match"].tolist()
        assert got["rank"].tolist() == list(range(1, len(got) + 1))
    # m above the query width matches nothing
    assert min_should_match_search(built, "alpha beta gamma", m=4,
                                   k=10).num_rows == 0


def test_match_stats_brute_force(ray_session, built):
    from colbert_ray.pipelines.search import match_stats

    texts = ["alpha beta gamma"] * 4 + [
        "alpha beta", "alpha gamma", "beta gamma delta", "alpha",
        "beta", "gamma delta", "delta", "epsilon"]
    qt = pa.table({"qid": pa.array([0], type=pa.int64()),
                   "query": pa.array(["alpha beta gamma"])})
    full = search_table(qt, built, k=1000, with_sha=False).to_pandas()
    got = match_stats(built, "alpha beta gamma").to_pylist()[0]
    assert got["total_hits"] == len(full)
    assert got["max_score_r"] == round(full["score"].round(6).max(), 6)
    sum_dl = sum(len(texts[d - 1].split()) for d in full["docid"])
    assert got["sum_doclen"] == sum_dl
    assert got["avg_doclen"] == round(sum_dl / len(full), 6)
    assert match_stats(built, "zzznope").to_pylist()[0]["total_hits"] == 0


def test_sampled_matches_deterministic_and_consistent(ray_session, built):
    """Hash-gate match sampling: reproducible, rate-monotone (a lower
    rate's survivors are a subset of a higher rate's), and consistent
    across queries (same docids survive every gate)."""
    from colbert_ray.pipelines.search import sampled_matches

    a = sampled_matches(built, "alpha beta gamma", rate=0.5).to_pandas()
    b = sampled_matches(built, "alpha beta gamma", rate=0.5).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    low = set(sampled_matches(built, "alpha beta gamma",
                              rate=0.2).to_pandas()["docid"])
    assert low <= set(a["docid"])
    # cross-query consistency: survival is a property of the DOCID, not
    # the query — restricted to docs matching both queries, the two
    # samples select exactly the same docids
    other = set(sampled_matches(built, "alpha", rate=0.5)
                .to_pandas()["docid"])
    alpha_matches = {1, 2, 3, 4, 5, 6, 8}   # docs containing 'alpha'
    assert set(a["docid"]) & alpha_matches == other
    assert sampled_matches(built, "zzznope", rate=0.9).num_rows == 0
    # a different seed permutes the gate (distinct hash stream)
    seeded = set(sampled_matches(built, "alpha beta gamma", rate=0.5,
                                 seed=7).to_pandas()["docid"])
    assert seeded != set(a["docid"])
