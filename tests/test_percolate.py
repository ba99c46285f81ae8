"""Percolator tests: engine vs the DuckDB twin on a corpus with every
atom kind, required-term prefilter equivalence, multi-batch stability,
and prefilter unit behaviour."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines.percolate import (
    Percolator,
    percolate,
    required_terms,
    sql_percolate,
)
from colbert_ray.pipelines.querylang import QuerySyntaxError, parse

CFG = EngineConfig()

DOCS = pa.table({
    "doc_id": pa.array(list(range(1, 13)), type=pa.int64()),
    "text": pa.array([
        "alpha beta gamma delta",
        "alpha beta beta delta epsilon",
        "gamma delta epsilon zeta",
        "alphaBeta zeta eta",                      # camelCase split
        "beta alpha theta",                        # wrong phrase order
        "prefixy suffixo middle alpha",
        "alpha words between beta here",           # NEAR window material
        "alpha one two three four five beta",      # beyond slop 3
        "solo",
        "beta gamma beta gamma",
        "epsilon prefixyx",
        "short doc",
    ], type=pa.string()),
    "lang": pa.array(["en", "fr", "en", "fr", "en", "zh",
                      "en", "en", "fr", "en", "zh", "en"]),
    "source": pa.array([f"src{i % 3}" for i in range(12)]),
})

QUERIES = [
    (1, "alpha AND beta"),
    (2, "gamma OR epsilon"),
    (3, '"alpha beta" AND NOT epsilon'),
    (4, "(alpha OR gamma) AND prefix*"),
    (5, "*ixo AND NOT zeta"),
    (6, "*efix* OR solo"),
    (7, "lang:fr AND alpha"),
    (8, "source:src1 AND doclen>=4"),
    (9, '"alpha beta"~3'),
    (10, "doclen<2"),
    (11, "pre*xy AND alpha"),
    (12, "alphaBeta"),
]


def _engine(prefilter=True, batch_size=256) -> pd.DataFrame:
    out = percolate(DOCS, QUERIES, CFG, fields=("lang", "source"),
                    prefilter=prefilter, batch_size=batch_size).to_pandas()
    return (out.sort_values(["query_id", "doc_id"])
               .reset_index(drop=True))


def _oracle() -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", DOCS)
    sql = sql_percolate("documents", QUERIES, CFG,
                        fields=("lang", "source"))
    return con.execute(sql).df()


def test_percolate_matches_duckdb_twin(ray_session):
    eng, ora = _engine(), _oracle()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)
    # every query produced at least one match except the impossible ones
    assert set(eng["query_id"]) >= {1, 2, 3, 4, 5, 6, 7, 9, 12}


def test_prefilter_equivalence_and_batch_stability(ray_session):
    base = _engine()
    pd.testing.assert_frame_equal(base, _engine(prefilter=False))
    pd.testing.assert_frame_equal(base, _engine(batch_size=3))


def test_required_terms_extraction():
    req = lambda q: set(required_terms(parse(q, CFG)))
    assert req("alpha AND beta") == {"alpha", "beta"}
    assert req('"alpha beta"~3') == {"alpha", "beta"}
    # OR requires only what every branch requires
    assert req("(alpha beta) OR (alpha gamma)") == {"alpha"}
    # NOT / wildcard / field / range atoms require nothing
    assert req("alpha AND NOT beta") == {"alpha"}
    assert req("pre* OR alpha") == set()
    assert req("lang:fr AND doclen>=4") == set()


def test_prefilter_skips_absent_required_term():
    p = Percolator([(1, "nosuchterm AND alpha"), (2, "alpha")],
                   CFG.to_dict())
    out = p(DOCS)
    assert set(out.column("query_id").to_pylist()) == {2}


def test_field_atom_requires_declared_column():
    p = Percolator([(1, "missingfield:x")], CFG.to_dict(), fields=())
    with pytest.raises(QuerySyntaxError, match="missingfield"):
        p(DOCS)


def test_empty_and_no_match():
    p = Percolator([(1, "zzznope")], CFG.to_dict(), prefilter=False)
    out = p(DOCS)
    assert out.num_rows == 0
    assert out.schema.names == ["query_id", "doc_id"]


def test_int_field_atom_coerces():
    """field:val against an int64 column compares as int (querylang's
    coercion rule) — pc.equal(int64, string) has no Arrow kernel and
    would otherwise kill the stream mid-batch."""
    docs = DOCS.append_column(
        "year", pa.array([2023 + (i % 2) for i in range(12)],
                         type=pa.int64()))
    qs = [(1, "year:2024 AND alpha"), (2, "year:2023")]
    p = Percolator(qs, CFG.to_dict(), fields=("year",))
    eng = (p(docs).to_pandas().sort_values(["query_id", "doc_id"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", docs)
    ora = con.execute(
        sql_percolate("documents", qs, CFG, fields=("year",))).df()
    pd.testing.assert_frame_equal(eng, ora)
    assert set(eng["query_id"]) == {1, 2}
    with pytest.raises(QuerySyntaxError, match="not an integer"):
        Percolator([(1, "year:twenty")], CFG.to_dict(),
                   fields=("year",))(docs)


def test_fuzzy_atom_percolates():
    """word~d over the batch vocabulary mirrors the levenshtein() twin."""
    qs = [(1, "alpah~2"), (2, "gamm~1 AND NOT zeta"), (3, "solo~1")]
    p = Percolator(qs, CFG.to_dict())
    eng = (p(DOCS).to_pandas().sort_values(["query_id", "doc_id"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", DOCS)
    ora = con.execute(sql_percolate("documents", qs, CFG)).df()
    pd.testing.assert_frame_equal(eng, ora)
    assert 1 in set(eng["query_id"])      # alpah~2 reaches 'alpha'


def test_percolate_cli(ray_session, tmp_path):
    """CLI percolate subcommand in a fresh process: TSV pairs to stdout
    equal the library result."""
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq2

    docs_path = str(tmp_path / "docs.parquet")
    pq2.write_table(DOCS, docs_path)
    qpath = str(tmp_path / "q.tsv")
    with open(qpath, "w") as f:
        for qid, q in QUERIES[:4]:
            f.write(f"{qid}\t{q}\n")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "colbert_ray.cli", "percolate",
         "--queries", qpath, "--docs", docs_path,
         "--fields", "lang,source"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    got = [tuple(map(int, line.split("\t")))
           for line in r.stdout.strip().splitlines() if "\t" in line]
    want = (percolate(DOCS, QUERIES[:4], CFG, fields=("lang", "source"))
            .to_pandas().sort_values(["query_id", "doc_id"]))
    assert got == list(map(tuple, want.to_numpy().tolist()))
