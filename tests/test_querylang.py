"""Boolean query-DSL tests: parser structure/errors, set semantics vs a
naive scan oracle, constant-score wildcards, Lucene-style NOT placement."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines.build import build_index
from colbert_ray.pipelines.querylang import (
    QuerySyntaxError,
    dsl_search,
    parse,
    scoring_terms,
)

CFG = EngineConfig(num_term_partitions=4)

DOCS = [
    (1, "alpha beta gamma"),
    (2, "alpha beta beta delta"),
    (3, "gamma delta epsilon"),
    (4, "alphaBeta zeta"),          # camelCase -> alpha beta (adjacent)
    (5, "beta alpha"),              # both words, wrong phrase order
    (6, "prefixy suffixo middle"),
]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsl_fix")
    t = pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], type=pa.int64()),
        "text": pa.array([x for _, x in DOCS], type=pa.string()),
    })
    src = str(root / "docs.parquet")
    pq.write_table(t, src)
    idx = str(root / "idx")
    build_index(src, idx, CFG, content_col="text", key_cols=(),
                meta_cols=(), docid_col="doc_id")
    corpus = ray.data.read_parquet(src)
    return idx, corpus


def _docids(idx, corpus, q):
    return dsl_search(idx, corpus, q, k=100, cfg=CFG) \
        .column("docid").to_pylist()


def test_parse_structure_and_precedence():
    ast = parse('a OR b AND NOT c', CFG)
    assert ast.kind == "or"
    assert ast.children[1].kind == "and"
    assert ast.children[1].children[1].kind == "not"
    # adjacency = implicit AND
    ast2 = parse('a b', CFG)
    assert ast2.kind == "and" and len(ast2.children) == 2
    assert scoring_terms(parse('a AND (b* OR "c d") AND NOT e', CFG)) \
        == ["a", "c", "d"]


def test_parse_errors():
    for bad in ('NOT alpha', '(a OR NOT b)', 'a AND (b', '"unterminated',
                '', 'a**b', '*', 'a )'):
        with pytest.raises(QuerySyntaxError):
            parse(bad, CFG)


def test_and_or_not_sets(built):
    idx, corpus = built
    assert sorted(_docids(idx, corpus, 'alpha AND beta')) == [1, 2, 4, 5]
    assert sorted(_docids(idx, corpus, 'epsilon OR zeta')) == [3, 4]
    assert sorted(_docids(idx, corpus, 'alpha AND NOT delta')) == [1, 4, 5]
    assert sorted(_docids(idx, corpus, 'alpha beta NOT delta')) == [1, 4, 5]


def test_phrase_order_sensitive(built):
    idx, corpus = built
    # phrase matches docs 1, 2 and the camelCase-split doc 4 — not doc 5
    assert sorted(_docids(idx, corpus, '"alpha beta"')) == [1, 2, 4]
    assert sorted(_docids(idx, corpus, '"beta alpha"')) == [5]


def test_camelcase_term_is_conjunction(built):
    idx, corpus = built
    # the term atom alphaBeta tokenizes to {alpha, beta}: bag semantics
    assert sorted(_docids(idx, corpus, 'alphaBeta')) == [1, 2, 4, 5]


def test_wildcards_constant_score(built):
    idx, corpus = built
    t = dsl_search(idx, corpus, 'prefix* OR *ixo OR *iddl*', k=10, cfg=CFG)
    assert t.column("docid").to_pylist() == [6]
    assert t.column("score").to_pylist() == [0.0]   # no literal terms
    # wildcard pre*suf with non-overlap: 'prefixy' matches p*y
    assert _docids(idx, corpus, 'p*y') == [6]


def test_scores_match_plain_bm25_when_pure_conjunction(built):
    idx, corpus = built
    from colbert_ray.state.index import BM25Scorer

    t = dsl_search(idx, corpus, 'alpha AND beta', k=10, cfg=CFG)
    sc = BM25Scorer(idx, k=10, with_sha=False)
    d, s, _ = sc.score_query("alpha beta", k=10)
    ref = dict(zip(d.tolist(), s.tolist()))
    for did, got in zip(t.column("docid").to_pylist(),
                        t.column("score").to_pylist()):
        assert got == ref[did]


def test_oov_and_empty_results(built):
    idx, corpus = built
    assert _docids(idx, corpus, 'nonexistentterm') == []
    assert _docids(idx, corpus, 'alpha AND nonexistentterm') == []
    assert _docids(idx, corpus, '"alpha gamma"') == []   # not adjacent


def test_field_atoms(tmp_path_factory):
    """lang:value metadata filters: constant-score, composable, and
    validated against the index's docmeta columns."""
    root = tmp_path_factory.mktemp("dsl_field")
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["alpha beta", "alpha gamma",
                          "alpha beta", "delta"]),
        "lang": pa.array(["en", "fr", "fr", "en"]),
    })
    src = str(root / "docs.parquet")
    pq.write_table(t, src)
    idx = str(root / "idx")
    build_index(src, idx, CFG, content_col="text", key_cols=(),
                meta_cols=("lang",), docid_col="doc_id")
    corpus = ray.data.read_parquet(src)

    def ids(q):
        return sorted(dsl_search(idx, corpus, q, k=10, cfg=CFG)
                      .column("docid").to_pylist())

    assert ids("lang:fr") == [2, 3]
    assert ids("alpha AND lang:fr") == [2, 3]
    assert ids("alpha AND lang:fr AND NOT gamma") == [3]
    assert ids("lang:en OR lang:fr") == [1, 2, 3, 4]
    # pure field query is constant-score
    out = dsl_search(idx, corpus, "lang:en", k=10, cfg=CFG)
    assert out.column("score").to_pylist() == [0.0, 0.0]
    # unknown field -> syntax error
    with pytest.raises(QuerySyntaxError, match="unknown field"):
        dsl_search(idx, corpus, "nosuch:x", k=10, cfg=CFG)


def test_range_atoms(built):
    """doclen>n numeric range filters over docmeta, composable."""
    idx, corpus = built
    # every fixture doc has doclen >= 2; absurd bound gives empty
    assert _docids(idx, corpus, 'alpha AND doclen>100000') == []
    full = _docids(idx, corpus, 'alpha')
    assert sorted(_docids(idx, corpus, 'alpha AND doclen>=1')) == \
        sorted(full)
    # exclusive vs inclusive boundary semantics
    lo = _docids(idx, corpus, 'alpha AND doclen>2')
    hi = _docids(idx, corpus, 'alpha AND doclen>=2')
    assert set(lo) <= set(hi)
    with pytest.raises(QuerySyntaxError, match="integer bound"):
        parse('doclen>abc', CFG)


def test_near_slop_atoms(built):
    """"a b"~N proximity: min distinct-word window <= words + slop."""
    idx, corpus = built
    # doc 1 "alpha beta gamma": window(alpha, gamma) = 3 -> slop >= 1
    assert sorted(_docids(idx, corpus, '"alpha gamma"~1')) == [1]
    assert _docids(idx, corpus, '"alpha gamma"~0') == []
    # order-insensitive (distinct-word window): doc 5 "beta alpha"
    assert sorted(_docids(idx, corpus, '"alpha beta"~0')) == [1, 2, 4, 5]
    # composable + scoring terms come from the near atom
    got = dsl_search(idx, corpus, '"alpha gamma"~1 AND NOT zeta',
                     k=5, cfg=CFG)
    assert got.column("docid").to_pylist() == [1]
    assert got.column("score").to_pylist()[0] > 0.0
    with pytest.raises(QuerySyntaxError, match="slop"):
        parse('"a b"~x', CFG)


def test_random_queries_match_naive_evaluator(built):
    """Property test: random DSL queries over the fixture vocab must match
    a from-scratch Python set evaluator + brute-force BM25 on every doc."""
    import math
    import random

    idx, corpus = built
    docs = {d: t.split() for d, t in
            [(1, "alpha beta gamma"), (2, "alpha beta beta delta"),
             (3, "gamma delta epsilon"), (4, "alpha beta zeta"),
             (5, "beta alpha"), (6, "prefixy suffixo middle")]}
    # doc 4 text is 'alphaBeta zeta' -> tokens alpha beta zeta
    vocab = sorted({w for ws in docs.values() for w in ws})
    rng = random.Random(17)

    def naive_atom():
        r = rng.random()
        if r < 0.5:
            return ("term", rng.choice(vocab))
        if r < 0.7:
            w = rng.choice(vocab)
            return ("wild", w[:2] + "*")
        return ("phrase", [rng.choice(vocab), rng.choice(vocab)])

    def gen(depth):
        if depth == 0:
            return naive_atom()
        op = rng.choice(["and", "or", "andnot"])
        a, b = gen(depth - 1), gen(depth - 1)
        return (op, a, b)

    def to_str(n):
        k = n[0]
        if k == "term":
            return n[1]
        if k == "wild":
            return n[1]
        if k == "phrase":
            return '"' + " ".join(n[1]) + '"'
        a, b = to_str(n[1]), to_str(n[2])
        if k == "and":
            return f"({a} AND {b})"
        if k == "or":
            return f"({a} OR {b})"
        return f"({a} AND NOT {b})"

    def ev(n):
        k = n[0]
        if k == "term":
            return {d for d, ws in docs.items() if n[1] in ws}
        if k == "wild":
            pre = n[1][:-1]
            return {d for d, ws in docs.items()
                    if any(w.startswith(pre) for w in ws)}
        if k == "phrase":
            p = n[1]
            return {d for d, ws in docs.items()
                    if any(ws[i:i + len(p)] == p
                           for i in range(len(ws) - len(p) + 1))}
        a, b = ev(n[1]), ev(n[2])
        return {"and": a & b, "or": a | b, "andnot": a - b}[k]

    def pos_terms(n):
        k = n[0]
        if k == "term":
            return {n[1]}
        if k == "phrase":
            return set(n[1])
        if k == "wild":
            return set()
        if k == "andnot":
            return pos_terms(n[1])
        return pos_terms(n[1]) | pos_terms(n[2])

    n_docs = len(docs)
    avgdl = sum(len(ws) for ws in docs.values()) / n_docs
    k1, b = CFG.k1, CFG.b

    def bm25(d, terms):
        ws = docs[d]
        s = 0.0
        for t in sorted(terms):
            tf = ws.count(t)
            if tf == 0:
                continue
            df = sum(1 for x in docs.values() if t in x)
            idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)
                        / (tf + k1 * (1.0 - b + b * len(ws) / avgdl)))
        return s

    checked = 0
    for _ in range(40):
        ast = gen(rng.choice([1, 1, 2]))
        q = to_str(ast)
        want = ev(ast)
        got = dsl_search(idx, corpus, q, k=100, cfg=CFG).to_pandas()
        assert set(got["docid"]) == want, (q, set(got["docid"]), want)
        terms = pos_terms(ast)
        for row in got.itertuples():
            assert abs(row.score - bm25(row.docid, terms)) < 1e-9, \
                (q, row.docid)
        checked += len(got)
    assert checked > 40      # the generator actually produced matches


def test_dsl_search_table_matches_per_query(built):
    """The actor-pool batch path must equal per-query dsl_search on
    index-only queries, at multiple concurrencies."""
    from colbert_ray.pipelines.querylang import dsl_search_table

    idx, corpus = built
    qs = pa.table({
        "qid": pa.array([1, 2, 3, 4], type=pa.int64()),
        "query": pa.array(["alpha AND beta", "epsilon OR zeta",
                           "alpha AND NOT delta", "p*y OR alphaBeta"]),
    })
    want = []
    for qid, q in zip(qs.column("qid").to_pylist(),
                      qs.column("query").to_pylist()):
        t = dsl_search(idx, corpus, q, k=10, cfg=CFG).to_pandas()
        t.insert(0, "qid", np.int64(qid))
        want.append(t)
    import pandas as pd

    want = (pd.concat(want, ignore_index=True)
            .sort_values(["qid", "rank"]).reset_index(drop=True))
    for conc in (1, 2):
        got = (dsl_search_table(qs, idx, k=10, cfg=CFG, concurrency=conc,
                                batch_size=2).to_pandas()
               .sort_values(["qid", "rank"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)
    # phrase atoms rejected on the batch path
    bad = pa.table({"qid": pa.array([1], type=pa.int64()),
                    "query": pa.array(['"alpha beta"'])})
    with pytest.raises(Exception, match="corpus pass"):
        dsl_search_table(bad, idx, k=5, cfg=CFG)


def test_fuzzy_atoms(built):
    idx, corpus = built
    # alpha~1 expands to dictionary terms within ED 1 of 'alpha'
    assert sorted(_docids(idx, corpus, 'alpha~1')) == [1, 2, 4, 5]
    # gamm~1 -> gamma (docs 1, 3); zet~1 -> zeta (doc 4 only)
    assert sorted(_docids(idx, corpus, 'gamm~1')) == [1, 3]
    assert sorted(_docids(idx, corpus, 'zet~1')) == [4]
    # bare ~ = distance 2 (Lucene default): 'alhpa~' still finds alpha docs
    assert set(_docids(idx, corpus, 'alhpa~')) >= {1, 2, 5}
    # ~0 is exactly the term atom
    assert _docids(idx, corpus, 'alpha~0') == _docids(idx, corpus, 'alpha')
    # fuzzy atoms are constant-score (no literal scoring terms)
    t = dsl_search(idx, corpus, 'zet~1', k=10, cfg=CFG)
    assert t.column("score").to_pylist() == [0.0]
    assert scoring_terms(parse('zet~1 AND beta', CFG)) == ["beta"]


def test_fuzzy_parse_errors():
    # (a leading '~' is not a fuzzy atom: '~1' tokenizes as the term '1')
    for bad in ('alpha~3', 'alpha~x', 'alphaBeta~1'):
        with pytest.raises(QuerySyntaxError):
            parse(bad, CFG)
