"""Boolean query language — the Lucene-QueryParser-style front end that
composes this engine's retrieval primitives into one query string:

    camelCase AND "exact phrase" AND (foo* OR *bar) AND NOT baz
    "key scan"~4 AND lang:en AND doclen>=40

Grammar (explicit, small):

    expr     := and_expr (OR and_expr)*
    and_expr := unary (AND? unary)*        # adjacency = implicit AND
    unary    := NOT unary | atom
    atom     := '(' expr ')' | '"' words '"' ['~' slop]
              | field ':' value | field (>|>=|<|<=) int | word[* forms]
              | word '~' [0|1|2]            # fuzzy (Lucene FuzzyQuery)

Word atoms go through the corpus tokenizer (camelCase splitting etc.; a
multi-token word is an implicit AND of its tokens). Wildcard forms:
``pre*``, ``*suf``, ``pre*suf``, ``*inf*``. ``word~d`` is a fuzzy atom
(dictionary terms within Levenshtein distance d, d in 0..2, bare ``~``
= 2 as in Lucene; constant-score like wildcards). Field (``lang:fr``)
and numeric range (``doclen>=40``) atoms filter on the index's docmeta
columns; ``"a b"~N`` is a sloppy phrase (min distinct-word window
<= words + N). ``AND``/``OR``/``NOT`` are uppercase keywords; lowercase
they are ordinary terms.

Semantics (documented, exactly SQL-twinnable):
- every node evaluates to a docid SET over the built index (term ->
  postings; phrase -> two-stage phrase_search; wildcards -> dictionary
  range probe + rollup; AND/OR -> sorted set ops). NOT is only legal as a
  direct child of an AND (``a AND NOT b``) — pure-negative queries are
  rejected, as in Lucene.
- ranking: BM25 over the query's positive LITERAL terms (term atoms +
  phrase words outside any NOT), restricted to the candidate set;
  candidates matching no scoring term rank with score 0.0 — the Lucene
  constant-score rewrite for wildcard-only branches. Tie-break
  (-round(score, 6), docid), the engine's float policy.

Reference capability: query planning / candidate filtering
(``colbert/search/index_storage.py:72-96``); everything else is classic
public Lucene behavior re-expressed over this engine's primitives.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from colbert_ray.config import EngineConfig
from colbert_ray.functions.tokenizer import sql_tokenize_expr, tokenize_query

PHRASE_ALL = 1 << 40          # phrase atoms need the full matching set


@dataclass
class Node:
    kind: str                  # 'term' | 'phrase' | 'wild' | 'and' | 'or' | 'not'
    terms: list[str] | None = None       # term: tokens; phrase: words
    wild: tuple[str, str, str] | None = None   # (form, a, b)
    children: list["Node"] | None = None


class QuerySyntaxError(ValueError):
    pass


def _lex(q: str) -> list[str]:
    out, i, n = [], 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c in "()":
            out.append(c)
            i += 1
        elif c == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise QuerySyntaxError("unterminated phrase quote")
            out.append(q[i:j + 1])
            i = j + 1
        else:
            j = i
            while j < n and not q[j].isspace() and q[j] not in '()"':
                j += 1
            out.append(q[i:j])
            i = j
    return out


def parse(q: str, cfg: EngineConfig | None = None) -> Node:
    cfg = cfg or EngineConfig()
    toks = _lex(q)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_expr() -> Node:
        kids = [parse_and()]
        while peek() == "OR":
            take()
            kids.append(parse_and())
        return kids[0] if len(kids) == 1 else Node("or", children=kids)

    def parse_and() -> Node:
        kids = [parse_unary()]
        while True:
            t = peek()
            if t == "AND":
                take()
                kids.append(parse_unary())
            elif t is not None and t not in (")", "OR"):
                kids.append(parse_unary())       # adjacency = AND
            else:
                break
        return kids[0] if len(kids) == 1 else Node("and", children=kids)

    def parse_unary() -> Node:
        if peek() == "NOT":
            take()
            return Node("not", children=[parse_unary()])
        return parse_atom()

    def parse_atom() -> Node:
        t = peek()
        if t is None:
            raise QuerySyntaxError("unexpected end of query")
        if t == "(":
            take()
            node = parse_expr()
            if peek() != ")":
                raise QuerySyntaxError("missing ')'")
            take()
            return node
        if t == ")":
            raise QuerySyntaxError("unexpected ')'")
        take()
        if t.startswith('"'):
            # phrases need ORDERED tokens (tokenize_query dedups/sorts)
            from colbert_ray.pipelines.phrase import phrase_tokens

            words = phrase_tokens(t[1:-1], cfg)
            if not words:
                raise QuerySyntaxError(f"empty phrase {t}")
            nxt = peek()
            if nxt is not None and nxt.startswith("~"):
                take()
                try:
                    slop = int(nxt[1:])
                except ValueError:
                    raise QuerySyntaxError(f"bad slop: {nxt!r}")
                if slop < 0:
                    raise QuerySyntaxError("slop must be >= 0")
                return Node("near", terms=words,
                            wild=("slop", str(slop), ""))
            return Node("phrase", terms=words)
        for op in (">=", "<=", ">", "<"):
            if op in t and "*" not in t:
                field, val = t.split(op, 1)
                if field and val:
                    try:
                        int(val)
                    except ValueError:
                        raise QuerySyntaxError(
                            f"range atom needs an integer bound: {t!r}")
                    return Node("range", terms=[field, op, val])
        if ":" in t and not t.startswith(":") and not t.endswith(":") \
                and "*" not in t:
            field, val = t.split(":", 1)
            return Node("field", terms=[field, val])
        if "~" in t and not t.startswith("~") and "*" not in t:
            base, _, dd = t.rpartition("~")
            if dd == "":
                d = 2                      # bare ``word~`` = Lucene default
            else:
                try:
                    d = int(dd)
                except ValueError:
                    raise QuerySyntaxError(f"bad fuzzy distance: {t!r}")
            if not 0 <= d <= 2:
                raise QuerySyntaxError(
                    f"fuzzy distance must be 0..2, got {d} in {t!r}")
            words = tokenize_query(base, cfg)[0]
            if len(words) != 1:
                raise QuerySyntaxError(
                    f"fuzzy atom needs a single token, {base!r} "
                    f"tokenizes to {words}")
            if d == 0:                     # ~0 = exact term
                return Node("term", terms=words)
            return Node("fuzzy", terms=words, wild=("fuzzy", str(d), ""))
        if "*" in t:
            parts = t.split("*")
            if t.count("*") == 1:
                a, b = parts
                if a and b:
                    return Node("wild", wild=("both", a, b))
                if a:
                    return Node("wild", wild=("prefix", a, ""))
                if b:
                    return Node("wild", wild=("suffix", "", b))
            elif (t.count("*") == 2 and t.startswith("*") and t.endswith("*")
                  and parts[1]):
                return Node("wild", wild=("infix", parts[1], ""))
            raise QuerySyntaxError(f"unsupported wildcard form: {t}")
        terms = tokenize_query(t, cfg)[0]
        if not terms:
            raise QuerySyntaxError(f"term tokenizes to nothing: {t!r}")
        return Node("term", terms=sorted(terms))

    node = parse_expr()
    if pos != len(toks):
        raise QuerySyntaxError(f"trailing tokens: {toks[pos:]}")
    _validate_not(node, under_and=False)
    return node


def _validate_not(n: Node, under_and: bool) -> None:
    if n.kind == "not":
        if not under_and:
            raise QuerySyntaxError(
                "NOT is only allowed as a direct child of an AND "
                "(pure-negative queries are rejected, as in Lucene)")
        _validate_not(n.children[0], under_and=False)
    elif n.children:
        for c in n.children:
            _validate_not(c, under_and=(n.kind == "and"))


def scoring_terms(n: Node) -> list[str]:
    """Positive literal terms (term atoms + phrase words outside NOT)."""
    if n.kind == "not":
        return []
    if n.kind in ("term", "phrase", "near"):
        return sorted(set(n.terms))
    if n.kind in ("wild", "fuzzy", "field", "range"):
        return []                      # constant-score rewrite
    out: list[str] = []
    for c in n.children or ():
        out.extend(scoring_terms(c))
    return sorted(set(out))


def _eval_set(n: Node, index_dir: str, corpus, idx, cfg,
              text_col: str, id_col: str) -> np.ndarray:
    from colbert_ray.pipelines.phrase import (
        conjunctive_candidates,
        infix_search,
        phrase_search,
        prefix_search,
        suffix_search,
        wildcard_search,
    )

    if n.kind == "term":
        return conjunctive_candidates(idx, n.terms)
    if n.kind == "phrase":
        t = phrase_search(index_dir, corpus, " ".join(n.terms),
                          k=PHRASE_ALL, cfg=cfg,
                          text_col=text_col, id_col=id_col)
        return np.sort(t.column("doc_id").to_numpy(zero_copy_only=False)
                       .astype(np.int64))
    if n.kind == "near":
        from colbert_ray.pipelines.phrase import proximity_search

        slop = int(n.wild[1])
        w = len(set(n.terms)) + slop      # max window = distinct words + slop
        t = proximity_search(index_dir, corpus, " ".join(n.terms),
                             k=PHRASE_ALL, cfg=cfg,
                             text_col=text_col, id_col=id_col)
        span = t.column("span").to_numpy(zero_copy_only=False)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return np.sort(d[span <= w].astype(np.int64))
    if n.kind == "wild":
        form, a, b = n.wild
        t = {"prefix": lambda: prefix_search(index_dir, a),
             "suffix": lambda: suffix_search(index_dir, b),
             "both": lambda: wildcard_search(index_dir, a, b),
             "infix": lambda: infix_search(index_dir, a)}[form]()
        return t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
    if n.kind == "fuzzy":
        from colbert_ray.pipelines.phrase import fuzzy_search

        t = fuzzy_search(index_dir, n.terms[0], int(n.wild[1]))
        return t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
    if n.kind in ("field", "range"):
        import glob
        import os
        import operator

        import pyarrow.dataset as pads

        if n.kind == "range":
            field, op, val = n.terms
        else:
            field, op, val = n.terms[0], "==", n.terms[1]
        files = sorted(glob.glob(os.path.join(index_dir, "docmeta",
                                              "*.parquet")))
        if not files:
            raise QuerySyntaxError("index has no docmeta/ — field atoms "
                                   "need an index built with meta_cols")
        dset = pads.dataset(files)
        if field not in dset.schema.names:
            raise QuerySyntaxError(
                f"unknown field {field!r}; docmeta has "
                f"{sorted(set(dset.schema.names) - {'docid'})}")
        cmp = {"==": operator.eq, ">": operator.gt, "<": operator.lt,
               ">=": operator.ge, "<=": operator.le}[op]
        ftype = dset.schema.field(field).type
        rhs: object = val
        if op != "==" or pa.types.is_integer(ftype):
            try:
                rhs = int(val)
            except ValueError:
                raise QuerySyntaxError(
                    f"field {field!r} is {ftype}; {val!r} is not an "
                    f"integer")
        elif not (pa.types.is_string(ftype)
                  or pa.types.is_large_string(ftype)):
            raise QuerySyntaxError(
                f"field {field!r} has unsupported type {ftype} for "
                f"equality atoms")
        t = dset.to_table(columns=["docid"],
                          filter=cmp(pads.field(field), rhs))
        d = np.sort(t.column("docid").to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        if len(idx.tombstones):
            d = np.setdiff1d(d, idx.tombstones)
        return d
    if n.kind == "or":
        parts = [_eval_set(c, index_dir, corpus, idx, cfg, text_col, id_col)
                 for c in n.children]
        return np.union1d(parts[0], np.concatenate(parts[1:])) \
            if len(parts) > 1 else parts[0]
    if n.kind == "and":
        pos = [c for c in n.children if c.kind != "not"]
        neg = [c.children[0] for c in n.children if c.kind == "not"]
        if not pos:
            raise QuerySyntaxError("AND group with only NOT children")
        cur = _eval_set(pos[0], index_dir, corpus, idx, cfg, text_col, id_col)
        for c in pos[1:]:
            if len(cur) == 0:
                return cur
            cur = np.intersect1d(
                cur, _eval_set(c, index_dir, corpus, idx, cfg,
                               text_col, id_col), assume_unique=False)
        if neg and len(cur):
            ex = np.concatenate([
                _eval_set(c, index_dir, corpus, idx, cfg, text_col, id_col)
                for c in neg])
            cur = np.setdiff1d(cur, ex)
        return cur
    raise QuerySyntaxError(f"cannot evaluate node kind {n.kind}")


def node_kinds(n: Node):
    """All node kinds in an AST (used to reject corpus-pass atoms on
    index-only surfaces)."""
    yield n.kind
    for c in n.children or ():
        yield from node_kinds(c)


def score_candidates(scorer, ast: Node,
                     cand: np.ndarray, k: int) -> tuple[np.ndarray,
                                                        np.ndarray]:
    """THE ranking kernel for boolean-DSL results, shared by dsl_search,
    DSLScorer and the HTTP server's cached_dsl: BM25 over the positive
    literal terms restricted to the sorted candidate docid set (score 0.0
    for candidates matching no scoring term), cut to k by the engine
    tie-break (-round(score, 6), docid). Returns the top-k (docids,
    scores)."""
    scores = np.zeros(len(cand), dtype=np.float64)
    terms = scoring_terms(ast)
    if terms:
        tids = scorer.idx.lookup_terms(terms)
        if len(tids):
            d, s = scorer._all_match_scores(tids, docid_filter=cand)
            scores[np.searchsorted(cand, d)] = s
    order = np.lexsort((cand, -np.round(scores, 6)))[:max(k, 0)]
    return cand[order], scores[order]


def dsl_search(index_dir: str, corpus, q: str, k: int = 10,
               cfg: EngineConfig | None = None, *,
               text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Evaluate a boolean DSL query -> top-k (docid, rank, score), BM25
    over the positive literal terms restricted to the boolean candidate
    set (score 0.0 for candidates matching no scoring term); tie-break
    (-round(score, 6), docid)."""
    from colbert_ray.state.decoded import DecodedIndex
    from colbert_ray.state.index import BM25Scorer

    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    # default to the INDEX's tokenizer config — parsing DSL atoms with a
    # different tokenizer than the dictionary was built with silently
    # misses terms (e.g. camelCase handling)
    cfg = cfg or idx.cfg
    ast = parse(q, cfg)
    cand = _eval_set(ast, index_dir, corpus, idx, cfg, text_col, id_col)
    empty = pa.table({"docid": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64()),
                      "score": pa.array([], type=pa.float64())})
    if len(cand) == 0:
        return empty
    scorer = BM25Scorer(index_dir, k=max(k, 1), with_sha=False)
    docids, scores = score_candidates(scorer, ast, cand, k)
    return pa.table({
        "docid": pa.array(docids, type=pa.int64()),
        "rank": pa.array(np.arange(1, len(docids) + 1, dtype=np.int64)),
        "score": pa.array(scores, type=pa.float64()),
    })


# ---------------------------------------------------------------------------
# SQL twin: translate the SAME AST into a per-doc boolean predicate over the
# tokenized corpus + the standard BM25 scoring CTE over the scoring terms.
# ---------------------------------------------------------------------------


def sql_predicate(n: Node, toks: str = "toks") -> str:
    """DuckDB boolean expression over a per-doc token list column."""
    if n.kind == "term":
        return "(" + " AND ".join(
            f"list_contains({toks}, '{t}')" for t in n.terms) + ")"
    if n.kind == "phrase":
        m = len(n.terms)
        conds = " AND ".join(
            f"{toks}[i + {j}] = '{w}'" for j, w in enumerate(n.terms))
        return (f"(len({toks}) >= {m} AND len(list_filter("
                f"generate_series(1, len({toks}) - {m - 1}), "
                f"i -> {conds})) > 0)")
    if n.kind == "near":
        # exists a width-W window containing every distinct word
        # (W = distinct words + slop — the standard slop simplification)
        uniq = sorted(set(n.terms))
        w = len(uniq) + int(n.wild[1])
        conds = " AND ".join(
            f"len(list_filter(generate_series(s, "
            f"least(s + {w - 1}, len({toks}))), "
            f"i -> {toks}[i] = '{word}')) > 0"
            for word in uniq)
        return (f"(len(list_filter(generate_series(1, len({toks})), "
                f"s -> {conds})) > 0)")
    if n.kind == "wild":
        form, a, b = n.wild
        like = {"prefix": f"'{a}%'", "suffix": f"'%{b}'",
                "both": f"'{a}%{b}'", "infix": f"'%{a}%'"}[form]
        guard = (f" AND len(t) >= {len(a) + len(b)}" if form == "both" else "")
        return (f"(len(list_filter({toks}, t -> t LIKE {like}{guard})) > 0)")
    if n.kind == "fuzzy":
        return (f"(len(list_filter({toks}, t -> "
                f"levenshtein(t, '{n.terms[0]}') <= {int(n.wild[1])})) > 0)")
    if n.kind == "field":
        field, val = n.terms
        return f"({field} = '{val}')"
    if n.kind == "range":
        field, op, val = n.terms
        # doclen lives in docmeta engine-side; its SQL twin is the
        # tokenized length of the same row
        lhs = f"len({toks})" if field == "doclen" else field
        return f"({lhs} {op} {val})"
    if n.kind == "or":
        return "(" + " OR ".join(sql_predicate(c, toks)
                                 for c in n.children) + ")"
    if n.kind == "and":
        parts = []
        for c in n.children:
            if c.kind == "not":
                parts.append(f"(NOT {sql_predicate(c.children[0], toks)})")
            else:
                parts.append(sql_predicate(c, toks))
        return "(" + " AND ".join(parts) + ")"
    raise QuerySyntaxError(f"cannot translate node kind {n.kind}")


def sql_dsl_search(table: str, q: str, k: int = 10,
                   cfg: EngineConfig | None = None, *,
                   text_col: str = "text", id_col: str = "doc_id",
                   fields: tuple[str, ...] = ()) -> str:
    """DuckDB twin of ``dsl_search`` (one query -> top-k docid/rank/score
    with score rounded to 6, the shared float policy)."""
    cfg = cfg or EngineConfig()
    ast = parse(q, cfg)
    terms = scoring_terms(ast)
    field_sel = "".join(f", {f}" for f in fields)
    k1, b = cfg.k1, cfg.b
    values = ",\n      ".join(f"('{t}')" for t in terms) or "(NULL)"
    score_join = f"""
q(term) AS (VALUES {values}),
sc AS (
  SELECT tf.doc_id AS docid,
         sum( ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * ( (tf.tf * ({k1} + 1.0))
                  / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl)) ) )
           AS score
  FROM q JOIN df ON df.term = q.term
  JOIN tf ON tf.term = q.term
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)""" if terms else """
sc AS (SELECT NULL::BIGINT AS docid, NULL::DOUBLE AS score WHERE FALSE)"""
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id{field_sel},
         {sql_tokenize_expr(text_col, cfg)} AS toks
  FROM {table}
),
stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM d
),
tok AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM d
),
tf AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
cand AS (SELECT doc_id FROM d WHERE {sql_predicate(ast)}),
{score_join}
SELECT cand.doc_id AS docid,
       row_number() OVER (
         ORDER BY round(coalesce(sc.score, 0.0), 6) DESC, cand.doc_id)
         AS rank,
       round(coalesce(sc.score, 0.0), 6) AS score_r
FROM cand LEFT JOIN sc ON sc.docid = cand.doc_id
QUALIFY rank <= {k}
ORDER BY rank
"""


class DSLScorer:
    """Actor-pool stage for BATCH DSL search: the index opens once per
    actor (mmap serve artifact), each batch of (qid, query) rows is
    evaluated per query — boolean set eval is inherently per-query index
    probing, the same per-row loop shape as the BM25 scorer actors.
    Index-only atoms (phrase/NEAR need a corpus pass and are rejected,
    matching the HTTP endpoint's contract)."""

    def __init__(self, index_dir: str, k: int, cfg_dict: dict | None = None):
        from colbert_ray.state.index import BM25Scorer

        self.index_dir = index_dir
        self.k = k
        self.scorer = BM25Scorer(index_dir, k=max(1, k), with_sha=False)
        self.cfg = (EngineConfig.from_dict(cfg_dict) if cfg_dict
                    else self.scorer.idx.cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("qid").to_numpy(zero_copy_only=False)
        queries = batch.column("query").to_pylist()
        out_q, out_d, out_r, out_s = [], [], [], []
        for qid, q in zip(qids, queries):
            ast = parse(q, self.cfg)
            if set(node_kinds(ast)) & {"phrase", "near"}:
                raise QuerySyntaxError(
                    f"qid={qid}: phrase/NEAR atoms need a corpus pass — "
                    f"use dsl_search() for those queries")
            cand = _eval_set(ast, self.index_dir, None, self.scorer.idx,
                             self.cfg, "text", "doc_id")
            if len(cand) == 0:
                continue
            docids, scores = score_candidates(self.scorer, ast, cand,
                                              self.k)
            out_q.extend([int(qid)] * len(docids))
            out_d.extend(docids.tolist())
            out_r.extend(range(1, len(docids) + 1))
            out_s.extend(scores.tolist())
        return pa.table({
            "qid": pa.array(out_q, type=pa.int64()),
            "docid": pa.array(out_d, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
        })


def dsl_search_table(queries, index_dir: str, k: int = 10,
                     cfg: EngineConfig | None = None,
                     concurrency: int = 2,
                     batch_size: int = 64) -> pa.Table:
    """Batch DSL search over a (qid, query) table/Dataset via the
    DSLScorer actor pool — the search_table analog for boolean queries
    (index-only atoms). Returns (qid, docid, rank, score) sorted by
    (qid, rank)."""
    import ray.data as _rd

    ds = _rd.from_arrow(queries) if isinstance(queries, pa.Table) else queries
    out = ds.map_batches(
        DSLScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k,
                               "cfg_dict": cfg.to_dict() if cfg else None},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, zero_copy_batch=True)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    if "qid" not in t.column_names:
        return pa.table({"qid": pa.array([], type=pa.int64()),
                         "docid": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.float64())})
    import pyarrow.compute as pc2

    order = pc2.sort_indices(t, sort_keys=[("qid", "ascending"),
                                           ("rank", "ascending")])
    return t.take(order)
