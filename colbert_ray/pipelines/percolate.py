"""Percolator — reverse search: stream DOCUMENTS against a small set of
STORED boolean queries and emit every (query_id, doc_id) match.

This is the Elasticsearch-percolate capability re-expressed Ray-Data-first:
the stored queries are the tiny broadcast side (parsed once per actor in
``__init__``), the corpus is the stream, and each ``map_batches`` call
evaluates every surviving query VECTORIZED over the whole batch — one
tokenize pass per batch, one flat==token scan per distinct term (memoised
across queries, which share vocabulary), ``np.bincount`` folds token hits
to row masks, and boolean structure is plain mask algebra. No index is
built and nothing shuffles: at 100 TB this is a single embarrassingly
parallel pass whose per-batch cost is O(batch_tokens x distinct_atoms).

Scale guard — the classic percolator optimisation: every query
pre-extracts its REQUIRED terms (tokens that must appear in any matching
doc: conjunctive positive term/phrase/NEAR atoms; for OR, terms required
by every branch). A batch first materialises its vocabulary (one
``pc.unique``) and skips outright each query with a required term absent
from the batch — with thousands of stored queries and selective atoms,
most queries never touch a batch at all. Queries with no extractable
required term (wildcard/field/range-only) always evaluate.

Semantics are EXACTLY ``pipelines.querylang``'s (same parser, same
tokenizer, same sloppy-window rule), so the DuckDB twin is
``sql_predicate`` applied per query over the shared tokenize expression
— see ``sql_percolate``.

Reference capability: query-side candidate filtering
(``colbert/search/index_storage.py:72-96``) turned inside out — queries
stored, documents probed; the percolate shape itself is classic public
Lucene/Elasticsearch behaviour.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from colbert_ray.config import EngineConfig
from colbert_ray.functions.tokenizer import (sql_tokenize_expr,
                                             tokenize_column)
from colbert_ray.pipelines.querylang import (Node, QuerySyntaxError, parse,
                                             sql_predicate)

__all__ = ["Percolator", "percolate", "required_terms", "sql_percolate"]


def required_terms(n: Node) -> frozenset[str]:
    """Tokens that MUST appear in any document matching ``n``.

    term/phrase/NEAR atoms require their tokens; AND requires the union of
    its positive children; OR requires only what EVERY branch requires;
    NOT / wildcard / fuzzy / field / range atoms can require nothing.
    """
    if n.kind in ("term", "phrase", "near"):
        return frozenset(n.terms)
    if n.kind == "and":
        out: frozenset[str] = frozenset()
        for c in n.children:
            if c.kind != "not":
                out |= required_terms(c)
        return out
    if n.kind == "or":
        sets = [required_terms(c) for c in n.children]
        out = sets[0]
        for s in sets[1:]:
            out &= s
        return out
    return frozenset()


class _BatchEval:
    """One batch's shared evaluation state: tokenize once, flatten once,
    memoise per-token row masks across all queries probing this batch."""

    def __init__(self, batch: pa.Table, cfg: EngineConfig,
                 text_col: str, fields: tuple[str, ...]):
        toks = tokenize_column(batch.column(text_col), cfg)
        self.n = len(batch)
        off = np.asarray(toks.offsets)
        self.counts = np.diff(off).astype(np.int64)
        flat = toks.flatten()
        self.flat = flat
        self.parents = np.repeat(np.arange(self.n, dtype=np.int64),
                                 self.counts)
        self.vocab = frozenset(
            t for t in pc.unique(flat).to_pylist() if t is not None)
        self.batch = batch
        self.fields = fields
        self._term_mask: dict[str, np.ndarray] = {}
        self._term_eq: dict[str, np.ndarray] = {}
        self._fuzzy: dict[tuple[str, int], np.ndarray] = {}
        # sorted once: fuzzy atoms always evaluate (they contribute no
        # required terms, so the prefilter never skips them) and the
        # Levenshtein DP is memoised per (term, d) across queries
        self.vocab_sorted = sorted(self.vocab)
        # per-row flat spans for the candidate-only phrase/NEAR verify
        self._starts = np.concatenate([[0], np.cumsum(self.counts)])

    # -- atom evaluators (each returns a bool mask over batch rows) -----
    def _eq(self, token: str) -> np.ndarray:
        eq = self._term_eq.get(token)
        if eq is None:
            eq = pc.fill_null(pc.equal(self.flat, token), False)
            eq = np.asarray(eq.to_numpy(zero_copy_only=False), dtype=bool)
            self._term_eq[token] = eq
        return eq

    def term_mask(self, token: str) -> np.ndarray:
        m = self._term_mask.get(token)
        if m is None:
            hits = self.parents[self._eq(token)]
            m = np.bincount(hits, minlength=self.n).astype(bool)
            self._term_mask[token] = m
        return m

    def _phrase_mask(self, words: list[str]) -> np.ndarray:
        m = len(words)
        total = len(self.flat)
        if total < m:
            return np.zeros(self.n, dtype=bool)
        span = total - m + 1
        hit = self._eq(words[0])[:span].copy()
        for j in range(1, m):
            hit &= self._eq(words[j])[j:j + span]
        # consecutive positions must not cross a row boundary
        hit &= self.parents[:span] == self.parents[m - 1:]
        rows = self.parents[:span][hit]
        return np.bincount(rows, minlength=self.n).astype(bool)

    def _near_mask(self, words: list[str], slop: int) -> np.ndarray:
        uniq = sorted(set(words))
        w = len(uniq) + slop
        # candidate prefilter: rows containing every distinct word
        cand = self.term_mask(uniq[0]).copy()
        for word in uniq[1:]:
            cand &= self.term_mask(word)
        out = np.zeros(self.n, dtype=bool)
        # candidate-only window verify (same two-stage shape as
        # pipelines/phrase.py: cheap set intersection, then positions)
        eqs = [self._eq(word) for word in uniq]
        for r in np.flatnonzero(cand):
            lo, hi = self._starts[r], self._starts[r + 1]
            L = hi - lo
            for s in range(max(1, L - w + 1)):
                if all(e[lo + s:lo + min(s + w, L)].any() for e in eqs):
                    out[r] = True
                    break
        return out

    def _fuzzy_mask(self, term: str, d: int) -> np.ndarray:
        from colbert_ray.functions.util import levenshtein_leq_mask

        m = self._fuzzy.get((term, d))
        if m is not None:
            return m
        hit = levenshtein_leq_mask(self.vocab_sorted, term, d)
        matched = [v for v, h in zip(self.vocab_sorted, hit) if h]
        if not matched:
            m = np.zeros(self.n, dtype=bool)
        else:
            isin = pc.fill_null(
                pc.is_in(self.flat, value_set=pa.array(matched)), False)
            isin = np.asarray(isin.to_numpy(zero_copy_only=False),
                              dtype=bool)
            m = np.bincount(self.parents[isin],
                            minlength=self.n).astype(bool)
        self._fuzzy[(term, d)] = m
        return m

    def _wild_mask(self, form: str, a: str, b: str) -> np.ndarray:
        if form == "prefix":
            hit = pc.starts_with(self.flat, a)
        elif form == "suffix":
            hit = pc.ends_with(self.flat, b)
        elif form == "infix":
            hit = pc.match_substring(self.flat, a)
        else:  # both: a%b with the LIKE no-overlap length guard
            hit = pc.and_(
                pc.and_(pc.starts_with(self.flat, a),
                        pc.ends_with(self.flat, b)),
                pc.greater_equal(pc.utf8_length(self.flat),
                                 len(a) + len(b)))
        hit = np.asarray(hit.to_numpy(zero_copy_only=False), dtype=bool)
        return np.bincount(self.parents[hit], minlength=self.n).astype(bool)

    def _field_mask(self, field: str, val: str) -> np.ndarray:
        if field not in self.fields:
            raise QuerySyntaxError(
                f"field atom {field!r} not in percolated columns "
                f"{self.fields}")
        col = self.batch.column(field)
        # same coercion rule as querylang._eval_set: integer columns
        # compare against int(val), string columns against the raw string
        # (pc.equal(int64, string) has no kernel and would kill the task)
        rhs: object = val
        if pa.types.is_integer(col.type):
            try:
                rhs = int(val)
            except ValueError:
                raise QuerySyntaxError(
                    f"field {field!r} is {col.type}; {val!r} is not an "
                    f"integer")
        elif not (pa.types.is_string(col.type)
                  or pa.types.is_large_string(col.type)):
            raise QuerySyntaxError(
                f"field {field!r} has unsupported type {col.type} for "
                f"equality atoms")
        eq = pc.equal(col, rhs)
        return np.asarray(
            pc.fill_null(eq, False).to_numpy(zero_copy_only=False),
            dtype=bool)

    def _range_mask(self, field: str, op: str, val: str) -> np.ndarray:
        if field == "doclen":
            lhs = self.counts
        else:
            if field not in self.fields:
                raise QuerySyntaxError(
                    f"range atom {field!r} not in percolated columns "
                    f"{self.fields}")
            lhs = np.asarray(self.batch.column(field)
                             .to_numpy(zero_copy_only=False))
        v = int(val)
        return {"<": lhs < v, "<=": lhs <= v,
                ">": lhs > v, ">=": lhs >= v}[op]

    def eval(self, n: Node) -> np.ndarray:
        if n.kind == "term":
            m = self.term_mask(n.terms[0]).copy()
            for t in n.terms[1:]:
                m &= self.term_mask(t)
            return m
        if n.kind == "phrase":
            return self._phrase_mask(n.terms)
        if n.kind == "near":
            return self._near_mask(n.terms, int(n.wild[1]))
        if n.kind == "wild":
            return self._wild_mask(*n.wild)
        if n.kind == "fuzzy":
            return self._fuzzy_mask(n.terms[0], int(n.wild[1]))
        if n.kind == "field":
            return self._field_mask(n.terms[0], n.terms[1])
        if n.kind == "range":
            return self._range_mask(*n.terms)
        if n.kind == "or":
            m = self.eval(n.children[0]).copy()
            for c in n.children[1:]:
                m |= self.eval(c)
            return m
        if n.kind == "and":
            m = np.ones(self.n, dtype=bool)
            for c in n.children:
                if c.kind == "not":
                    m &= ~self.eval(c.children[0])
                else:
                    m &= self.eval(c)
            return m
        raise QuerySyntaxError(f"cannot evaluate node kind {n.kind}")


class Percolator:
    """Actor-pool stage: stored queries parse ONCE per actor; each batch
    tokenizes once and evaluates the surviving queries over shared,
    memoised term masks. ``prefilter=False`` disables the required-term
    skip (equivalence-tested — results must be identical)."""

    def __init__(self, queries: list[tuple[int, str]],
                 cfg_dict: dict | None = None, *, text_col: str = "text",
                 id_col: str = "doc_id", fields: tuple[str, ...] = (),
                 prefilter: bool = True):
        self.cfg = (EngineConfig.from_dict(cfg_dict) if cfg_dict
                    else EngineConfig())
        self.text_col, self.id_col = text_col, id_col
        self.fields = tuple(fields)
        self.prefilter = prefilter
        self.compiled: list[tuple[int, Node, frozenset[str]]] = []
        for qid, q in queries:
            ast = parse(q, self.cfg)
            self.compiled.append((int(qid), ast, required_terms(ast)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ev = _BatchEval(batch, self.cfg, self.text_col, self.fields)
        ids = np.asarray(batch.column(self.id_col)
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for qid, ast, req in self.compiled:
            if self.prefilter and not req <= ev.vocab:
                continue
            mask = ev.eval(ast)
            if mask.any():
                d = ids[mask]
                out_q.append(np.full(len(d), qid, dtype=np.int64))
                out_d.append(d)
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "doc_id": pa.array(np.concatenate(out_d))})


def percolate(docs, queries: list[tuple[int, str]],
              cfg: EngineConfig | None = None, *, text_col: str = "text",
              id_col: str = "doc_id", fields: tuple[str, ...] = (),
              prefilter: bool = True, concurrency: int = 2,
              batch_size: int = 256) -> "ray.data.Dataset":
    """Match every document in ``docs`` against the stored ``queries``;
    returns a Dataset of (query_id, doc_id) pairs (unordered — sort at
    the consumer; the gate sorts by (query_id, doc_id))."""
    import ray.data as _rd

    ds = _rd.from_arrow(docs) if isinstance(docs, pa.Table) else docs
    return ds.map_batches(
        Percolator,
        fn_constructor_kwargs={
            "queries": queries,
            "cfg_dict": (cfg or EngineConfig()).to_dict(),
            "text_col": text_col, "id_col": id_col, "fields": fields,
            "prefilter": prefilter},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, zero_copy_batch=True)


def sql_percolate(table: str, queries: list[tuple[int, str]],
                  cfg: EngineConfig | None = None, *,
                  text_col: str = "text", id_col: str = "doc_id",
                  fields: tuple[str, ...] = ()) -> str:
    """DuckDB twin: the shared tokenize CTE + one ``sql_predicate`` branch
    per stored query, UNION ALL, ordered (query_id, doc_id)."""
    cfg = cfg or EngineConfig()
    field_sel = "".join(f", {f}" for f in fields)
    branches = "\nUNION ALL\n".join(
        f"SELECT {int(qid)}::BIGINT AS query_id, doc_id FROM d "
        f"WHERE {sql_predicate(parse(q, cfg))}"
        for qid, q in queries)
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id{field_sel},
         {sql_tokenize_expr(text_col, cfg)} AS toks
  FROM {table}
)
{branches}
ORDER BY query_id, doc_id
"""
