"""Minimal HTTP serving layer over the BM25 engine (T5 serving analog).

The reference serves one endpoint with an LRU query cache
(``/root/reference/server.py:16-47``: Flask + ``functools.lru_cache``);
this is the same surface on the stdlib ``ThreadingHTTPServer`` (Flask is
not in the container):

    GET /api/search?query=...&k=10
    -> {"query": ..., "k": ..., "latency_ms": ..., "topk":
        [{"docid": ..., "rank": ..., "score": ..., "content_sha256": ...}]}

``after=`` (bm25 only; empty value = page 1, ``score_r,docid`` for later
pages) switches the endpoint to stateless cursor pagination
(``pipelines.search.search_after``): the reply carries ``next_after``,
and because the cursor is pure sort-key state any replica can serve any
page — no scroll context to pin. Paginating clients must fetch page 1
with ``after=`` too: pagination orders by the ROUNDED (score_r, docid)
key, while the plain response orders by raw score, so a cursor built
from the plain page 1 can drop or duplicate a rounded tie.

``collapse=<docmeta field>`` serves field-collapsed results (one hit per
field value + group_count; ``pipelines.search.collapse_search``) and
``boost_field=<numeric docmeta field>`` [+ ``boost_factor=``] serves
function-score results (``function_score_search``) — both index+docmeta
only, so they belong on the serving tier (rescore/significant-terms need
a corpus pass and stay offline). The result-shaping modes (dsl, after,
collapse, boost_field) are mutually exclusive. The fan-out front end
serves EVERY mode: plain bm25, ``ranker=ql`` (per-shard QL scores ride
the global ``cf_by_term`` sidecar, union merge), ``dsl=1`` (shards clip
boolean candidate sets to their docid range — the sets partition, union
merge under the DSL order), ``fix=1`` (correction is dictionary-global:
one shard answers ``/api/fix``, the corrected query then runs any mode),
``after=`` pagination (one global cursor is valid on every shard; merged
pages exact), ``count=1`` (shard stats ADD), ``collapse=`` (two-phase:
shard reps -> union best -> counts summed via the shard-internal
``/api/group_counts``) and ``boost_field=`` (per-doc global scores
union-merge) — each asserted equal to the unsharded result in
tests/test_serve.py.

The scorer holds the mmap-opened serve artifact (DecodedIndex fast path),
so startup is milliseconds and concurrent handler threads share one
page-cache copy. On a serving cluster, run one server per docid shard
(``--docid-range lo:hi``) plus ONE fan-out front end (``--fanout
url1,url2,...``) exposing the same API: it queries every shard
concurrently and merges by (-score, docid) — per-shard scores use global
statistics, so the merged ranking is bit-identical to the unsharded
scorer (the ``search_sharded`` topology over HTTP).

Usage:
    python -m colbert_ray.server --index DIR [--port 8893] [--k 10]
    python -m colbert_ray.server --index DIR --docid-range 0:500000 ...
    python -m colbert_ray.server --fanout http://h1:8893,http://h2:8893
"""

from __future__ import annotations

import argparse
import functools
import json
import time
import urllib.error
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from colbert_ray.state.index import BM25Scorer


def make_server(index_dir: str, port: int = 8893, k: int = 10,
                with_sha: bool = True, cache_size: int = 1_000_000,
                docid_range: tuple[int, int] | None = None) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``serve_forever()`` to run.

    A per-request ``ranker=ql`` query parameter serves Dirichlet QL from
    the SAME loaded index (the second scorer shares the process-cached
    DecodedIndex, so the switch costs no decode). QL works on docid_range
    shards too: the vocab-sized ``cf_by_term`` sidecar keeps the collection
    model GLOBAL across restriction, so per-shard QL scores are exact.
    """
    scorers = {"bm25": BM25Scorer(index_dir, k=k, with_sha=with_sha,
                                  docid_range=docid_range)}

    def get_scorer(ranker: str):
        sc = scorers.get(ranker)
        if sc is None:
            sc = BM25Scorer(index_dir, k=k, with_sha=with_sha, ranker="ql",
                            docid_range=docid_range)
            scorers["ql"] = sc
        return sc

    @functools.lru_cache(maxsize=cache_size)   # the reference's query cache
    def cached_dsl(query: str, kk: int):
        """Boolean-DSL path (pipelines/querylang) — index-only atoms.
        Phrase atoms need a corpus pass and 400 here.

        On a docid_range shard the final candidate set is CLIPPED to the
        shard's range: atoms that consult the shard's restricted postings
        already return (global ∩ shard), but wildcard/fuzzy/field atoms
        expand against the full dictionary/docmeta, so without the clip a
        zero-scoring-term candidate outside the range would be returned by
        EVERY shard. Clipped, the shard sets partition the global candidate
        set and the fan-out union merge is exact."""
        from colbert_ray.pipelines.querylang import (
            _eval_set,
            node_kinds,
            parse,
            score_candidates,
        )

        scorer = get_scorer("bm25")
        ast = parse(query, scorer.idx.cfg)
        if set(node_kinds(ast)) & {"phrase", "near"}:
            raise ValueError("phrase/NEAR atoms need a corpus pass — use "
                             "dsl_search() offline, not the HTTP endpoint")
        cand = _eval_set(ast, index_dir, None, scorer.idx, scorer.idx.cfg,
                         "text", "doc_id")
        if docid_range is not None and len(cand):
            cand = cand[(cand >= scorer.idx.docid_base)
                        & (cand < scorer.idx.docid_limit)]
        if len(cand) == 0:
            return []
        docids, scores = score_candidates(scorer, ast, cand, kk)
        rows = []
        for r, (d, s) in enumerate(zip(docids.tolist(), scores.tolist()),
                                   1):
            row = {"docid": d, "rank": r, "score": s}
            if with_sha and scorer.idx.sha256 is not None:
                row["content_sha256"] = scorer.idx.sha256[
                    d - scorer.idx.docid_base]
            rows.append(row)
        return rows

    @functools.lru_cache(maxsize=cache_size)   # the reference's query cache
    def cached_search(query: str, kk: int, ranker: str = "bm25"):
        scorer = get_scorer(ranker)
        docids, scores, ranks = scorer.score_query(query, k=kk)
        rows = []
        for d, s, r in zip(docids.tolist(), scores.tolist(), ranks.tolist()):
            row = {"docid": d, "rank": r, "score": s}
            if with_sha and scorer.idx.sha256 is not None:
                row["content_sha256"] = scorer.idx.sha256[
                    d - scorer.idx.docid_base]
            rows.append(row)
        return rows

    @functools.lru_cache(maxsize=cache_size)
    def cached_collapse(query: str, field: str, kk: int):
        from colbert_ray.pipelines.search import collapse_search

        return collapse_search(index_dir, query, field, k=kk,
                               scorer=get_scorer("bm25")).to_pylist()

    @functools.lru_cache(maxsize=cache_size)
    def cached_group_counts(query: str, field: str, values: tuple):
        """Shard-internal phase-2 of distributed collapse: match counts
        for SPECIFIC field values over this shard's match set. With
        docid-range shards the counts ADD to the global group counts.
        ``values`` arrive as URL strings and are re-coerced against the
        docmeta column type; the reply is keyed by the ORIGINAL strings,
        so the front end's string-keyed sum works for numeric fields."""
        import pyarrow as pa

        from colbert_ray.functions.tokenizer import tokenize_query
        from colbert_ray.pipelines.search import _docmeta_lookup

        scorer = get_scorer("bm25")
        tids = scorer.idx.lookup_terms(
            tokenize_query(query, scorer.idx.cfg)[0])
        d = (scorer._all_match_scores(
                 tids, docid_filter=scorer.docid_filter)[0]
             if len(tids) else [])
        if not len(d):
            return {v: 0 for v in values}
        vals_arr = _docmeta_lookup(index_dir, field, d)
        if pa.types.is_integer(vals_arr.type):
            def conv(v):
                try:
                    return int(v)
                except ValueError:
                    return None
        elif pa.types.is_string(vals_arr.type) \
                or pa.types.is_large_string(vals_arr.type):
            conv = str
        else:
            raise ValueError(f"group_counts: unsupported field type "
                             f"{vals_arr.type}")
        from collections import Counter

        native_counts = Counter(vals_arr.to_pylist())
        # an unparseable value for an integer field coerces to None, and
        # None keys the NULL-field group in the Counter — report 0 for the
        # bogus value instead of silently returning the null-group count
        return {v: (native_counts.get(cv, 0)
                    if (cv := conv(v)) is not None else 0)
                for v in values}

    @functools.lru_cache(maxsize=cache_size)
    def cached_fix(query: str) -> str:
        # did-you-mean: OOV terms -> best Levenshtein-1 dictionary
        # neighbor (df DESC, term ASC); index-only, so it belongs here
        from colbert_ray.functions.spelling import correct_terms
        from colbert_ray.functions.tokenizer import tokenize_query

        idx = get_scorer("bm25").idx
        toks = tokenize_query(query, idx.cfg)[0]
        return " ".join(correct_terms(idx.dict_terms, idx.dict_dfs,
                                      toks))

    @functools.lru_cache(maxsize=cache_size)
    def cached_count(query: str):
        from colbert_ray.pipelines.search import match_stats

        return match_stats(index_dir, query,
                           scorer=get_scorer("bm25")).to_pylist()[0]

    @functools.lru_cache(maxsize=cache_size)
    def cached_page(query: str, kk: int, after):
        # pagination is as cacheable as any other mode: the cursor is part
        # of the key, so repeat pages (and every per-shard call from a
        # fan-out front end) are O(1) after the first
        from colbert_ray.pipelines.search import search_after

        page, cursor = search_after(index_dir, query, k=kk, after=after,
                                    scorer=get_scorer("bm25"))
        return (page.to_pylist(),
                None if cursor is None else f"{cursor[0]},{cursor[1]}")

    @functools.lru_cache(maxsize=cache_size)
    def cached_funcscore(query: str, field: str, factor: float, kk: int):
        from colbert_ray.pipelines.search import function_score_search

        return function_score_search(index_dir, query, field=field,
                                     factor=factor, k=kk,
                                     scorer=get_scorer("bm25")).to_pylist()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):   # quiet by default
            pass

        def _reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):   # noqa: N802  (stdlib handler naming)
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/api/suggest":
                params = urllib.parse.parse_qs(parsed.query,
                                               keep_blank_values=True)
                prefix = (params.get("prefix") or [""])[0]
                try:
                    kk = int((params.get("k") or [str(k)])[0])
                except ValueError:
                    self._reply(400, {"error": "k must be an integer"})
                    return
                if kk <= 0:
                    self._reply(400, {"error": "k must be positive"})
                    return
                if not prefix:
                    self._reply(400, {"error": "missing prefix parameter"})
                    return
                from colbert_ray.pipelines.phrase import (
                    suggest_terms_idx,
                )

                t0 = time.time()
                # the scorer's idx honors this server's docid_range, so a
                # SHARD's suggestions carry shard-local dfs (they sum to
                # the global df in the fan-out merge)
                t = suggest_terms_idx(get_scorer("bm25").idx, prefix, k=kk)
                self._reply(200, {
                    "prefix": prefix, "k": kk,
                    "latency_ms": round((time.time() - t0) * 1000, 3),
                    "suggestions": t.to_pylist(),
                })
                return
            if parsed.path == "/api/group_counts":
                params = urllib.parse.parse_qs(parsed.query,
                                               keep_blank_values=True)
                query = (params.get("query") or [""])[0]
                field = (params.get("field") or [""])[0]
                values = tuple(params.get("value") or ())
                if not (query and field and values):
                    self._reply(400, {"error": "need query=, field= and "
                                               ">=1 value= parameters"})
                    return
                t0 = time.time()
                try:
                    counts = cached_group_counts(query, field, values)
                except ValueError as e:
                    self._reply(400, {"error": str(e)})
                    return
                self._reply(200, {
                    "query": query, "field": field,
                    "latency_ms": round((time.time() - t0) * 1000, 3),
                    "counts": counts,
                })
                return
            if parsed.path == "/api/fix":
                # standalone did-you-mean: index-only (dictionary terms +
                # GLOBAL dfs, both unrestricted on docid_range shards), so
                # every shard returns the identical correction — the fan-out
                # front end asks one shard and reuses the answer
                params = urllib.parse.parse_qs(parsed.query,
                                               keep_blank_values=True)
                query = (params.get("query") or [""])[0]
                if not query:
                    self._reply(400, {"error": "missing query parameter"})
                    return
                t0 = time.time()
                self._reply(200, {
                    "query": query,
                    "corrected_query": cached_fix(query),
                    "latency_ms": round((time.time() - t0) * 1000, 3),
                })
                return
            if parsed.path != "/api/search":
                self._reply(404, {"error": "unknown path; use /api/search, "
                                           "/api/fix, /api/group_counts or "
                                           "/api/suggest"})
                return
            params = urllib.parse.parse_qs(parsed.query,
                                               keep_blank_values=True)
            query = (params.get("query") or [""])[0]
            try:
                kk = int((params.get("k") or [str(k)])[0])
            except ValueError:
                self._reply(400, {"error": "k must be an integer"})
                return
            if kk <= 0:
                self._reply(400, {"error": "k must be positive"})
                return
            if not query:
                self._reply(400, {"error": "missing query parameter"})
                return
            ranker = (params.get("ranker") or ["bm25"])[0]
            if ranker not in ("bm25", "ql"):
                self._reply(400, {"error": "ranker must be bm25 or ql"})
                return
            dsl = (params.get("dsl") or ["0"])[0] in ("1", "true")
            # pagination mode is keyed on the PRESENCE of after= (an empty
            # value serves page 1) so page 1 and later pages share the
            # rounded (score_r, docid) total order — bootstrapping a
            # cursor from the raw-score plain response can drop/duplicate
            # a rounded tie that straddles the page boundary
            after_vals = params.get("after")
            paginate = after_vals is not None
            after = None
            if paginate:
                if dsl or ranker != "bm25":
                    self._reply(400, {"error": "after= pagination is "
                                               "bm25-only"})
                    return
                if after_vals[0]:
                    try:
                        a_s, a_d = after_vals[0].split(",")
                        after = (float(a_s), int(a_d))
                    except ValueError:
                        self._reply(400, {"error": "after must be "
                                                   "'score_r,docid' (or "
                                                   "empty for page 1)"})
                        return
            collapse = (params.get("collapse") or [""])[0]
            boost_field = (params.get("boost_field") or [""])[0]
            try:
                boost_factor = float(
                    (params.get("boost_factor") or ["1.0"])[0])
            except ValueError:
                self._reply(400, {"error": "boost_factor must be a "
                                           "number"})
                return
            count = (params.get("count") or ["0"])[0] in ("1", "true")
            fix = (params.get("fix") or ["0"])[0] in ("1", "true")
            # each result-shaping mode changes the response contract;
            # combining them silently would pick one arbitrarily
            if sum([dsl, paginate, bool(collapse),
                    bool(boost_field), count]) > 1:
                self._reply(400, {"error": "dsl/after/collapse/"
                                           "boost_field/count are "
                                           "mutually exclusive"})
                return
            if (dsl or collapse or boost_field or count) \
                    and ranker != "bm25":
                # dsl included: dsl=1&ranker=ql would otherwise silently
                # run the BM25-scored DSL path and ignore the requested QL
                self._reply(400, {"error": "dsl/collapse/boost_field/count "
                                           "are bm25-only"})
                return
            if fix and (dsl or ranker != "bm25"):
                self._reply(400, {"error": "fix=1 (did-you-mean) is "
                                           "bm25-only and not available "
                                           "with dsl"})
                return
            t0 = time.time()
            corrected = None
            if fix:
                corrected = cached_fix(query)
                query = corrected
            fix_note = ({"corrected_query": corrected}
                        if corrected is not None else {})
            try:
                if count:
                    stats = cached_count(query)
                    self._reply(200, {
                        "query": query, "ranker": "bm25",
                        "latency_ms": round((time.time() - t0) * 1000, 3),
                        **fix_note, **stats,
                    })
                    return
                if paginate:
                    rows_, nxt = cached_page(query, kk, after)
                    self._reply(200, {
                        "query": query, "k": kk, "ranker": "bm25",
                        "latency_ms": round((time.time() - t0) * 1000, 3),
                        "topk": rows_,
                        "next_after": nxt,
                        **fix_note,
                    })
                    return
                if collapse:
                    rows = cached_collapse(query, collapse, kk)
                elif boost_field:
                    rows = cached_funcscore(query, boost_field,
                                            boost_factor, kk)
                elif dsl:
                    rows = cached_dsl(query, kk)
                else:
                    rows = cached_search(query, kk, ranker)
            except ValueError as e:
                self._reply(400, {"error": str(e)})
                return
            mode = ("collapse" if collapse else
                    "function_score" if boost_field else
                    "dsl" if dsl else ranker)
            self._reply(200, {
                "query": query, "k": kk, "ranker": mode,
                "latency_ms": round((time.time() - t0) * 1000, 3),
                "topk": rows,
                **fix_note,
            })

    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    httpd.cached_search = cached_search   # exposed for tests/cache stats
    return httpd


def make_fanout(shard_urls: list[str], port: int = 8893, k: int = 10,
                cache_size: int = 1_000_000,
                timeout_s: float = 30.0) -> ThreadingHTTPServer:
    """Multi-shard HTTP front end: the same ``/api/search`` surface, backed
    by N shard servers (one per docid range, each started with
    ``make_server(..., docid_range=...)``). Each request fans out to every
    shard CONCURRENTLY, merges by (-score, docid) and cuts to k — per-shard
    scores use GLOBAL statistics, so the merged ranking is bit-identical to
    the unsharded scorer (the ``search_sharded`` topology over HTTP).

    ``shard_urls``: base URLs like ``http://host:port`` (no trailing path).
    """
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=max(2, len(shard_urls)))

    def _shard_get(base: str, path: str, params: list) -> dict:
        """One parameterized shard GET — the single URL builder every
        fan-out mode shares."""
        qs = "&".join(f"{k}={urllib.parse.quote(str(v))}"
                      for k, v in params)
        with urllib.request.urlopen(f"{base}{path}?{qs}",
                                    timeout=timeout_s) as r:
            return json.loads(r.read())

    def _shard_err(e: Exception) -> tuple[int, dict]:
        """Map a shard-call failure to (status, body). A shard-side 4xx
        (DSL syntax error, phrase/NEAR atom, unknown field...) is a CLIENT
        error and must surface as 400 with the shard's message — wrapping
        it as 502 would misclassify user input as a server fault and trip
        5xx monitoring/retries. Anything else (shard down, timeout, 5xx)
        is a genuine 502."""
        if isinstance(e, urllib.error.HTTPError) and 400 <= e.code < 500:
            try:
                msg = json.loads(e.read()).get("error", str(e))
            except Exception:
                msg = str(e)
            return 400, {"error": msg}
        return 502, {"error": f"shard fan-out failed: {e}"}

    def _merge_topk(parts: list, score_key: str, kk: int) -> list[dict]:
        """THE union merge: global top-k is a subset of the union of
        per-shard top-k under the same (-score, docid) total order."""
        rows = [row for p in parts for row in p]
        rows.sort(key=lambda r: (-r[score_key], r["docid"]))
        rows = rows[:kk]
        for i, r in enumerate(rows):
            r["rank"] = i + 1
        return rows

    @functools.lru_cache(maxsize=cache_size)
    def cached_suggest(prefix: str, kk: int):
        # a docid-range shard's df counts ITS postings, so per-shard dfs
        # SUM to the exact global df — merge is an exact distributed
        # aggregation, then the same (df DESC, term ASC) cut.
        # Shards are asked uncapped-ish (k huge) so the global merge sees
        # every matching term's partial df.
        parts = list(pool.map(
            lambda b: _shard_get(b, "/api/suggest",
                                 [("prefix", prefix),
                                  ("k", 1_000_000)])["suggestions"],
            shard_urls))
        total: dict = {}
        for p in parts:
            for row in p:
                total[row["term"]] = total.get(row["term"], 0) + row["df"]
        rows = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:kk]
        return [{"term": t, "df": df, "rank": i + 1}
                for i, (t, df) in enumerate(rows)]

    @functools.lru_cache(maxsize=cache_size)
    def cached_search(query: str, kk: int, ranker: str = "bm25"):
        # ranker=ql merges identically to bm25: per-shard QL scores use the
        # GLOBAL collection model (cf_by_term sidecar survives restriction),
        # so every doc's score is bit-identical to the unsharded scorer and
        # the (-score, docid) union merge is exact
        parts = list(pool.map(
            lambda b: _shard_get(b, "/api/search",
                                 [("query", query), ("k", kk),
                                  ("ranker", ranker)])["topk"],
            shard_urls))
        return _merge_topk(parts, "score", kk)

    @functools.lru_cache(maxsize=cache_size)
    def cached_dsl(query: str, kk: int):
        # each shard evaluates the boolean set CLIPPED to its docid range
        # (shard sets partition the global candidate set) and scores with
        # global stats; the merge must reproduce the DSL ranking order
        # (-round(score, 6), docid) — score_candidates' exact lexsort key
        import numpy as _np

        parts = list(pool.map(
            lambda b: _shard_get(b, "/api/search",
                                 [("query", query), ("k", kk),
                                  ("dsl", 1)])["topk"],
            shard_urls))
        rows = [row for p in parts for row in p]
        if not rows:
            return []
        d = _np.array([r["docid"] for r in rows], dtype=_np.int64)
        s = _np.array([r["score"] for r in rows], dtype=_np.float64)
        order = _np.lexsort((d, -_np.round(s, 6)))[:kk]
        out = []
        for i, j in enumerate(order, 1):
            r = dict(rows[int(j)])
            r["rank"] = i
            out.append(r)
        return out

    @functools.lru_cache(maxsize=cache_size)
    def cached_fix(query: str):
        # the correction is index-only over the UNRESTRICTED dictionary +
        # global dfs, identical on every shard — ask one
        return _shard_get(shard_urls[0], "/api/fix",
                          [("query", query)])["corrected_query"]

    @functools.lru_cache(maxsize=cache_size)
    def cached_count(query: str):
        # exact distributed aggregation: shard match sets partition the
        # global one (docid-range shards, global stats), so counts/sums
        # ADD and the rounded max is the max of shard maxes
        parts = list(pool.map(
            lambda b: _shard_get(b, "/api/search",
                                 [("query", query), ("count", 1)]),
            shard_urls))
        hits = sum(p["total_hits"] for p in parts)
        sum_dl = sum(p["sum_doclen"] for p in parts)
        return {
            "total_hits": hits,
            "max_score_r": max(p["max_score_r"] for p in parts),
            "sum_doclen": sum_dl,
            "avg_doclen": round(sum_dl / hits, 6) if hits else 0.0,
        }

    @functools.lru_cache(maxsize=cache_size)
    def cached_collapse(query: str, field: str, kk: int):
        """Two-phase exact distributed collapse. Phase 1: every shard's
        top-kk collapsed reps — a group in the GLOBAL top-kk has its
        global rep inside some shard's local top-kk (local reps of
        competing groups score <= their global reps, so fewer than kk
        local groups can beat it). Phase 2: the selected groups' counts
        are summed across shards (docid-range shards partition the match
        set). NULL-field reps are singletons (count 1) and skip phase 2."""
        parts = list(pool.map(
            lambda b: _shard_get(b, "/api/search",
                                 [("query", query), ("k", kk),
                                  ("collapse", field)])["topk"],
            shard_urls))
        best: dict = {}
        for p in parts:
            for row in p:
                g = row[field]
                key = g if g is not None else ("\0null", row["docid"])
                cur = best.get(key)
                if cur is None or (-row["score_r"], row["docid"]) \
                        < (-cur["score_r"], cur["docid"]):
                    best[key] = row
        reps = sorted(best.values(),
                      key=lambda r: (-r["score_r"], r["docid"]))[:kk]
        named = [r[field] for r in reps if r[field] is not None]
        counts: dict = {}
        if named:
            # values ride the URL as strings; the shard re-coerces them
            # against the docmeta column type and echoes the SAME string
            # keys back, so non-string fields count correctly
            gp = [("query", query), ("field", field)] + \
                [("value", v) for v in named]
            for part in pool.map(
                    lambda b: _shard_get(b, "/api/group_counts",
                                         gp)["counts"],
                    shard_urls):
                for v, c in part.items():
                    counts[v] = counts.get(v, 0) + c
        out = []
        for i, r in enumerate(reps, 1):
            out.append({"docid": r["docid"], "rank": i,
                        "score_r": r["score_r"], field: r[field],
                        "group_count": (counts.get(str(r[field]), 1)
                                        if r[field] is not None else 1)})
        return out

    @functools.lru_cache(maxsize=cache_size)
    def cached_boost(query: str, field: str, factor: float, kk: int):
        # function-score is per-doc with GLOBAL stats, so the union merge
        # applies verbatim
        parts = list(pool.map(
            lambda b: _shard_get(b, "/api/search",
                                 [("query", query), ("k", kk),
                                  ("boost_field", field),
                                  ("boost_factor", factor)])["topk"],
            shard_urls))
        return _merge_topk(parts, "score_r", kk)

    @functools.lru_cache(maxsize=cache_size)
    def cached_search_after(query: str, kk: int, after: str):
        # the cursor is a GLOBAL sort key (per-shard scores use global
        # statistics and pagination orders by the rounded (score_r, docid)
        # total order), so the SAME cursor is valid on every shard: each
        # shard returns its k rows strictly after the cursor, and the
        # merged cut is exactly the unsharded page — no composite cursor
        # or scroll state needed
        parts = list(pool.map(
            lambda b: _shard_get(b, "/api/search",
                                 [("query", query), ("k", kk),
                                  ("after", after)])["topk"],
            shard_urls))
        rows = _merge_topk(parts, "score_r", kk)
        nxt = (f"{rows[-1]['score_r']},{rows[-1]['docid']}" if rows
               else None)
        return rows, nxt

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):   # noqa: N802
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/api/suggest":
                params = urllib.parse.parse_qs(parsed.query,
                                               keep_blank_values=True)
                prefix = (params.get("prefix") or [""])[0]
                try:
                    kk = int((params.get("k") or [str(k)])[0])
                except ValueError:
                    self._reply(400, {"error": "k must be an integer"})
                    return
                if kk <= 0:
                    self._reply(400, {"error": "k must be positive"})
                    return
                if not prefix:
                    self._reply(400, {"error": "missing prefix parameter"})
                    return
                t0 = time.time()
                try:
                    rows = cached_suggest(prefix, kk)
                except Exception as e:
                    self._reply(*_shard_err(e))
                    return
                self._reply(200, {
                    "prefix": prefix, "k": kk,
                    "n_shards": len(shard_urls),
                    "latency_ms": round((time.time() - t0) * 1000, 3),
                    "suggestions": rows,
                })
                return
            if parsed.path != "/api/search":
                self._reply(404, {"error": "unknown path; use /api/search "
                                           "or /api/suggest"})
                return
            params = urllib.parse.parse_qs(parsed.query,
                                               keep_blank_values=True)
            query = (params.get("query") or [""])[0]
            try:
                kk = int((params.get("k") or [str(k)])[0])
            except ValueError:
                self._reply(400, {"error": "k must be an integer"})
                return
            if kk <= 0:
                self._reply(400, {"error": "k must be positive"})
                return
            if not query:
                self._reply(400, {"error": "missing query parameter"})
                return
            ranker = (params.get("ranker") or ["bm25"])[0]
            if ranker not in ("bm25", "ql"):
                self._reply(400, {"error": "ranker must be bm25 or ql"})
                return
            dsl_f = (params.get("dsl") or ["0"])[0] in ("1", "true")
            fix_f = (params.get("fix") or ["0"])[0] in ("1", "true")
            collapse_f = (params.get("collapse") or [""])[0]
            boost_f = (params.get("boost_field") or [""])[0]
            count_f = (params.get("count") or ["0"])[0] in ("1", "true")
            paginate_f = params.get("after") is not None
            # mirror the single-node server's mutual exclusivity — the
            # fan-out must never silently drop one of two combined modes
            if sum([dsl_f, bool(collapse_f), bool(boost_f), count_f,
                    paginate_f]) > 1:
                self._reply(400, {"error": "dsl/after/collapse/boost_field/"
                                           "count are mutually "
                                           "exclusive"})
                return
            if (dsl_f or collapse_f or boost_f or count_f or paginate_f) \
                    and ranker != "bm25":
                # dsl_f included (same rule as the solo server): otherwise
                # dsl=1&ranker=ql silently drops the requested QL ranking
                self._reply(400, {"error": "dsl/after/collapse/boost_field/"
                                           "count are bm25-only"})
                return
            if fix_f and (dsl_f or ranker != "bm25"):
                self._reply(400, {"error": "fix=1 (did-you-mean) is "
                                           "bm25-only and not available "
                                           "with dsl"})
                return
            corrected = None
            if fix_f:
                try:
                    corrected = cached_fix(query)
                except Exception as e:
                    self._reply(*_shard_err(e))
                    return
                query = corrected
            fix_note = ({"corrected_query": corrected}
                        if corrected is not None else {})
            if fix_f and not query:
                # solo-server parity: a query that corrects to nothing
                # serves an empty page — forwarding query= to shards
                # would 400 there and surface as a bogus 502 here
                self._reply(200, {"query": query, "k": kk,
                                  "n_shards": len(shard_urls),
                                  "ranker": ranker, "latency_ms": 0.0,
                                  "topk": [], **fix_note})
                return
            if dsl_f:
                t0 = time.time()
                try:
                    rows = cached_dsl(query, kk)
                except Exception as e:
                    self._reply(*_shard_err(e))
                    return
                self._reply(200, {
                    "query": query, "k": kk,
                    "n_shards": len(shard_urls), "ranker": "dsl",
                    "latency_ms": round((time.time() - t0) * 1000, 3),
                    "topk": rows,
                })
                return
            if collapse_f or boost_f:
                try:
                    factor = float(
                        (params.get("boost_factor") or ["1.0"])[0])
                except ValueError:
                    self._reply(400, {"error": "boost_factor must be a "
                                               "number"})
                    return
                t0 = time.time()
                try:
                    rows = (cached_collapse(query, collapse_f, kk)
                            if collapse_f else
                            cached_boost(query, boost_f, factor, kk))
                except Exception as e:
                    self._reply(*_shard_err(e))
                    return
                self._reply(200, {
                    "query": query, "k": kk,
                    "n_shards": len(shard_urls),
                    "ranker": ("collapse" if collapse_f
                               else "function_score"),
                    "latency_ms": round((time.time() - t0) * 1000, 3),
                    "topk": rows,
                    **fix_note,
                })
                return
            if count_f:
                t0 = time.time()
                try:
                    stats = cached_count(query)
                except Exception as e:
                    self._reply(*_shard_err(e))
                    return
                self._reply(200, {
                    "query": query, "n_shards": len(shard_urls),
                    "latency_ms": round((time.time() - t0) * 1000, 3),
                    **fix_note, **stats,
                })
                return
            after_vals = params.get("after")
            if after_vals is not None and after_vals[0]:
                # validate here so a malformed cursor is a clean 400, not
                # a 502 wrapping every shard's 400
                try:
                    a_s, a_d = after_vals[0].split(",")
                    float(a_s), int(a_d)
                except ValueError:
                    self._reply(400, {"error": "after must be "
                                               "'score_r,docid' (or empty "
                                               "for page 1)"})
                    return
            t0 = time.time()
            try:
                if after_vals is not None:
                    rows, nxt = cached_search_after(query, kk,
                                                    after_vals[0])
                else:
                    rows = cached_search(query, kk, ranker)
            except Exception as e:   # shard 4xx => 400; down/5xx => 502
                self._reply(*_shard_err(e))
                return
            body = {
                "query": query, "k": kk, "n_shards": len(shard_urls),
                "ranker": ranker,
                "latency_ms": round((time.time() - t0) * 1000, 3),
                "topk": rows,
                **fix_note,
            }
            if after_vals is not None:
                body["next_after"] = nxt
            self._reply(200, body)

    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    httpd.cached_search = cached_search
    return httpd


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", help="index dir (single-shard server)")
    ap.add_argument("--fanout", help="comma-separated shard base URLs "
                    "(multi-shard front end, e.g. "
                    "http://h1:8893,http://h2:8893)")
    ap.add_argument("--port", type=int, default=8893)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--no-sha", action="store_true")
    ap.add_argument("--docid-range", default=None,
                    help="lo:hi — serve only this docid shard")
    args = ap.parse_args(argv)
    if bool(args.index) == bool(args.fanout):
        ap.error("exactly one of --index or --fanout is required")
    if args.fanout:
        urls = [u.strip().rstrip("/") for u in args.fanout.split(",") if u.strip()]
        httpd = make_fanout(urls, args.port, args.k)
        print(json.dumps({"fanout": urls, "port": args.port}))
    else:
        rng = None
        if args.docid_range:
            lo, hi = args.docid_range.split(":")
            rng = (int(lo), int(hi))
        httpd = make_server(args.index, args.port, args.k,
                            with_sha=not args.no_sha, docid_range=rng)
        print(json.dumps({"serving": args.index, "port": args.port,
                          "docid_range": list(rng) if rng else None}))
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
