"""Minimal HTTP serving layer over the BM25 engine (T5 serving analog).

The reference serves one endpoint with an LRU query cache
(``/root/reference/server.py:16-47``: Flask + ``functools.lru_cache``);
this is the same surface on the stdlib ``ThreadingHTTPServer`` (Flask is
not in the container):

    GET /api/search?query=...&k=10
    -> {"query": ..., "k": ..., "latency_ms": ..., "topk":
        [{"docid": ..., "rank": ..., "score": ..., "content_sha256": ...}]}

The scorer holds the mmap-opened serve artifact (DecodedIndex fast path),
so startup is milliseconds and concurrent handler threads share one
page-cache copy. On a serving cluster, run one server per docid shard
(``docid_range``) behind any HTTP fan-out and merge by (-score, docid) —
the same topology ``search_sharded`` implements in-engine.

Usage: ``python -m colbert_ray.server --index DIR [--port 8893] [--k 10]``.
"""

from __future__ import annotations

import argparse
import functools
import json
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from colbert_ray.state.index import BM25Scorer


def make_server(index_dir: str, port: int = 8893, k: int = 10,
                with_sha: bool = True, cache_size: int = 1_000_000,
                docid_range: tuple[int, int] | None = None) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``serve_forever()`` to run."""
    scorer = BM25Scorer(index_dir, k=k, with_sha=with_sha,
                        docid_range=docid_range)

    @functools.lru_cache(maxsize=cache_size)   # the reference's query cache
    def cached_search(query: str, kk: int):
        docids, scores, ranks = scorer.score_query(query, k=kk)
        rows = []
        for d, s, r in zip(docids.tolist(), scores.tolist(), ranks.tolist()):
            row = {"docid": d, "rank": r, "score": s}
            if with_sha and scorer.idx.sha256 is not None:
                row["content_sha256"] = scorer.idx.sha256[
                    d - scorer.idx.docid_base]
            rows.append(row)
        return rows

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
            if parsed.path != "/api/search":
                self._reply(404, {"error": "unknown path; use /api/search"})
                return
            params = urllib.parse.parse_qs(parsed.query)
            query = (params.get("query") or [""])[0]
            try:
                kk = int((params.get("k") or [str(k)])[0])
            except ValueError:
                self._reply(400, {"error": "k must be an integer"})
                return
            if not query:
                self._reply(400, {"error": "missing query parameter"})
                return
            t0 = time.time()
            rows = cached_search(query, kk)
            self._reply(200, {
                "query": query, "k": kk,
                "latency_ms": round((time.time() - t0) * 1000, 3),
                "topk": rows,
            })

    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    httpd.cached_search = cached_search   # exposed for tests/cache stats
    return httpd


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True)
    ap.add_argument("--port", type=int, default=8893)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--no-sha", action="store_true")
    args = ap.parse_args(argv)
    httpd = make_server(args.index, args.port, args.k,
                        with_sha=not args.no_sha)
    print(json.dumps({"serving": args.index, "port": args.port}))
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
