"""sf1 SEARCH certification — quiet-window query-path walls at 2M docs.

The round-4 sf1 smoke (tools/sf1_smoke.py) certified bounded MEMORY at 2M
files / 2.49B tokens, but its query walls landed in a host throttle window
and were correctly not claimed. This tool measures ONLY the query path —
the expensive fixture + index build are cached on disk and reused (the
build is resumable, so an interrupted prior build continues instead of
restarting) — so it can run inside a short quiet window:

- distributed ``search_table`` over the full 1000-query set,
- warm ``SearchSession`` (actor pool) over the same set,
- sequential loaded-scorer per-query latency (p50/p95/mean over 1000).

Probes host alloc/memcpy bandwidth immediately before and after the timed
region and stamps ``quiet`` so a throttled run can't masquerade as a
certification (BASELINE.md gate: probe > 2 GB/s).

Usage:
    python tools/sf1_search_cert.py                  # 2M files, 32 CPUs
    SF1_N_FILES=200000 python tools/sf1_search_cert.py   # dry run
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _probe() -> dict:
    import numpy as np

    a = np.ones(8 * 1024 * 1024, dtype=np.float64)   # warm 64MB source
    t0 = time.time()
    a.copy()
    memcpy_dt = time.time() - t0
    t0 = time.time()
    np.ones(16 * 1024 * 1024, dtype=np.float64).sum()
    alloc_dt = time.time() - t0
    return {"memcpy_gbps": round(0.064 / max(memcpy_dt, 1e-9), 2),
            "alloc_gbps": round(0.128 / max(alloc_dt, 1e-9), 2)}


def main() -> None:
    n_files = int(os.environ.get("SF1_N_FILES", 2_000_000))
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    root = os.environ.get("SF1_ROOT", "/tmp/colbert_ray_sf1")
    quiet_gbps = float(os.environ.get("GRAFT_QUIET_GBPS", "2"))

    import numpy as np
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from colbert_ray.config import EngineConfig
    from colbert_ray.fixtures import ensure_fixture
    from colbert_ray.pipelines.build import build_index
    from colbert_ray.pipelines.search import SearchSession, search_table
    from colbert_ray.state.index import BM25Scorer

    t0 = time.time()
    corpus_dir, queries_path = ensure_fixture(root, n_files, 1000,
                                              token_scale=4)
    fixture_wall = time.time() - t0

    # ONE cached index, built (or resumed) outside the timed region; the
    # same dir sf1_smoke.py uses at this cpu count, so a prior smoke's
    # index is reused as-is
    index_dir = os.path.join(root, f"index_cpus{num_cpus}")
    t0 = time.time()
    report = build_index(corpus_dir, index_dir,
                         EngineConfig(scorer_concurrency=max(2, num_cpus - 2)))
    build_wall = time.time() - t0
    resumed = not report["phases"]

    queries_t = pq.read_table(queries_path)
    p_before = _probe()

    t0 = time.time()
    ranking = search_table(queries_t, index_dir, k=10, with_sha=False)
    dist_wall = time.time() - t0

    sess = SearchSession(index_dir, k=10, with_sha=False,
                         n_actors=max(2, min(12, num_cpus - 2)))
    sess.search_table(queries_t)          # cold: actors load the mmap
    t0 = time.time()
    sess.search_table(queries_t)
    warm_wall = time.time() - t0
    sess.close()

    scorer = BM25Scorer(index_dir, k=10, with_sha=False)
    texts = queries_t.column("query").to_pylist()
    for q in texts[:50]:
        scorer.score_query(q)             # warm the mmap pages
    lat = []
    for q in texts:
        t1 = time.time()
        scorer.score_query(q)
        lat.append(time.time() - t1)
    p_after = _probe()

    quiet = all(v > quiet_gbps for p in (p_before, p_after)
                for v in p.values())
    out = {
        "metric": "sf1_search_cert",
        "n_files": n_files,
        "num_cpus": num_cpus,
        "fixture_sec": round(fixture_wall, 1),
        "build_sec": round(build_wall, 1),
        "build_resumed": resumed,
        "dist_search_1000q_sec": round(dist_wall, 2),
        "session_warm_1000q_sec": round(warm_wall, 2),
        "query_p50_ms": round(float(np.percentile(lat, 50)) * 1000, 3),
        "query_p95_ms": round(float(np.percentile(lat, 95)) * 1000, 3),
        "query_mean_ms": round(float(np.mean(lat)) * 1000, 3),
        "ranking_rows": ranking.num_rows,
        "probe_before": p_before,
        "probe_after": p_after,
        "quiet": quiet,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
