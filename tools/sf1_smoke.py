"""sf1 scale smoke test — 2M-file build + 1000-query search.

Certifies the build's bounded-memory claims (E2 chunking via
``max_encode_postings``, two-pass serve artifact, SPIMI spill) at 10x the
bench scale (sf0.1 = 200k files). Samples peak RSS of every Ray worker task
and of the driver from /proc while the build runs, and prints one JSON line
with per-phase walls + peaks; the numbers are recorded in BASELINE.md.

Usage:
    python tools/sf1_smoke.py            # 2M files, 32 CPUs
    SF1_N_FILES=200000 python tools/sf1_smoke.py   # cheaper dry run

The corpus fixture is cached under SF1_ROOT (default /tmp/colbert_ray_sf1)
and generation time is reported separately (not part of the build wall).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PAGE = os.sysconf("SC_PAGE_SIZE")


class RssSampler(threading.Thread):
    """Samples resident set size of the driver and every `ray::` worker
    process twice a second; keeps the overall per-process peak and a coarse
    timeline so peaks can be aligned with build phases afterwards."""

    def __init__(self):
        super().__init__(daemon=True)
        self._halt = threading.Event()
        self.peak_task_gb = 0.0
        self.peak_task_cmd = ""
        self.peak_driver_gb = 0.0
        self.timeline: list[tuple[float, float]] = []  # (epoch, max task GB now)
        self._driver_pid = os.getpid()

    def _rss_gb(self, pid: str) -> float:
        with open(f"/proc/{pid}/statm") as f:
            return int(f.read().split()[1]) * _PAGE / 1e9

    def run(self):
        while not self._halt.is_set():
            now_max = 0.0
            for pid in os.listdir("/proc"):
                if not pid.isdigit():
                    continue
                try:
                    with open(f"/proc/{pid}/cmdline", "rb") as f:
                        cmd = f.read()
                    if b"ray::" not in cmd:
                        continue
                    rss = self._rss_gb(pid)
                except OSError:
                    continue
                now_max = max(now_max, rss)
                if rss > self.peak_task_gb:
                    self.peak_task_gb = rss
                    self.peak_task_cmd = cmd.split(b"\0")[0].decode(errors="replace")[:100]
            try:
                self.peak_driver_gb = max(self.peak_driver_gb,
                                          self._rss_gb(str(self._driver_pid)))
            except OSError:
                pass
            self.timeline.append((time.time(), round(now_max, 3)))
            self._halt.wait(0.5)

    def stop(self):
        # NB: attribute must not be named _stop - Thread.join() calls the
        # private Thread._stop() internally and an Event there breaks join
        self._halt.set()
        self.join()


def main() -> None:
    n_files = int(os.environ.get("SF1_N_FILES", 2_000_000))
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    budget_gb = float(os.environ.get("SF1_RSS_BUDGET_GB", 12.0))
    root = os.environ.get("SF1_ROOT", "/tmp/colbert_ray_sf1")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from colbert_ray.config import EngineConfig
    from colbert_ray.fixtures import ensure_fixture
    from colbert_ray.pipelines.build import build_index
    from colbert_ray.pipelines.search import search_table

    t0 = time.time()
    corpus_dir, queries_path = ensure_fixture(root, n_files, 1000, token_scale=4)
    fixture_wall = time.time() - t0

    index_dir = os.path.join(root, f"index_cpus{num_cpus}")
    shutil.rmtree(index_dir, ignore_errors=True)

    sampler = RssSampler()
    sampler.start()
    t0 = time.time()
    cfg = EngineConfig(scorer_concurrency=max(2, num_cpus - 2))
    report = build_index(corpus_dir, index_dir, cfg)
    build_wall = time.time() - t0
    build_peak_gb = sampler.peak_task_gb

    queries_t = pq.read_table(queries_path)
    t0 = time.time()
    ranking = search_table(queries_t, index_dir, k=10, with_sha=False)
    search_wall = time.time() - t0
    sampler.stop()

    meta = report.get("metadata", {})
    phases = {k: round(v, 2) for k, v in report["phases"].items()
              if isinstance(v, (int, float))}
    out = {
        "metric": "sf1_scale_smoke",
        "n_files": n_files,
        "num_cpus": num_cpus,
        "fixture_gen_sec": round(fixture_wall, 1),
        "build_sec": round(build_wall, 2),
        "files_per_sec": round(n_files / build_wall, 1),
        "phases_sec": phases,
        "total_tokens": meta.get("total_tokens"),
        "n_terms": meta.get("n_terms"),
        "n_segments": meta.get("num_partitions_effective",
                               meta.get("num_term_partitions")),
        "search_1000q_sec": round(search_wall, 2),
        "ranking_rows": ranking.num_rows,
        "peak_task_rss_gb": round(build_peak_gb, 2),
        "peak_task_cmd": sampler.peak_task_cmd,
        "peak_driver_rss_gb": round(sampler.peak_driver_gb, 2),
        "rss_budget_gb": budget_gb,
        "within_budget": build_peak_gb <= budget_gb,
    }
    print(json.dumps(out))
    if not out["within_budget"]:
        sys.exit(1)
    ray.shutdown()


if __name__ == "__main__":
    main()
