#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "files_per_sec": ..., "query_p95_ms": ..., "rankings_sha": ...}

Headline: code-corpus (input_hint shape) index build + 1000-query BM25
search, plus the documents-table pipelines. ``--scaling`` runs the identical
job at N=4 and 4N=16 CPUs in fresh processes on the same input and reports
strong + weak scaling efficiency and rank-identity across levels
(BASELINE.md protocol; see run_scaling docstring for the rationale).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_ROOT = "/tmp/colbert_ray_bench"
N_QUERIES = 1000
K = 10


def _sf() -> float:
    base = os.path.basename(os.path.normpath(SF_DIR))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _rankings_sha(df) -> str:
    df = df.sort_values(["qid", "rank"]).reset_index(drop=True)
    blob = df.assign(score=df["score"].round(9)).to_csv(index=False).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


_QUIET_LOG_YAML = os.path.join(BENCH_ROOT, "ray_data_logging.yaml")


def _quiet_logging_env() -> dict:
    """runtime_env that silences Ray Data's benign INFO chatter and two
    benign WARNINGs in WORKER processes too ("Failed to hash the schemas" —
    schema metadata contains a dict, which only disables an internal dedup
    cache; "produced a RefBundle with a different schema" — aggregate stages
    legitimately change the schema mid-stream). Neither affects results;
    silenced so the bench tail is clean (VERDICT r2 #8)."""
    os.makedirs(BENCH_ROOT, exist_ok=True)
    with open(_QUIET_LOG_YAML, "w") as f:
        f.write(
            "version: 1\n"
            "disable_existing_loggers: false\n"
            "loggers:\n"
            "  ray.data:\n"
            "    level: ERROR\n"
        )
    os.environ["RAY_DATA_LOGGING_CONFIG"] = _QUIET_LOG_YAML
    return {"env_vars": {"RAY_DATA_LOGGING_CONFIG": _QUIET_LOG_YAML}}


def _quiet_ray_data() -> None:
    """Driver-side half of the silencing (see _quiet_logging_env)."""
    import logging

    from ray.data._internal.logging import configure_logging

    configure_logging()
    for name in ("ray.data",
                 "ray.data._internal.execution.streaming_executor",
                 "ray.data._internal.execution.streaming_executor_state",
                 "ray.data._internal.arrow_ops.transform_pyarrow",
                 "ray.data._internal.logging"):
        logging.getLogger(name).setLevel(logging.ERROR)


def _host_probe() -> dict:
    """One-shot host-contention probe recorded in the bench output: this
    shared VM has documented external-throttling windows (BASELINE.md) where
    a pure 64MB memcpy drops from ~16 GB/s to <1 GB/s — the probe lets a
    reader judge whether a bench number came from a quiet or throttled
    window without re-running anything."""
    import numpy as np

    # TWO probes — the host's throttling windows limit page-fault/alloc
    # rate and memory bandwidth INDEPENDENTLY (observed: warm copy at
    # 13 GB/s while a fresh 64MB fault-in ran at 0.01 GB/s). Build walls
    # track the ALLOC probe (builds fault in fresh arrays constantly);
    # warm bandwidth bounds the compute kernels.
    t0 = time.time()
    fresh = np.empty(64 * 1024 * 1024, dtype=np.uint8)
    fresh.copy()                             # first-touch fault-in
    alloc_dt = max(time.time() - t0, 1e-9)
    src = np.zeros(64 * 1024 * 1024, dtype=np.uint8)
    dst = np.zeros(64 * 1024 * 1024, dtype=np.uint8)
    np.copyto(dst, src)                      # warm-up pass
    t0 = time.time()
    np.copyto(dst, src)
    dt = max(time.time() - t0, 1e-9)
    return {"host_memcpy_gbps": round(64 / 1024 / dt, 2),
            "host_alloc_gbps": round(128 / 1024 / alloc_dt, 2)}


# ---- quiet-window self-gating (VERDICT r3 #3) --------------------------
# The host's external-throttling windows made BENCH numbers contradict the
# probe-gated BASELINE protocol (r3: build 67s stamped alloc_gbps=0.07 vs
# 14-18s quiet). The bench now gates itself: probe BEFORE each rep, wait
# (bounded global budget) for a quiet window, prefer quiet reps for the
# headline min, and mark the artifact throttled when no rep landed quiet.
QUIET_GBPS = float(os.environ.get("GRAFT_QUIET_GBPS", "2"))   # BASELINE gate
_QUIET_WAIT = float(os.environ.get("GRAFT_QUIET_WAIT_SEC", "20"))
_QUIET_BUDGET = [float(os.environ.get("GRAFT_QUIET_BUDGET_SEC", "90"))]


def _probe_is_quiet(p: dict) -> bool:
    return (p["host_alloc_gbps"] > QUIET_GBPS
            and p["host_memcpy_gbps"] > QUIET_GBPS)


def _wait_for_quiet() -> tuple[dict, bool]:
    """Probe; while throttled, sleep and re-probe until the shared global
    wait budget runs out. Returns (last probe, landed-in-quiet-window?).
    Windows last hours, so the budget is a bounded best-effort — a still-
    throttled rep runs anyway and is marked."""
    while True:
        p = _host_probe()
        if _probe_is_quiet(p):
            return p, True
        if _QUIET_BUDGET[0] <= 0:
            return p, False
        w = min(_QUIET_WAIT, _QUIET_BUDGET[0])
        time.sleep(w)
        _QUIET_BUDGET[0] -= w


def _gated_reps(reps: int, fn, setup=None) -> tuple[list, list, list]:
    """Run ``fn`` ``reps`` times, each rep gated on a quiet-window probe;
    if NO rep landed quiet, spend one bonus attempt. ``setup`` (e.g. the
    rmtree of the previous rep's index) runs OUTSIDE the timed region so
    walls stay comparable with the pre-r4 protocol numbers. Returns
    (walls, per-rep alloc gbps, per-rep quiet flags)."""
    runs, probes, quiets = [], [], []

    def one_rep():
        p, q = _wait_for_quiet()
        if setup is not None:
            setup()
        t0 = time.time()
        fn()
        runs.append(round(time.time() - t0, 3))
        probes.append(p["host_alloc_gbps"])
        quiets.append(q)
        return q

    for _ in range(reps):
        one_rep()
    if not any(quiets):
        p, q = _wait_for_quiet()
        if q:   # a window opened: one make-up rep
            one_rep()
    return runs, probes, quiets


def _best(runs: list, quiets: list) -> float:
    quiet_runs = [r for r, q in zip(runs, quiets) if q]
    return min(quiet_runs) if quiet_runs else min(runs)


def run_bench() -> dict:
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR", runtime_env=_quiet_logging_env())
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    _quiet_ray_data()

    from colbert_ray.config import EngineConfig
    from colbert_ray.extras import dedup as x_dedup
    from colbert_ray.extras import relational as x_rel
    from colbert_ray.extras import simsearch as x_sim
    from colbert_ray.fixtures import ensure_fixture
    from colbert_ray.pipelines.build import build_index
    from colbert_ray.pipelines.search import search_table
    from colbert_ray.state.index import BM25Scorer

    import ray.data as rd

    sf = _sf()
    # sized so the build is COMPUTE-bound, not phase-overhead-bound (the
    # scaling-efficiency protocol needs real parallel work):
    # sf0.1 -> 200k files x ~860 tokens (~170M tokens, ~1GB corpus).
    # GRAFT_N_FILES overrides (used by the weak-scaling run).
    n_files = int(os.environ.get("GRAFT_N_FILES", max(1000, int(2_000_000 * sf))))
    token_scale = 4
    cfg = EngineConfig(scorer_concurrency=max(2, NUM_CPUS - 2))

    # fixture corpus is cached across runs (generation is NOT benchmarked)
    corpus_dir, queries_path = ensure_fixture(BENCH_ROOT, n_files, N_QUERIES,
                                              token_scale=token_scale)
    # warm the page cache so we measure compute+shuffle, not first disk read
    for f in sorted(os.listdir(corpus_dir)):
        if f.endswith(".parquet"):
            pq.read_table(os.path.join(corpus_dir, f))

    queries_t = pq.read_table(queries_path)
    timings: dict[str, float] = {}
    extras: dict = {}

    # --- headline: code-corpus build (fresh dir, best-of-N) -------------
    # this shared-host VM shows ±30-100% wall noise run to run; min-of-N is
    # the standard noisy-host estimator (all runs reported in build_runs)
    reps = int(os.environ.get("GRAFT_BUILD_REPS", "2"))
    idx = os.path.join(BENCH_ROOT, f"index_cpus{NUM_CPUS}")

    build_runs, build_probes, build_quiet = _gated_reps(
        reps, lambda: build_index(corpus_dir, idx, cfg),
        setup=lambda: shutil.rmtree(idx, ignore_errors=True))
    timings["code_build"] = _best(build_runs, build_quiet)
    extras["build_runs"] = build_runs
    extras["build_rep_alloc_gbps"] = build_probes
    extras["build_rep_quiet"] = build_quiet
    extras["files_per_sec"] = round(n_files / timings["code_build"], 1)

    # --- headline: 1000-query batch search (best-of-N) ------------------
    # scoring is ~3ms/query: a modest pool finishes the work long before a
    # 30-actor pool finishes STARTING (actor init dominates at this scale)
    last_res = {}

    def _one_search():
        last_res["res"] = search_table(
            queries_t, idx, k=K, with_sha=False,
            concurrency=max(2, min(12, NUM_CPUS - 2)))

    search_runs, _sp, search_quiet = _gated_reps(reps, _one_search)
    timings["code_search1000"] = _best(search_runs, search_quiet)
    extras["search_runs"] = search_runs
    extras["search_rep_quiet"] = search_quiet
    # the artifact is throttled if EITHER headline number has no quiet rep
    # (the shared wait budget can run out between the build and search loops)
    extras["throttled"] = not (any(build_quiet) and any(search_quiet))
    extras["rankings_sha"] = _rankings_sha(last_res["res"].to_pandas())

    # persistent-session serving: spawn cost paid once (Searcher analog)
    from colbert_ray.pipelines.search import SearchSession

    t0 = time.time()
    sess = SearchSession(idx, k=K, with_sha=False,
                         n_actors=max(2, min(12, NUM_CPUS - 2)))
    sess.search_table(queries_t)
    timings["code_search1000_session_cold"] = round(time.time() - t0, 3)
    t0 = time.time()
    res_warm = sess.search_table(queries_t)
    timings["code_search1000_session_warm"] = round(time.time() - t0, 3)
    assert _rankings_sha(res_warm.to_pandas()) == extras["rankings_sha"]
    sess.close()

    # --- block-max pruning micro-bench ---------------------------------
    # the headline fixture's tiny vocabulary (every term ultra-common)
    # bails MaxScore to the dense path by design; this corpus has the
    # realistic shape (2000-term Zipf vocabulary + per-file identifiers)
    # where two-stage pruning pays. Queries mix selective medium-df terms
    # with common ones. Corpus AND index are cached across runs (resume
    # makes the rebuild a no-op); only query latency is measured.
    prune_idx = os.path.join(BENCH_ROOT, "prune_corpus", "index")
    prune_corpus = os.path.join(BENCH_ROOT, "prune_corpus", "docs.parquet")
    if not os.path.exists(prune_corpus):
        import pyarrow as pa

        rng = np.random.default_rng(4242)
        v_sz = 2000
        vocab = np.array([f"w{i}" for i in range(v_sz)], dtype=object)
        zipf_p = 1.0 / np.arange(1, v_sz + 1) ** 1.1
        zipf_p /= zipf_p.sum()
        draws = rng.choice(v_sz, size=(60_000, 60), p=zipf_p)
        texts = [
            " ".join(vocab[row]) + " "
            + " ".join(f"id{i}x{j}" for j in range(4))
            for i, row in enumerate(draws)
        ]
        os.makedirs(os.path.dirname(prune_corpus), exist_ok=True)
        pq.write_table(pa.table({
            "repo": pa.array(["r"] * len(texts)),
            "path": pa.array([f"{i:06d}.py" for i in range(len(texts))]),
            "commit": pa.array(["c"] * len(texts)),
            "lang": pa.array(["py"] * len(texts)),
            "content": pa.array(texts),
        }), prune_corpus)
    build_index(prune_corpus, prune_idx, cfg)   # resume: no-op when cached
    rng = np.random.default_rng(99)
    prune_queries = [
        f"w{int(rng.integers(800, 2000))} w{int(rng.integers(800, 2000))}"
        f" w{int(rng.integers(3, 40))} w{int(rng.integers(3, 40))}"
        for _ in range(200)
    ]
    lat = {}
    for mode in ("maxscore", "bmw", "off"):
        sc = BM25Scorer(prune_idx, k=K, with_sha=False,
                        prune=(mode != "off"),
                        prune_strategy=mode if mode != "off" else None)
        for q in prune_queries[:20]:
            sc.score_query(q)
        t0 = time.time()
        for q in prune_queries:
            sc.score_query(q)
        lat[mode] = (time.time() - t0) / len(prune_queries)
        if mode == "maxscore":
            extras["prune_blocks_skipped"] = sc.stats["blocks_skipped"]
        elif mode == "bmw":
            extras["bmw_regions_skipped"] = sc.stats["bmw_regions_skipped"]
    extras["prune_query_mean_ms"] = round(lat["maxscore"] * 1000, 3)
    extras["bmw_query_mean_ms"] = round(lat["bmw"] * 1000, 3)
    extras["noprune_query_mean_ms"] = round(lat["off"] * 1000, 3)
    extras["prune_speedup"] = round(lat["off"] / max(lat["maxscore"], 1e-9), 2)
    extras["bmw_speedup"] = round(lat["off"] / max(lat["bmw"], 1e-9), 2)

    # --- single-query p95 latency (loaded scorer, sequential) ----------
    scorer = BM25Scorer(idx, k=K, with_sha=False)
    texts = queries_t.column("query").to_pylist()[:200]
    lat = []
    for q in texts:
        t0 = time.time()
        scorer.score_query(q)
        lat.append(time.time() - t0)
    extras["query_p95_ms"] = round(float(np.percentile(lat, 95)) * 1000, 3)
    extras["query_mean_ms"] = round(float(np.mean(lat)) * 1000, 3)

    # --- documents-table pipelines --------------------------------------
    doc_path = os.path.join(SF_DIR, "documents.parquet")
    if os.environ.get("GRAFT_BUILD_ONLY"):
        doc_path = ""                      # scaling runs: headline job only
    if doc_path and os.path.exists(doc_path):
        docs_idx = os.path.join(BENCH_ROOT, f"docs_index_cpus{NUM_CPUS}")
        shutil.rmtree(docs_idx, ignore_errors=True)
        t0 = time.time()
        build_index(doc_path, docs_idx, cfg, content_col="text", key_cols=(),
                    meta_cols=("lang", "source"), docid_col="doc_id")
        import __ray_entry__ as entrymod

        import pyarrow as pa

        qt = pa.table(
            {"qid": pa.array([q for q, _ in entrymod.QUERY_SET], type=pa.int64()),
             "query": pa.array([t for _, t in entrymod.QUERY_SET], type=pa.string())}
        )
        search_table(qt, docs_idx, k=10, with_sha=False)
        timings["docs_bm25_e2e"] = round(time.time() - t0, 3)

        t0 = time.time()
        x_dedup.minhash_lsh_pairs(
            rd.read_parquet(doc_path, columns=["doc_id", "text"])
        ).to_pandas()
        timings["minhash_dedup"] = round(time.time() - t0, 3)

        # round-5 dedup additions at scale: SimHash pair mining via the
        # exact pigeonhole Hamming banding, and MOSS winnowing clone pairs
        t0 = time.time()
        x_dedup.simhash_dup_pairs(
            rd.read_parquet(doc_path, columns=["doc_id", "text"]))
        timings["simhash_dedup"] = round(time.time() - t0, 3)
        t0 = time.time()
        x_dedup.code_clone_pairs(
            rd.read_parquet(doc_path, columns=["doc_id", "text"]))
        timings["clone_pairs"] = round(time.time() - t0, 3)

        emb_path = os.path.join(SF_DIR, "embeddings.parquet")
        et = pq.read_table(emb_path, columns=["vec_id", "embedding"])
        qv = np.stack([np.asarray(v, dtype=np.float64)
                       for v in et.column("embedding").to_pylist()[:16]])
        # use the rows' ACTUAL vec_ids so exclude_self excludes the right
        # vectors even if the file isn't written in vec_id order
        qids = et.column("vec_id").to_numpy(
            zero_copy_only=False)[:16].astype(np.int64)
        t0 = time.time()
        x_sim.knn_cosine(rd.read_parquet(emb_path), qv, qids, k=10).to_pandas()
        timings["knn_cosine"] = round(time.time() - t0, 3)

        t0 = time.time()
        x_rel.pricing_summary(
            rd.read_parquet(os.path.join(SF_DIR, "lineitem.parquet"),
                            columns=["l_returnflag", "l_linestatus", "l_quantity",
                                     "l_extendedprice", "l_discount"])
        ).to_pandas()
        timings["pricing_summary"] = round(time.time() - t0, 3)

        t0 = time.time()
        x_rel.events_hourly_window(
            rd.read_parquet(os.path.join(SF_DIR, "events.parquet"),
                            columns=["user_id", "ts", "value"])
        ).to_pandas()
        timings["events_hourly"] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "colbert_ray_bench_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "n_code_files": n_files,
        **_host_probe(),
        **extras,
    }


def _run_once(n_cpus: int, n_files: int | None = None) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(n_cpus), GRAFT_BUILD_ONLY="1")
    if n_files is not None:
        env["GRAFT_N_FILES"] = str(n_files)
    out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                         capture_output=True, text=True, check=True,
                         cwd=os.path.dirname(os.path.abspath(__file__))).stdout
    return json.loads(out.strip().splitlines()[-1])


def run_scaling():
    """Same job at N and 4N parallelism in fresh processes (north_rule
    protocol), N=4.

    Reports BOTH:
    - strong scaling: identical corpus at 4 and 16 CPUs (a real 4x cluster
      adds a memory bus + disk per node; a single box shares them, so 16->32
      core-scaling here saturates memory bandwidth — we measure below that
      ceiling and the rank-identity across levels which is the correctness
      half of the criterion);
    - weak scaling: quarter corpus at 4 CPUs vs full corpus at 16 CPUs
      (constant work per core — the model that matches 'bigger cluster,
      bigger data' at 10^12-file scale).
    """
    lo, hi = 4, 16
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "1"))

    def best(n_cpus, n_files=None):
        # best-of-N: this VM shows +-30% run-to-run noise (shared host);
        # min wall per configuration is the standard noisy-host estimator.
        # Runs whose every rep hit a throttle window are excluded when any
        # quiet run exists (each child is itself quiet-gated).
        runs = [_run_once(n_cpus, n_files) for _ in range(reps)]
        pool = [r for r in runs if not r.get("throttled")] or runs
        return min(pool, key=lambda r: r["queries"]["code_build"])

    r_lo = best(lo)
    r_hi = best(hi)
    small = best(lo, n_files=r_lo["n_code_files"] // 4)
    strong = (r_hi["files_per_sec"] / r_lo["files_per_sec"]) / (hi / lo)
    weak = small["queries"]["code_build"] / r_hi["queries"]["code_build"]
    print(json.dumps({
        "metric": "scaling_efficiency_build_throughput",
        "cpus": [lo, hi],
        "files_per_sec_lo": r_lo["files_per_sec"],
        "files_per_sec_hi": r_hi["files_per_sec"],
        "build_sec_lo": r_lo["queries"]["code_build"],
        "build_sec_hi": r_hi["queries"]["code_build"],
        "strong_scaling_efficiency": round(strong, 3),
        # T(quarter corpus @ 4 cpus) / T(full corpus @ 16 cpus):
        # 1.0 = perfect weak scaling; >1 = better than linear
        "weak_scaling_efficiency": round(weak, 3),
        "weak_build_sec_quarter_at_lo": small["queries"]["code_build"],
        "rank_identical_across_levels":
            r_lo["rankings_sha"] == r_hi["rankings_sha"],
        "rankings_sha_lo": r_lo["rankings_sha"],
        "rankings_sha_hi": r_hi["rankings_sha"],
        "query_p95_ms_hi": r_hi["query_p95_ms"],
        "throttled": any(r.get("throttled") for r in (r_lo, r_hi, small)),
        **_host_probe(),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
