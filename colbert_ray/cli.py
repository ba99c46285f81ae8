"""CLI entry points — the ``ray job submit`` surface.

    python -m colbert_ray.cli build  --corpus DIR --index DIR [--docid-col COL ...]
    python -m colbert_ray.cli search --index DIR --queries PATH [--k 10] [--out DIR]
    python -m colbert_ray.cli eval   --ranking DIR --qrels PATH
    python -m colbert_ray.cli compact --index DIR
    python -m colbert_ray.cli merge  --indexes DIR1,DIR2[,...] --out DIR
    python -m colbert_ray.cli suggest --index DIR --prefix PRE [--k 10]
    python -m colbert_ray.cli serve  --index DIR [--port 8893]

On a cluster this module is the job driver:
``ray job submit -- python -m colbert_ray.cli build ...`` — ``ray.init()``
here connects to the cluster it runs on (address from the environment); in
the sandbox it starts local mode. The driver-side smoke path
(`__ray_entry__`) never goes through here, so its no-ray.init contract holds.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray() -> bool:
    """Init Ray if nobody has; returns True iff WE started the session (the
    CLI only shuts down a session it owns — calling main() from a process
    that already holds a Ray session must not tear it down)."""
    import ray

    started = False
    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")
        started = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return started


def _index_stats(index_dir: str) -> dict:
    """Filesystem-only index summary: metadata, per-phase lineage, segment
    layout, serve-artifact state, pending deltas/tombstones."""
    import glob
    import os

    from colbert_ray.state.serve import _segment_files

    with open(os.path.join(index_dir, "metadata.json")) as f:
        meta = json.load(f)
    seg_files = _segment_files(index_dir)
    phases = {}
    for mf in sorted(glob.glob(os.path.join(index_dir, "_manifest_*.json"))):
        with open(mf) as f:
            m = json.load(f)
        phases[m.get("phase", os.path.basename(mf))] = round(
            m.get("wall_sec", 0.0), 3)
    deltas = sorted(glob.glob(os.path.join(index_dir, "deltas", "delta_*")))
    tomb_path = os.path.join(index_dir, "tombstones.json")
    n_tomb = 0
    if os.path.exists(tomb_path):
        with open(tomb_path) as f:
            n_tomb = len(json.load(f))
    from colbert_ray.state.serve import serve_valid

    return {
        "n_docs": meta["n_docs"],
        "n_terms": meta["n_terms"],
        "n_postings": meta["n_postings"],
        "total_tokens": meta["total_tokens"],
        "avgdl": meta["avgdl"],
        "segment_codec": meta["config"].get("segment_codec", "varint"),
        "semantic_hash": meta["semantic_hash"],
        "inputs_hash": meta["inputs_hash"],
        "n_segment_files": len(seg_files),
        "segment_bytes": sum(os.path.getsize(f) for f in seg_files),
        "serve_artifact_valid": serve_valid(index_dir),
        "n_pending_deltas": len(deltas),
        "n_tombstones": n_tomb,
        "build_phase_walls_sec": phases,
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="colbert_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an index")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--content-col", default="content")
    b.add_argument("--key-cols", default="repo,path")
    b.add_argument("--meta-cols", default="commit,lang")
    b.add_argument("--docid-col", default=None)
    b.add_argument("--config", default=None, help="JSON dict of EngineConfig overrides")

    s = sub.add_parser("search", help="batch top-k search")
    s.add_argument("--index", required=True)
    s.add_argument("--queries", required=True, help="parquet/TSV of (qid, query)")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--out", default=None, help="output parquet dir (default: stdout TSV)")
    s.add_argument("--shards", type=int, default=1)
    s.add_argument("--job-shards", type=int, default=0,
                   help="resumable qid-sharded output: out/shard=i/ + manifests")
    s.add_argument("--ranker", choices=("bm25", "ql"), default="bm25",
                   help="scoring model over the same index (ql = Dirichlet "
                        "query likelihood; plain search paths only)")
    s.add_argument("--strategy", choices=("maxscore", "bmw"), default=None,
                   help="exact pruning algorithm (default: index config)")
    s.add_argument("--dsl", action="store_true",
                   help="treat each query as a boolean-DSL expression "
                        "(AND/OR/NOT, \"phrases\", wildcards, field: and "
                        "range atoms; see pipelines/querylang)")
    s.add_argument("--corpus", default=None,
                   help="corpus parquet dir (needed only for DSL phrase "
                        "atoms, which re-verify against the text)")

    pc_ = sub.add_parser("percolate", help="stream documents against "
                                           "STORED boolean queries "
                                           "(reverse search)")
    pc_.add_argument("--queries", required=True,
                     help="parquet/TSV of (qid, query) boolean-DSL rows")
    pc_.add_argument("--docs", required=True, help="documents parquet")
    pc_.add_argument("--text-col", default="text")
    pc_.add_argument("--id-col", default="doc_id")
    pc_.add_argument("--fields", default="",
                     help="comma-separated metadata columns usable in "
                          "field:/range atoms")
    pc_.add_argument("--out", default=None,
                     help="output parquet dir (default: stdout TSV)")
    pc_.add_argument("--config", default=None,
                     help="JSON dict of EngineConfig overrides")

    e = sub.add_parser("eval", help="MRR/recall/success of a ranking vs qrels")
    e.add_argument("--ranking", required=True)
    e.add_argument("--qrels", required=True)

    c = sub.add_parser("compact", help="coalesce segments into one file")
    c.add_argument("--index", required=True)

    mg = sub.add_parser("merge", help="merge complete sub-indexes into one "
                                      "(global stats refresh; == union build)")
    mg.add_argument("--indexes", required=True,
                    help="comma-separated sub-index dirs (>= 2)")
    mg.add_argument("--out", required=True)
    mg.add_argument("--config", default=None,
                    help="JSON dict of EngineConfig overrides (tokenizer "
                         "fields must match the sub-indexes)")

    st = sub.add_parser("stats", help="index introspection (no Ray session)")
    st.add_argument("--index", required=True)

    sg = sub.add_parser("suggest", help="prefix autocompletion over the "
                                        "dictionary (no Ray session)")
    sg.add_argument("--index", required=True)
    sg.add_argument("--prefix", required=True)
    sg.add_argument("--k", type=int, default=10)

    sn = sub.add_parser("snapshot", help="snapshot a quiesced index "
                                         "(hardlink + sha256 manifest; "
                                         "no Ray session)")
    sn.add_argument("--index", required=True)
    sn.add_argument("--out", required=True, help="snapshot directory "
                                                 "(must not exist)")

    rs = sub.add_parser("restore", help="restore an index from a snapshot "
                                        "(verifies sha256; no Ray session)")
    rs.add_argument("--snapshot", required=True)
    rs.add_argument("--out", required=True, help="restore directory "
                                                 "(must not exist)")
    rs.add_argument("--no-verify", action="store_true")

    al = sub.add_parser("alias", help="index alias registry: atomic "
                                      "blue/green cutover (no Ray session)")
    al.add_argument("--registry", required=True)
    al.add_argument("--set", dest="set_", metavar="NAME=INDEX_DIR",
                    default=None)
    al.add_argument("--drop", default=None, metavar="NAME")
    al.add_argument("--resolve", default=None, metavar="NAME")

    v = sub.add_parser("serve", help="HTTP search endpoint (see colbert_ray.server)")
    v.add_argument("--index", default=None)
    v.add_argument("--fanout", default=None,
                   help="comma-separated shard base URLs (front end mode)")
    v.add_argument("--docid-range", default=None, help="lo:hi docid shard")
    v.add_argument("--port", type=int, default=8893)
    v.add_argument("--k", type=int, default=10)
    v.add_argument("--no-sha", action="store_true")

    args = p.parse_args(argv)
    if args.cmd == "serve":
        # serving needs no Ray session: the scorer mmap-opens the artifact
        from colbert_ray.server import main as serve_main

        argv2 = ["--port", str(args.port), "--k", str(args.k)]
        if args.fanout:
            argv2 += ["--fanout", args.fanout]
        if args.index:
            argv2 += ["--index", args.index]
        if args.docid_range:
            argv2 += ["--docid-range", args.docid_range]
        if args.no_sha:
            argv2 += ["--no-sha"]
        return serve_main(argv2)
    if args.cmd == "stats":
        # pure filesystem introspection — no Ray session
        print(json.dumps(_index_stats(args.index), indent=1, sort_keys=True))
        return 0
    if args.cmd == "alias":
        from colbert_ray.state.aliases import (
            drop_alias,
            list_aliases,
            resolve,
            set_alias,
        )

        if args.set_:
            name, _, target = args.set_.partition("=")
            print(json.dumps(set_alias(args.registry, name, target)))
        elif args.drop:
            print(json.dumps(drop_alias(args.registry, args.drop)))
        elif args.resolve:
            print(resolve(args.registry, args.resolve))
        else:
            print(json.dumps(list_aliases(args.registry)))
        return 0
    if args.cmd == "snapshot":
        # pure filesystem operation — no Ray session
        from colbert_ray.state.snapshot import snapshot_index

        m = snapshot_index(args.index, args.out)
        print(json.dumps({"snapshot": args.out,
                          "n_files": m["n_files"]}))
        return 0
    if args.cmd == "restore":
        from colbert_ray.state.snapshot import restore_index

        m = restore_index(args.snapshot, args.out,
                          verify=not args.no_verify)
        print(json.dumps({"restored": args.out, "n_files": m["n_files"],
                          "verified": not args.no_verify}))
        return 0
    if args.cmd == "suggest":
        # mmap dictionary probe — no Ray session
        from colbert_ray.pipelines.phrase import suggest_terms

        for row in suggest_terms(args.index, args.prefix,
                                 k=args.k).to_pylist():
            print(f"{row['rank']}\t{row['term']}\t{row['df']}")
        return 0
    started_ray = _ensure_ray()

    from colbert_ray.config import EngineConfig

    if args.cmd == "build":
        from colbert_ray.pipelines.build import build_index

        cfg = EngineConfig().merged(**json.loads(args.config)) if args.config \
            else EngineConfig()
        report = build_index(
            args.corpus, args.index, cfg,
            content_col=args.content_col,
            key_cols=tuple(x for x in args.key_cols.split(",") if x),
            meta_cols=tuple(x for x in args.meta_cols.split(",") if x),
            docid_col=args.docid_col,
        )
        print(json.dumps({"metadata": report["metadata"],
                          "phases": {k: round(v, 2) for k, v in
                                     report["phases"].items()
                                     if isinstance(v, (int, float))}}))
    elif args.cmd == "search":
        from colbert_ray.pipelines.search import search, search_sharded, search_table
        from colbert_ray.sources.readers import read_queries
        from colbert_ray.sources.writers import write_ranking_parquet

        if args.job_shards and not args.out:
            p.error("--job-shards requires --out (sharded resumable output "
                    "is written as parquet under --out)")
        if args.ranker != "bm25" and (args.shards > 1 or args.job_shards):
            p.error("--ranker ql is only supported on the plain search "
                    "paths (docid-range shards would make cf shard-local)")
        queries = read_queries(args.queries)
        if args.dsl and (args.out or args.job_shards or args.shards > 1
                         or args.ranker != "bm25"):
            p.error("--dsl prints TSV to stdout only; it does not combine "
                    "with --out/--job-shards/--shards/--ranker")
        if args.dsl:
            import ray as _ray

            from colbert_ray.pipelines.querylang import dsl_search

            corpus = (_ray.data.read_parquet(args.corpus)
                      if args.corpus else None)
            for row in queries.take_all():
                t = dsl_search(args.index, corpus, row["query"], k=args.k)
                for r in t.to_pylist():
                    print(f"{row['qid']}\t{r['docid']}\t{r['rank']}"
                          f"\t{r['score']}")
            if started_ray:
                import ray

                ray.shutdown()
            return 0
        if args.out and args.job_shards:
            from colbert_ray.pipelines.search import search_job

            rep = search_job(queries, args.index, args.out, k=args.k,
                             n_shards=args.job_shards,
                             prune_strategy=args.strategy)
            print(json.dumps(rep))
        elif args.out:
            ds = (search_sharded(queries, args.index, k=args.k,
                                 n_shards=args.shards,
                                 prune_strategy=args.strategy)
                  if args.shards > 1
                  else search(queries, args.index, k=args.k,
                              prune_strategy=args.strategy,
                              ranker=args.ranker))
            write_ranking_parquet(ds, args.out, k=args.k, index=args.index)
            print(json.dumps({"out": args.out}))
        else:
            t = search_table(queries, args.index, k=args.k, with_sha=False,
                             prune_strategy=args.strategy,
                             ranker=args.ranker)
            for row in t.to_pylist():
                print(f"{row['qid']}\t{row['docid']}\t{row['rank']}\t{row['score']}")
    elif args.cmd == "percolate":
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data

        from colbert_ray.pipelines.percolate import percolate
        from colbert_ray.sources.readers import read_queries

        qt = pa.Table.from_pandas(read_queries(args.queries).to_pandas(),
                                  preserve_index=False)
        stored = list(zip(qt.column("qid").to_pylist(),
                          qt.column("query").to_pylist()))
        cfg = EngineConfig().merged(**json.loads(args.config)) if args.config \
            else EngineConfig()
        out = percolate(
            ray.data.read_parquet(args.docs), stored, cfg,
            text_col=args.text_col, id_col=args.id_col,
            fields=tuple(x for x in args.fields.split(",") if x))
        if args.out:
            out.write_parquet(args.out)
            print(json.dumps({"out": args.out}))
        else:
            t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
            if t.num_rows:
                t = t.take(pc.sort_indices(
                    t, sort_keys=[("query_id", "ascending"),
                                  ("doc_id", "ascending")]))
            for row in t.to_pylist():
                print(f"{row['query_id']}\t{row['doc_id']}")
    elif args.cmd == "eval":
        from colbert_ray.pipelines.evaluate import ranking_metrics
        from colbert_ray.sources.readers import read_qrels, read_ranking

        m = ranking_metrics(read_ranking(args.ranking), read_qrels(args.qrels))
        print(m.to_json(orient="records"))
    elif args.cmd == "compact":
        from colbert_ray.stages.compact import coalesce_segments

        dest = coalesce_segments(args.index)
        print(json.dumps({"coalesced": dest}))
    elif args.cmd == "merge":
        from colbert_ray.pipelines.merge import merge_indexes

        cfg = EngineConfig().merged(**json.loads(args.config)) if args.config \
            else None
        report = merge_indexes(
            [d for d in args.indexes.split(",") if d], args.out, cfg)
        print(json.dumps({"metadata": report["metadata"],
                          "merged_from": report["merged_from"],
                          "phases": {k: round(v, 2) for k, v in
                                     report["phases"].items()
                                     if isinstance(v, (int, float))}}))
    if started_ray:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
