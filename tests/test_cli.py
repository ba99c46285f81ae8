"""End-to-end tests of the CLI (the `ray job submit` driver surface):
build -> search (stdout TSV) -> resumable job-sharded output -> eval."""

import json
import os

import pyarrow.parquet as pq
import pytest

from colbert_ray.cli import main
from colbert_ray.config import EngineConfig
from colbert_ray.fixtures import ensure_fixture


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_fix"))
    corpus_dir, queries_path = ensure_fixture(root, 200, 10)
    return root, corpus_dir, queries_path


def test_cli_build_search_eval_roundtrip(fix, capsys):
    root, corpus_dir, queries_path = fix
    idx = os.path.join(root, "index")
    cfg = json.dumps({"salt_max_run": 30, "num_term_partitions": 8})
    assert main(["build", "--corpus", corpus_dir, "--index", idx,
                 "--config", cfg]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["metadata"]["n_docs"] == 200

    # rebuild = resume: no phases run
    assert main(["build", "--corpus", corpus_dir, "--index", idx,
                 "--config", cfg]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["phases"] == {}

    # stdout TSV search
    assert main(["search", "--index", idx, "--queries", queries_path,
                 "--k", "3"]) == 0
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines()
             if ln and "\t" in ln]
    assert lines and all(len(ln.split("\t")) == 4 for ln in lines)

    # --strategy bmw is exact: identical TSV to the default strategy
    assert main(["search", "--index", idx, "--queries", queries_path,
                 "--k", "3", "--strategy", "bmw"]) == 0
    lines_bmw = [ln for ln in capsys.readouterr().out.strip().splitlines()
                 if ln and "\t" in ln]
    assert lines_bmw == lines

    # resumable job-sharded parquet output
    out = os.path.join(root, "jobout")
    assert main(["search", "--index", idx, "--queries", queries_path,
                 "--k", "5", "--out", out, "--job-shards", "2"]) == 0
    rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(rep3["ran"]) == [0, 1]
    t = pq.read_table(os.path.join(out, "shard=0", "ranking.parquet"))
    assert t.num_rows > 0

    # eval against a tiny qrels file (first ranked doc of first query)
    qid, docid = lines[0].split("\t")[:2]
    qrels = os.path.join(root, "qrels.tsv")
    with open(qrels, "w") as f:
        f.write(f"{qid}\t0\t{docid}\t1\n")
    ranking_tsv = os.path.join(root, "ranking.tsv")
    with open(ranking_tsv, "w") as f:
        f.write("\n".join(lines) + "\n")
    assert main(["eval", "--ranking", ranking_tsv, "--qrels", qrels]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])[0]
    assert m["mrr@10"] == 1.0

    # the CLI must NOT have shut down the session-scoped Ray
    import ray

    assert ray.is_initialized()


def test_cli_stats(fix, capsys):
    root, corpus_dir, _ = fix
    idx = os.path.join(root, "index")
    if not os.path.exists(os.path.join(idx, "metadata.json")):
        cfg = json.dumps({"salt_max_run": 30, "num_term_partitions": 8})
        main(["build", "--corpus", corpus_dir, "--index", idx,
              "--config", cfg])
        capsys.readouterr()
    assert main(["stats", "--index", idx]) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["n_docs"] == 200
    assert st["serve_artifact_valid"] is True
    assert st["n_segment_files"] > 0
    assert st["build_phase_walls_sec"]["segments"] >= 0


def test_cli_subprocess_job_driver(fix):
    """The literal ``ray job submit`` form: ``python -m colbert_ray.cli``
    in a FRESH process (own Ray session from the environment), with config
    overrides for the round-3 knobs (pfor codec + bmw strategy). The
    subprocess's ranking must byte-match an in-process default-config
    search (both knobs are exact / bytes-only)."""
    import subprocess
    import sys

    root, corpus_dir, queries_path = fix
    idx = os.path.join(root, "index_sub")
    env = dict(os.environ, RAY_ADDRESS="local")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "colbert_ray.cli", "build",
         "--corpus", corpus_dir, "--index", idx,
         "--config", json.dumps({"salt_max_run": 30, "num_term_partitions": 8,
                                 "segment_codec": "pfor"})],
        capture_output=True, text=True, env=env, cwd=repo, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["metadata"]["n_docs"] == 200

    r2 = subprocess.run(
        [sys.executable, "-m", "colbert_ray.cli", "search",
         "--index", idx, "--queries", queries_path, "--k", "3",
         "--strategy", "bmw"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=420)
    assert r2.returncode == 0, r2.stderr[-2000:]
    sub_lines = [ln for ln in r2.stdout.strip().splitlines() if "\t" in ln]

    # in-process reference: default codec + default strategy, same corpus
    from colbert_ray.pipelines.search import search_table
    from colbert_ray.pipelines.build import build_index
    from colbert_ray.sources.readers import read_queries

    ref_idx = os.path.join(root, "index_ref")
    build_index(corpus_dir, ref_idx,
                EngineConfig(salt_max_run=30, num_term_partitions=8))
    t = search_table(read_queries(queries_path), ref_idx, k=3, with_sha=False)
    ref_lines = [f"{r['qid']}\t{r['docid']}\t{r['rank']}\t{r['score']}"
                 for r in t.to_pylist()]
    assert sub_lines == ref_lines


def test_cli_merge(fix, capsys, tmp_path_factory):
    """`merge` subcommand: two half-corpus builds -> merged index whose
    stats equal the full build from test_cli_build_search_eval_roundtrip."""
    import glob

    import pyarrow as pa

    root, corpus_dir, _ = fix
    mroot = str(tmp_path_factory.mktemp("cli_merge"))
    files = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    ha, hb = os.path.join(mroot, "ha"), os.path.join(mroot, "hb")
    os.makedirs(ha)
    os.makedirs(hb)
    pq.write_table(t.slice(0, 80), os.path.join(ha, "a.parquet"))
    pq.write_table(t.slice(80), os.path.join(hb, "b.parquet"))
    cfg = json.dumps({"salt_max_run": 30, "num_term_partitions": 8})
    ia, ib = os.path.join(mroot, "ia"), os.path.join(mroot, "ib")
    assert main(["build", "--corpus", ha, "--index", ia, "--config", cfg]) == 0
    assert main(["build", "--corpus", hb, "--index", ib, "--config", cfg]) == 0
    capsys.readouterr()
    out = os.path.join(mroot, "merged")
    assert main(["merge", "--indexes", f"{ia},{ib}", "--out", out,
                 "--config", cfg]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["metadata"]["n_docs"] == 200
    assert len(rep["merged_from"]) == 2
    # the merged index serves like any index
    assert main(["stats", "--index", out]) == 0


def test_cli_dsl_search(fix, capsys):
    root, corpus_dir, _ = fix
    idx = os.path.join(root, "index")      # built by the roundtrip test
    if not os.path.exists(os.path.join(idx, "metadata.json")):
        cfg = json.dumps({"salt_max_run": 30, "num_term_partitions": 8})
        assert main(["build", "--corpus", corpus_dir, "--index", idx,
                     "--config", cfg]) == 0
        capsys.readouterr()
    # pull a real term from the dictionary
    import glob

    import pyarrow.dataset as pads

    d = pads.dataset(sorted(glob.glob(
        os.path.join(idx, "dictionary", "*.parquet")))).to_table()
    term = d.column("term")[len(d) // 2].as_py()
    qp = os.path.join(root, "dsl_queries.parquet")
    import pyarrow as pa

    pq.write_table(pa.table({
        "qid": pa.array([1], type=pa.int64()),
        "query": pa.array([f"{term} OR doclen>=1"], type=pa.string()),
    }), qp)
    assert main(["search", "--index", idx, "--queries", qp,
                 "--k", "3", "--dsl"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3 and all(ln.startswith("1\t") for ln in out)
