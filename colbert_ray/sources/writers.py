"""Output writers: parquet sinks + reference-compatible TSV + provenance.

Analog of the reference's Ranking writer (``colbert/data/ranking.py:63-81``:
TSV + ``.meta`` provenance JSON via ``colbert/infra/provenance.py``) and the
collection/queries re-emitters (S8/S9). Parquet is the native sink (one
directory of part files, resumable); TSV is for diffing against reference
tooling.
"""

from __future__ import annotations

import getpass
import json
import os
import socket
import time

import pyarrow as pa
import ray.data

from colbert_ray.stages.manifests import atomic_write_json


def provenance(**extra) -> dict:
    """Provenance record attached to saved artifacts (provenance.py:6-25
    analog — config + environment instead of captured stack traces)."""
    return {
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "unix_time": time.time(),
        "host": socket.gethostname(),
        "user": getpass.getuser(),
        **extra,
    }


def write_ranking_parquet(ds: "ray.data.Dataset", out_dir: str, **meta) -> str:
    """Ranking Dataset -> parquet dir + ``.meta`` JSON. Returns out_dir."""
    ds.write_parquet(out_dir, mode="overwrite")
    atomic_write_json(os.path.join(out_dir, "ranking.meta"), provenance(**meta))
    return out_dir


def write_ranking_tsv(table: pa.Table, path: str, **meta) -> str:
    """Small ranking table -> reference-format TSV ``qid\tdocid\trank\tscore``
    + ``.meta`` (ranking.py:63-81 analog). Driver-side (small results)."""
    cols = [c for c in ("qid", "docid", "rank", "score") if c in table.column_names]
    t = table.select(cols)
    with open(path + ".tmp", "w") as f:
        arrays = [t.column(c).to_pylist() for c in cols]
        for row in zip(*arrays):
            f.write("\t".join(str(v) for v in row) + "\n")
    os.replace(path + ".tmp", path)
    with open(path + ".meta", "w") as f:
        json.dump(provenance(**meta), f, indent=1)
    return path


def write_queries_tsv(table: pa.Table, path: str) -> str:
    """(qid, query) -> TSV (queries.py:84-102 analog)."""
    with open(path + ".tmp", "w") as f:
        for qid, q in zip(table.column("qid").to_pylist(),
                          table.column("query").to_pylist()):
            assert "\t" not in q and "\n" not in q
            f.write(f"{qid}\t{q}\n")
    os.replace(path + ".tmp", path)
    return path
