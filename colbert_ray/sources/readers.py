"""Input readers mirroring the reference's loader surface (SURVEY.md §2.1).

Reference formats (all TSV/JSONL, ``colbert/evaluation/loaders.py`` +
``colbert/data/*.py``) re-expressed as Ray Data / Arrow sources with the
reference's validation semantics (uniqueness asserts, dedup, rank ordering):

- queries:   ``qid\tquery``                  (loaders.py:15-30, S2)
- queries JSONL: ``{qid, question, ...}``    (queries.py:54-67, S3)
- qrels:     ``qid 0 docid 1``               (loaders.py:33-56, S4)
- rankings:  ``qid\tdocid\trank[\tscore]``   (loaders.py:59-91, S5)
- collection/corpus parquet                  (S1; the engine's native input)

Every reader ALSO accepts parquet (the native format at scale); TSV paths
are for interop with reference tooling. ``cast``-style duck typing
(collection.py:86-97 analog): each accepts a path, a pyarrow Table, or a
Ray Dataset and returns a Ray Dataset.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _cast(src, reader_tsv, schema_cols) -> "ray.data.Dataset":
    import os

    if isinstance(src, ray.data.Dataset):
        return src
    if isinstance(src, pa.Table):
        return ray.data.from_arrow(src)
    if isinstance(src, str) and src.endswith(".parquet"):
        return ray.data.read_parquet(src, columns=schema_cols)
    if isinstance(src, str) and os.path.isdir(src):
        import glob as _glob

        files = sorted(_glob.glob(os.path.join(src, "*.parquet")))
        return ray.data.read_parquet(files, columns=schema_cols)
    return reader_tsv(src)


def read_queries(src) -> "ray.data.Dataset":
    """-> Dataset (qid:int64, query:string[, answers]); asserts qid
    uniqueness (loaders.py:25 analog). A ``.json``/``.jsonl`` path is the
    reference's QA-queries format ``{qid, question, answers}``
    (queries.py:54-67, S3): query text comes from ``question`` and the
    ``answers`` list rides along for downstream EM evaluation (M15)."""

    def from_tsv(path: str) -> "ray.data.Dataset":
        # quote_char=False: queries TSV is RAW tab-separated — a leading
        # '"' is query text (e.g. a boolean-DSL phrase atom), not a CSV
        # quote to strip (queries.py:41-48 reads with plain split('\t'))
        ds = ray.data.read_csv(
            path,
            read_options=__import__("pyarrow.csv", fromlist=["x"]).ReadOptions(
                column_names=["qid", "query"]),
            parse_options=__import__("pyarrow.csv", fromlist=["x"]).ParseOptions(
                delimiter="\t", quote_char=False),
        )
        return ds

    def from_jsonl(path: str) -> "ray.data.Dataset":
        def fix(b: pa.Table) -> pa.Table:
            cols = {"qid": pc.cast(b.column("qid"), pa.int64())}
            src_col = "question" if "question" in b.schema.names else "query"
            cols["query"] = pc.cast(b.column(src_col), pa.string())
            if "answers" in b.schema.names:
                cols["answers"] = b.column("answers")
            return pa.table(cols)

        return ray.data.read_json(path).map_batches(fix, batch_format="pyarrow")

    if isinstance(src, str) and (src.endswith(".json") or src.endswith(".jsonl")):
        ds = from_jsonl(src)
    else:
        ds = _cast(src, from_tsv, ["qid", "query"])
    n = ds.count()
    nu = ds.unique("qid")
    assert len(nu) == n, f"duplicate qids: {n - len(nu)}"
    return ds


def read_qrels(src) -> "ray.data.Dataset":
    """-> Dataset (qid:int64, docid:int64), deduplicated
    (loaders.py:33-56 analog: 4-col TSV ``qid 0 docid rel``)."""

    def from_tsv(path: str) -> "ray.data.Dataset":
        import pyarrow.csv as pcsv

        ds = ray.data.read_csv(
            path,
            read_options=pcsv.ReadOptions(column_names=["qid", "_z", "docid", "_rel"]),
            parse_options=pcsv.ParseOptions(delimiter="\t"),
        )
        return ds.select_columns(["qid", "docid"])

    ds = _cast(src, from_tsv, ["qid", "docid"])
    if set(ds.schema().names) - {"qid", "docid"}:
        ds = ds.select_columns(["qid", "docid"])

    def dedup(g):
        return g.drop_duplicates(["qid", "docid"])

    return ds.groupby("qid").map_groups(dedup, batch_format="pandas")


def read_ranking(src) -> "ray.data.Dataset":
    """-> Dataset (qid, docid, rank[, score]) from TSV or parquet
    (ranking.py:18-22 / loaders.py:59-91 analog, numericize included)."""

    def from_tsv(path: str) -> "ray.data.Dataset":
        import pyarrow.csv as pcsv

        with open(path) as f:
            first = f.readline().rstrip("\n").split("\t")
        names = ["qid", "docid", "rank", "score"][: len(first)]
        return ray.data.read_csv(
            path,
            read_options=pcsv.ReadOptions(column_names=names),
            parse_options=pcsv.ParseOptions(delimiter="\t"),
        )

    return _cast(src, from_tsv, None)


def read_corpus(src, columns=None) -> "ray.data.Dataset":
    """Corpus parquet (input_hint shape) -> Dataset, with column pruning."""
    if isinstance(src, ray.data.Dataset):
        return src
    if isinstance(src, pa.Table):
        return ray.data.from_arrow(src)
    return ray.data.read_parquet(src, columns=columns)


def read_translate_map(src) -> dict[int, int]:
    """Subset-docid -> full-docid sidecar map (TranslateAbleCollection
    analog, collection.py:102-149): small JSON/parquet loaded driver-side
    and broadcast by callers."""
    import json
    import os

    if isinstance(src, dict):
        return {int(k): int(v) for k, v in src.items()}
    if isinstance(src, str) and os.path.exists(src):
        if src.endswith(".json"):
            with open(src) as f:
                return {int(k): int(v) for k, v in json.load(f).items()}
        import pyarrow.parquet as pq

        t = pq.read_table(src)
        return dict(zip(t.column(0).to_pylist(), t.column(1).to_pylist()))
    raise ValueError(f"cannot load translate map from {src!r}")
