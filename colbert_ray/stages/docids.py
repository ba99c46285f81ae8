"""Deterministic global-rank assignment after a distributed sort.

Analog of the reference's chunk-offset prefix-sum during finalize
(``collection_indexer.py:412-436``: per-chunk counts -> sequential
passage/embedding offsets) and of its pid = line-index convention
(``loaders.py:164``): here docid = rank of (repo, path) under a global sort,
and term_id = rank of term under a global sort — both independent of
parallelism, block boundaries and cluster size (north_rule rank-identity).

Mechanism: ``ds.sort(keys)`` (Ray Data range-partitioned sample sort) ->
materialize -> per-block row counts (tiny remote tasks) -> driver prefix sum
-> per-block remote task appends ``id = offset + arange`` -> dataset from the
new block refs. This is the one spot the Dataset API cannot express
(a global enumerate), so we drop to raw Ray object refs, as sanctioned for
exactly this case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote
def _count_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _append_range_column(t: pa.Table, name: str, offset: int) -> pa.Table:
    ids = np.arange(offset, offset + t.num_rows, dtype=np.int64)
    return t.append_column(name, pa.array(ids, type=pa.int64()))


def sorted_rank_dataset(
    ds: "ray.data.Dataset", sort_keys: list[str], id_col: str,
    driver_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Sort ``ds`` by ``sort_keys`` and append a dense global-rank column.

    The result's ``id_col`` is the 0-based rank under the sort — identical at
    any parallelism level (keys must be unique for full determinism).

    Small inputs (<= ``driver_threshold`` rows — key projections, term
    dictionaries) skip Ray's range-partitioned sample sort entirely: its
    fixed coordination cost (~5 s regardless of size) dominates tiny sorts
    and wrecks strong-scaling on small corpora. The driver sort uses
    pyarrow ``sort_indices`` — the same UTF-8-byte ordering the distributed
    sort produces, so ranks are identical on either path.
    """
    import pyarrow.compute as pc

    mat = ds.materialize()
    if mat.count() <= driver_threshold:
        tables = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
        if not tables:
            return mat
        t = pa.concat_tables(tables, promote_options="default")
        order = pc.sort_indices(
            t, sort_keys=[(k, "ascending") for k in sort_keys])
        t = t.take(order)
        ids = np.arange(t.num_rows, dtype=np.int64)
        return ray.data.from_arrow(
            t.append_column(id_col, pa.array(ids, type=pa.int64())))

    mat = mat.sort(sort_keys).materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        return mat
    counts = ray.get([_count_rows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    out_refs = [
        _append_range_column.remote(r, id_col, int(off)) for r, off in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(out_refs)
