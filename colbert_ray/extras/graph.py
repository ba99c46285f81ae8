"""Iterative graph algorithms over edge datasets (Pregel-style rounds).

PageRank (Page et al. 1999) expressed Ray-Data-first: each iteration is one
streaming pass over the edge dataset — per-batch vectorized gather of the
broadcast rank/degree vectors, map-side partial sums per destination, one
small ``groupby(node).sum()`` exchange whose row count is bounded by the
node count (never the edge count). Transitive closure / connected
components live in ``extras/dedup.connected_components``; this module holds
the weighted-propagation family.

Float policy (matches the repo-wide oracle contract): ranks are rounded to
``ndigits`` decimals after every iteration on BOTH the engine and the SQL
twin, so bit-level summation-order differences can never compound across
rounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _node_partials(ranks_over_deg: np.ndarray, nodes_sorted: np.ndarray):
    """Batch kernel factory: gather src contribution, partial-sum by dst."""

    def kernel(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy(zero_copy_only=False)
        dst = b.column("dst").to_numpy(zero_copy_only=False)
        contrib = ranks_over_deg[np.searchsorted(nodes_sorted, src)]
        uk, inv = np.unique(dst, return_inverse=True)
        psum = np.zeros(len(uk), dtype=np.float64)
        np.add.at(psum, inv, contrib)
        return pa.table({"node": pa.array(uk, type=pa.int64()),
                         "partial": pa.array(psum)})

    return kernel


def pagerank(
    edges: "ray.data.Dataset",
    *,
    damping: float = 0.85,
    n_iter: int = 5,
    ndigits: int = 6,
) -> pa.Table:
    """PageRank over a directed edge dataset ``(src int64, dst int64)``.

    Semantics (shared verbatim with the SQL twin): nodes are the distinct
    ``src`` values (feed a symmetrized edge set for undirected graphs — then
    every node has out-degree and no rank mass dangles); ``r_0 =
    round(1/N, ndigits)``; each round ``r_{t+1}(v) = round((1-damping)/N +
    damping * sum_{u->v} r_t(u)/deg(u), ndigits)``.

    Scale shape: the edge set streams once per iteration (materialized once
    up front so iterations re-read blocks from the object store, not the
    source); the rank and degree vectors are broadcast via ``ray.put`` (16
    bytes/node — fine to ~10^8 nodes; past that the gather becomes a
    hash-partitioned ``Dataset.join`` on src, same rounds, documented
    trade). Per-batch ``np.add.at`` partials mean the ``groupby(node)``
    exchange moves O(nodes-per-batch), not O(edges). Only the O(N) rank
    table ever reaches the driver.
    """
    edges = edges.select_columns(["src", "dst"]).materialize()

    # out-degree: map-side unique-count partials -> one small groupby
    def deg_partial(b: pa.Table) -> pa.Table:
        uk, cnt = np.unique(
            b.column("src").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"node": pa.array(uk, type=pa.int64()),
                         "partial": pa.array(cnt.astype(np.float64))})

    from ray.data.aggregate import Sum

    deg_df = (edges.map_batches(deg_partial, batch_format="pyarrow")
              .groupby("node").aggregate(Sum("partial", alias_name="d"))
              .to_pandas().sort_values("node").reset_index(drop=True))
    nodes = deg_df["node"].to_numpy().astype(np.int64)     # sorted
    deg = deg_df["d"].to_numpy().astype(np.float64)
    n = float(len(nodes))
    teleport = (1.0 - damping) / n
    ranks = np.full(len(nodes), round(1.0 / n, ndigits), dtype=np.float64)

    for _ in range(n_iter):
        kernel = _node_partials(ranks / deg, nodes)
        sums = (edges.map_batches(kernel, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("partial", alias_name="m"))
                .to_pandas())
        mass = np.zeros(len(nodes), dtype=np.float64)
        idx = np.searchsorted(nodes, sums["node"].to_numpy())
        mass[idx] = sums["m"].to_numpy()
        ranks = np.round(teleport + damping * mass, ndigits)

    return pa.table({"node": pa.array(nodes, type=pa.int64()),
                     "rank_r": pa.array(ranks)})


def bipartite_pagerank_edges(
    orders: "ray.data.Dataset",
    lineitem: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """Symmetrized customer–supplier co-order graph: distinct
    ``(2*o_custkey, 2*l_suppkey+1)`` pairs from the orders⋈lineitem join,
    emitted in both directions. The even/odd encoding keeps the two key
    spaces disjoint in one int64 node domain.

    Scale shape: column-pruned reads, ONE hash-partitioned join on
    orderkey, distinct via ``groupby([src, dst]).count()`` (exchange keyed
    on the pair — skew-free for TPC-H-ish fanouts), symmetrize as a free
    ``union`` of two projections of the same deduped set.
    """

    li = lineitem.select_columns(["l_orderkey", "l_suppkey"])
    ords = orders.select_columns(["o_orderkey", "o_custkey"])
    joined = li.join(ords, join_type="inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def encode(b: pa.Table) -> pa.Table:
        cust = b.column("o_custkey").to_numpy(zero_copy_only=False)
        supp = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(2 * cust, type=pa.int64()),
                         "dst": pa.array(2 * supp + 1, type=pa.int64())})

    pairs = (joined.map_batches(encode, batch_format="pyarrow")
             .groupby(["src", "dst"]).count()
             .select_columns(["src", "dst"]))

    def reverse(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("dst"), "dst": b.column("src")})

    return pairs.union(pairs.map_batches(reverse, batch_format="pyarrow"))
