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


def bfs_hops(
    edges: "ray.data.Dataset",
    seed: int,
    *,
    max_hops: int = 4,
) -> pa.Table:
    """Minimum hop count from ``seed`` to every reachable node within
    ``max_hops``, over a directed edge dataset ``(src, dst)`` (feed a
    symmetrized set for undirected semantics). Returns (node, hops) —
    unreachable nodes are absent, matching the SQL twin's recursive-CTE
    semantics exactly (integer arithmetic, no float policy needed).

    Scale shape: frontier expansion — per hop the edge set streams ONCE
    through a vectorized ``np.isin``-style membership filter against the
    broadcast sorted frontier, each batch emits only its distinct
    neighbors, and a node-bounded ``groupby`` dedups before the driver
    extends the visited set (O(N) driver state, same broadcast-threshold
    note as :func:`pagerank`; past it the visited set becomes an
    anti-join). Iterations stop early when a frontier is empty.
    """
    edges = edges.select_columns(["src", "dst"]).materialize()
    visited: dict[int, int] = {int(seed): 0}
    frontier = np.array([int(seed)], dtype=np.int64)

    for hop in range(1, max_hops + 1):
        f_ref = ray.put(np.sort(frontier))

        def neighbors(b: pa.Table, _f=f_ref) -> pa.Table:
            f = ray.get(_f)
            src = b.column("src").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(f, src)
            pos[pos == len(f)] = 0
            m = f[pos] == src
            dst = np.unique(
                b.column("dst").to_numpy(zero_copy_only=False)[m])
            return pa.table({"node": pa.array(dst, type=pa.int64())})

        reached = (edges.map_batches(neighbors, batch_format="pyarrow")
                   .groupby("node").count()
                   .to_pandas()["node"].to_numpy().astype(np.int64))
        fresh = np.array([v for v in reached if int(v) not in visited],
                         dtype=np.int64)
        if not len(fresh):
            break
        for v in fresh:
            visited[int(v)] = hop
        frontier = fresh

    out = sorted(visited.items())
    return pa.table({"node": pa.array([n for n, _ in out], type=pa.int64()),
                     "hops": pa.array([h for _, h in out], type=pa.int64())})


def triangle_counts(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pa.Table:
    """Per-node triangle participation counts over an undirected graph
    given as an edge dataset (either direction, duplicates and self-loops
    tolerated). Returns (node, n_tri) for nodes in >=1 triangle.

    Classic degree-oriented wedge join (node-iterator++): canonicalize +
    dedup edges, orient every edge from the (degree, id)-smaller endpoint
    to the larger — bounding per-node out-degree by O(sqrt(edges)) so the
    wedge self-join cannot blow up on skewed hubs — then one
    hash-partitioned self-join builds wedges and a second composite-key
    join closes them against the oriented edge set. Each triangle
    materializes exactly once; corners flat-map to 3 rows and a
    node-bounded groupby counts them. The degree/order map is node-bounded
    and broadcast (same threshold note as :func:`pagerank`).
    """
    edges = edges.select_columns([src_col, dst_col])

    node_t = edges.schema().base_schema.field(src_col).type

    def canon(b: pa.Table) -> pa.Table:
        s = b.column(src_col).to_numpy(zero_copy_only=False)
        d = b.column(dst_col).to_numpy(zero_copy_only=False)
        m = s != d
        s, d = s[m], d[m]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        # explicit types: an all-self-loop batch must not emit null-typed
        # empty columns (they would poison the downstream join schema)
        return pa.table({"a": pa.array(lo, type=node_t),
                         "b": pa.array(hi, type=node_t)})

    canon_ds = (edges.map_batches(canon, batch_format="pyarrow")
                .groupby(["a", "b"]).count().select_columns(["a", "b"])
                .materialize())

    def deg_partial(b: pa.Table) -> pa.Table:
        both = np.concatenate([
            b.column("a").to_numpy(zero_copy_only=False),
            b.column("b").to_numpy(zero_copy_only=False)])
        uk, cnt = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(uk, type=node_t),
                         "partial": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    deg_df = (canon_ds.map_batches(deg_partial, batch_format="pyarrow")
              .groupby("node").aggregate(Sum("partial", alias_name="d"))
              .to_pandas())
    # total order: (degree, node id); broadcast as parallel sorted arrays
    # so the per-edge rank lookup is a vectorized searchsorted, not a loop
    deg_df = deg_df.sort_values(["d", "node"]).reset_index(drop=True)
    # row index in the (deg, node) sort IS the rank; re-sorted by node value
    # the pair (keys_sorted[j], sort_by_node[j]) is a searchsorted-able map
    sort_by_node = np.argsort(deg_df["node"].to_numpy(), kind="stable")
    keys_sorted = deg_df["node"].to_numpy()[sort_by_node]
    ranks_for_keys = sort_by_node.astype(np.int64)
    ord_ref = ray.put((keys_sorted, ranks_for_keys))

    def orient(b: pa.Table) -> pa.Table:
        keys, rks = ray.get(ord_ref)
        a = b.column("a").to_numpy(zero_copy_only=False)
        bb = b.column("b").to_numpy(zero_copy_only=False)
        ra = rks[np.searchsorted(keys, a)]
        rb = rks[np.searchsorted(keys, bb)]
        swap = ra > rb
        u = np.where(swap, bb, a)
        v = np.where(swap, a, bb)
        ru = np.where(swap, rb, ra)
        rv = np.where(swap, ra, rb)
        return pa.table({"u": pa.array(u, type=node_t),
                         "v": pa.array(v, type=node_t),
                         "ru": pa.array(ru, type=pa.int64()),
                         "rv": pa.array(rv, type=pa.int64())})

    oriented = (canon_ds.map_batches(orient, batch_format="pyarrow")
                .materialize())
    # wedge join at the order-minimal corner: (u->v1), (u->v2), rv1 < rv2
    left = oriented.select_columns(["u", "v", "rv"])
    right = (oriented.map_batches(
        lambda b: pa.table({"u": b.column("u"), "w": b.column("v"),
                            "rw": b.column("rv")}),
        batch_format="pyarrow"))
    wedges = left.join(right, join_type="inner", num_partitions=8,
                       on=("u",))

    def open_wedges(b: pa.Table) -> pa.Table:
        m = (b.column("rv").to_numpy(zero_copy_only=False)
             < b.column("rw").to_numpy(zero_copy_only=False))
        pm = pa.array(m)
        return pa.table({"u": b.column("u").filter(pm),
                         "v": b.column("v").filter(pm),
                         "w": b.column("w").filter(pm)})

    # Repartition between the two joins: empty partitions of the first join
    # surface as zero-field blocks that are forwarded around the map fn and
    # crash the second join's acero key resolution ("no match for FieldRef");
    # the coalescing repartition re-normalizes every block to one schema.
    open_ds = (wedges.map_batches(open_wedges, batch_format="pyarrow")
               .repartition(8))
    closing = oriented.map_batches(
        lambda b: pa.table({"v": b.column("u"), "w": b.column("v")}),
        batch_format="pyarrow")
    tris = open_ds.join(closing, join_type="inner", num_partitions=8,
                        on=("v", "w"))

    def corners(b: pa.Table) -> pa.Table:
        allc = np.concatenate([
            b.column("u").to_numpy(zero_copy_only=False),
            b.column("v").to_numpy(zero_copy_only=False),
            b.column("w").to_numpy(zero_copy_only=False)])
        uk, cnt = np.unique(allc, return_counts=True)
        return pa.table({"node": pa.array(uk, type=node_t),
                         "partial": pa.array(cnt.astype(np.int64))})

    out = (tris.map_batches(corners, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("partial", alias_name="n_tri"))
           .to_pandas())
    if out.empty:        # triangle-free graph: typed empty result
        return pa.table({"node": pa.array([], type=node_t),
                         "n_tri": pa.array([], type=pa.int64())})
    out = out.sort_values("node").reset_index(drop=True)
    out["n_tri"] = out["n_tri"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


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
