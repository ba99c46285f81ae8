"""General relational demonstrations of the engine's wide-operator mappings
(groupby/aggregate with per-batch pre-aggregation, windowed aggregates) over
the TPC-H-ish test tables — the same shapes the index build uses (A5/A7
analogs), expressed standalone so they are oracle-checkable in SQL."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Mean, Sum


def pricing_summary(lineitem: "ray.data.Dataset") -> "ray.data.Dataset":
    """TPC-H Q1-shaped grouped aggregate with a computed measure."""

    def revenue(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        return batch.append_column("revenue", rev)

    return (
        lineitem.map_batches(revenue, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("revenue", alias_name="sum_revenue"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
    )


def top_revenue_orders(
    customer: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    lineitem: "ray.data.Dataset",
    *,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-15",
    k: int = 10,
) -> "pa.Table":
    """TPC-H Q3 analog: the engine's three join shapes in one pipeline.

    - customer (tiny after the segment filter) -> its custkey set is
      BROADCAST once via ``ray.put`` and probed inside ``map_batches``
      (never shuffled);
    - lineitem (the big table) pre-aggregates revenue per orderkey INSIDE
      each batch (map-side combine) before anything wide happens;
    - lineitem ⋈ orders is a hash-partitioned ``Dataset.join`` — the
      large-large exchange — followed by a small grouped sum and a
      driver-side top-k of the tiny grouped result.
    """
    import ray as _ray

    cutoff_ts = np.datetime64(cutoff)

    def cust_filter(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.equal(b.column("c_mktsegment"), segment))

    ckeys = np.sort(np.concatenate([
        b.column("c_custkey").to_numpy(zero_copy_only=False)
        for b in customer.select_columns(["c_custkey", "c_mktsegment"])
        .map_batches(cust_filter, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ] or [np.empty(0, dtype=np.int64)]))
    ckeys_ref = _ray.put(ckeys)

    def orders_filter(b: pa.Table) -> pa.Table:
        keys = _ray.get(ckeys_ref)
        od = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        m = (od < cutoff_ts) & np.isin(ck, keys)
        return pa.table({
            "o_orderkey": b.column("o_orderkey").filter(pa.array(m)),
            "o_orderdate": b.column("o_orderdate").filter(pa.array(m)),
            "o_orderpriority": b.column("o_orderpriority").filter(pa.array(m)),
        })

    def lineitem_partial(b: pa.Table) -> pa.Table:
        sd = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        m = sd > cutoff_ts
        okey = b.column("l_orderkey").to_numpy(zero_copy_only=False)[m]
        rev = (b.column("l_extendedprice").to_numpy(zero_copy_only=False)[m]
               * (1.0 - b.column("l_discount").to_numpy(zero_copy_only=False)[m]))
        # map-side combine: one partial row per orderkey per batch
        uk, inv = np.unique(okey, return_inverse=True)
        psum = np.zeros(len(uk), dtype=np.float64)
        np.add.at(psum, inv, rev)
        return pa.table({"l_orderkey": pa.array(uk, type=pa.int64()),
                         "rev_partial": pa.array(psum)})

    ords = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(orders_filter, batch_format="pyarrow")
    li = lineitem.select_columns(
        ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(lineitem_partial, batch_format="pyarrow")
    joined = li.join(ords, join_type="inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    grouped = joined.groupby(
        ["l_orderkey", "o_orderdate", "o_orderpriority"]
    ).aggregate(Sum("rev_partial", alias_name="revenue")).to_pandas()
    grouped["revenue"] = grouped["revenue"].round(4)
    grouped = grouped.sort_values(
        ["revenue", "l_orderkey"], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(grouped.reset_index(drop=True),
                                preserve_index=False)


def events_hourly_window(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """Tumbling 1-hour event-time window per user: count + value sum.

    Ray Data has no native windows (SURVEY.md §2.9 — reference is batch-only
    too); the window key is computed vectorized in map_batches, then a
    grouped aggregate — the documented batch-window mapping."""

    def window_key(batch: pa.Table) -> pa.Table:
        # normalize to microseconds first: cast(int64) alone would yield the
        # column's NATIVE unit (ns-unit input -> 3.6-second "hours")
        ts = (batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        hour = (ts // 3_600_000_000) * 3_600_000_000
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "window_start": pa.array(hour),
                "value": batch.column("value"),
            }
        )

    return (
        events.select_columns(["user_id", "ts", "value"])
        .map_batches(window_key, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )


def user_value_quantiles(
    events: "ray.data.Dataset",
    qs: tuple = (0.5, 0.9),
) -> "ray.data.Dataset":
    """Exact per-user discrete quantiles of ``value`` (A4/A7-adjacent
    statistical aggregate). Uses the SQL-standard ``percentile_disc``
    selection rule — sorted[max(0, ceil(q*n) - 1)] — so results are
    ELEMENT-exact (an actual observed value, no float interpolation) and
    hash-comparable to DuckDB's ``quantile_disc``.

    Scale shape: one ``groupby(user_id)`` shuffle; each group is one user's
    values, reduced with a single vectorized sort. For heavy-hitter keys at
    extreme scale the same rule composes over pre-sorted partials (merge +
    select), but per-user event counts are bounded in practice."""
    import math

    def quants(g) -> "pd.Series":
        import pandas as pd

        v = np.sort(g["value"].to_numpy(dtype=np.float64))
        row = {"user_id": g["user_id"].iloc[0], "n_events": len(v)}
        for q in qs:
            # epsilon guards the binary-float overshoot: q*n that is
            # mathematically integral may land epsilon above it (0.07*100
            # = 7.000000000000001), which would ceil one element too far
            idx = max(0, math.ceil(q * len(v) - 1e-9) - 1)
            row[f"p{round(q * 100)}"] = v[idx]
        return pd.DataFrame([row])

    return (events.select_columns(["user_id", "value"])
            .groupby("user_id")
            .map_groups(quants, batch_format="pandas"))


def sessionize(events: "ray.data.Dataset",
               gap_minutes: int = 30) -> "ray.data.Dataset":
    """Event sessionization: per-user sessions split where the gap between
    consecutive events exceeds ``gap_minutes``. Emits one row per session
    ``(user_id, session_id, session_start, session_end, n_events)`` with
    1-based session ids in time order.

    Scale shape: the ONLY wide step is ``groupby(user_id)`` — each group is
    one user's events (bounded; heavy users are still single-node-sized),
    processed with a vectorized sort + diff + cumsum inside ``map_groups``.
    Deterministic under ts ties: equal timestamps can never exceed the gap,
    so they always land in the same session regardless of sort order."""
    gap_us = gap_minutes * 60_000_000

    def sessions(g) -> "pa.Table":
        import pandas as pd

        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        new_s = np.empty(len(ts), dtype=np.int64)
        new_s[0] = 1
        new_s[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(new_s)
        starts = np.flatnonzero(new_s)
        ends = np.append(starts[1:], len(ts)) - 1
        return pd.DataFrame({
            "user_id": np.repeat(g["user_id"].iloc[0], len(starts)),
            "session_id": np.arange(1, len(starts) + 1, dtype=np.int64),
            "session_start": ts[starts].astype("datetime64[us]"),
            "session_end": ts[ends].astype("datetime64[us]"),
            "n_events": (ends - starts + 1).astype(np.int64),
        })

    return (events.select_columns(["user_id", "ts"])
            .groupby("user_id")
            .map_groups(sessions, batch_format="pandas"))


def events_sliding_window(events: "ray.data.Dataset",
                          hours: int = 3) -> "ray.data.Dataset":
    """SLIDING event-time window (hour-aligned, ``hours`` wide) per user via
    two-level aggregation: tumbling hourly PARTIALS first (tiny), then each
    partial is expanded into the ``hours`` windows it contributes to and
    re-aggregated — the scalable sliding-window shape (the shuffle moves
    per-hour partials, never raw events). A window_start w aggregates
    events with hour(e) in [w - (hours-1), w]."""
    HOUR = 3_600_000_000

    def window_key(batch: pa.Table) -> pa.Table:
        # normalize to microseconds first: cast(int64) alone would yield the
        # column's NATIVE unit (ns-unit input -> 3.6-second "hours")
        ts = (batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        hour = (ts // HOUR) * HOUR
        return pa.table({
            "user_id": batch.column("user_id"),
            "h": pa.array(hour),
            "value": batch.column("value"),
        })

    hourly = (
        events.select_columns(["user_id", "ts", "value"])
        .map_batches(window_key, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "h"])
        .aggregate(Count(alias_name="c"), Sum("value", alias_name="s"))
    )

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        h = batch.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        s = batch.column("s").to_numpy(zero_copy_only=False)
        ks = np.arange(hours, dtype=np.int64) * HOUR
        return pa.table({
            "user_id": pa.array(np.repeat(uid, hours)),
            "window_start": pa.array(
                np.repeat(h, hours) + np.tile(ks, n)),
            "c": pa.array(np.repeat(c, hours)),
            "s": pa.array(np.repeat(s, hours)),
        })

    return (
        hourly.map_batches(expand, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        .aggregate(Sum("c", alias_name="n_events_3h"),
                   Sum("s", alias_name="sum_value_3h"))
    )
