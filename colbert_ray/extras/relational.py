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


def events_hourly_window(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """Tumbling 1-hour event-time window per user: count + value sum.

    Ray Data has no native windows (SURVEY.md §2.9 — reference is batch-only
    too); the window key is computed vectorized in map_batches, then a
    grouped aggregate — the documented batch-window mapping."""

    def window_key(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
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
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
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
