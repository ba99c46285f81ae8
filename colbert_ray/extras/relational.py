"""General relational demonstrations of the engine's wide-operator mappings
(groupby/aggregate with per-batch pre-aggregation, windowed aggregates) over
the TPC-H-ish test tables — the same shapes the index build uses (A5/A7
analogs), expressed standalone so they are oracle-checkable in SQL."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Mean, Sum


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


def _tag_side(ds: "ray.data.Dataset", *, by: str, ts_col: str, side: int,
              left_payload: dict, right_payload: dict,
              row_filter=None) -> "ray.data.Dataset":
    """Map one join side onto the harmonized co-group schema
    ``(by, __ts_us, __side, *left_payload, *right_payload)`` — the other
    side's payload columns are typed nulls, so the two sides union into one
    Dataset and co-locate with a SINGLE groupby(by) shuffle. Column order is
    canonical (left payload then right payload on BOTH sides) so the union
    schemas are identical."""
    own = left_payload if side == 0 else right_payload

    def tag(b: pa.Table) -> pa.Table:
        if row_filter is not None:
            b = row_filter(b)
        n = b.num_rows
        cols = {by: b.column(by)}
        cols["__ts_us"] = b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
        for name, (src, typ) in {**left_payload, **right_payload}.items():
            cols[name] = (b.column(src).cast(typ) if name in own
                          else pa.nulls(n, typ))
        return pa.table(cols)

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def _cogroup_schema(g: pa.Table, by: str, left_payload: dict,
                    right_payload: dict) -> pa.Schema:
    fields = [g.schema.field(by)]
    for name, (_s, typ) in {**left_payload, **right_payload}.items():
        fields.append(pa.field(name, typ))
    return pa.schema(fields)


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
              by: str, left_on: str, right_on: str,
              left_payload: dict, right_payload: dict,
              strict: bool = True,
              left_filter=None, right_filter=None) -> "ray.data.Dataset":
    """Backward as-of join: each left row is matched to the single most
    recent right row of the same ``by`` key with ``right_on < left_on``
    (``<=`` when ``strict=False``); unmatched left rows are dropped (inner
    semantics, DuckDB ``ASOF JOIN``-equivalent).

    ``left_payload`` / ``right_payload`` map OUTPUT column name ->
    ``(source column, pyarrow type)`` for what each side carries through.

    Scale shape: Ray Data has no native as-of join, and expressing it as an
    inequality ``Dataset.join`` + argmax would materialize every
    (left, all-prior-right) pair. Instead both sides are tagged onto one
    harmonized schema and co-grouped with a SINGLE ``groupby(by)`` shuffle;
    inside each group one vectorized ``np.searchsorted`` resolves every left
    row at once. Only (by, ts, payload) columns ride the exchange — never
    full rows. Partitioning assumption: one key's rows fit in a worker
    (same bound as sessionize/quantiles above).

    Determinism: among right rows with EQUAL timestamps the one with the
    greatest first-payload value wins (lexsort tie-break); the driver-gate
    events table has no (user, ts) duplicates, so the oracle cannot diverge.
    """
    assert not set(left_payload) & set(right_payload), "payload names must be disjoint"
    tagged = _tag_side(left, by=by, ts_col=left_on, side=0,
                       left_payload=left_payload, right_payload=right_payload,
                       row_filter=left_filter).union(
        _tag_side(right, by=by, ts_col=right_on, side=1,
                  left_payload=left_payload, right_payload=right_payload,
                  row_filter=right_filter))

    def per_key(g: pa.Table) -> pa.Table:
        out_schema = _cogroup_schema(g, by, left_payload, right_payload)
        side = g.column("__side").to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        rts = rt.column("__ts_us").to_numpy(zero_copy_only=False)
        tie = rt.column(next(iter(right_payload))).to_numpy(zero_copy_only=False)
        try:
            order = np.lexsort((tie, rts))
        except TypeError:  # non-sortable payload dtype: ts-only (data has no ties)
            order = np.argsort(rts, kind="stable")
        rt = rt.take(pa.array(order))
        rts = rts[order]
        lts = lt.column("__ts_us").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(rts, lts, side="left" if strict else "right") - 1
        hit = idx >= 0
        lt = lt.filter(pa.array(hit))
        picks = pa.array(idx[hit])
        cols = {by: lt.column(by)}
        for name in left_payload:
            cols[name] = lt.column(name)
        for name in right_payload:
            cols[name] = rt.column(name).take(picks)
        return pa.table(cols, schema=out_schema)

    return tagged.groupby(by).map_groups(per_key, batch_format="pyarrow")


def range_join(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
               by: str, left_on: str, right_on: str,
               left_payload: dict, right_payload: dict,
               lower_us: int, upper_us: int,
               strict_lower: bool = True, strict_upper: bool = False,
               left_filter=None, right_filter=None) -> "ray.data.Dataset":
    """Banded range (interval) join: all pairs of same-``by`` rows whose time
    gap ``right_on - left_on`` lies in ``(lower_us, upper_us]`` (bound
    strictness configurable). Payload dicts as in :func:`asof_join`.

    Scale shape: same single-shuffle co-group as :func:`asof_join` — the
    quadratic-blowup hazard of an inequality join is contained per key, and
    within a group matching is two vectorized ``searchsorted`` calls per side
    plus a repeat/arange pair expansion (no Python loop). Output size is the
    true number of in-band pairs, never the per-key cross product."""
    assert not set(left_payload) & set(right_payload), "payload names must be disjoint"
    tagged = _tag_side(left, by=by, ts_col=left_on, side=0,
                       left_payload=left_payload, right_payload=right_payload,
                       row_filter=left_filter).union(
        _tag_side(right, by=by, ts_col=right_on, side=1,
                  left_payload=left_payload, right_payload=right_payload,
                  row_filter=right_filter))

    def per_key(g: pa.Table) -> pa.Table:
        out_schema = _cogroup_schema(g, by, left_payload, right_payload)
        side = g.column("__side").to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        lts = lt.column("__ts_us").to_numpy(zero_copy_only=False)
        lorder = np.argsort(lts, kind="stable")
        lt = lt.take(pa.array(lorder))
        lts = lts[lorder]
        rts = rt.column("__ts_us").to_numpy(zero_copy_only=False)
        # gap = r - l in (lower, upper]  <=>  l in [r-upper, r-lower)
        lo = np.searchsorted(lts, rts - upper_us,
                             side="right" if strict_upper else "left")
        hi = np.searchsorted(lts, rts - lower_us,
                             side="left" if strict_lower else "right")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        r_idx = np.repeat(np.arange(len(rts)), counts)
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
        l_idx = (np.arange(total) - np.repeat(offsets, counts)
                 + np.repeat(lo, counts))
        lpick, rpick = pa.array(l_idx), pa.array(r_idx)
        cols = {by: lt.column(by).take(lpick)}
        for name in left_payload:
            cols[name] = lt.column(name).take(lpick)
        for name in right_payload:
            cols[name] = rt.column(name).take(rpick)
        return pa.table(cols, schema=out_schema)

    return tagged.groupby(by).map_groups(per_key, batch_format="pyarrow")


def purchase_attribution(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """Attribute every purchase event to the user's most recent STRICTLY
    prior click (backward as-of join, the named custom-operator example);
    emits ``(user_id, event_id, ts, click_event_id, click_ts, lag_us)``."""
    ts_us = pa.timestamp("us")

    def typed(kind: str):
        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return b.filter(pc.equal(b.column("event_type"), kind))
        return f

    joined = asof_join(
        events.select_columns(["event_id", "user_id", "ts", "event_type"]),
        events.select_columns(["event_id", "user_id", "ts", "event_type"]),
        by="user_id", left_on="ts", right_on="ts",
        left_payload={"event_id": ("event_id", pa.int64()),
                      "ts": ("ts", ts_us)},
        right_payload={"click_event_id": ("event_id", pa.int64()),
                       "click_ts": ("ts", ts_us)},
        strict=True,
        left_filter=typed("purchase"), right_filter=typed("click"))

    def lag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        d = pc.subtract(b.column("ts").cast(pa.int64()),
                        b.column("click_ts").cast(pa.int64()))
        return b.append_column("lag_us", d)

    return joined.map_batches(lag, batch_format="pyarrow", zero_copy_batch=True)


def click_conversions(events: "ray.data.Dataset",
                      window_hours: int = 24) -> "ray.data.Dataset":
    """Click→purchase conversion pairs within ``window_hours`` (banded range
    join): every (click, later purchase) pair of the same user with
    ``0 < purchase.ts - click.ts <= window``; emits
    ``(user_id, click_event_id, purchase_event_id, gap_us)``."""
    ts_us = pa.timestamp("us")

    def typed(kind: str):
        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return b.filter(pc.equal(b.column("event_type"), kind))
        return f

    joined = range_join(
        events.select_columns(["event_id", "user_id", "ts", "event_type"]),
        events.select_columns(["event_id", "user_id", "ts", "event_type"]),
        by="user_id", left_on="ts", right_on="ts",
        left_payload={"click_event_id": ("event_id", pa.int64()),
                      "click_ts": ("ts", ts_us)},
        right_payload={"purchase_event_id": ("event_id", pa.int64()),
                       "purchase_ts": ("ts", ts_us)},
        lower_us=0, upper_us=window_hours * 3_600_000_000,
        strict_lower=True, strict_upper=False,
        left_filter=typed("click"), right_filter=typed("purchase"))

    def gap(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        d = pc.subtract(b.column("purchase_ts").cast(pa.int64()),
                        b.column("click_ts").cast(pa.int64()))
        return pa.table({
            "user_id": b.column("user_id"),
            "click_event_id": b.column("click_event_id"),
            "purchase_event_id": b.column("purchase_event_id"),
            "gap_us": d,
        })

    return joined.map_batches(gap, batch_format="pyarrow", zero_copy_batch=True)


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


def grouped_topk(ds: "ray.data.Dataset", group_col: str, order_col: str,
                 k: int, *, tie_col: str,
                 descending: bool = True) -> "ray.data.Dataset":
    """Top-k rows per group by ``order_col`` (ties broken by ``tie_col``
    ascending), emitting all input columns plus ``rn`` (1..k, int64) — the
    windowed row_number() <= k shape.

    Map-side partial: each batch keeps at most k rows per group IT contains
    (one lexsort + change-point rank, no per-row loop), so the single
    groupby exchange moves <= k x groups-per-batch rows per batch instead of
    the corpus. Final per-group selection runs in ``map_groups`` over those
    pre-reduced candidates. Ordering compares the RAW stored values (no
    arithmetic happens on either side, so engine and SQL twin see
    bit-identical keys); ``tie_col`` must make the order total."""
    def _order_key(o: np.ndarray) -> np.ndarray:
        # dense-rank transform: equal values get equal keys, order preserved
        # EXACTLY for any comparable dtype — no float64 cast that would
        # collapse int64 values above 2^53 (ids, ns-timestamps)
        r = np.unique(o, return_inverse=True)[1]
        return -r if descending else r

    def _rank_mask(g: np.ndarray, o: np.ndarray, t: np.ndarray) -> np.ndarray:
        idx = np.lexsort((t, _order_key(o), g))
        gs = g[idx]
        starts = np.flatnonzero(np.concatenate(([True], gs[1:] != gs[:-1])))
        rank = np.arange(len(gs)) - np.repeat(starts, np.diff(
            np.concatenate((starts, [len(gs)]))))
        return idx[rank < k]

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        o = b.column(order_col).to_numpy(zero_copy_only=False)
        t = b.column(tie_col).to_numpy(zero_copy_only=False)
        return b.take(pa.array(np.sort(_rank_mask(g, o, t))))

    def final(g: pa.Table) -> pa.Table:
        o = g.column(order_col).to_numpy(zero_copy_only=False)
        t = g.column(tie_col).to_numpy(zero_copy_only=False)
        idx = np.lexsort((t, _order_key(o)))[:k]
        out = g.take(pa.array(idx))
        return out.append_column(
            "rn", pa.array(np.arange(1, len(idx) + 1), type=pa.int64()))

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(group_col)
            .map_groups(final, batch_format="pyarrow"))


def pricing_rollup(lineitem: "ray.data.Dataset") -> "pa.Table":
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) — detail rows, per-flag
    subtotals, and a grand total, tagged with the standard GROUPING() bitmask
    (0 = detail, 1 = linestatus rolled up, 3 = grand total).

    Scale shape: the corpus is aggregated ONCE at the finest granularity
    (same pre-aggregated groupby as ``pricing_summary``); every coarser
    level is re-derived from that tiny grouped frame on the driver — sums
    and counts are associative, so no second pass over the data. Returns an
    Arrow table (the result is O(groups), never O(rows))."""
    base = (pricing_summary(lineitem)
            .to_pandas()
            .sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True))
    base = base.drop(columns=["avg_qty"])

    import pandas as pd

    measures = ["sum_qty", "sum_base_price", "sum_revenue", "count_order"]
    detail = base.assign(lvl=np.int64(0))
    sub = (base.groupby("l_returnflag", as_index=False)[measures].sum()
           .assign(l_linestatus="", lvl=np.int64(1)))
    grand = pd.DataFrame([{**{m: base[m].sum() for m in measures},
                           "l_returnflag": "", "l_linestatus": "",
                           "lvl": np.int64(3)}])
    out = pd.concat([detail, sub, grand], ignore_index=True)
    for c in ("sum_qty", "sum_base_price", "sum_revenue"):
        out[c] = out[c].round(2)
    out["count_order"] = out["count_order"].astype(np.int64)
    out = (out[["l_returnflag", "l_linestatus", "lvl"] + measures]
           .sort_values(["lvl", "l_returnflag", "l_linestatus"])
           .reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def pricing_cube(lineitem: "ray.data.Dataset") -> "pa.Table":
    """GROUP BY CUBE(l_returnflag, l_linestatus) — every grouping set:
    detail (lvl 0), per-flag subtotal (lvl 1 = linestatus rolled up),
    per-status subtotal (lvl 2 = returnflag rolled up), grand total (lvl 3)
    — the standard GROUPING() bitmask.

    Same scale shape as :func:`pricing_rollup`: ONE finest-granularity
    pre-aggregated pass over the corpus; every coarser grouping set is
    re-derived from the tiny grouped frame on the driver (sums/counts are
    associative). O(groups) result, never O(rows)."""
    base = (pricing_summary(lineitem)
            .to_pandas()
            .sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True))
    base = base.drop(columns=["avg_qty"])

    import pandas as pd

    measures = ["sum_qty", "sum_base_price", "sum_revenue", "count_order"]
    detail = base.assign(lvl=np.int64(0))
    by_flag = (base.groupby("l_returnflag", as_index=False)[measures].sum()
               .assign(l_linestatus="", lvl=np.int64(1)))
    by_status = (base.groupby("l_linestatus", as_index=False)[measures].sum()
                 .assign(l_returnflag="", lvl=np.int64(2)))
    grand = pd.DataFrame([{**{m: base[m].sum() for m in measures},
                           "l_returnflag": "", "l_linestatus": "",
                           "lvl": np.int64(3)}])
    out = pd.concat([detail, by_flag, by_status, grand], ignore_index=True)
    for c in ("sum_qty", "sum_base_price", "sum_revenue"):
        out[c] = out[c].round(2)
    out["count_order"] = out["count_order"].astype(np.int64)
    out = (out[["l_returnflag", "l_linestatus", "lvl"] + measures]
           .sort_values(["lvl", "l_returnflag", "l_linestatus"])
           .reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def skyline(ds: "ray.data.Dataset", *, maximize: list[str],
            minimize: list[str],
            keep_cols: list[str]) -> "pa.Table":
    """Skyline (Pareto frontier): rows not DOMINATED by any other row.
    ``y`` dominates ``x`` iff y is >= x on every ``maximize`` column,
    <= on every ``minimize`` column, and strictly better on at least one.
    Ties on every criterion keep both rows (neither dominates).

    Scale shape — the skyline operator is distributive: a row dominated
    within any subset is dominated globally, so
    ``skyline(all) == skyline(union of per-block skylines)``.
    1. per-batch LOCAL skyline (vectorized pairwise dominance matrix,
       batch-bounded) — survivors are typically O(log^d n) of the block;
    2. the union of local skylines merges on the driver with the same
       vectorized check. Only skyline candidates ever leave a task; the
       corpus streams. The documented assumption (every distributed-skyline
       paper makes it) is a final candidate set ≪ corpus; for adversarial
       anti-correlated data where the skyline itself is huge, the result
       is inherently O(skyline) anyway."""
    cols = list(maximize) + list(minimize)

    def _local(tbl: pa.Table) -> pa.Table:
        m = tbl.num_rows
        if m == 0:
            return tbl
        # normalize to all-maximize: negate minimize columns
        v = np.column_stack(
            [tbl.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
             for c in maximize] +
            [-tbl.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
             for c in minimize])
        ge = (v[:, None, :] >= v[None, :, :]).all(axis=2)
        gt = (v[:, None, :] > v[None, :, :]).any(axis=2)
        dominated = (ge & gt).any(axis=0)
        return tbl.filter(pa.array(~dominated))

    def local_skyline(batch: pa.Table) -> pa.Table:
        return _local(batch.select(keep_cols))

    import pyarrow.compute as pc

    import ray as _ray

    refs = (ds.select_columns(keep_cols)
            .map_batches(local_skyline, batch_format="pyarrow",
                         zero_copy_batch=True)
            .to_arrow_refs())
    parts = [t for t in _ray.get(refs) if t.num_rows]
    if not parts:
        return pa.table({c: [] for c in keep_cols})
    merged = pa.concat_tables(parts).combine_chunks()
    out = _local(merged.select(keep_cols))
    order = pc.sort_indices(out, sort_keys=[(keep_cols[0], "ascending")])
    return out.take(order)


def group_zscore(ds: "ray.data.Dataset", group_col: str, val_col: str,
                 out_col: str = "z") -> "ray.data.Dataset":
    """Per-group z-score normalization (feature-engineering staple):
    appends ``out_col`` = (x - mean_g) / stddev_pop_g.

    Two passes, broadcast-not-shuffle: pass 1 reduces the corpus to one
    CENTERED-moment row (n, mean, M2) per group per batch and Chan-combines
    them in a tiny ``groupby.map_groups`` — the numerically stable parallel
    form (an E[x^2]-E[x]^2 fold cancels catastrophically when |mean| >>
    stddev, diverging from the oracle's stddev_pop). The group->(mean, std)
    table is broadcast ONCE via ``ray.put`` and pass 2 streams the corpus
    through a stateless vectorized lookup — the full dataset never enters an
    exchange. Zero-variance groups get z = 0."""
    import ray as _ray

    def moments(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        x = b.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ug, inv = np.unique(g, return_inverse=True)
        cnt = np.bincount(inv).astype(np.float64)
        s = np.zeros(len(ug)); np.add.at(s, inv, x)
        mean = s / np.maximum(cnt, 1.0)
        m2 = np.zeros(len(ug))
        np.add.at(m2, inv, (x - mean[inv]) ** 2)      # centered in-batch
        return pa.table({group_col: pa.array(ug, type=b.schema.field(
                             group_col).type),
                         "n_": pa.array(cnt), "mean_": pa.array(mean),
                         "m2_": pa.array(m2)})

    def chan_fold(t: pa.Table) -> pa.Table:
        # pairwise combine (Chan et al.) over this group's batch partials
        n = t.column("n_").to_numpy(zero_copy_only=False)
        m = t.column("mean_").to_numpy(zero_copy_only=False)
        m2 = t.column("m2_").to_numpy(zero_copy_only=False)
        na, ma, M2 = n[0], m[0], m2[0]
        for i in range(1, len(n)):
            nb, mb, M2b = n[i], m[i], m2[i]
            nt = na + nb
            d = mb - ma
            ma = ma + d * nb / nt
            M2 = M2 + M2b + d * d * na * nb / nt
            na = nt
        return pa.table({group_col: t.column(group_col).slice(0, 1),
                         "n_": pa.array([na]), "mean_": pa.array([ma]),
                         "m2_": pa.array([M2])})

    stats = (ds.select_columns([group_col, val_col])
             .map_batches(moments, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby(group_col)
             .map_groups(chan_fold, batch_format="pyarrow")
             .to_pandas())
    var = np.maximum(stats["m2_"].to_numpy()
                     / np.maximum(stats["n_"].to_numpy(), 1.0), 0.0)
    lookup = {k: (m, np.sqrt(v))
              for k, m, v in zip(stats[group_col], stats["mean_"], var)}
    ref = _ray.put(lookup)

    def apply(b: pa.Table) -> pa.Table:
        lk = _ray.get(ref)
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        x = b.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ug, inv = np.unique(g, return_inverse=True)
        ms = np.array([lk[k] for k in ug], dtype=np.float64)[inv]  # per GROUP
        sd = ms[:, 1]
        z = np.where(sd == 0, 0.0, (x - ms[:, 0]) / np.where(sd == 0, 1.0, sd))
        return b.append_column(out_col, pa.array(z))

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def pivot_counts(ds: "ray.data.Dataset", group_col: str, pivot_col: str,
                 values: list[str]) -> "ray.data.Dataset":
    """Pivot ``pivot_col`` into per-value count columns per group
    (conditional aggregation: one ``n_<value>`` column per entry of
    ``values``, unknown values ignored).

    Scale shape: each batch reduces to one partial row per group it contains
    (vectorized 2-D bincount over group x value codes); the only shuffle
    moves those ``groups x blocks`` partials through a single groupby-Sum.
    The pivot width is fixed by ``values`` — this is the bounded-width
    pivot; discovering columns from data would make the schema data-
    dependent, which Ray Data (rightly) can't stream."""
    from ray.data.aggregate import Sum as RSum

    vmap = {v: i for i, v in enumerate(values)}
    ncols = [f"n_{v}" for v in values]

    def partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        p = b.column(pivot_col).to_numpy(zero_copy_only=False)
        up, pinv = np.unique(p, return_inverse=True)       # loop over UNIQUE
        ucodes = np.array([vmap.get(x, -1) for x in up], dtype=np.int64)
        codes = ucodes[pinv] if len(p) else np.zeros(0, dtype=np.int64)
        # ug spans ALL rows (before the unlisted-value mask) so a group whose
        # values are all unlisted still emits an all-zero row, exactly like
        # SQL's count(*) FILTER under GROUP BY
        ug, ginv = np.unique(g, return_inverse=True)
        keep = codes >= 0
        flat = np.bincount(ginv[keep] * len(values) + codes[keep],
                           minlength=len(ug) * len(values))
        mat = flat.reshape(len(ug), len(values))
        # explicit type: an empty ug would otherwise infer a null-typed
        # column and emit schema-divergent blocks
        cols = {group_col: pa.array(ug, type=b.schema.field(group_col).type)}
        for i, c in enumerate(ncols):
            cols[c] = pa.array(mat[:, i].astype(np.int64))
        return pa.table(cols)

    return (ds.select_columns([group_col, pivot_col])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby(group_col)
            .aggregate(*[RSum(c, alias_name=c) for c in ncols]))


def running_total(events: "ray.data.Dataset", *,
                  group_col: str = "user_id", ts_col: str = "ts",
                  val_col: str = "value", id_col: str = "event_id",
                  out_col: str = "running") -> "ray.data.Dataset":
    """Per-group running (cumulative) sum of ``val_col`` in event-time order
    — the streaming-prefix window (`sum() OVER (PARTITION BY g ORDER BY ts,
    id ROWS UNBOUNDED PRECEDING)`).

    ``id_col`` joins the sort key because equal timestamps are common and a
    ts-only ORDER BY leaves the prefix sum nondeterministic — on BOTH the
    engine and SQL sides.

    Scale shape: same as ``sessionize`` — the only wide step is one
    ``groupby(group_col)``; each group is one user's events, reduced with a
    vectorized lexsort + cumsum inside ``map_groups``."""

    def prefix(g) -> "pd.DataFrame":
        import pandas as pd

        ts = g[ts_col].to_numpy().astype("datetime64[us]")
        ev = g[id_col].to_numpy()
        v = g[val_col].to_numpy(dtype=np.float64)
        order = np.lexsort((ev, ts.astype(np.int64)))
        return pd.DataFrame({
            group_col: g[group_col].to_numpy()[order],
            id_col: ev[order],
            ts_col: ts[order],
            out_col: np.cumsum(v[order]),
        })

    return (events.select_columns([group_col, ts_col, id_col, val_col])
            .groupby(group_col)
            .map_groups(prefix, batch_format="pandas"))


def event_gaps(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-user lag window: for every event with a predecessor (same user,
    ordered by ``(ts, event_id)``), the gap to that predecessor in
    microseconds. Emits ``(event_id, user_id, gap_us)`` — the first event of
    each user is dropped (inner-lag semantics, the DuckDB
    ``lag() OVER (PARTITION BY user_id ORDER BY ts, event_id)`` twin).

    Scale shape: the only wide step is one ``groupby(user_id)`` (each group
    is a single user's events); inside the group everything is a vectorized
    lexsort + diff. The ``(ts, event_id)`` order key makes ties exact —
    equal timestamps order by event id on both the engine and SQL sides."""

    def gaps(g) -> "pd.DataFrame":
        import pandas as pd

        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts))
        ts, eid = ts[order], eid[order]
        return pd.DataFrame({
            "event_id": eid[1:],
            "user_id": np.repeat(g["user_id"].iloc[0], max(len(ts) - 1, 0)),
            "gap_us": np.diff(ts),
        })

    return (events.select_columns(["event_id", "user_id", "ts"])
            .groupby("user_id")
            .map_groups(gaps, batch_format="pandas"))


def grouped_corr(ds: "ray.data.Dataset", group_col: str, x_col: str,
                 y_col: str) -> "pa.Table":
    """Per-group Pearson correlation from one-pass raw moments: each batch
    reduces to one (group, n, Sx, Sy, Sxx, Syy, Sxy) partial row, the only
    shuffle moves those partials, and the tiny grouped frame folds to
    ``corr = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))``
    (round-6; groups with zero variance in either column emit NULL).
    The SQL twin computes the SAME raw-moment formula (not corr()) so both
    sides share one arithmetic path (float policy)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        x = b.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = b.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        gu, gi = np.unique(g, return_inverse=True)
        m = len(gu)
        return pa.table({
            group_col: pa.array(gu),
            "n_p": np.bincount(gi, minlength=m).astype(np.int64),
            "sx_p": np.bincount(gi, weights=x, minlength=m),
            "sy_p": np.bincount(gi, weights=y, minlength=m),
            "sxx_p": np.bincount(gi, weights=x * x, minlength=m),
            "syy_p": np.bincount(gi, weights=y * y, minlength=m),
            "sxy_p": np.bincount(gi, weights=x * y, minlength=m),
        })

    folded = (ds.select_columns([group_col, x_col, y_col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(group_col)
              .aggregate(Sum("n_p", alias_name="n"),
                         Sum("sx_p", alias_name="sx"),
                         Sum("sy_p", alias_name="sy"),
                         Sum("sxx_p", alias_name="sxx"),
                         Sum("syy_p", alias_name="syy"),
                         Sum("sxy_p", alias_name="sxy"))).to_pandas()
    folded = folded.sort_values(group_col).reset_index(drop=True)
    n = folded["n"].to_numpy(dtype=np.float64)
    vx = n * folded["sxx"].to_numpy() - folded["sx"].to_numpy() ** 2
    vy = n * folded["syy"].to_numpy() - folded["sy"].to_numpy() ** 2
    cov = n * folded["sxy"].to_numpy() - \
        folded["sx"].to_numpy() * folded["sy"].to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = np.round(cov / np.sqrt(vx * vy), 6)
    valid = (vx > 0) & (vy > 0)
    return pa.table({
        group_col: pa.array(folded[group_col]),
        "n": pa.array(folded["n"].astype(np.int64)),
        "corr_xy": pa.array([float(c) if v else None
                             for c, v in zip(corr, valid)],
                            type=pa.float64()),
    })


def ohlc_hourly(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-(user, hour) OHLC bars: open/close = first/last ``value`` in
    ``(ts, event_id)`` order, high/low = max/min, plus count and round-6
    volume (sum). The temporal-downsampling aggregate (time-series
    compaction for feature pipelines).

    Scale shape: a textbook MERGEABLE combiner — each batch reduces every
    (user, hour) it touches to ONE partial row carrying (first key+value,
    last key+value, min, max, n, sum); only those partials ride the single
    groupby exchange, and the merge (pick global first/last, fold min/max)
    runs on a handful of partials per group. Raw events never shuffle."""
    HOUR_US = 3_600_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts = (b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        user = b.column("user_id").to_numpy(zero_copy_only=False)
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        val = b.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        hour = ts // HOUR_US
        order = np.lexsort((eid, ts, hour, user))
        user, hour, ts, eid, val = (a[order] for a in (user, hour, ts, eid, val))
        new = np.concatenate([[True], (user[1:] != user[:-1])
                              | (hour[1:] != hour[:-1])])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(user)) - 1
        # min/max/sum per run (vectorized reduceat)
        return pa.table({
            "user_id": user[starts], "hour": hour[starts],
            "o_ts": ts[starts], "o_eid": eid[starts], "o_val": val[starts],
            "c_ts": ts[ends], "c_eid": eid[ends], "c_val": val[ends],
            "hi_p": np.maximum.reduceat(val, starts),
            "lo_p": np.minimum.reduceat(val, starts),
            "n_p": (ends - starts + 1).astype(np.int64),
            "sum_p": np.add.reduceat(val, starts),
        })

    def merge(g) -> "pd.DataFrame":
        import pandas as pd

        o = np.lexsort((g["o_eid"].to_numpy(), g["o_ts"].to_numpy()))[0]
        c = np.lexsort((-g["c_eid"].to_numpy(), -g["c_ts"].to_numpy()))[0]
        return pd.DataFrame([{
            "user_id": g["user_id"].iloc[0],
            "hour": np.int64(g["hour"].iloc[0]),
            "open": g["o_val"].iloc[o],
            "high": g["hi_p"].max(),
            "low": g["lo_p"].min(),
            "close": g["c_val"].iloc[c],
            "n_events": np.int64(g["n_p"].sum()),
            "volume": round(float(g["sum_p"].sum()), 6),
        }])

    return (events.select_columns(["event_id", "user_id", "ts", "value"])
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["user_id", "hour"])
            .map_groups(merge, batch_format="pandas"))


def user_value_quantiles_cont(
    events: "ray.data.Dataset",
    qs: tuple = (0.25, 0.5, 0.75),
) -> "ray.data.Dataset":
    """Exact per-user INTERPOLATED quantiles of ``value`` — the SQL-standard
    ``percentile_cont`` rule (h = (n-1)q; v = v[floor(h)] + (h - floor(h)) *
    (v[floor(h)+1] - v[floor(h)])), the linear-interpolation complement of
    :func:`user_value_quantiles`'s element-exact percentile_disc. Round-6
    on both sides (float policy). Same scale shape: ONE groupby(user),
    vectorized sort + interpolation per group."""

    def quants(g) -> "pd.DataFrame":
        import math

        import pandas as pd

        v = np.sort(g["value"].to_numpy(dtype=np.float64))
        n = len(v)
        row = {"user_id": g["user_id"].iloc[0], "n_events": n}
        for q in qs:
            h = (n - 1) * q
            lo = int(math.floor(h))
            hi = min(lo + 1, n - 1)
            row[f"p{round(q * 100)}c"] = round(v[lo] + (h - lo) * (v[hi] - v[lo]), 6)
        return pd.DataFrame([row])

    return (events.select_columns(["user_id", "value"])
            .groupby("user_id")
            .map_groups(quants, batch_format="pandas"))


def returned_revenue_by_customer(
    customer: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    lineitem: "ray.data.Dataset",
    nation: "ray.data.Dataset",
    *,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    k: int = 20,
) -> "pa.Table":
    """TPC-H Q10 analog — the four-table join pipeline: which customers
    returned the most revenue in a quarter.

    Scale shapes (each table treated at its 100-TB role):
    - lineitem (largest): filter l_returnflag='R' at the batch level, then
      map-side combine revenue per orderkey BEFORE the exchange;
    - orders: date-range filter + column prune, then ONE hash-partitioned
      ``Dataset.join`` against the combined lineitem partials (the only
      large-large exchange);
    - per-customer grouped sum is small (bounded by |customers|);
    - customer: second hash join against the grouped sum (customer >> the
      grouped result is still possible at scale, so this stays a join, not
      a broadcast);
    - nation (25 rows): broadcast via ``ray.put`` and mapped in-batch.
    Driver sees only the final top-k.
    """
    import ray as _ray

    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    def li_partial(b: pa.Table) -> pa.Table:
        rf = b.column("l_returnflag").to_numpy(zero_copy_only=False)
        m = rf == "R"
        okey = b.column("l_orderkey").to_numpy(zero_copy_only=False)[m]
        rev = (b.column("l_extendedprice").to_numpy(zero_copy_only=False)[m]
               * (1.0 - b.column("l_discount").to_numpy(zero_copy_only=False)[m]))
        uk, inv = np.unique(okey, return_inverse=True)
        psum = np.zeros(len(uk), dtype=np.float64)
        np.add.at(psum, inv, rev)
        return pa.table({"l_orderkey": pa.array(uk, type=pa.int64()),
                         "rev_partial": pa.array(psum)})

    def orders_filter(b: pa.Table) -> pa.Table:
        od = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        m = (od >= lo) & (od < hi)
        return pa.table({
            "o_orderkey": b.column("o_orderkey").filter(pa.array(m)),
            "o_custkey": b.column("o_custkey").filter(pa.array(m)),
        })

    li = lineitem.select_columns(
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow")
    ords = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_filter, batch_format="pyarrow")
    joined = li.join(ords, join_type="inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    per_cust = joined.groupby("o_custkey").aggregate(
        Sum("rev_partial", alias_name="revenue"))

    cust = customer.select_columns(["c_custkey", "c_name", "c_nationkey",
                                    "c_acctbal"])
    enriched = per_cust.join(cust, join_type="inner", num_partitions=8,
                             on=("o_custkey",), right_on=("c_custkey",))

    nat = {int(k_): v for k_, v in zip(
        *[nation.to_pandas()[c].to_numpy() for c in ("n_nationkey", "n_name")])}
    nat_ref = _ray.put(nat)

    def add_nation(b: pa.Table) -> pa.Table:
        lut = _ray.get(nat_ref)
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        names = pa.array([lut[int(x)] for x in nk], type=pa.string())
        return b.append_column("n_name", names)

    out = enriched.map_batches(add_nation, batch_format="pyarrow").to_pandas()
    out["revenue"] = out["revenue"].round(4)
    out = out.rename(columns={"o_custkey": "c_custkey"})
    out = out.sort_values(["revenue", "c_custkey"],
                          ascending=[False, True]).head(k)
    out = out[["c_custkey", "c_name", "n_name", "c_acctbal", "revenue"]]
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def json_props_stats(events: "ray.data.Dataset",
                     field: str = "k") -> "pa.Table":
    """Semi-structured extraction: pull an integer field out of the JSON
    ``props`` column and aggregate it per event_type.

    Hot path is ZERO-python-loop: ``pc.extract_regex`` pulls the field's
    integer straight out of the JSON text, anchored so only FLAT
    top-level integer fields match. Everything else (null props, nested
    objects, non-integer values) falls to a ``json.loads`` loop over only
    the mismatches, which keeps TOP-LEVEL integer values and DROPS the
    rest — the declared semantics of an integer field (the SQL twin's
    BIGINT cast would error on a float). Aggregation is map-side partial
    (per batch, per type) -> one tiny groupby over partials.
    """
    import json as _json

    import pyarrow.compute as pc

    # anchored to a FLAT top-level object: no nested braces may precede
    # the field, and the integer must be terminated by ',' or '}' — so
    # nested objects and non-integer values never false-positive; they
    # fall to the json.loads path below
    pat = ('^\\{[^{}]*"' + field + '"\\s*:\\s*(?P<v>-?\\d+)\\s*[,}]')

    def extract_partial(b: pa.Table) -> pa.Table:
        props = b.column("props")
        ext = pc.extract_regex(props, pat)
        v_str = pc.struct_field(ext, "v")
        vals = v_str.to_pandas()          # object array, None on no-match
        miss = vals.isna() & props.to_pandas().notna()
        if miss.any():                    # fallback: real JSON parse
            raw = props.to_pandas()
            for i in np.flatnonzero(miss.to_numpy()):
                try:
                    d = _json.loads(raw.iloc[i])
                    v = d.get(field) if isinstance(d, dict) else None
                    # mirror the twin's CAST(json_extract_string AS BIGINT):
                    # ints and integer STRINGS count (bool is an int
                    # subclass — exclude); floats would error the SQL cast,
                    # so they are dropped here
                    if isinstance(v, int) and not isinstance(v, bool):
                        vals.iloc[i] = int(v)
                    elif isinstance(v, str) and re.fullmatch(r"-?\d+", v):
                        vals.iloc[i] = int(v)
                except (ValueError, TypeError):
                    pass
        ok = vals.notna().to_numpy()
        v = vals[ok].astype(np.int64).to_numpy()
        et = b.column("event_type").to_numpy(zero_copy_only=False)[ok]
        ut, inv = np.unique(et, return_inverse=True)
        cnt = np.bincount(inv)
        s = np.zeros(len(ut), dtype=np.int64)
        np.add.at(s, inv, v)
        mx = np.full(len(ut), np.iinfo(np.int64).min)
        np.maximum.at(mx, inv, v)
        return pa.table({"event_type": pa.array(ut, type=pa.string()),
                         "cnt": pa.array(cnt.astype(np.int64)),
                         "sum_v": pa.array(s),
                         "max_v": pa.array(mx)})

    partials = events.select_columns(["event_type", "props"]).map_batches(
        extract_partial, batch_format="pyarrow")
    out = (partials.groupby("event_type")
           .aggregate(Sum("cnt", alias_name="n"),
                      Sum("sum_v", alias_name="sum_v"),
                      Max("max_v", alias_name="max_v"))
           .to_pandas())
    out["avg_v"] = (out["sum_v"] / out["n"]).round(6)
    out = out.sort_values("event_type").reset_index(drop=True)
    out[["n", "sum_v", "max_v"]] = out[["n", "sum_v", "max_v"]].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def late_events(events: "ray.data.Dataset",
                delay_us: int = 30 * 60 * 1_000_000,
                bucket_width: int = 100_000) -> "pa.Table":
    """Watermark-style late-data detection: an event is LATE iff its
    event time ``ts`` is more than ``delay_us`` behind the running maximum
    ts over all events that ARRIVED earlier (arrival order = event_id).

    A global running max is a cross-partition PREFIX SCAN — the one shape
    a plain groupby can't express. Decomposition (scan = local reduce +
    exclusive prefix + seeded local scan):
      1. map_batches partials: (bucket, max_ts) per event_id-bucket per
         batch — only these tiny rows ride the first (combiner) groupby;
      2. driver: exclusive prefix-max over the bounded bucket maxima,
         broadcast once via ``ray.put``;
      3. ONE real groupby(bucket).map_groups: sort by event_id, exclusive
         cummax seeded with the bucket's prefix, count late per type.
    Exact at any parallelism; raw events shuffle exactly once.
    """
    import ray as _ray

    def bucket_partial(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        bk = eid // bucket_width
        ub, inv = np.unique(bk, return_inverse=True)
        mx = np.full(len(ub), np.iinfo(np.int64).min)
        np.maximum.at(mx, inv, ts)
        return pa.table({"bucket": pa.array(ub, type=pa.int64()),
                         "max_ts": pa.array(mx, type=pa.int64())})

    from ray.data.aggregate import Max as _Max

    bmax = (events.select_columns(["event_id", "ts"])
            .map_batches(bucket_partial, batch_format="pyarrow")
            .groupby("bucket").aggregate(_Max("max_ts", alias_name="max_ts"))
            .to_pandas())
    if bmax.empty:                             # empty input -> empty result
        return pa.table({"event_type": pa.array([], type=pa.string()),
                         "n_late": pa.array([], type=pa.int64()),
                         "n_events": pa.array([], type=pa.int64())})
    bmax = bmax.sort_values("bucket")
    buckets = bmax["bucket"].to_numpy(dtype=np.int64)
    maxima = bmax["max_ts"].to_numpy(dtype=np.int64)
    # exclusive prefix over OCCUPIED buckets (gaps carry forward implicitly)
    prefix = {int(buckets[0]): np.iinfo(np.int64).min}
    run = maxima[0]
    for b_, m_ in zip(buckets[1:], maxima[1:]):
        prefix[int(b_)] = run
        run = max(run, m_)
    seed_ref = _ray.put(prefix)

    def scan(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        seeds = _ray.get(seed_ref)
        g = g.sort_values("event_id")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        run_max = np.maximum.accumulate(ts)
        hwm = np.empty_like(ts)
        hwm[0] = seeds[int(g["bucket"].iloc[0])]
        hwm[1:] = np.maximum(run_max[:-1], hwm[0])
        late = (hwm != np.iinfo(np.int64).min) & (ts < hwm - delay_us)
        et = g["event_type"].to_numpy()
        ut, inv = np.unique(et, return_inverse=True)
        n_late = np.zeros(len(ut), dtype=np.int64)
        np.add.at(n_late, inv, late.astype(np.int64))
        return pd.DataFrame({"event_type": ut, "n_late": n_late,
                             "n_events": np.bincount(inv).astype(np.int64)})

    def add_bucket(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array(eid // bucket_width, type=pa.int64()))

    per_bucket = (events.select_columns(["event_id", "ts", "event_type"])
                  .map_batches(add_bucket, batch_format="pyarrow")
                  .groupby("bucket").map_groups(scan, batch_format="pandas")
                  .to_pandas())
    out = (per_bucket.groupby("event_type", as_index=False)
           [["n_late", "n_events"]].sum()
           .sort_values("event_type").reset_index(drop=True))
    out[["n_late", "n_events"]] = out[["n_late", "n_events"]].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def cohort_retention(events: "ray.data.Dataset",
                     week_us: int = 7 * 86_400 * 1_000_000) -> "pa.Table":
    """Cohort retention: users grouped by first-seen week, counted as
    retained in each later week they were active.

    Shapes at scale: (1) per-user first week = one groupby(user) Min —
    map-side combinable; (2) distinct (user, week) activity = map-side
    per-batch dedup partials, then the pair groupby dedups globally;
    (3) cohort attach = hash-partitioned Dataset.join (user cardinality
    can rival the corpus, so no broadcast); (4) final (cohort_week,
    week_offset) distinct-user count is a small grouped aggregate.
    All week math is integer µs // week — exact, timezone-free.
    Output: (cohort_week, week_offset, n_users), sorted.
    """
    from ray.data.aggregate import Min

    def to_week(b: pa.Table) -> pa.Table:
        ts = (b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        wk = ts // week_us
        t = pa.table({"user_id": b.column("user_id"),
                      "week": pa.array(wk, type=pa.int64())})
        # map-side dedup: one (user, week) row per batch
        return t.group_by(["user_id", "week"]).aggregate([])

    from ray.data.aggregate import Count as _Count

    pairs = (events.select_columns(["user_id", "ts"])
             .map_batches(to_week, batch_format="pyarrow")
             .groupby(["user_id", "week"])
             .aggregate(_Count(alias_name="_c"))      # global distinct
             .drop_columns(["_c"]))
    # cohort week from the already-deduped pairs — the corpus is scanned
    # and week-bucketized exactly once
    first = pairs.groupby("user_id").aggregate(
        Min("week", alias_name="cohort_week"))
    joined = pairs.join(first, join_type="inner", num_partitions=8,
                        on=("user_id",))

    def offset(b: pa.Table) -> pa.Table:
        wk = b.column("week").to_numpy(zero_copy_only=False)
        cw = b.column("cohort_week").to_numpy(zero_copy_only=False)
        return pa.table({
            "cohort_week": b.column("cohort_week"),
            "week_offset": pa.array(wk - cw, type=pa.int64()),
        })

    from ray.data.aggregate import Count

    out = (joined.map_batches(offset, batch_format="pyarrow")
           .groupby(["cohort_week", "week_offset"])
           .aggregate(Count(alias_name="n_users"))
           .to_pandas()
           .sort_values(["cohort_week", "week_offset"])
           .reset_index(drop=True))
    out["n_users"] = out["n_users"].astype(np.int64)
    out["cohort_week"] = out["cohort_week"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def session_funnel(events: "ray.data.Dataset",
                   stages: tuple[str, str, str] = ("view", "click",
                                                   "purchase"),
                   gap_minutes: int = 30) -> "pa.Table":
    """Ordered conversion funnel within sessions: a session converts to
    stage 2 iff it has a stage-2 event AT/after its first stage-1 event,
    and to stage 3 iff a stage-3 event lands at/after that first
    qualifying stage-2 event (first-qualifying-time semantics; >= keeps
    equal-µs ties consistent with the SQL twin).

    Shape: ONE groupby(user) (the sessionize shuffle); per user the
    session split and all three stage times are vectorized pandas; only
    per-user partial counters leave the group, summed on the driver.
    Output: one row (n_sessions, n_s1, n_s12, n_s123).
    """
    gap_us = gap_minutes * 60_000_000
    s1, s2, s3 = stages

    def per_user(g) -> "pd.DataFrame":
        import pandas as pd

        order = np.lexsort((g["event_id"].to_numpy(),
                            g["ts"].to_numpy()))
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(
            np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        new_s = np.empty(len(ts), dtype=np.int64)
        new_s[0] = 1
        new_s[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(new_s)
        df = pd.DataFrame({"sid": sid, "ts": ts, "et": et})
        n_sessions = int(sid[-1])
        t1 = (df[df.et == s1].groupby("sid")["ts"].min())
        n_s1 = len(t1)
        d2 = df[df.et == s2].merge(t1.rename("t1"), on="sid")
        t2 = (d2[d2.ts >= d2.t1].groupby("sid")["ts"].min())
        n_s12 = len(t2)
        d3 = df[df.et == s3].merge(t2.rename("t2"), on="sid")
        n_s123 = int((d3[d3.ts >= d3.t2].groupby("sid").size() > 0).sum())
        return pd.DataFrame([{"n_sessions": n_sessions, "n_s1": n_s1,
                              "n_s12": n_s12, "n_s123": n_s123}])

    parts = (events.select_columns(["user_id", "ts", "event_type",
                                    "event_id"])
             .groupby("user_id")
             .map_groups(per_user, batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return pa.table({
            "n_sessions": pa.array([0], type=pa.int64()),
            "n_s1": pa.array([0], type=pa.int64()),
            "n_s12": pa.array([0], type=pa.int64()),
            "n_s123": pa.array([0], type=pa.int64()),
        })
    tot = parts.sum()
    return pa.table({
        "n_sessions": pa.array([int(tot.n_sessions)], type=pa.int64()),
        "n_s1": pa.array([int(tot.n_s1)], type=pa.int64()),
        "n_s12": pa.array([int(tot.n_s12)], type=pa.int64()),
        "n_s123": pa.array([int(tot.n_s123)], type=pa.int64()),
    })


def unpivot(ds: "ray.data.Dataset", group_col: str,
            value_cols: list[str], name_col: str = "name",
            value_col: str = "value") -> "ray.data.Dataset":
    """Wide -> long reshape (the inverse of pivot_counts): each input row
    emits one output row per entry of ``value_cols`` with the column name
    in ``name_col``. Stateless vectorized map_batches (repeat + tile), no
    shuffle — partitioning is preserved."""

    def melt(b: pa.Table) -> pa.Table:
        n = b.num_rows
        k = len(value_cols)
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        vals = np.empty(n * k, dtype=np.int64)
        for i, c in enumerate(value_cols):
            vals[i::k] = b.column(c).to_numpy(zero_copy_only=False)
        return pa.table({
            group_col: pa.array(np.repeat(g, k),
                                type=b.schema.field(group_col).type),
            name_col: pa.array(np.tile(np.array(value_cols, dtype=object),
                                       n), type=pa.string()),
            value_col: pa.array(vals),
        })

    return ds.map_batches(melt, batch_format="pyarrow")


def user_value_ntile(events: "ray.data.Dataset", n: int = 4) -> "ray.data.Dataset":
    """NTILE(n) per user over arrival order (ts, event_id) — SQL's
    equal-frequency bucketing rule: the first ``count %% n`` buckets get
    one extra row. One groupby(user) shuffle; bucket assignment per group
    is a vectorized arange/searchsorted, no Python loop over rows.
    Rows: (event_id, user_id, tile)."""

    def tiles(g) -> "pd.DataFrame":
        import pandas as pd

        order = np.lexsort((g["event_id"].to_numpy(), g["ts"].to_numpy()))
        eid = g["event_id"].to_numpy()[order]
        cnt = len(eid)
        base, extra = divmod(cnt, n)
        # bucket boundaries: first `extra` buckets sized base+1, rest base
        sizes = np.full(min(n, cnt), base, dtype=np.int64)
        sizes[:extra] += 1
        bounds = np.cumsum(sizes)
        tile = np.searchsorted(bounds, np.arange(cnt), side="right") + 1
        return pd.DataFrame({
            "event_id": eid,
            "user_id": np.repeat(g["user_id"].iloc[0], cnt),
            "tile": tile.astype(np.int64),
        })

    return (events.select_columns(["user_id", "ts", "event_id"])
            .groupby("user_id")
            .map_groups(tiles, batch_format="pandas"))


def session_event_paths(events: "ray.data.Dataset",
                        gap_minutes: int = 30) -> "ray.data.Dataset":
    """Per-session event-type PATH string ('view>click>purchase', arrival
    order) — the group-concat / journey-analysis op. Same single
    groupby(user) shape as sessionize; the concat per session runs on one
    user's bounded rows. Rows: (user_id, session_id, path, n_events)."""
    gap_us = gap_minutes * 60_000_000

    def paths(g) -> "pd.DataFrame":
        import pandas as pd

        order = np.lexsort((g["event_id"].to_numpy(), g["ts"].to_numpy()))
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(
            np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        new_s = np.empty(len(ts), dtype=np.int64)
        new_s[0] = 1
        new_s[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(new_s)
        df = pd.DataFrame({"session_id": sid, "et": et})
        out = df.groupby("session_id")["et"].agg(">".join).reset_index()
        out = out.rename(columns={"et": "path"})
        out["n_events"] = df.groupby("session_id").size().to_numpy(
            dtype=np.int64)
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["session_id"] = out["session_id"].astype(np.int64)
        return out

    return (events.select_columns(["user_id", "ts", "event_type",
                                   "event_id"])
            .groupby("user_id")
            .map_groups(paths, batch_format="pandas"))


def customer_order_activity(
    customer: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """LEFT OUTER join coverage: every customer row survives, with
    (n_orders, total_spent) from a per-custkey order aggregate and 0s for
    customers that never ordered.

    Scale shape: orders pre-reduce per custkey inside map_batches (partial
    count/sum) and then through ONE small groupby, so the hash-partitioned
    ``Dataset.join(join_type='left_outer')`` exchange moves at most one
    aggregate row per customer — never raw orders. The null side of the
    outer join is coalesced vectorized post-join."""
    from ray.data.aggregate import Sum as RSum

    def pre(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        tp = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        ck_s, tp_s = ck[order], tp[order]
        starts = np.flatnonzero(np.r_[True, ck_s[1:] != ck_s[:-1]])
        bounds = np.r_[starts, len(ck_s)]
        return pa.table({
            "o_custkey": pa.array(ck_s[starts], type=pa.int64()),
            "n_p": pa.array(np.diff(bounds), type=pa.int64()),
            "s_p": pa.array(np.add.reduceat(tp_s, starts)
                            if len(ck_s) else np.zeros(0),
                            type=pa.float64())})

    agg = (orders.select_columns(["o_custkey", "o_totalprice"])
           .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("o_custkey")
           .aggregate(RSum("n_p", alias_name="n_orders"),
                      RSum("s_p", alias_name="total_spent")))

    joined = customer.select_columns(["c_custkey", "c_name"]).join(
        agg, join_type="left_outer", num_partitions=num_partitions,
        on=("c_custkey",), right_on=("o_custkey",))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.fill_null(b.column("n_orders"), 0)
        s = pc.fill_null(b.column("total_spent"), 0.0)
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "c_name": b.column("c_name"),
            "n_orders": pc.cast(n, pa.int64()),
            "total_spent": pa.array(
                np.round(s.to_numpy(zero_copy_only=False), 2),
                type=pa.float64())})

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def user_click_purchase_matrix(
    events: "ray.data.Dataset",
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """FULL-OUTER-join semantics: per-user click counts ⋈ per-user purchase
    counts — users active on only one side survive with zero for the
    missing side.

    Scale shape: instead of a two-sided hash join, each batch emits
    one-sided partial rows (user, n_clicks_p, n_purchases_p) and a SINGLE
    groupby(user) sums both columns — the union-of-partials form of a full
    outer join on aggregates. One exchange, no empty-partition hazard
    (Ray 2.49's Dataset.join(full_outer) raises ArrowInvalid when a hash
    partition's left side is empty), and the shuffle moves one partial row
    per (batch, active user)."""
    from ray.data.aggregate import Sum as RSum

    def pre(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = b.column("event_type")
        out_u, out_c, out_p = [], [], []
        for ev, col in (("click", "c"), ("purchase", "p")):
            m = pc.equal(et, ev)
            u = b.column("user_id").filter(m).to_numpy(zero_copy_only=False)
            uu, cc = np.unique(u, return_counts=True)
            out_u.append(uu)
            out_c.append(cc if col == "c" else np.zeros(len(uu), np.int64))
            out_p.append(cc if col == "p" else np.zeros(len(uu), np.int64))
        return pa.table({
            "user_id": pa.array(np.concatenate(out_u), type=pa.int64()),
            "nc_p": pa.array(np.concatenate(out_c), type=pa.int64()),
            "np_p": pa.array(np.concatenate(out_p), type=pa.int64())})

    return (events.select_columns(["user_id", "event_type"])
            .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("user_id")
            .aggregate(RSum("nc_p", alias_name="n_clicks"),
                       RSum("np_p", alias_name="n_purchases")))


def event_transitions(events: "ray.data.Dataset") -> pd.DataFrame:
    """First-order Markov transition matrix over event types: for every
    consecutive event pair within a user's (ts, event_id)-ordered stream,
    (from_type, to_type, n, p_r) with p_r = round(n / total-from, 6).

    Scale shape: ONE groupby(user) — each group is one user's bounded
    stream, pair counts computed vectorized in-group — then a tiny
    groupby((from, to)) sum; the |types|^2 result and its row-normalizing
    totals finish on the driver. Raw events ride the first exchange once;
    nothing else is wide."""
    import pandas as pd

    from ray.data.aggregate import Sum as RSum

    def per_user(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        if len(et) < 2:
            return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                                 "to_type": pd.Series([], dtype=object),
                                 "n_p": pd.Series([], dtype=np.int64)})
        pairs = pd.DataFrame({"from_type": et[:-1], "to_type": et[1:]})
        c = (pairs.groupby(["from_type", "to_type"], sort=True)
             .size().reset_index(name="n_p"))
        c["n_p"] = c["n_p"].astype(np.int64)
        return c

    counts = (events.select_columns(["user_id", "event_id", "ts",
                                     "event_type"])
              .groupby("user_id").map_groups(per_user, batch_format="pandas")
              .groupby(["from_type", "to_type"])
              .aggregate(RSum("n_p", alias_name="n"))
              .to_pandas())
    counts["n"] = counts["n"].astype(np.int64)
    tot = counts.groupby("from_type")["n"].transform("sum")
    counts["p_r"] = np.round(counts["n"].to_numpy(dtype=np.float64)
                             / tot.to_numpy(dtype=np.float64), 6)
    return (counts.sort_values(["from_type", "to_type"])
            .reset_index(drop=True))


def user_mode_event(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """MODE aggregate per group: each user's most frequent event type
    (ties -> lexicographically smallest type). Per-(user,type) counts
    pre-reduce per batch, ride ONE small groupby, and the per-user argmax
    runs vectorized inside a second tiny groupby."""
    from ray.data.aggregate import Sum as RSum

    def pre(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
            "event_type": b.column("event_type").to_pylist()})
        c = (df.groupby(["user_id", "event_type"], sort=True)
             .size().reset_index(name="n_p"))
        return pa.Table.from_pandas(c, preserve_index=False)

    counts = (events.select_columns(["user_id", "event_type"])
              .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
              .groupby(["user_id", "event_type"])
              .aggregate(RSum("n_p", alias_name="n")))

    def argmax(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        g = g.sort_values(["n", "event_type"],
                          ascending=[False, True]).head(1)
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(dtype=np.int64),
            "mode_type": g["event_type"].to_numpy(),
            "n": g["n"].to_numpy(dtype=np.int64)})

    return counts.groupby("user_id").map_groups(argmax,
                                                batch_format="pandas")
