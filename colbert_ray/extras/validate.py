"""Declarative data-validation (expectations) over a Dataset.

A large-scale ingest pipeline gates its inputs on rule suites ("no null
keys", "prices in range", "status in vocabulary", "primary key unique") and
records violation counts per rule. Rules here are declarative dicts so a
suite can live in config; evaluation is one streaming pass of vectorized
per-batch partial counts + a tiny sum — except ``unique``, which needs one
hash shuffle of (value -> count) partials (duplicate detection is global by
nature).

Rule kinds:
- ``{"rule": name, "kind": "not_null",  "col": c}``
- ``{"rule": name, "kind": "range",     "col": c, "lo": x, "hi": y}``
  (violation = value outside [lo, hi]; nulls are NOT range violations —
  pair with a not_null rule)
- ``{"rule": name, "kind": "in_set",    "col": c, "values": [...]}``
- ``{"rule": name, "kind": "regex",     "col": c, "pattern": p}``
  (violation = no RE2 match anywhere in the string)
- ``{"rule": name, "kind": "unique",    "col": c}``
  (violation = every row whose value occurs more than once)

Output: (rule, n_violations, n_checked) per rule, one row each.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _batch_violations(batch: pa.Table, rule: dict) -> tuple[int, int]:
    col = batch.column(rule["col"])
    kind = rule["kind"]
    n = len(col)
    if kind == "not_null":
        return col.null_count, n
    if kind == "range":
        ok = pc.and_(pc.greater_equal(col, rule["lo"]),
                     pc.less_equal(col, rule["hi"]))
        bad = pc.sum(pc.fill_null(pc.invert(ok), False)).as_py() or 0
        return int(bad), n
    if kind == "in_set":
        # Arrow's is_in yields FALSE (not null) for null inputs — mask nulls
        # explicitly so, as in SQL's NOT IN, a null is not a vocab violation
        ok = pc.is_in(col, value_set=pa.array(rule["values"],
                                              type=col.type))
        bad_mask = pc.and_(pc.invert(ok), pc.is_valid(col))
        bad = pc.sum(bad_mask).as_py() or 0
        return int(bad), n
    if kind == "regex":
        ok = pc.match_substring_regex(pc.cast(col, pa.string()),
                                      rule["pattern"])
        bad = pc.sum(pc.fill_null(pc.invert(ok), False)).as_py() or 0
        return int(bad), n
    raise ValueError(f"unknown rule kind: {kind}")


def expect(ds: "ray.data.Dataset", rules: list[dict]) -> pd.DataFrame:
    """Evaluate a rule suite; returns the tiny per-rule violation report
    (rule, n_violations, n_checked) sorted by rule name.

    Scale shape: all row-local rules share ONE streaming pass (per-batch
    vectorized partial counts, summed on the driver — the partials are a
    handful of ints per batch). Each ``unique`` rule adds one
    (value, partial_count) groupby; only distinct values per batch ride
    that exchange, and the duplicate tally reduces inside the groupby."""
    from ray.data.aggregate import Sum as RSum

    local = [r for r in rules if r["kind"] != "unique"]
    uniques = [r for r in rules if r["kind"] == "unique"]
    names = [r["rule"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")

    out_rows: list[tuple[str, int, int]] = []

    if local:
        cols = sorted({r["col"] for r in local})

        def partials(batch: pa.Table) -> pa.Table:
            row = {}
            for i, r in enumerate(local):
                v, c = _batch_violations(batch, r)
                row[f"v{i}"] = [v]
                row[f"c{i}"] = [c]
            return pa.table(row)

        agg = (ds.select_columns(cols)
               .map_batches(partials, batch_format="pyarrow",
                            zero_copy_batch=True)
               .sum([f"v{i}" for i in range(len(local))]
                    + [f"c{i}" for i in range(len(local))]))
        for i, r in enumerate(local):
            out_rows.append((r["rule"], int(agg[f"sum(v{i})"] or 0),
                             int(agg[f"sum(c{i})"] or 0)))

    for r in uniques:
        col = r["col"]

        def vc(batch: pa.Table, _col=col) -> pa.Table:
            v = batch.column(_col).to_numpy(zero_copy_only=False)
            uu, cc = np.unique(v, return_counts=True)
            return pa.table({"val": pa.array(uu),
                             "n_p": pa.array(cc, type=pa.int64())})

        grouped = (ds.select_columns([col])
                   .map_batches(vc, batch_format="pyarrow",
                                zero_copy_batch=True)
                   .groupby("val")
                   .aggregate(RSum("n_p", alias_name="n")))

        def tally(batch: pa.Table) -> pa.Table:
            n = batch.column("n").to_numpy(zero_copy_only=False)
            return pa.table({"dup_p": pa.array([int(n[n > 1].sum())]),
                             "tot_p": pa.array([int(n.sum())])})

        # duplicates AND the row total reduce in the same single execution
        agg2 = (grouped.map_batches(tally, batch_format="pyarrow")
                .sum(["dup_p", "tot_p"]))
        out_rows.append((r["rule"], int(agg2["sum(dup_p)"] or 0),
                         int(agg2["sum(tot_p)"] or 0)))

    return (pd.DataFrame(out_rows,
                         columns=["rule", "n_violations", "n_checked"])
            .astype({"n_violations": np.int64, "n_checked": np.int64})
            .sort_values("rule").reset_index(drop=True))
