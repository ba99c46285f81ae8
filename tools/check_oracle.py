"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side by side on one sf dir, compare row count, schema
(column names) and order-insensitive values. Usage:

    PYTHONPATH=. python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Normalize the way the driver's value-hash sees a frame: columns sorted
    by name, integer widths collapsed to int64, float widths to float64,
    objects stringified. Crucially an int-valued float64 column stays float64
    — the driver's hash is dtype-sensitive across the int/float divide (the
    round-3 event_sessions red row), so canon must NOT cross-cast."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            # the driver's hash is timestamp-UNIT-insensitive: engine
            # datetime64[s] vs oracle datetime64[us] was hash-GREEN in
            # CORRECTNESS_r03 (top_revenue_orders) — normalize, don't fail
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # The PQ/IVF-PQ oracle twins inline codebook literals trained at
    # GRAFT_ORACLE_SF_DIR (read by __ray_entry__ at import time). If that
    # scale differs from the dir we gate against, those gates FAIL spuriously
    # — so default it to the target dir, and warn loudly on an explicit pin
    # that disagrees (judge repro, round 4: pq_adc_top5/ivfpq_top5 at sf0.001).
    pinned = os.environ.get("GRAFT_ORACLE_SF_DIR")
    if pinned is None:
        if os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            os.environ["GRAFT_ORACLE_SF_DIR"] = sf_dir
        else:
            # oracle_sql() trains codebooks from ORACLE_SF_DIR's embeddings
            # at import; a partial target dir must not crash the whole
            # sweep before any gate runs — keep the entry module's default
            # and warn that embedding gates would mis-gate against it
            print(f"WARNING: {sf_dir} has no embeddings.parquet; leaving "
                  "GRAFT_ORACLE_SF_DIR at the module default — skip the "
                  "knn/pq/ivf gates against this dir.")
    elif os.path.abspath(pinned) != os.path.abspath(sf_dir):
        print(f"WARNING: GRAFT_ORACLE_SF_DIR={pinned} != target {sf_dir}; "
              "codebook-literal gates (pq_adc_top5, ivfpq_top5, knn ivf family) "
              "will compare against the WRONG scale and may false-FAIL.")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    n_run = 0
    n_rows_only = 0
    t_sweep = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"[{name}] RAY-ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        wall = time.time() - t0
        if name not in oracles:
            n_rows_only += 1
            print(f"[{name}] rows-only: {len(got)} rows, {wall:.1f}s cols={list(got.columns)}")
            continue
        try:
            want = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"[{name}] SQL-ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        ok_rows = len(got) == len(want)
        ok_schema = list(got.columns) == list(want.columns)
        ok_dtypes = True
        if ok_schema:
            for c in got.columns:
                if got[c].dtype != want[c].dtype:
                    ok_dtypes = False
                    print(f"[{name}] DTYPE-MISMATCH {c}: engine={got[c].dtype} "
                          f"oracle={want[c].dtype}")
        ok_vals = False
        if ok_rows and ok_schema and ok_dtypes:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=True,
                                              check_exact=True)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).splitlines()
                print(f"[{name}] VALUE-MISMATCH: {msg[0] if msg else ''}")
                # show first differing rows
                neq = (got != want) & ~(got.isna() & want.isna())
                bad = neq.any(axis=1)
                print(got[bad].head(3))
                print(want[bad].head(3))
        status = "OK" if (ok_rows and ok_schema and ok_dtypes and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"[{name}] {status} rows={len(got)}/{len(want)} "
              f"schema={'=' if ok_schema else f'{list(got.columns)} vs {list(want.columns)}'} "
              f"{wall:.1f}s")
    ray.shutdown()
    # One-line CI verdict: the full sweep is THE regression gate for all
    # queries() entries (156 as of round 5) between driver rounds.
    sweep_wall = time.time() - t_sweep
    if failures:
        print(f"SWEEP RED: {failures}/{n_run} gates failed "
              f"({n_rows_only} rows-only) in {sweep_wall:.0f}s on {sf_dir}")
    else:
        print(f"ALL GREEN: {n_run}/{n_run} gates "
              f"({n_run - n_rows_only} SQL-gated, {n_rows_only} rows-only) "
              f"in {sweep_wall:.0f}s on {sf_dir}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
