"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle SQL at a given sf and compare row-count, schema
(column names) and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if hasattr(res, "to_pandas"):
        try:
            return res.to_pandas()
        except TypeError:
            pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype(np.float64)
        if str(df[c].dtype) in ("int32", "uint32", "uint64", "int16", "int8", "bool"):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def dtype_kinds(df: pd.DataFrame) -> list[str]:
    """Per-column dtype KIND ('i', 'f', 'O', 'M', ...) — the driver's
    value hash is dtype-representation-sensitive (12.0 != 12), so a
    float-vs-int kind mismatch must FAIL here even when values compare
    equal (round-1 lesson: forward_shuffle / sessionize slipped through
    a width-normalizing canon)."""
    return [df.dtypes[c].kind for c in df.columns]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--json")]
    json_out = next((a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")), None)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: ray side raised {type(e).__name__}: {e}")
            results[name] = {"status": "fail", "err": f"{type(e).__name__}: {e}"}
            n_fail += 1
            continue
        if name not in sqls:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            results[name] = {"status": "rows_only", "rows": len(got)}
            continue
        exp = canon(con.sql(sqls[name]).df())
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns) and dtype_kinds(got) == dtype_kinds(exp)
        ok_vals = False
        detail = ""
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                detail = str(e).split("\n")[0:3]
        status = "OK  " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(f"[{status}] {name}: rows {len(got)}/{len(exp)} cols_match={ok_cols} vals_match={ok_vals} {detail}")
        if not ok_cols:
            print(f"        ray={list(got.columns)} kinds={dtype_kinds(got)}\n        sql={list(exp.columns)} kinds={dtype_kinds(exp)}")
        results[name] = {
            "status": "ok" if status == "OK  " else "fail",
            "rows": len(got),
            "oracle_rows": len(exp),
            "cols_match": bool(ok_cols),
            "vals_match": bool(ok_vals),
        }
    ray.shutdown()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(results)} queries)")
    return n_fail


if __name__ == "__main__":
    raise SystemExit(main())
