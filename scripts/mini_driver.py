"""Local stand-in for the round driver: runs entry() + every queries() entry
at a given sf, executes the matching oracle_sql() in DuckDB (with the
testdata tables registered as views), and compares row-count, schema and an
order-insensitive value hash — the same gate shape as CORRECTNESS_r{N}.json.

Usage: python scripts/mini_driver.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive content hash: name-sorted columns, stringified rows
    (floats rounded), sorted row digest list."""
    import hashlib

    df = df.reindex(sorted(df.columns), axis=1)
    norm = df.copy()
    for c in norm.columns:
        if norm[c].dtype.kind == "f":
            norm[c] = norm[c].round(6)
    rows = norm.astype(str).agg("|".join, axis=1).sort_values()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    # render oracle_sql() for THIS tier (the round driver leaves the default,
    # sf0.01; exporting it here proves the gate is tier-independent)
    import os

    os.environ["TCR_ORACLE_SF_DIR"] = sf_dir
    import __ray_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    print("== entry() smoke ==")
    t0 = time.time()
    res = to_pandas(mod.entry())
    print(f"entry rows={len(res)} cols={list(res.columns)} sec={time.time()-t0:.2f}")

    qs, sqls = mod.queries(), mod.oracle_sql()
    report = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
            ray_sec = time.time() - t0
        except Exception as e:  # noqa: BLE001
            report[name] = {"status": "RAY_ERROR", "error": str(e)[:500]}
            print(f"[{name}] RAY_ERROR {e}")
            continue
        if name not in sqls:
            report[name] = {"status": "ROWS_ONLY", "rows": len(got), "ray_sec": round(ray_sec, 2)}
            print(f"[{name}] rows-only: {len(got)} rows ({ray_sec:.2f}s)")
            continue
        try:
            exp = con.execute(sqls[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            report[name] = {"status": "SQL_ERROR", "error": str(e)[:500]}
            print(f"[{name}] SQL_ERROR {e}")
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = value_hash(got) == value_hash(exp) if ok_rows and ok_cols else False
        status = "MATCH" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        report[name] = {
            "status": status, "rows": len(got), "oracle_rows": len(exp),
            "cols_ok": ok_cols, "hash_ok": ok_hash, "ray_sec": round(ray_sec, 2),
        }
        print(f"[{name}] {status} rows={len(got)}/{len(exp)} cols_ok={ok_cols} "
              f"hash_ok={ok_hash} ({ray_sec:.2f}s)")
        if status == "MISMATCH" and ok_cols and ok_rows:
            merged = got.reindex(sorted(got.columns), axis=1)
            print("  got head:\n", merged.head(3).to_string())
            print("  exp head:\n", exp.reindex(sorted(exp.columns), axis=1).head(3).to_string())

    print(json.dumps(report, indent=2, default=str))
    bad = [n for n, r in report.items() if r["status"] not in ("MATCH", "ROWS_ONLY")]
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
