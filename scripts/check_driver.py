"""Local simulation of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` callable at the given sf_dir, compares
row-count + schema + order-insensitive value hash against ``oracle_sql()`` via
DuckDB (same tables pre-registered as views), prints one line per query.

Usage: python scripts/check_driver.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import logging
import sys
import time

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(canon(df).to_csv(index=False).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows, cols={sorted(got.columns)} ({dt:.1f}s)")
            continue
        want = con.execute(oracles[name]).df()
        ok_rows = len(got) == len(want)
        ok_schema = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_schema and value_hash(got) == value_hash(want)
        if ok_hash:
            print(f"PASS  {name}: {len(got)} rows ({dt:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: rows {len(got)}/{len(want)} schema_ok={ok_schema} ({dt:.1f}s)")
            if ok_schema and ok_rows:
                g, w = canon(got), canon(want)
                neq = (g != w) & ~(g.isna() & w.isna())
                bad = neq.any(axis=1)
                print("   engine:", g[bad].head(3).to_dict("records"))
                print("   oracle:", w[bad].head(3).to_dict("records"))
            else:
                print("   engine cols:", sorted(got.columns))
                print("   oracle cols:", sorted(want.columns))
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
