"""Live-DB connector tests (sources/sqldb.py): sqlite-backed ray.data.read_sql
ingest must be row-identical to the parquet path, sharded or not."""

import os
import sqlite3

import pandas as pd
import pytest

from registry_address_matcher_ray.sources import io, sqldb

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def orders_db(tmp_path_factory):
    db = str(tmp_path_factory.mktemp("sqldb") / "orders.db")
    n = sqldb.dataset_to_sqlite(os.path.join(SF, "orders.parquet"), db, "orders")
    assert n > 0
    return db, n


def test_read_sql_table_matches_parquet(orders_db):
    db, n = orders_db
    fac = sqldb.connection_factory("sqlite", database=db)
    got = sqldb.read_sql_table(
        "SELECT o_orderkey, o_totalprice FROM orders", fac
    ).to_pandas()
    want = io.read_parquet_clean(
        os.path.join(SF, "orders.parquet"), columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    assert len(got) == n
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_read_sql_sharded_partitions_exactly(orders_db):
    db, n = orders_db
    fac = sqldb.connection_factory("sqlite", database=db)
    ds = sqldb.read_sql_sharded(
        "orders", fac, "o_orderkey", num_shards=4,
        columns=["o_orderkey", "o_custkey"],
    )
    got = ds.to_pandas()
    # exact partition: every row exactly once
    assert len(got) == n
    assert got["o_orderkey"].is_unique
    want = io.read_parquet_clean(
        os.path.join(SF, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_sharding_handles_negative_keys(tmp_path):
    db = str(tmp_path / "neg.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (k INTEGER, v TEXT)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(-7, "a"), (-1, "b"), (0, "c"), (5, "d")])
    con.commit(); con.close()
    fac = sqldb.connection_factory("sqlite", database=db)
    got = sqldb.read_sql_sharded("t", fac, "k", num_shards=3).to_pandas()
    assert sorted(got["v"]) == ["a", "b", "c", "d"]


def test_write_sql_roundtrip(tmp_path):
    db = str(tmp_path / "rt.db")
    src = io.read_parquet_clean(os.path.join(SF, "supplier.parquet"))
    n = sqldb.write_sql_table(src, "supplier", db)
    fac = sqldb.connection_factory("sqlite", database=db)
    got = sqldb.read_sql_table("SELECT * FROM supplier", fac).to_pandas()
    assert len(got) == n
    # sqlite widens INTEGER to int64; values must be lossless
    types = {"s_acctbal": "float64", "s_nationkey": "int64", "s_suppkey": "int64"}
    pd.testing.assert_frame_equal(
        _canon(got.astype(types)), _canon(src.to_pandas().astype(types)))


def test_registry_sql_validates_schema(tmp_path, fixtures_small):
    import ray.data

    spr_tbl = fixtures_small["registry_spr"]
    db = str(tmp_path / "reg.db")
    sqldb.write_sql_table(ray.data.from_arrow(spr_tbl), "spr", db)
    fac = sqldb.connection_factory("sqlite", database=db)
    ds = sqldb.read_registry_sql("spr", fac, "rowid", num_shards=2)
    assert ds.count() == spr_tbl.num_rows
    # a non-registry table must be rejected at ingest
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE bad (x INTEGER)")
    con.execute("INSERT INTO bad VALUES (1)")
    con.commit(); con.close()
    with pytest.raises(io.SchemaValidationError):
        sqldb.read_registry_sql("bad", fac, "x", num_shards=1)


def test_unsupported_engines_fail_loud():
    with pytest.raises(NotImplementedError):
        sqldb.connection_factory("mysql", host="h")
    with pytest.raises(ValueError):
        sqldb.connection_factory("oracle")


def test_write_sql_table_scale_guard(tmp_path):
    """The driver-side sqlite sink refuses corpus-sized datasets up front
    (it is a small-result export, not a corpus sink)."""
    import pytest
    import ray.data

    ds = ray.data.range(100)
    with pytest.raises(ValueError, match="max_rows"):
        sqldb.write_sql_table(ds, "t", str(tmp_path / "g.db"), max_rows=50)
    # opt-out and small writes still work
    n = sqldb.write_sql_table(ds, "t", str(tmp_path / "g.db"), max_rows=None)
    assert n == 100
