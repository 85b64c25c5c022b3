"""Hot-key salting in the as-of / range co-shuffle joins.

A pathologically hot probe key is forced through the salting pre-pass
(``max_group_rows`` far below the key's row count) and must produce results
identical to the unsalted plan and to a pandas oracle.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from registry_address_matcher_ray.stages import analytics as A


@pytest.fixture(scope="module")
def hot_tables():
    rng = np.random.default_rng(7)
    n_hot, n_cold = 3000, 50
    base = np.datetime64("2024-01-01T00:00:00", "us")
    lrows = pd.DataFrame({
        "user_id": ["hot"] * n_hot + [f"u{i % 10}" for i in range(n_cold)],
        "ts": base + rng.integers(0, 10**9, n_hot + n_cold).astype("timedelta64[us]"),
        "event_id": np.arange(n_hot + n_cold, dtype=np.int64),
    })
    rrows = pd.DataFrame({
        "o_custkey": ["hot"] * 200 + [f"u{i % 10}" for i in range(40)],
        "o_orderdate": base + rng.integers(0, 10**9, 240).astype("timedelta64[us]"),
    })
    return lrows, rrows


def _asof_oracle(lrows: pd.DataFrame, rrows: pd.DataFrame) -> pd.Series:
    out = {}
    for _, r in lrows.iterrows():
        cand = rrows[(rrows["o_custkey"] == r["user_id"])
                     & (rrows["o_orderdate"] <= r["ts"])]["o_orderdate"]
        out[int(r["event_id"])] = cand.max() if len(cand) else pd.NaT
    return pd.Series(out)


def test_asof_salted_equals_unsalted_and_oracle(hot_tables, ray_session):
    lrows, rrows = hot_tables
    left = ray.data.from_pandas(lrows).repartition(8)
    right = ray.data.from_pandas(rrows).repartition(4)

    kw = dict(left_key="user_id", right_key="o_custkey",
              left_ts="ts", right_ts="o_orderdate",
              left_id="event_id", out_col="asof")
    salted = A.asof_join_latest(left, right, max_group_rows=200, **kw).to_pandas()
    plain = A.asof_join_latest(left, right, **kw).to_pandas()

    s = salted.set_index("event_id")["asof"].sort_index()
    p = plain.set_index("event_id")["asof"].sort_index()
    assert len(s) == len(lrows)
    pd.testing.assert_series_equal(s, p, check_names=False)

    oracle = _asof_oracle(lrows, rrows).sort_index()
    pd.testing.assert_series_equal(
        s, oracle.astype(s.dtype), check_names=False)


def test_range_salted_equals_unsalted(hot_tables, ray_session):
    lrows, rrows = hot_tables
    left = ray.data.from_pandas(lrows).repartition(8)
    right = ray.data.from_pandas(rrows).repartition(4)

    kw = dict(left_key="user_id", right_key="o_custkey",
              left_ts="ts", right_ts="o_orderdate",
              left_id="event_id", window_s=86_400.0, out_col="cnt")
    salted = A.range_join_count(left, right, max_group_rows=200, **kw).to_pandas()
    plain = A.range_join_count(left, right, **kw).to_pandas()

    s = salted.set_index("event_id")["cnt"].sort_index()
    p = plain.set_index("event_id")["cnt"].sort_index()
    assert len(s) == len(lrows)
    assert (s == p).all()
    # the hot key really went through >1 shard
    assert s.loc[: len(lrows)].notna().all()


def test_hot_right_side_warns(hot_tables, ray_session, caplog):
    import logging

    lrows, rrows = hot_tables
    left = ray.data.from_pandas(lrows.head(60))
    right = ray.data.from_pandas(rrows)  # 200 'hot' rows > bound of 100
    with caplog.at_level(logging.WARNING,
                         logger="registry_address_matcher_ray.stages.analytics"):
        out = A.asof_join_latest(
            left, right, left_key="user_id", right_key="o_custkey",
            left_ts="ts", right_ts="o_orderdate", left_id="event_id",
            max_group_rows=100).to_pandas()
    assert len(out) == 60
    assert any("hot BUILD side" in m or "salting cannot" in m
               for m in caplog.messages)
