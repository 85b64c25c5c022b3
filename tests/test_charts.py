"""Chart-data stage: panel data equals the underlying distributed aggregates."""

import numpy as np
import pandas as pd
import ray.data as rd

from registry_address_matcher_ray.stages import charts


def _matches_df(n=400, seed=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "ADDRESS_ID_SPR": [f"S{i}" for i in range(n)],
        "MATCH_SCORE": rng.uniform(60, 100, size=n).round(2),
        "MATCH_TYPE": rng.choice(
            ["EXACT_FULL", "EXACT_KEY", "FUZZY"], size=n, p=[0.5, 0.2, 0.3]),
        "COMPLETENESS_SPR": rng.uniform(0, 1, size=n).round(3),
        "COMPLETENESS_CAD": rng.uniform(0, 1, size=n).round(3),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86400, size=n), unit="s"),
    })


def test_match_quality_spec_panels():
    df = _matches_df()
    spec = charts.match_quality_chart_spec(
        rd.from_pandas(df).repartition(4).materialize(), ts_col="ts")
    assert spec["n_matches"] == len(df)
    kinds = [p["kind"] for p in spec["panels"]]
    assert kinds == ["histogram", "pie", "scatter", "bar"]

    hist = {p["bin"]: p["count"] for p in spec["panels"][0]["data"]}
    exp_bins = np.clip((df["MATCH_SCORE"] / 5.0).astype(int), 0, 19).value_counts()
    assert hist == exp_bins.to_dict()

    pie = {p["label"]: p["value"] for p in spec["panels"][1]["data"]}
    assert pie == df["MATCH_TYPE"].value_counts().to_dict()

    # below the cap the scatter is the full point cloud
    assert len(spec["panels"][2]["data"]) == len(df)
    assert spec["panels"][2]["sampled"] is False

    bar = {p["hour"]: p["count"] for p in spec["panels"][3]["data"]}
    assert bar == df["ts"].dt.hour.value_counts().to_dict()


def test_scatter_downsampled_above_cap_and_deterministic():
    df = _matches_df(n=800)
    ds = rd.from_pandas(df).materialize()
    s1 = charts.match_quality_chart_spec(ds, scatter_cap=100)
    s2 = charts.match_quality_chart_spec(
        rd.from_pandas(df).repartition(8).materialize(), scatter_cap=100)
    p1, p2 = s1["panels"][2], s2["panels"][2]
    assert p1["sampled"] and len(p1["data"]) <= 100
    assert p1["data"] == p2["data"]  # hash sample: parallelism-invariant


def test_radar_spec_closes_polygon():
    q = {"street_name_completeness": 0.9, "house_completeness": 0.8,
         "building_completeness": 0.5, "avg_completeness": 0.75}
    spec = charts.data_quality_radar_spec(q, dict(q, avg_completeness=0.6))
    assert spec["axes"][0] == spec["axes"][-1] == "street_completeness"
    for s in spec["series"]:
        assert s["values"][0] == s["values"][-1]
    assert spec["series"][0]["values"][:4] == [90.0, 80.0, 50.0, 75.0]
