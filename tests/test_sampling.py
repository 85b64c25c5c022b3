"""Deterministic split / sample / per-key cap operators (stages/sampling.py)."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from registry_address_matcher_ray.stages import sampling


@pytest.fixture(scope="module")
def docs_df():
    rng = np.random.default_rng(3)
    return pd.DataFrame({
        "doc_id": np.arange(2000),
        "lang": rng.choice(["en", "de", "zh"], size=2000, p=[0.6, 0.3, 0.1]),
    })


def test_hash_split_fractions_and_determinism(docs_df):
    out = sampling.hash_split(rd.from_pandas(docs_df), "doc_id").to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.04
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03
    # matches the reference md5 formula row-for-row
    def exp_one(i):
        h = hashlib.md5(str(i).encode()).hexdigest()[:4]
        return "train" if h < "cccc" else ("val" if h < "e666" else "test")
    exp = docs_df["doc_id"].map(exp_one)
    got = out.set_index("doc_id").loc[docs_df["doc_id"], "split"].values
    assert (got == exp.values).all()


def test_stratified_sample_rate_holds_per_stratum(docs_df):
    ds = rd.from_pandas(docs_df).repartition(8)
    out = sampling.stratified_hash_sample(ds, "doc_id").to_pandas()
    # ~10% overall and within each stratum (binomial tolerance)
    assert abs(len(out) / len(docs_df) - 0.1) < 0.03
    for lang, g in docs_df.groupby("lang"):
        rate = (out["lang"] == lang).sum() / len(g)
        assert abs(rate - 0.1) < 0.06, (lang, rate)
    # identical at different parallelism
    out2 = sampling.stratified_hash_sample(
        rd.from_pandas(docs_df).repartition(2), "doc_id").to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_per_key_topn_matches_pandas():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.integers(0, 40, size=1500),
        "v": rng.normal(size=1500).round(6),
        "id": np.arange(1500),
    })
    got = (
        sampling.per_key_topn(
            rd.from_pandas(df).repartition(7), "k",
            order_by=[("v", True), ("id", False)], n=3)
        .to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
    )
    exp = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
        .groupby("k", sort=False).head(3)
        .sort_values(["k", "id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "v", "id"]], exp[["k", "v", "id"]])
