"""Engine-variant matcher vs a literal pandas transcription of
/root/reference/src/matching/engine.py (exact SEARCH_KEY phase, 4-way candidate
union, weighted score, threshold_poor cutoff, top-100, quality labels)."""

import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray
import ray.data

from registry_address_matcher_ray.pipelines.linkage import preprocess
from registry_address_matcher_ray.sources import synth
from registry_address_matcher_ray.stages.engine_variant import (
    build_engine_cad_table,
    engine_variant_matches,
    match_quality_label,
    weighted_fuzzy_score,
)

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from reference_oracle import preprocess as oracle_preprocess  # noqa: E402


def oracle_engine_match(spr_raw: pd.DataFrame, cad_raw: pd.DataFrame,
                        threshold_poor=50.0, max_results=100) -> pd.DataFrame:
    """Literal transcription of engine.py:117-249 (canonical candidate order =
    ascending row order, matching the engine module's documented canonicalization)."""
    spr = oracle_preprocess(spr_raw).reset_index(drop=True)
    cad = oracle_preprocess(cad_raw).reset_index(drop=True)
    street_index, house_index, skey_index, flex_index, comp_index = {}, {}, {}, {}, {}
    for i, row in cad.iterrows():
        st, h, sk = row["STREET_NORM"], row["HOUSE_NORM"], row["SEARCH_KEY"]
        if st:
            street_index.setdefault(st, []).append(i)
            comp_index.setdefault(st[:3], []).append(i)
        if h:
            house_index.setdefault(h, []).append(i)
        if len(h) >= 2:
            flex_index.setdefault(h[:2], []).append(i)
        if sk:
            skey_index.setdefault(sk, []).append(i)
    out = []
    for _, srow in spr.iterrows():
        sk = srow["SEARCH_KEY"]
        exact = skey_index.get(sk, []) if sk else []
        if exact:
            for ci in exact:
                out.append((srow["ADDRESS_ID"], cad.at[ci, "ADDRESS_ID"], 100.0,
                            "Excellent", "Exact"))
            continue
        cands = set()
        cands.update(street_index.get(srow["STREET_NORM"], []))
        cands.update(house_index.get(srow["HOUSE_NORM"], []))
        if len(srow["HOUSE_NORM"]) >= 2:
            cands.update(flex_index.get(srow["HOUSE_NORM"][:2], []))
        if len(srow["STREET_NORM"]) >= 3:
            cands.update(comp_index.get(srow["STREET_NORM"][:3], []))
        scored = []
        for ci in sorted(cands):
            sc = weighted_fuzzy_score(sk, cad.at[ci, "SEARCH_KEY"])
            if sc >= threshold_poor:
                scored.append((sc, ci))
        scored.sort(key=lambda t: -t[0])
        for sc, ci in scored[:max_results]:
            out.append((srow["ADDRESS_ID"], cad.at[ci, "ADDRESS_ID"], sc,
                        match_quality_label(sc), "Fuzzy"))
    return pd.DataFrame(out, columns=["spr_index", "cad_index", "match_score",
                                      "match_quality", "match_type"])


@pytest.fixture(scope="module")
def small_registries():
    t = synth.synth_registries(250, seed=21)
    return t["registry_spr"].to_pandas(), t["registry_cad"].to_pandas()


def _engine_run(spr_df, cad_df, **kw):
    spr = preprocess(ray.data.from_pandas(spr_df))
    cad = preprocess(ray.data.from_pandas(cad_df)).materialize()
    cad_ref = ray.put(build_engine_cad_table(cad))
    return engine_variant_matches(spr, cad_ref, **kw).to_pandas()


def test_engine_variant_matches_oracle(small_registries, ray_session):
    spr_df, cad_df = small_registries
    got = _engine_run(spr_df, cad_df)
    exp = oracle_engine_match(spr_df, cad_df)
    key = ["spr_index", "cad_index", "match_type"]
    got_s = got[key + ["match_score", "match_quality"]].sort_values(key).reset_index(drop=True)
    exp_s = exp[key + ["match_score", "match_quality"]].sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(exp_s)
    pd.testing.assert_frame_equal(got_s, exp_s, check_dtype=False, atol=1e-9)
    assert (got["match_type"] == "Exact").any() and (got["match_type"] == "Fuzzy").any()


def test_engine_variant_exact_is_search_key_only(ray_session):
    """SURVEY §2.12.6: SEARCH_KEY equality matches even when buildings differ."""
    spr = pd.DataFrame({"ADDRESS_ID": ["s1"], "STREET_NAME": ["ԱԲՈՎՅԱՆ"],
                        "HOUSE": ["5"], "BUILDING": ["1"]})
    cad = pd.DataFrame({"ADDRESS_ID": ["c1"], "STREET_NAME": ["ԱԲՈՎՅԱՆ"],
                        "HOUSE": ["5"], "BUILDING": ["2"]})
    got = _engine_run(spr, cad)
    assert len(got) == 1 and got.at[0, "match_type"] == "Exact"
    assert got.at[0, "match_score"] == 100.0


def test_engine_variant_top_k_cap(ray_session):
    """One spr row against many same-street cads: results capped at max_results."""
    spr = pd.DataFrame({"ADDRESS_ID": ["s1"], "STREET_NAME": ["ՄԱՇՏՈՑԻ ՊՈՂՈՏԱ"],
                        "HOUSE": ["7"], "BUILDING": [""]})
    cad = pd.DataFrame({
        "ADDRESS_ID": [f"c{i}" for i in range(30)],
        "STREET_NAME": ["ՄԱՇՏՈՑԻ ՊՈՂՈՏԱ"] * 30,
        "HOUSE": [str(100 + i) for i in range(30)],
        "BUILDING": [""] * 30,
    })
    got = _engine_run(spr, cad, max_results=5)
    assert len(got) == 5
    assert (got["match_score"].diff().dropna() <= 1e-12).all()  # sorted desc
    labels = set(got["match_quality"])
    assert labels <= {"Excellent", "Good", "Poor"}
