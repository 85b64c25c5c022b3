"""Automatic physical-plan selection (SURVEY §7.3(4)).

``fuzzy_strategy="auto"`` (the default) measures the preprocessed cadastre's
byte size and picks broadcast_dedup under ``broadcast_threshold_bytes``, else
the salted shuffle. Both regimes are forced through the auto path here and must
produce row-identical matches to the pandas oracle.
"""

import pandas as pd
import pytest
import ray.data

import reference_oracle as oracle
from registry_address_matcher_ray.pipelines import linkage
from registry_address_matcher_ray.pipelines.config import PipelineConfig

KEY = ["ADDRESS_ID_SPR", "ADDRESS_ID_CAD"]


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(KEY).reset_index(drop=True)


def _run(t, cfg: PipelineConfig) -> pd.DataFrame:
    spr = ray.data.from_arrow(t["registry_spr"])
    cad = ray.data.from_arrow(t["registry_cad"])
    return _sorted(linkage.match_registries(spr, cad, cfg).to_pandas())


def test_auto_picks_broadcast_for_small_cad(fixtures_small):
    got = _run(fixtures_small, PipelineConfig(fuzzy_strategy="auto"))
    assert linkage.LAST_PLAN["strategy"] == "broadcast_dedup"
    assert linkage.LAST_PLAN["forced"] is False
    assert linkage.LAST_PLAN["cad_bytes"] > 0
    expected = _sorted(
        oracle.run_pipeline(
            fixtures_small["registry_spr"].to_pandas(),
            fixtures_small["registry_cad"].to_pandas(),
        )
    )
    assert len(got) == len(expected)
    assert (got[KEY].values == expected[KEY].values).all()


def test_auto_falls_back_to_shuffle_above_threshold(fixtures_small):
    # a 0-byte bound forces the big-big regime through the SAME auto path
    cfg = PipelineConfig(fuzzy_strategy="auto", broadcast_threshold_bytes=0)
    got = _run(fixtures_small, cfg)
    assert linkage.LAST_PLAN["strategy"] == "shuffle"
    # both auto regimes are row-identical
    auto_bcast = _run(fixtures_small, PipelineConfig(fuzzy_strategy="auto"))
    pd.testing.assert_frame_equal(got, auto_bcast, check_dtype=False)


def test_default_config_is_auto():
    assert PipelineConfig().fuzzy_strategy == "auto"


def test_explicit_strategy_bypasses_measurement(fixtures_small):
    _run(fixtures_small, PipelineConfig(fuzzy_strategy="broadcast_dedup"))
    assert linkage.LAST_PLAN == {
        "strategy": "broadcast_dedup", "cad_bytes": None, "forced": True}


def test_unknown_strategy_rejected():
    with pytest.raises(ValueError):
        PipelineConfig(fuzzy_strategy="bogus")


def test_exclude_plan_auto_switch(fixtures_small):
    """Shuffle-plan exact-match exclusion: broadcast is_in below the limit,
    distributed left_anti join above it — row-identical matches, decision
    observable in LAST_PLAN (VERDICT r4 watch-item #1)."""
    base = PipelineConfig(fuzzy_strategy="shuffle")
    got_bcast = _run(fixtures_small, base)
    assert linkage.LAST_PLAN["exclude_plan"] == "broadcast"

    forced = PipelineConfig(fuzzy_strategy="shuffle",
                            exclude_broadcast_limit=0)
    got_join = _run(fixtures_small, forced)
    assert linkage.LAST_PLAN["exclude_plan"] == "join"
    pd.testing.assert_frame_equal(got_bcast, got_join, check_dtype=False)

    # Fuzzy Only: no exact phase -> no exclusion at all
    fuzzy_only = PipelineConfig(fuzzy_strategy="shuffle",
                                method="Fuzzy Only")
    _run(fixtures_small, fuzzy_only)
    assert linkage.LAST_PLAN["exclude_plan"] == "none"
