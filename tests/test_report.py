"""S8 markdown report sink: aggregates and recommendation rules
(/root/reference/address.py:1640-1726)."""

import pandas as pd
import ray.data

from registry_address_matcher_ray.stages.report import summary_report


def _matches(scores):
    return ray.data.from_pandas(pd.DataFrame({
        "MATCH_SCORE": scores,
        "ADDRESS_ID_SPR": [f"s{i}" for i in range(len(scores))],
    }))


def test_report_buckets_and_rate(ray_session, tmp_path):
    m = _matches([95.0, 92.0, 85.0, 70.0])
    out = str(tmp_path / "report.md")
    text = summary_report(m, spr_total=5, generated_at="2026-01-01 00:00:00",
                          out_path=out)
    assert "**Total Matches:** 4" in text
    assert "**Match Rate:** 80.0%" in text
    assert "(>=90):** 2" in text
    assert "(80-89):** 1" in text
    assert "(<80):** 1" in text
    assert open(out).read() == text


def test_report_recommendations(ray_session):
    # avg < 85 and low-quality fraction > 20% -> first two recommendations
    m = _matches([70.0, 60.0, 95.0])
    text = summary_report(m, spr_total=100)
    assert "lowering the matching threshold" in text
    assert "low-quality matches" in text
    assert "Low match rate" in text  # 3/100 < 0.5

    unmatched = ray.data.from_pandas(pd.DataFrame({
        "COMPLETENESS_SCORE": [0.2, 0.3, 0.4, 0.9]}))
    text2 = summary_report(m, spr_total=100, unmatched=unmatched)
    assert "low completeness" in text2


def test_report_empty_matches(ray_session):
    m = _matches([]).filter(lambda r: True)
    text = summary_report(m, spr_total=0)
    assert "**Average Score:** N/A" in text
    assert "No specific recommendations" not in text or "Low match rate" not in text


def test_chart_data_series(fixtures_small):
    """Chart-data layer behind /root/reference/src/visualization/charts.py:6-49."""
    import json

    import ray.data

    from registry_address_matcher_ray.pipelines import linkage
    from registry_address_matcher_ray.stages.report import chart_data

    t = fixtures_small
    m = linkage.match_registries(
        ray.data.from_arrow(t["registry_spr"]),
        ray.data.from_arrow(t["registry_cad"]),
    ).materialize()
    data = chart_data(m)
    n = m.count()
    assert sum(data["score_histogram"].values()) == n
    assert sum(data["match_type_counts"].values()) == n
    assert set(data["match_type_counts"]) <= {
        "EXACT_FULL", "EXACT_KEY", "FUZZY_STREET_TOKEN_SORT_RATIO",
        "FUZZY_STREET_TOKEN_SET_RATIO", "FUZZY_STREET_PARTIAL_RATIO",
        "FUZZY_STREET_RATIO"}
    assert 0 < len(data["completeness_scatter"]) <= 2000
    json.dumps(data)  # every series is JSON-able
