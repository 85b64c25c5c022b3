"""Chart-data stage: renderer-agnostic specs for the reference's dashboards.

Reference parity: ``/root/reference/src/visualization/charts.py:6-92`` renders
a 4-panel plotly dashboard (match-score histogram nbins=20, match-type pie,
completeness scatter, hourly-match bar) plus a registry-quality radar. The
UI/plotly layer is out of scope for a headless engine; what the engine owes is
the DATA behind every panel, computed distributedly, packaged as a declarative
spec dict any frontend (plotly/vega/JSON API) can render.

Scale note: every panel is an aggregate (histogram / group-count) except the
completeness scatter, which the reference draws from raw rows. At engine scale
the raw cloud is replaced by a deterministic md5-hash sample capped at
``scatter_cap`` points — same visual, bounded payload, identical across runs
and parallelism levels.
"""

from __future__ import annotations

from typing import Optional

import ray.data

from . import analytics
from .sampling import stratified_hash_sample

__all__ = ["match_quality_chart_spec", "data_quality_radar_spec"]

_QUALITY_METRICS = (
    "street_completeness",
    "house_completeness",
    "building_completeness",
    "avg_completeness",
)


def match_quality_chart_spec(
    matches: ray.data.Dataset,
    scatter_cap: int = 5000,
    id_col: str = "ADDRESS_ID_SPR",
    ts_col: Optional[str] = None,
) -> dict:
    """Four-panel match-quality dashboard data (charts.py:6-49).

    One distributed aggregate per panel; the input Dataset is consumed up to
    four times, so pass a materialized matches Dataset (as the pipeline's
    sink already holds one).
    """
    hist = analytics.histogram(matches, "MATCH_SCORE", bins=20, lo=0.0, hi=100.0)
    hist_rows = sorted(
        (r["bin"], r["cnt"]) for r in hist.take_all()
    )
    types = analytics.value_counts(matches, "MATCH_TYPE")
    type_rows = sorted(
        ((r["MATCH_TYPE"], r["cnt"]) for r in types.take_all()),
        key=lambda t: (-t[1], t[0]),
    )

    n = matches.count()
    sample = matches.select_columns(
        [id_col, "COMPLETENESS_SPR", "COMPLETENESS_CAD"]
    )
    if n > scatter_cap:
        # two-step deterministic downsample: ~cap/n via the hash filter, then a
        # hard limit so the payload is bounded even under hash-rate variance
        frac = min(1.0, 1.5 * scatter_cap / n)
        max_hex = format(int(frac * 0xFFFF), "04x")
        sample = stratified_hash_sample(sample, id_col, max_hex=max_hex)
    pts = sample.limit(scatter_cap).take_all()
    scatter = sorted(
        (str(r[id_col]), r["COMPLETENESS_SPR"], r["COMPLETENESS_CAD"]) for r in pts
    )

    panels = [
        {
            "kind": "histogram",
            "title": "Match Score Distribution",
            "x": "MATCH_SCORE",
            "bins": 20,
            "range": [0.0, 100.0],
            "data": [{"bin": b, "count": c} for b, c in hist_rows],
        },
        {
            "kind": "pie",
            "title": "Match Type Distribution",
            "data": [{"label": t, "value": c} for t, c in type_rows],
        },
        {
            "kind": "scatter",
            "title": "Completeness Analysis",
            "x": "COMPLETENESS_SPR",
            "y": "COMPLETENESS_CAD",
            "sampled": n > scatter_cap,
            "data": [{"id": i, "x": x, "y": y} for i, x, y in scatter],
        },
    ]
    if ts_col is not None:
        hourly = analytics.hourly_counts(matches, ts_col)
        hourly_rows = sorted((r["hour"], r["cnt"]) for r in hourly.take_all())
        panels.append({
            "kind": "bar",
            "title": "Matches Over Time",
            "x": "hour",
            "data": [{"hour": h, "count": c} for h, c in hourly_rows],
        })
    return {
        "title": "Match Quality Analysis Dashboard",
        "n_matches": n,
        "panels": panels,
    }


def data_quality_radar_spec(spr_quality: dict, cad_quality: dict) -> dict:
    """Radar comparison of per-registry quality scalars (charts.py:53-92).

    Pure driver-side dict math over the (already aggregated) quality metrics;
    values are percentages with the first axis repeated to close the polygon,
    exactly as the reference renders it.
    """
    labels = list(_QUALITY_METRICS) + [_QUALITY_METRICS[0]]

    def _pct(q: dict) -> list:
        # engine quality_metrics names the first axis street_name_completeness;
        # the reference radar calls it street_completeness — accept both
        def get(m):
            if m == "street_completeness" and m not in q:
                return q["street_name_completeness"]
            return q[m]

        vals = [round(get(m) * 100.0, 6) for m in _QUALITY_METRICS]
        return vals + [vals[0]]

    return {
        "title": "Data Quality Comparison (%)",
        "kind": "radar",
        "axes": labels,
        "series": [
            {"name": "SPR Registry", "values": _pct(spr_quality)},
            {"name": "Cadastre Registry", "values": _pct(cad_quality)},
        ],
        "range": [0, 100],
    }
