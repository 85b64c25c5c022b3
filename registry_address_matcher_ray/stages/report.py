"""S8: markdown summary-report sink (reference parity: /root/reference/address.py:1640-1726).

The reference renders its report from in-memory pandas frames; here every input
number is a distributed aggregate over the matches / unmatched Datasets, and the
rendered markdown is returned (and optionally written) by the driver. The
timestamp is caller-provided so report bytes are deterministic in tests.
"""

from __future__ import annotations

import os
from typing import List, Optional

import pyarrow.compute as pc
import ray.data


def _count_where(ds: ray.data.Dataset, col: str, op, value) -> int:
    def _f(batch):
        return batch.filter(op(batch.column(col), value))

    return ds.map_batches(_f, batch_format="pyarrow").count()


def chart_data(
    matches: ray.data.Dataset,
    score_bins: int = 20,
    scatter_sample: int = 2000,
) -> dict:
    """Data series behind the reference's match-quality dashboard
    (``/root/reference/src/visualization/charts.py:6-49``), as distributed
    aggregates — the rendering (plotly) is UI-layer and out of scope; every
    series is JSON-able:

    - ``score_histogram``: 20-bin MATCH_SCORE counts (Histogram trace);
    - ``match_type_counts``: MATCH_TYPE value counts (Pie trace);
    - ``completeness_scatter``: a bounded sample of (COMPLETENESS_SPR,
      COMPLETENESS_CAD) points (Scatter trace — sampled, never the full set);
    - ``hourly_counts``: matches per hour when MATCH_TIMESTAMP exists.
    """
    from .analytics import histogram, hourly_counts, value_counts

    out: dict = {}
    hist = histogram(matches, "MATCH_SCORE", bins=score_bins, lo=0.0, hi=100.0)
    out["score_histogram"] = {
        int(r["bin"]): int(r["cnt"]) for r in hist.take_all()}
    out["match_type_counts"] = {
        r["MATCH_TYPE"]: int(r["cnt"])
        for r in value_counts(matches, "MATCH_TYPE").take_all()}
    sample = matches.select_columns(
        ["COMPLETENESS_SPR", "COMPLETENESS_CAD"]).limit(scatter_sample).take_all()
    out["completeness_scatter"] = [
        (float(r["COMPLETENESS_SPR"]), float(r["COMPLETENESS_CAD"])) for r in sample]
    if "MATCH_TIMESTAMP" in matches.schema().names:
        out["hourly_counts"] = {
            int(r["hour"]): int(r["cnt"])
            for r in hourly_counts(matches, "MATCH_TIMESTAMP").take_all()}
    return out


def summary_report(
    matches: ray.data.Dataset,
    spr_total: int,
    unmatched: Optional[ray.data.Dataset] = None,
    matching_method: str = "Comprehensive",
    processing_time_s: float = 0.0,
    generated_at: str = "",
    out_path: Optional[str] = None,
) -> str:
    """Render the reference's markdown summary report from distributed aggregates.

    Quality buckets, recommendations, match rate and average score follow
    address.py:1655-1716 (thresholds 90/80, rec rules at :1657-1676).
    """
    n_matches = matches.count()
    avg_score = 0.0
    high = medium = low = 0
    if n_matches > 0:
        from ray.data.aggregate import Mean

        avg_score = float(matches.aggregate(Mean("MATCH_SCORE", alias_name="m"))["m"])
        high = _count_where(matches, "MATCH_SCORE", pc.greater_equal, 90.0)
        low = _count_where(matches, "MATCH_SCORE", pc.less, 80.0)
        medium = n_matches - high - low
    match_rate = n_matches / spr_total if spr_total > 0 else 0.0

    recommendations: List[str] = []
    if n_matches > 0:
        if avg_score < 85:
            recommendations.append(
                "Consider lowering the matching threshold to capture more potential matches")
        if low > n_matches * 0.2:
            recommendations.append(
                "High number of low-quality matches - review and possibly adjust matching parameters")
    if match_rate < 0.5:
        recommendations.append(
            "Low match rate - consider data quality improvements or relaxed matching criteria")
    if unmatched is not None:
        n_unmatched = unmatched.count()
        if n_unmatched > 0:
            low_compl = _count_where(
                unmatched, "COMPLETENESS_SCORE", pc.less, 0.5)
            if low_compl > n_unmatched * 0.3:
                recommendations.append(
                    "Many unmatched records have low completeness - focus on data quality improvement")

    avg_score_text = f"{avg_score:.1f}" if n_matches > 0 else "N/A"
    rec_block = "\n".join(f"- {r}" for r in recommendations) \
        if recommendations else "- No specific recommendations"
    text = f"""# Address Matching Summary Report

**Generated:** {generated_at}
**Method:** {matching_method}
**Processing Time:** {processing_time_s:.2f} seconds

## Results Overview
- **Total SPR Records:** {spr_total:,}
- **Total Matches:** {n_matches:,}
- **Match Rate:** {match_rate:.1%}
- **Average Score:** {avg_score_text}

## Quality Assessment
- **High Quality Matches (>=90):** {high}
- **Medium Quality Matches (80-89):** {medium}
- **Low Quality Matches (<80):** {low}

## Recommendations
{rec_block}
"""
    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, out_path)
    return text
