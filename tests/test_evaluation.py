"""ER evaluation operators: distributed metrics vs a direct pandas
computation of the same definitions (the definitions themselves are the ones
the F1 gate in test_matching_e2e.py uses)."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from registry_address_matcher_ray.pipelines import linkage
from registry_address_matcher_ray.pipelines.config import PipelineConfig
from registry_address_matcher_ray.stages import evaluation


def _pandas_eval(matches: pd.DataFrame, labeled: pd.DataFrame) -> dict:
    pred = set(map(tuple, matches[["ADDRESS_ID_SPR", "ADDRESS_ID_CAD"]].values))
    truth = set(map(tuple, labeled.loc[labeled.label, ["spr_id", "cad_id"]].values))
    tp = len(pred & truth)
    fp, fn = len(pred) - tp, len(truth) - tp
    p, r = tp / max(1, tp + fp), tp / max(1, tp + fn)
    return {"tp": tp, "fp": fp, "fn": fn, "precision": round(p, 6),
            "recall": round(r, 6), "f1": round(2 * p * r / max(1e-9, p + r), 6)}


def test_pairwise_eval_matches_pandas(fixtures_small, ray_session):
    t = fixtures_small
    m = linkage.match_registries(
        ray.data.from_arrow(t["registry_spr"]),
        ray.data.from_arrow(t["registry_cad"]),
        PipelineConfig(),
    ).materialize()
    got = evaluation.pairwise_eval(
        m, ray.data.from_arrow(t["labeled_pairs"])).iloc[0].to_dict()
    want = _pandas_eval(m.to_pandas(), t["labeled_pairs"].to_pandas())
    assert got == want
    assert want["tp"] > 0  # fixture actually exercises the join


def test_pairwise_eval_empty_truth(fixtures_small, ray_session):
    t = fixtures_small
    m = linkage.match_registries(
        ray.data.from_arrow(t["registry_spr"]),
        ray.data.from_arrow(t["registry_cad"]),
        PipelineConfig(),
    ).materialize()
    empty = pa.table({"spr_id": pa.array([], pa.string()),
                      "cad_id": pa.array([], pa.string()),
                      "label": pa.array([], pa.bool_())})
    row = evaluation.pairwise_eval(m, ray.data.from_arrow(empty)).iloc[0]
    assert row["tp"] == 0 and row["fn"] == 0 and row["recall"] == 0.0
    assert row["fp"] == m.count()


def test_blocking_stats_matches_pandas(fixtures_medium, ray_session):
    from registry_address_matcher_ray.pipelines.linkage import preprocess

    t = fixtures_medium
    spr = preprocess(ray.data.from_arrow(t["registry_spr"])).materialize()
    cad = preprocess(ray.data.from_arrow(t["registry_cad"])).materialize()
    got = evaluation.blocking_stats(
        spr, cad, ray.data.from_arrow(t["labeled_pairs"])).iloc[0].to_dict()

    sdf, cdf = spr.to_pandas(), cad.to_pandas()
    lab = t["labeled_pairs"].to_pandas()
    for df in (sdf, cdf):
        df["hn"] = df["HOUSE_NORM"].fillna("")
        df["bn"] = df["BUILDING_NORM"].fillna("")
    sb = sdf[sdf.hn != ""]
    cb = cdf[cdf.hn != ""]
    ns = sb.groupby(["hn", "bn"]).size()
    nc = cb.groupby(["hn", "bn"]).size()
    cand = int((ns * nc).dropna().sum())
    skey = dict(zip(sb.ADDRESS_ID, zip(sb.hn, sb.bn)))
    ckey = dict(zip(cb.ADDRESS_ID, zip(cb.hn, cb.bn)))
    true_pairs = lab[lab.label]
    co = sum(
        1 for s, c in zip(true_pairs.spr_id, true_pairs.cad_id)
        if s in skey and c in ckey and skey[s] == ckey[c])
    assert got["candidate_pairs"] == cand
    assert got["co_blocked_true"] == co
    assert got["n_true_pairs"] == len(true_pairs)
    assert got["reduction_ratio"] == round(1 - cand / (len(sdf) * len(cdf)), 6)
    assert got["pairs_completeness"] == round(co / max(1, len(true_pairs)), 6)
    assert 0 < got["candidate_pairs"] < len(sdf) * len(cdf)
    assert got["pairs_completeness"] > 0.9  # the fixture blocks truth together


def test_threshold_sweep_brute(ray_session):
    """Sweep counts/metrics equal a per-threshold brute-force recompute."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from registry_address_matcher_ray.stages.evaluation import threshold_sweep

    rng = np.random.default_rng(3)
    n = 400
    m = pd.DataFrame({
        "ADDRESS_ID_SPR": [f"s{i}" for i in range(n)],
        "ADDRESS_ID_CAD": [f"c{i % 120}" for i in range(n)],
        "MATCH_SCORE": rng.uniform(80, 100, n).round(1),
    })
    lab = pd.DataFrame({
        "spr_id": [f"s{i}" for i in range(0, 500, 2)],
        "cad_id": [f"c{i % 120}" for i in range(0, 500, 2)],
        "label": [i % 3 != 0 for i in range(0, 500, 2)],
    })
    ths = (82.0, 90.0, 99.0)
    out = threshold_sweep(rd.from_pandas(m).repartition(4),
                          rd.from_pandas(lab), ths)
    truth = {(r.spr_id, r.cad_id) for r in lab.itertuples() if r.label}
    for t in ths:
        pred = m[m.MATCH_SCORE >= t]
        tp = sum((a, b) in truth for a, b in
                 zip(pred.ADDRESS_ID_SPR, pred.ADDRESS_ID_CAD))
        row = out[out.threshold == t].iloc[0]
        assert (row.n_pred, row.tp) == (len(pred), tp)
        assert row.fn == len(truth) - tp
        p = tp / max(1, len(pred)); r = tp / max(1, len(truth))
        assert row.f1 == pytest.approx(2 * p * r / max(1e-9, p + r), abs=1e-6)


def test_cluster_pairwise_eval_handbuilt(ray_session):
    """TP/FP/FN/TN verdicts on a hand-built cluster assignment."""
    import pandas as pd
    import ray.data as rd

    from registry_address_matcher_ray.stages.evaluation import (
        cluster_pairwise_eval)

    clusters = rd.from_pandas(pd.DataFrame({
        "node": ["S:1", "C:10", "S:2", "C:20", "S:3"],
        "cluster_id": ["A", "A", "B", "B", "Z"],
    }))
    labeled = rd.from_pandas(pd.DataFrame({
        "spr_id": ["1", "2", "1", "3", "4"],
        "cad_id": ["10", "20", "20", "10", "99"],
        # (1,10) same->TP; (2,20) labeled false but same->FP;
        # (1,20) diff clusters, true->FN; (3,10) S:3 clustered alone,
        # false->TN; (4,99) neither clustered, true->FN
        "label": [True, False, True, False, True],
    }))
    out = cluster_pairwise_eval(clusters, labeled)
    r = out.iloc[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (1, 1, 2, 1)
    assert r.precision == 0.5 and r.recall == pytest.approx(1 / 3, abs=1e-6)
