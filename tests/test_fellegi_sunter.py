"""Fellegi-Sunter probabilistic linkage: EM fit, weights, pattern histogram."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from registry_address_matcher_ray.stages.blocking import _preprocess_batch
from registry_address_matcher_ray.stages.probabilistic import (
    DEFAULT_FIELDS, comparison_vectors, fs_em, fs_match_weights,
    fs_pattern_counts)


def _pre(t):
    return (_preprocess_batch(t["registry_spr"]),
            _preprocess_batch(t["registry_cad"]))


def _brute_vectors(spr, cad):
    """Independent pandas transcription of the blocked comparison join."""
    s = spr.to_pandas()
    c = cad.to_pandas()
    for df in (s, c):
        for col in ("HOUSE_NORM", "STREET_NORM", "BUILDING_NORM",
                    "FULL_ADDRESS"):
            df[col] = df[col].fillna("")
    s = s[s.HOUSE_NORM != ""]
    c = c[c.HOUSE_NORM != ""]
    j = s.merge(c, on="HOUSE_NORM", suffixes=("_s", "_c"))
    pat = (
        (j.STREET_NORM_s == j.STREET_NORM_c).astype(int) * 8
        + (j.STREET_NORM_s.str[:4] == j.STREET_NORM_c.str[:4]).astype(int) * 4
        + (j.BUILDING_NORM_s == j.BUILDING_NORM_c).astype(int) * 2
        + (j.FULL_ADDRESS_s == j.FULL_ADDRESS_c).astype(int))
    return pd.DataFrame({"spr": j.ADDRESS_ID_s, "cad": j.ADDRESS_ID_c,
                         "pattern": pat})


@pytest.mark.parametrize("plan", ["broadcast", "shuffle"])
def test_comparison_vectors_match_brute(fixtures_small, plan):
    spr, cad = _pre(fixtures_small)
    got = comparison_vectors(
        ray.data.from_arrow(spr).repartition(3),
        ray.data.from_arrow(cad).repartition(2), plan=plan).to_pandas()
    exp = _brute_vectors(spr, cad)
    key = lambda d, a, b: sorted(zip(d[a], d[b], d["pattern"]))
    assert key(got, "ADDRESS_ID_SPR", "ADDRESS_ID_CAD") == key(exp, "spr", "cad")
    assert len(got) > 0


def test_broadcast_expansion_chunks_hot_block(fixtures_small, monkeypatch):
    """A hot block key (every cad row in one house block) must still emit the
    complete pair set when the per-yield fan-out bound is far below the
    block's total expansion."""
    import registry_address_matcher_ray.stages.probabilistic as P

    monkeypatch.setattr(P, "MAX_EXPAND_PAIRS", 7)
    spr, cad = _pre(fixtures_small)
    got = P.comparison_vectors(
        ray.data.from_arrow(spr), ray.data.from_arrow(cad),
        plan="broadcast", probe_batch_size=1000).to_pandas()
    exp = _brute_vectors(spr, cad)
    key = lambda d, a, b: sorted(zip(d[a], d[b], d["pattern"]))
    assert key(got, "ADDRESS_ID_SPR", "ADDRESS_ID_CAD") == key(exp, "spr", "cad")


def test_comparison_vectors_auto_picks_broadcast_small(fixtures_small):
    # a kB-scale cad side must route to the broadcast plan and still agree
    spr, cad = _pre(fixtures_small)
    got = comparison_vectors(
        ray.data.from_arrow(spr), ray.data.from_arrow(cad),
        plan="auto").to_pandas()
    exp = _brute_vectors(spr, cad)
    assert len(got) == len(exp)
    assert sorted(got.pattern) == sorted(exp.pattern)


def test_pattern_counts_partition_invariant(fixtures_small):
    spr, cad = _pre(fixtures_small)
    outs = []
    for ps, pc_ in ((1, 1), (4, 3)):
        df = fs_pattern_counts(
            ray.data.from_arrow(spr).repartition(ps),
            ray.data.from_arrow(cad).repartition(pc_),
        ).to_pandas().sort_values("pattern").reset_index(drop=True)
        outs.append(df)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    exp = _brute_vectors(spr, cad).pattern.value_counts()
    assert dict(zip(outs[0].pattern, outs[0].n)) == exp.to_dict()


def _em_reference(counts, k, iters, init_m, init_u, init_p):
    """Scalar-loop EM, written independently of the vectorized fs_em."""
    m = [init_m] * k
    u = [init_u] * k
    p = init_p
    rows = list(zip(counts["pattern"], counts["n"]))
    for _ in range(iters):
        sm = su = 0.0
        am = [0.0] * k
        au = [0.0] * k
        tot = 0.0
        for pat, n in rows:
            bits = [(pat >> (k - 1 - i)) & 1 for i in range(k)]
            pm = p
            pu = 1 - p
            for i, g in enumerate(bits):
                pm *= m[i] if g else (1 - m[i])
                pu *= u[i] if g else (1 - u[i])
            w = pm / (pm + pu)
            sm += w * n
            su += (1 - w) * n
            tot += n
            for i, g in enumerate(bits):
                am[i] += g * w * n
                au[i] += g * (1 - w) * n
        m = [min(max(a / max(sm, 1e-6), 1e-6), 1 - 1e-6) for a in am]
        u = [min(max(a / max(su, 1e-6), 1e-6), 1 - 1e-6) for a in au]
        p = min(max(sm / max(tot, 1e-6), 1e-6), 1 - 1e-6)
    return m, u, p


def test_em_matches_reference_impl():
    rng = np.random.default_rng(7)
    k = 4
    pats = np.arange(1 << k)
    counts = pd.DataFrame({
        "pattern": pats,
        "n": rng.integers(1, 5000, size=1 << k).astype("int64")})
    got = fs_em(counts, k, iters=40)
    em, eu, ep = _em_reference(counts, k, 40, 0.9, 0.1, 0.05)
    np.testing.assert_allclose(got["m"], em, rtol=1e-10)
    np.testing.assert_allclose(got["u"], eu, rtol=1e-10)
    assert got["p"] == pytest.approx(ep, rel=1e-10)


def test_em_recovers_planted_params():
    # synthesize a histogram from known (m, u, p); EM must land close
    k = 4
    m_true = np.array([0.95, 0.9, 0.7, 0.85])
    u_true = np.array([0.02, 0.15, 0.3, 0.01])
    p_true = 0.2
    pats = np.arange(1 << k)
    gamma = ((pats[:, None] >> (k - 1 - np.arange(k))) & 1).astype(float)
    pm = np.prod(np.where(gamma, m_true, 1 - m_true), axis=1)
    pu = np.prod(np.where(gamma, u_true, 1 - u_true), axis=1)
    n = 1_000_000 * (p_true * pm + (1 - p_true) * pu)
    fit = fs_em(pd.DataFrame({"pattern": pats, "n": n}), k, iters=500)
    np.testing.assert_allclose(fit["m"], m_true, atol=0.02)
    np.testing.assert_allclose(fit["u"], u_true, atol=0.02)
    assert fit["p"] == pytest.approx(p_true, abs=0.02)


def test_match_weights_ordering_and_decisions(fixtures_small):
    spr, cad = _pre(fixtures_small)
    m = [0.95, 0.9, 0.9, 0.85]
    u = [0.05, 0.2, 0.4, 0.01]
    out = fs_match_weights(
        ray.data.from_arrow(spr), ray.data.from_arrow(cad),
        m, u, upper=3.0, lower=0.0).to_pandas()
    # full agreement outweighs full disagreement; decisions follow the rule
    wt = dict(zip(out.pattern, out.fs_weight))
    if 15 in wt and 0 in wt:
        assert wt[15] > wt[0]
    assert (out.loc[out.fs_weight >= 3.0, "decision"] == "link").all()
    assert (out.loc[out.fs_weight < 0.0, "decision"] == "non_link").all()
    assert (out.loc[(out.fs_weight >= 0.0) & (out.fs_weight < 3.0),
                    "decision"] == "possible").all()
    # weight is a pure function of pattern
    assert out.groupby("pattern").fs_weight.nunique().le(1).all()


def test_fs_value_weights_rarity(ray_session):
    """Rare-street agreement outweighs common-street agreement; u_v is the
    product of the two sides' value frequencies; disagreement weight is 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from registry_address_matcher_ray.stages.probabilistic import (
        fs_value_weights)

    def _reg(streets, houses):
        n = len(streets)
        return rd.from_arrow(pa.table({
            "ADDRESS_ID": [str(i) for i in range(n)],
            "STREET_NORM": streets,
            "HOUSE_NORM": houses,
            "BUILDING_NORM": [""] * n,
            "FULL_ADDRESS": streets,
        }))

    # 'common' appears 4x per side, 'rare' once; all share house block '1'
    spr = _reg(["common"] * 4 + ["rare"], ["1"] * 5)
    cad = _reg(["common"] * 4 + ["rare"], ["1"] * 5)
    out = fs_value_weights(spr, cad).to_pandas()
    assert len(out) == 25
    agree = out[out.street_agree]
    w_rare = agree[agree.street == "rare"].fs_value_weight.unique()
    w_common = agree[agree.street == "common"].fs_value_weight.unique()
    assert len(w_rare) == 1 and len(w_common) == 1
    assert w_rare[0] > w_common[0]
    # u_v = product of per-side frequencies
    r = agree[agree.street == "rare"].iloc[0]
    assert r.u_v == round((1 / 5) * (1 / 5), 12)
    c = agree[agree.street == "common"].iloc[0]
    assert c.u_v == round((4 / 5) * (4 / 5), 12)
    assert np.isclose(r.fs_value_weight, round(np.log2(0.95 / (0.04)), 6))
    assert (out.loc[~out.street_agree, "fs_value_weight"] == 0).all()
