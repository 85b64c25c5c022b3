"""End-to-end engine vs pandas-oracle equality + pairwise F1 gate (SURVEY §5.2-5.3)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

import reference_oracle as oracle
from registry_address_matcher_ray.pipelines import linkage
from registry_address_matcher_ray.pipelines.config import PipelineConfig

KEY = ["ADDRESS_ID_SPR", "ADDRESS_ID_CAD"]


def _compare(expected: pd.DataFrame, got: pd.DataFrame):
    e = expected.sort_values(KEY).reset_index(drop=True)
    g = got.sort_values(KEY).reset_index(drop=True)
    assert len(e) == len(g), (
        f"count mismatch {len(e)} vs {len(g)}; "
        f"only-oracle={set(map(tuple, e[KEY].values)) - set(map(tuple, g[KEY].values))}"
    )
    for c in oracle.MATCH_COLUMNS:
        a, b = e[c], g[c]
        if a.dtype.kind == "f":
            assert np.allclose(a.astype(float), b.astype(float)), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c


@pytest.mark.parametrize("strategy", ["broadcast", "broadcast_dedup", "shuffle"])
def test_engine_matches_oracle(fixtures_small, strategy):
    t = fixtures_small
    spr_df = t["registry_spr"].to_pandas()
    cad_df = t["registry_cad"].to_pandas()
    expected = oracle.run_pipeline(spr_df, cad_df)

    spr = ray.data.from_arrow(t["registry_spr"])
    cad = ray.data.from_arrow(t["registry_cad"])
    got = linkage.match_registries(
        spr, cad, PipelineConfig(fuzzy_strategy=strategy)
    ).to_pandas()
    _compare(expected, got)


@pytest.mark.parametrize("method", ["Exact Only", "Fuzzy Only", "Hybrid (Exact + Fuzzy)"])
def test_method_gating(fixtures_small, method):
    t = fixtures_small
    expected = oracle.run_pipeline(
        t["registry_spr"].to_pandas(), t["registry_cad"].to_pandas(), method=method
    )
    got = linkage.match_registries(
        ray.data.from_arrow(t["registry_spr"]),
        ray.data.from_arrow(t["registry_cad"]),
        PipelineConfig(method=method),
    ).to_pandas()
    _compare(expected, got)


def test_threshold_tunable(fixtures_small):
    t = fixtures_small
    expected = oracle.run_pipeline(
        t["registry_spr"].to_pandas(), t["registry_cad"].to_pandas(), threshold=95
    )
    got = linkage.match_registries(
        ray.data.from_arrow(t["registry_spr"]),
        ray.data.from_arrow(t["registry_cad"]),
        PipelineConfig(threshold=95),
    ).to_pandas()
    _compare(expected, got)


def test_pairwise_f1_gate(fixtures_medium):
    """BASELINE.json metric: pairwise F1 >= 0.99 on labeled pairs at the blocking key."""
    t = fixtures_medium
    labeled = t["labeled_pairs"].to_pandas()
    true_pairs = set(
        map(tuple, labeled.loc[labeled.label, ["spr_id", "cad_id"]].values)
    )
    got = linkage.match_registries(
        ray.data.from_arrow(t["registry_spr"]),
        ray.data.from_arrow(t["registry_cad"]),
        PipelineConfig(),
    ).to_pandas()
    pred = set(map(tuple, got[KEY].values))
    tp = len(pred & true_pairs)
    fp = len(pred - true_pairs)
    fn = len(true_pairs - pred)
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    f1 = 2 * precision * recall / max(1e-9, precision + recall)
    assert f1 >= 0.99, (f1, precision, recall, "fp", fp, "fn", fn)


def test_parallelism_invariance(fixtures_small):
    """Same bytes at different block counts (order-insensitive)."""
    t = fixtures_small

    def run(nblocks):
        spr = ray.data.from_arrow(t["registry_spr"]).repartition(nblocks)
        cad = ray.data.from_arrow(t["registry_cad"]).repartition(nblocks)
        df = linkage.match_registries(spr, cad, PipelineConfig()).to_pandas()
        return df.sort_values(KEY).reset_index(drop=True)

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)


def test_max_records_cap(fixtures_small):
    t = fixtures_small
    got = linkage.match_registries(
        ray.data.from_arrow(t["registry_spr"]),
        ray.data.from_arrow(t["registry_cad"]),
        PipelineConfig(max_records=50),
    ).to_pandas()
    assert got["ADDRESS_ID_SPR"].nunique() <= 50


def test_shuffle_salting_hot_block(fixtures_small):
    """Adversarial hot block: one (HOUSE, BUILDING) key dominates the cadastre.

    With hot_block_cap forced far below the block size the salted shuffle plan
    must split the block across shards and still produce rows identical to the
    broadcast plan (per-strategy shard merge == unsharded extractOne)."""
    import pyarrow as pa

    from registry_address_matcher_ray.stages import matching as M

    t = fixtures_small
    spr_df = t["registry_spr"].to_pandas()
    cad_df = t["registry_cad"].to_pandas()
    # every cad row moved into ONE hot block (house "1", empty building)
    cad_df = cad_df.assign(HOUSE="1", BUILDING=None)
    spr_df = spr_df.assign(HOUSE="1", BUILDING=None)
    spr = ray.data.from_arrow(pa.Table.from_pandas(spr_df, preserve_index=False))
    cad = ray.data.from_arrow(pa.Table.from_pandas(cad_df, preserve_index=False))

    expected = linkage.match_registries(
        ray.data.from_arrow(pa.Table.from_pandas(spr_df, preserve_index=False)),
        ray.data.from_arrow(pa.Table.from_pandas(cad_df, preserve_index=False)),
        PipelineConfig(fuzzy_strategy="broadcast"),
    ).to_pandas()

    pre_spr = linkage.preprocess(spr).materialize()
    pre_cad = linkage.preprocess(cad).materialize()
    exact = M.exact_matches(pre_spr, pre_cad).materialize()
    from registry_address_matcher_ray.stages.analytics import distinct_values

    exclude = set(distinct_values(exact, "ADDRESS_ID_SPR"))
    residue = M.filter_out_ids(pre_spr, "ADDRESS_ID", exclude)
    fuzzy = M.fuzzy_matches_shuffle(
        residue, pre_cad, threshold=85.0, hot_block_cap=25,  # block is ~400 rows
    )
    got = exact.union(fuzzy).to_pandas()

    e = expected.sort_values(KEY).reset_index(drop=True)
    g = got.sort_values(KEY).reset_index(drop=True)
    assert len(e) == len(g), (len(e), len(g))
    for c in oracle.MATCH_COLUMNS:
        a, b = e[c], g[c]
        if a.dtype.kind == "f":
            assert np.allclose(a.astype(float), b.astype(float)), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c


def test_match_incremental_equals_full_batch(fixtures_small, ray_session):
    """prior ∪ match(residue) must be row-identical to the full-batch match
    when the cadastre is unchanged (per-probe independence)."""
    t = fixtures_small
    spr = ray.data.from_arrow(t["registry_spr"])
    cad = ray.data.from_arrow(t["registry_cad"])
    full = linkage.match_registries(spr, cad, PipelineConfig()).to_pandas()

    ids = sorted(t["registry_spr"].column("ADDRESS_ID").to_pylist())
    old_ids = set(ids[: len(ids) // 2])

    def _old(b):
        import pyarrow as pa
        keep = [v in old_ids for v in b.column("ADDRESS_ID").to_pylist()]
        return b.filter(pa.array(keep, pa.bool_()))

    prior = linkage.match_registries(
        spr.map_batches(_old, batch_format="pyarrow"), cad,
        PipelineConfig()).materialize()
    assert 0 < prior.count() < len(full)
    inc = linkage.match_incremental(spr, cad, prior, PipelineConfig()).to_pandas()
    k = ["ADDRESS_ID_SPR", "ADDRESS_ID_CAD"]
    pd.testing.assert_frame_equal(
        full.sort_values(k).reset_index(drop=True)[sorted(full.columns)],
        inc.sort_values(k).reset_index(drop=True)[sorted(full.columns)],
    )


# ---------------------------------------------------------------------------
# greedy one-to-one assignment
# ---------------------------------------------------------------------------


def _greedy_one_to_one(df):
    d = df.sort_values(["score", "l", "r"], ascending=[False, True, True],
                       kind="mergesort")
    seen_l, seen_r, out = set(), set(), []
    for row in d.itertuples(index=False):
        if row.l not in seen_l and row.r not in seen_r:
            seen_l.add(row.l)
            seen_r.add(row.r)
            out.append((row.l, row.r, row.score))
    return sorted(out)


def _mk_pairs(seed, n=2500, ids=350, tie_scores=True):
    rng = np.random.default_rng(seed)
    score = rng.uniform(0, 100, n)
    if tie_scores:
        score = np.round(score, 1)  # force frequent score ties
    return pd.DataFrame({"l": rng.integers(0, ids, n),
                         "r": rng.integers(0, ids, n),
                         "score": score}).drop_duplicates(
        ["l", "r"]).reset_index(drop=True)


def test_one_to_one_matches_greedy_parity(ray_session):
    from registry_address_matcher_ray.stages.matching import one_to_one_matches

    for seed, ties in ((3, True), (4, False)):
        df = _mk_pairs(seed, tie_scores=ties)
        got = one_to_one_matches(
            ray.data.from_pandas(df).repartition(5), "l", "r", "score"
        ).to_pandas()
        assert sorted(map(tuple, got[["l", "r", "score"]].values.tolist())) \
            == _greedy_one_to_one(df)
        # 1:1 property
        assert got["l"].is_unique and got["r"].is_unique


def test_one_to_one_distributed_rounds_parity(ray_session):
    from registry_address_matcher_ray.stages.matching import one_to_one_matches

    df = _mk_pairs(9)
    want = _greedy_one_to_one(df)
    for parts in (1, 8):
        got = one_to_one_matches(
            ray.data.from_pandas(df).repartition(parts), "l", "r", "score",
            local_finish_rows=50,  # force several distributed rounds
        ).to_pandas()
        assert sorted(map(tuple, got[["l", "r", "score"]].values.tolist())) \
            == want, parts
