"""Connected-components correctness: distributed label propagation vs BFS oracle."""

import random

import pyarrow as pa
import pytest
import ray.data

from registry_address_matcher_ray.stages import cluster


def bfs_components(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen, out = {}, {}
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        seen[start] = True
        while stack:
            v = stack.pop()
            comp.append(v)
            for w in adj[v]:
                if w not in seen:
                    seen[w] = True
                    stack.append(w)
        root = min(comp)
        for v in comp:
            out[v] = root
    return out


def _edge_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.string()),
                "dst": pa.array([b for _, b in edges], pa.string()),
            }
        )
    )


@pytest.mark.parametrize("small_threshold", [10**9, 0])
def test_components_random_graphs(small_threshold):
    rng = random.Random(17)
    nodes = [f"N{i:03d}" for i in range(60)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(75)]
    want = bfs_components(edges)
    got_ds = cluster.connected_components(
        _edge_ds(edges), small_threshold=small_threshold, num_partitions=4
    )
    got = {r["node"]: r["cluster_id"] for r in got_ds.take_all()}
    assert got == want


def test_components_chain_converges():
    # a long chain needs several propagation rounds on the distributed path
    edges = [(f"C{i:02d}", f"C{i+1:02d}") for i in range(20)]
    got_ds = cluster.connected_components(_edge_ds(edges), small_threshold=0, num_partitions=4)
    got = {r["node"]: r["cluster_id"] for r in got_ds.take_all()}
    assert set(got.values()) == {"C00"}


def test_components_empty():
    ds = _edge_ds([])
    out = cluster.connected_components(ds)
    assert out.count() == 0


def test_assign_clusters_bipartite(fixtures_small):
    import ray.data as rd
    from registry_address_matcher_ray.pipelines import linkage
    from registry_address_matcher_ray.pipelines.config import PipelineConfig

    t = fixtures_small
    matches = linkage.match_registries(
        rd.from_arrow(t["registry_spr"]), rd.from_arrow(t["registry_cad"]), PipelineConfig()
    ).materialize()
    clusters = cluster.assign_clusters(matches).to_pandas()
    # every matched node appears exactly once, namespaced
    mdf = matches.to_pandas()
    nodes = set("S:" + mdf.ADDRESS_ID_SPR) | set("C:" + mdf.ADDRESS_ID_CAD)
    assert set(clusters.node) == nodes
    assert clusters.node.is_unique
    # cluster ids are the min node id of each component (deterministic labels)
    by_cluster = clusters.groupby("cluster_id")["node"].min()
    assert (by_cluster.index == by_cluster.values).all()


@pytest.mark.parametrize("small_threshold", [10**9, 0])
def test_gap_chain_components_matches_islands(small_threshold):
    """gap_chain_components == pandas gaps-and-islands, both CC paths."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(5000, size=600, replace=False))
    keys = rng.choice(list("abc"), size=600)
    df = pd.DataFrame({"k": keys, "i": ids})

    got = (
        cluster.gap_chain_components(
            rd.from_pandas(df), "k", "i", gap=4,
            small_threshold=small_threshold, num_partitions=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )

    exp_parts = []
    for _, g in df.groupby("k"):
        g = g.sort_values("i")
        brk = (g["i"].diff() > 4) | g["i"].diff().isna()
        seg = brk.cumsum()
        exp_parts.append(pd.DataFrame({
            "node": g["i"].values,
            "cluster_id": g.groupby(seg)["i"].transform("min").values,
        }))
    exp = pd.concat(exp_parts).sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_pagerank_plans_agree_and_props(ray_session):
    import numpy as np
    import ray.data as rd

    from registry_address_matcher_ray.sources.synth import synth_web_graph
    from registry_address_matcher_ray.stages import cluster as C

    ds = rd.from_arrow(synth_web_graph(1507, seed=5)).repartition(4)
    a = C.pagerank(ds).to_pandas().sort_values("node").reset_index(drop=True)
    b = C.pagerank(ds, small_threshold=0).to_pandas().sort_values(
        "node").reset_index(drop=True)
    assert len(a) == len(b) == 1507
    assert (a["node"].values == b["node"].values).all()
    assert np.allclose(a["rank"], b["rank"], atol=1e-6)
    # probability mass is conserved (no dangling nodes by fixture contract)
    assert abs(a["rank"].sum() - 1.0) < 1e-3
    # the generator skews links toward low ids: hubs must out-rank the tail
    assert a.loc[a["node"] < 50, "rank"].mean() > 1.5 * a["rank"].mean()


def test_golden_records_survivorship(ray_session):
    """Brute-force survivorship check on a hand-built 2-cluster graph."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from registry_address_matcher_ray.stages.cluster import golden_records

    clusters = rd.from_pandas(pd.DataFrame({
        "node": ["S:1", "S:2", "C:10", "C:11", "S:3", "C:12"],
        "cluster_id": ["C:10"] * 4 + ["C:12"] * 2,
    }))
    spr = rd.from_arrow(pa.table({
        "ADDRESS_ID": ["1", "2", "3"],
        "STREET_NORM": ["main", "main", "oak"],
        "HOUSE_NORM": ["5", "", "7"],
        "BUILDING_NORM": ["", "", ""],
        "FULL_ADDRESS": ["main 5", "main", "oak 7"],
    }))
    cad = rd.from_arrow(pa.table({
        "ADDRESS_ID": ["10", "11", "12"],
        "STREET_NORM": ["maine", "main", "oak"],
        "HOUSE_NORM": ["5", "5", None],
        "BUILDING_NORM": ["a", "", ""],
        "FULL_ADDRESS": ["maine 5", "main 5", "oak"],
    }))
    out = (golden_records(clusters, spr, cad)
           .to_pandas().sort_values("cluster_id").reset_index(drop=True))
    assert list(out.cluster_id) == ["C:10", "C:12"]
    assert list(out.cluster_size) == [4, 2]
    r = out.iloc[0]
    # main appears 3x vs maine 1x; house 5 (3x); building only 'a'; full
    # address 'main 5' 2x beats 'main'/'maine 5' 1x (lex tie-break unused)
    assert (r.STREET_NORM, r.HOUSE_NORM, r.BUILDING_NORM, r.FULL_ADDRESS) == \
        ("main", "5", "a", "main 5")
    r2 = out.iloc[1]
    # all BUILDING_NORM empty in cluster 2 -> NULL survives
    assert r2.STREET_NORM == "oak" and r2.HOUSE_NORM == "7"
    assert pd.isna(r2.BUILDING_NORM)
    # tie on FULL_ADDRESS ('oak 7' vs 'oak', both 1x) -> lexicographic min
    assert r2.FULL_ADDRESS == "oak"


def test_merge_cluster_delta_bridges_components(ray_session):
    """A delta edge bridging two prior clusters merges them under the
    global min label; untouched clusters keep their id."""
    import pandas as pd
    import ray.data as rd

    from registry_address_matcher_ray.stages.cluster import (
        assign_clusters, merge_cluster_delta)

    old = rd.from_pandas(pd.DataFrame({
        "ADDRESS_ID_SPR": ["1", "2", "7"],
        "ADDRESS_ID_CAD": ["10", "20", "70"],
    }))
    prior = assign_clusters(old.materialize()).materialize()
    # S:2—C:10 bridges {S:1,C:10} and {S:2,C:20}; (5,50) is a new cluster
    delta = rd.from_pandas(pd.DataFrame({
        "ADDRESS_ID_SPR": ["2", "5"],
        "ADDRESS_ID_CAD": ["10", "50"],
    }))
    got = dict(zip(*[c.tolist() for c in
                     merge_cluster_delta(prior, delta).to_pandas()
                     [["node", "cluster_id"]].T.values]))
    # full recompute over all five edges
    full = rd.from_pandas(pd.DataFrame({
        "ADDRESS_ID_SPR": ["1", "2", "7", "2", "5"],
        "ADDRESS_ID_CAD": ["10", "20", "70", "10", "50"],
    }))
    exp = dict(zip(*[c.tolist() for c in
                     assign_clusters(full.materialize()).to_pandas()
                     [["node", "cluster_id"]].T.values]))
    assert got == exp
    assert got["S:1"] == got["C:20"]          # bridged
    assert got["S:7"] == got["C:70"] != got["S:1"]  # untouched


def test_hits_plans_agree_and_props(ray_session):
    import numpy as np
    import ray.data as rd

    from registry_address_matcher_ray.sources.synth import synth_web_graph
    from registry_address_matcher_ray.stages import cluster as C

    ds = rd.from_arrow(synth_web_graph(1507, seed=5)).repartition(4)
    a = C.hits(ds).to_pandas().sort_values("node").reset_index(drop=True)
    b = C.hits(ds, small_threshold=0).to_pandas().sort_values(
        "node").reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["node"].values == b["node"].values).all()
    assert np.allclose(a["hub"], b["hub"], atol=1e-6)
    assert np.allclose(a["authority"], b["authority"], atol=1e-6)
    # L1 normalization: each score vector sums to 1
    assert abs(a["hub"].sum() - 1.0) < 1e-3
    assert abs(a["authority"].sum() - 1.0) < 1e-3
    # the generator skews links TOWARD low ids: they must dominate authority
    assert (a.loc[a["node"] < 50, "authority"].mean()
            > 1.5 * a["authority"].mean())


def test_hits_tiny_graph_manual(ray_session):
    """Hand-unrolled reference on a 4-node graph, incl. a sink node (3) with
    authority but zero hub, exercising the no-out-link zero contract."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from registry_address_matcher_ray.stages import cluster as C

    edges = pd.DataFrame({"src": [0, 0, 1, 2], "dst": [1, 3, 3, 3]})
    n_iters = 5
    h = np.full(4, 0.25)
    a = np.zeros(4)
    for _ in range(n_iters):
        a = np.zeros(4)
        for s, d in edges.itertuples(index=False):
            a[d] += h[s]
        a /= a.sum()
        h = np.zeros(4)
        for s, d in edges.itertuples(index=False):
            h[s] += a[d]
        h /= h.sum()
    for thr in (0, 10**6):  # both plans
        got = (C.hits(rd.from_pandas(edges), n_iters=n_iters,
                      small_threshold=thr)
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert list(got["node"]) == [0, 1, 2, 3]
        assert np.allclose(got["hub"], np.round(h, 6), atol=2e-6)
        assert np.allclose(got["authority"], np.round(a, 6), atol=2e-6)
        assert got.loc[3, "hub"] == 0.0   # sink: no out-links
        assert got.loc[3, "authority"] > got.loc[1, "authority"]
