"""Batch R-Swoosh: fixpoint vs an independent sequential implementation."""

import itertools

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from registry_address_matcher_ray.stages.swoosh import (
    iterative_merge, round_pairs)


def _brute_fixpoint(recs, threshold):
    """Sequential batch semantics: each round merges the connected
    components of the full match graph, until no pair matches."""
    recs = {r[0]: (r[1], frozenset(r[2])) for r in recs}  # rid->(house,toks)
    while True:
        ids = sorted(recs)
        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        matched = False
        for i, j in itertools.combinations(ids, 2):
            hi, ti = recs[i]
            hj, tj = recs[j]
            if hi == hj and len(ti & tj) / len(ti | tj) >= threshold:
                pi, pj = find(i), find(j)
                if pi != pj:
                    parent[max(pi, pj)] = min(pi, pj)
                matched = True
        if not matched:
            break
        merged = {}
        for i in ids:
            root = find(i)
            h, t = recs[i]
            if root in merged:
                mh, mt, n = merged[root]
                merged[root] = (mh, mt | t, n + 1)
            else:
                merged[root] = (h, t, 1)
        recs = {rid: (h, t) for rid, (h, t, _) in merged.items()}
        counts = {rid: n for rid, (_, _, n) in merged.items()}
        if all(n == 1 for n in counts.values()):
            break
    return recs


def _ds(rows, parts=1):
    return rd.from_arrow(pa.table({
        "ADDRESS_ID": [r[0] for r in rows],
        "HOUSE_NORM": [r[1] for r in rows],
        "STREET_NORM": [" ".join(sorted(r[2])) for r in rows],
    })).repartition(parts)


def test_two_round_fixpoint():
    """r3 matches neither source record but matches their round-1 merge."""
    rows = [("1", "5", {"a", "b", "c"}),
            ("2", "5", {"a", "b", "d"}),
            ("3", "5", {"b", "c", "d", "e"})]
    # round 1: J(1,2)=2/4=0.5 -> merge {a,b,c,d}; J(3, either) = 2/5 < 0.5
    # round 2: J(merged, 3) = 3/5 >= 0.5 -> all three consolidate
    out = iterative_merge(_ds(rows), threshold=0.5).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r.rid == "1" and r.tokens == "a b c d e" and r.n_members == 3
    # and round-1 pairs alone do NOT contain record 3
    p0 = round_pairs(
        _ds(rows).map_batches(lambda b: pa.table({
            "rid": b.column("ADDRESS_ID"), "house": b.column("HOUSE_NORM"),
            "tokens": b.column("STREET_NORM")}), batch_format="pyarrow"),
        0.5).to_pandas()
    assert set(zip(p0.a, p0.b)) == {("1", "2")}


@pytest.mark.parametrize("parts", [1, 5])
def test_fixpoint_matches_brute(fixtures_small, parts):
    from registry_address_matcher_ray.stages.blocking import _preprocess_batch

    spr = _preprocess_batch(fixtures_small["registry_spr"])
    ds = rd.from_arrow(spr).repartition(parts)
    out = iterative_merge(ds, threshold=0.6).to_pandas()
    recs = []
    for i, h, s in zip(spr.column("ADDRESS_ID").to_pylist(),
                       spr.column("HOUSE_NORM").to_pylist(),
                       spr.column("STREET_NORM").to_pylist()):
        toks = frozenset(t for t in (s or "").split(" ") if t)
        if toks and h:
            recs.append((str(i), h, toks))
    exp = _brute_fixpoint(recs, 0.6)
    got = {r.rid: (r.house, frozenset(r.tokens.split(" ")))
           for r in out.itertuples()}
    assert got == exp
    assert int(out.n_members.sum()) == len(recs)
