"""Sorted-neighborhood blocking vs a brute-force window scan (SURVEY §2 blocking)."""

import pandas as pd
import pytest
import ray.data

from registry_address_matcher_ray.stages.blocking import (
    _preprocess_batch, sorted_neighborhood_pairs)


def _brute(spr, cad, window):
    u = pd.concat([
        pd.DataFrame({"k": spr.column("SEARCH_KEY").to_pylist(), "src": "s",
                      "id": spr.column("ADDRESS_ID").to_pylist()}),
        pd.DataFrame({"k": cad.column("SEARCH_KEY").to_pylist(), "src": "c",
                      "id": cad.column("ADDRESS_ID").to_pylist()}),
    ]).sort_values(["k", "src", "id"], kind="mergesort").reset_index(drop=True)
    exp = set()
    for i in range(len(u)):
        for j in range(i + 1, min(i + window, len(u))):
            if u.src[i] != u.src[j]:
                s, c = ((u.id[i], u.id[j]) if u.src[i] == "s"
                        else (u.id[j], u.id[i]))
                exp.add((s, c, j - i))
    return exp


@pytest.mark.parametrize("window,bucket_rows", [(2, 64), (4, 64), (6, 7)])
def test_sorted_neighborhood_matches_brute(fixtures_small, window, bucket_rows):
    t = fixtures_small
    spr = _preprocess_batch(t["registry_spr"])
    cad = _preprocess_batch(t["registry_cad"])
    out = sorted_neighborhood_pairs(
        ray.data.from_arrow(spr).repartition(3),
        ray.data.from_arrow(cad).repartition(4),
        window=window, bucket_rows=bucket_rows).to_pandas()
    got = list(zip(out.ADDRESS_ID_SPR, out.ADDRESS_ID_CAD, out.rank_dist))
    exp = _brute(spr, cad, window)
    # exact pair set, each unordered pair emitted by exactly one bucket
    assert len(got) == len(set(got)) == len(exp)
    assert set(got) == exp


def test_sorted_neighborhood_rejects_bad_params(fixtures_small, ray_session):
    t = fixtures_small
    spr = ray.data.from_arrow(_preprocess_batch(t["registry_spr"]))
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(spr, spr, window=1)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(spr, spr, window=9, bucket_rows=8)


def test_edit1_pairs_vs_bruteforce(ray_session):
    """FastSS candidates+verify == brute-force codepoint Levenshtein d=1."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from registry_address_matcher_ray.stages.blocking import (
        _edit1_check, edit1_value_pairs)

    vals = ["աբգ", "աբդ", "աբ", "բա", "աբգդ", "xy", "xz", "x", "y",
            "կենտրոն", "կենտրոնա", "կենտրան", "կենրոն", "աբգ", ""]
    ds = rd.from_arrow(pa.table({"STREET_NORM": vals})).repartition(3)
    out = edit1_value_pairs(ds, "STREET_NORM").to_pandas()
    got = set(zip(out.a, out.b))

    def _lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    uniq = sorted(set(v for v in vals if v))
    exp = {(a, b) for a, b in itertools.combinations(uniq, 2)
           if _lev(a, b) == 1}
    assert got == exp
    assert all(out.dist == 1)
    # the cheap verifier agrees with true distance on every pair
    for a, b in itertools.combinations(uniq, 2):
        assert _edit1_check(a, b) == (_lev(a, b) <= 1)


def test_metablocking_cbs_vs_brute(fixtures_small, ray_session):
    """CBS weights == brute-force shared-distinct-token counts w/ purging."""
    import itertools

    import pandas as pd
    import ray.data as rd

    from registry_address_matcher_ray.stages.blocking import (
        _preprocess_batch, metablocking_cbs_pairs)

    t = fixtures_small
    spr = _preprocess_batch(t["registry_spr"])
    cad = _preprocess_batch(t["registry_cad"])
    max_block, min_w = 100, 2
    out = metablocking_cbs_pairs(
        rd.from_arrow(spr).repartition(3), rd.from_arrow(cad).repartition(2),
        min_weight=min_w, max_block=max_block).to_pandas()

    def _toks(tbl):
        d = {}
        for i, v in zip(tbl.column("ADDRESS_ID").to_pylist(),
                        tbl.column("STREET_NORM").to_pylist()):
            d[str(i)] = {x for x in (v or "").split(" ") if x}
        return d

    s, c = _toks(spr), _toks(cad)
    from collections import Counter
    sizes = Counter()
    for toks in list(s.values()) + list(c.values()):
        sizes.update(toks)
    ok = {t_ for t_, n in sizes.items() if n <= max_block}
    exp = {}
    for (si, st_), (ci, ct_) in itertools.product(s.items(), c.items()):
        w = len(st_ & ct_ & ok)
        if w >= min_w:
            exp[(si, ci)] = w
    got = {(a, b): w for a, b, w in
           zip(out.ADDRESS_ID_SPR, out.ADDRESS_ID_CAD, out.weight)}
    assert got == exp and len(exp) > 0
    # a cap that purges every block yields a clean empty result
    empty = metablocking_cbs_pairs(
        rd.from_arrow(spr), rd.from_arrow(cad),
        min_weight=min_w, max_block=2).to_pandas()
    assert len(empty) == 0
