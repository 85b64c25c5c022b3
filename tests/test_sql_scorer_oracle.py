"""Parity tests for the DuckDB scorer transcription (__ray_entry__._scorer_ctes).

The match_pairs / engine_variant_pairs oracles rely on a recursive-CTE
bit-parallel LCS (HUGEINT) reproducing the Python scorers bit-for-bit; this
checks the four strategy scores on randomized string pairs, including
non-ASCII (Armenian) text and adversarial shapes (repeats, subsets,
single-char, token permutations).
"""

import importlib.util
import random

import duckdb
import pytest

from registry_address_matcher_ray.functions import scorers


def _entry():
    spec = importlib.util.spec_from_file_location("entry_sql", "__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _sql_scores(pairs):
    m = _entry()
    con = duckdb.connect()
    con.execute("CREATE TABLE qc(q VARCHAR, c VARCHAR)")
    con.executemany("INSERT INTO qc VALUES (?, ?)", pairs)
    rows = con.execute(
        "WITH RECURSIVE " + m._scorer_ctes()
        + " SELECT q, c, s1, s2, s3, s4 FROM pair_scores"
    ).fetchall()
    return {(q, c): (s1, s2, s3, s4) for q, c, s1, s2, s3, s4 in rows}


def _py_scores(q, c):
    return (
        scorers.token_sort_ratio(q, c),
        scorers.token_set_ratio(q, c),
        scorers.partial_ratio(q, c),
        scorers.ratio(q, c),
    )


def test_sql_scorers_random_pairs():
    rng = random.Random(42)
    alpha = "ABC ԱԲԳԴԵՓՈՂՑ019"
    pairs = set()
    while len(pairs) < 150:
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 30))).strip()
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 30))).strip()
        a, b = " ".join(a.split()), " ".join(b.split())  # normalized form
        if a and b:
            pairs.add((a, b))
    pairs = sorted(pairs)
    got = _sql_scores(pairs)
    for q, c in pairs:
        assert got[(q, c)] == pytest.approx(_py_scores(q, c), abs=0.0), (q, c)


def test_sql_scorers_adversarial():
    cases = [
        ("Ա", "Ա"), ("Ա", "Բ"),
        ("ՓՈՂՈՑ ԱԲ", "ԱԲ ՓՈՂՈՑ"),             # token permutation -> tsort 100
        ("ԱԲ", "ԱԲ ՓՈՂՈՑ ԳԴ"),                  # subset tokens -> tset 100
        ("ԱԱԱԱԱԱԱ", "ԱԱԱ"),                     # substring -> partial 100
        ("Ա Բ Ա Բ", "Բ Ա"),                     # dup tokens vs set semantics
        ("ՔՈԹԱՆՋՅԱՆ ՓՈՂՈՑ 12", "ՔՈԹԱՆՋՅԱՆ 12"),
        ("A" * 120, "A" * 100),                  # near the HUGEINT 126-bit cap
    ]
    got = _sql_scores(cases)
    for q, c in cases:
        assert got[(q, c)] == pytest.approx(_py_scores(q, c), abs=0.0), (q, c)


def test_match_pairs_oracle_registered():
    m = _entry()
    o = m.oracle_sql()
    for k in ("match_pairs", "match_pairs_shuffle_plan", "match_clusters",
              "unmatched_spr", "engine_variant_pairs", "pages_flagship"):
        assert k in o and "read_parquet" in o[k]
