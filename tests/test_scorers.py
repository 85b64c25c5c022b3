"""Golden + metamorphic tests for the rapidfuzz-semantics scorers (SURVEY §2.9, §5.1)."""

import random

import pytest

from registry_address_matcher_ray.functions import scorers as S


def lcs_dp(a, b):
    m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i, ca in enumerate(a):
        for j, cb in enumerate(b):
            m[i + 1][j + 1] = m[i][j] + 1 if ca == cb else max(m[i][j + 1], m[i + 1][j])
    return m[len(a)][len(b)]


def test_lcs_bitparallel_matches_dp_randomized():
    rng = random.Random(99)
    alpha = "ab ԱԲԳխ1"
    for _ in range(1500):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 15)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 15)))
        assert S.lcs_length(a, b) == lcs_dp(a, b), (a, b)


# published rapidfuzz example values
GOLDEN = [
    ("this is a test", "this is a test!", "ratio", 100 * 2 * 14 / 29),
    ("this is a test", "this is a test!", "partial_ratio", 100.0),
    ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear", "token_sort_ratio", 100.0),
    ("fuzzy was a bear", "fuzzy fuzzy was a bear", "token_set_ratio", 100.0),
    ("", "", "ratio", 100.0),
    ("", "abc", "ratio", 0.0),
    ("", "abc", "partial_ratio", 0.0),
    ("abc", "abc", "ratio", 100.0),
    ("abcd", "badc", "ratio", 50.0),  # LCS=2 -> 2*2/8
]


@pytest.mark.parametrize("a,b,fn,expected", GOLDEN)
def test_scorer_golden(a, b, fn, expected):
    assert S.SCORER_REGISTRY[fn](a, b) == pytest.approx(expected, abs=1e-9)


def test_symmetry_and_bounds():
    rng = random.Random(5)
    alpha = "abc ԱԲ"
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 10)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 10)))
        for name in ("ratio", "token_sort_ratio", "token_set_ratio", "jaro_winkler"):
            fn = S.SCORER_REGISTRY[name]
            assert fn(a, b) == pytest.approx(fn(b, a))
            assert 0.0 <= fn(a, b) <= 100.0
        assert fn(a, a) == 100.0


def test_token_set_subset_rule():
    # one side's tokens subset of the other's (nonempty intersection) -> 100
    assert S.token_set_ratio("ԱԲՈՎՅԱՆ", "ԱԲՈՎՅԱՆ ՓՈՂՈՑ") == 100.0


def test_partial_ratio_substring_is_100():
    assert S.partial_ratio("ՎԱՐԴԱՆ", "Ք ՎԱՐԴԱՆՅԱՆՑ") == 100.0


def test_extract_one_first_index_tie_break():
    res = S.extract_one("abc", ["abd", "abc", "abc"], S.ratio)
    assert res == ("abc", 100.0, 1)
    res = S.extract_one("xy", ["ax", "xa"], S.ratio)  # equal scores -> first
    assert res[2] == 0
    assert S.extract_one("q", [], S.ratio) is None


def test_multi_strategy_order():
    # all-zero scores -> None (reference strict > vs initial 0)
    assert S.best_match_multi_strategy("ԱԱԱ", ["ԲԲԲ"]) is None
    # strategy precedence: token_sort before token_set on equal scores
    got = S.best_match_multi_strategy("ԱԲ ԳԴ", ["ԳԴ ԱԲ"])
    assert got is not None
    score, idx, strategy = got
    assert score == 100.0 and idx == 0 and strategy == "token_sort_ratio"


def test_levenshtein_ratio_known():
    assert S.levenshtein_ratio("kitten", "sitting") == pytest.approx(100 * (1 - 3 / 7))


def test_jaro_winkler_known():
    assert S.jaro_winkler("MARTHA", "MARHTA") == pytest.approx(96.1111111111, abs=1e-6)
    assert S.jaro_winkler("DWAYNE", "DUANE") == pytest.approx(84.0, abs=0.1)
