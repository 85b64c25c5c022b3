"""Vectorized block scorer == scalar 4-strategy loop (for every outcome a caller
can observe: any result at/above the threshold must be identical in score,
winning strategy, and candidate index; below-threshold results are discarded by
the caller, so only their below-threshold-ness must agree)."""

import random

import pytest

from registry_address_matcher_ray.functions.block_scorer import (
    PreparedBlock,
    best_match_block,
)
from registry_address_matcher_ray.functions.scorers import best_match_multi_strategy

ALPHABET = "ԱԲԳԴԵԶԷԸԹԺԻԼԽԾԿՀՁՂՃՄՅՆՇՈՉՊՋՌՍՎՏՐՑՒՓՔՕՖ ABC"


def _rand_street(rng, max_tokens=4, max_len=9):
    toks = [
        "".join(rng.choice(ALPHABET.replace(" ", ""))
                for _ in range(rng.randint(1, max_len)))
        for _ in range(rng.randint(1, max_tokens))
    ]
    return " ".join(toks)


def _mutate(rng, s):
    ops = rng.randint(0, 3)
    s = list(s)
    for _ in range(ops):
        if not s:
            break
        k = rng.randrange(len(s))
        op = rng.random()
        if op < 0.4:
            s[k] = rng.choice(ALPHABET.replace(" ", ""))
        elif op < 0.7:
            del s[k]
        else:
            s.insert(k, rng.choice(ALPHABET.replace(" ", "")))
    return "".join(s).strip() or "Ա"


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
@pytest.mark.parametrize("threshold", [50.0, 85.0])
def test_block_scorer_equivalence_random(seed, threshold):
    rng = random.Random(seed)
    vocab = [_rand_street(rng) for _ in range(40)]
    choices = list(dict.fromkeys(
        _mutate(rng, rng.choice(vocab)) for _ in range(120)))
    blk = PreparedBlock(choices)
    for _ in range(150):
        q = _mutate(rng, rng.choice(vocab + choices))
        got = best_match_block(q, blk, threshold)
        exp = best_match_multi_strategy(q, choices)
        if exp is None:
            assert got is None or got[0] < threshold
            continue
        e_score, e_idx, e_name = exp
        if e_score >= threshold:
            assert got is not None
            g_score, g_idx, g_name = got
            assert g_score == e_score
            assert g_idx == e_idx
            assert g_name == e_name
        else:
            assert got is None or got[0] < threshold


def test_block_scorer_identical_strings():
    blk = PreparedBlock(["ՄԱՇՏՈՑ", "ԱԲՈՎՅԱՆ", "ՄԱՇՏՈՑ Ա"])
    got = best_match_block("ՄԱՇՏՈՑ", blk, 85.0)
    assert got == (100.0, 0, "token_sort_ratio")


def test_block_scorer_token_order_invariance():
    blk = PreparedBlock(["Բ Ա"])
    got = best_match_block("Ա Բ", blk, 85.0)
    assert got is not None and got[0] == 100.0 and got[2] == "token_sort_ratio"


def test_block_scorer_duplicate_token_edge():
    # token sets deduplicate: "Ա Ա Բ" vs "Ա Բ" must agree with the scalar path
    choices = ["Ա Ա Բ", "Ա Բ Գ", "ԲԳԴ"]
    blk = PreparedBlock(choices)
    for q in ["Ա Բ", "Ա Ա Բ", "Գ Բ Ա", "ԲԳԴ Ա"]:
        got = best_match_block(q, blk, 10.0)
        exp = best_match_multi_strategy(q, choices)
        assert got is not None and exp is not None
        if exp[0] >= 10.0:
            assert got == (exp[0], exp[1], exp[2])
