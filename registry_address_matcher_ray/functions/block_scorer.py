"""Vectorized query-vs-block scoring with exact extractOne/strategy semantics.

Replaces the per-pair 4-scorer loop of ``best_match_multi_strategy`` (the
reference's fuzzy kernel, ``/root/reference/address.py:656-682``) with a
query-at-a-time evaluation against ALL candidates of a block:

- ``ratio`` and ``token_sort_ratio``: bit-parallel LCS ran simultaneously for every
  candidate with numpy uint64 lanes — one vectorized pass over the padded
  char-code matrix of the block instead of n Python DP loops.
- ``token_set_ratio``: closed forms for two of the three component ratios (the
  intersection string is a prefix of both combined strings, so ``LCS = |sect|``
  exactly), and the third (diff-vs-diff) runs a short bit-parallel DP only when its
  upper bound could strictly beat the running extractOne best.
- ``partial_ratio``: computed per-pair only for candidates whose upper bound
  ``200*L/(l1+L)`` (with ``L`` the full-string LCS already computed for ``ratio``,
  ``l1`` the shorter length — the window-ratio maximizer) reaches the decision
  cutoff ``max(threshold, best-of-other-strategies)``. A skipped candidate's
  partial score is strictly below every value that could influence the outcome, so
  the winner (score, strategy, index) is bit-identical to the exhaustive loop.

All score floats use the exact same expression ``100.0 * (2.0 * lcs) / total`` as
``scorers.ratio``, so cross-strategy strict-``>`` comparisons behave identically.
Equivalence is property-tested against the scalar implementation
(tests/test_block_scorer.py).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .scorers import (
    _token_sorted,
    lcs_length,
    partial_ratio,
    ratio,
)

#: uint64 bit-parallel lanes need headroom for the (v + u) carry
_MAX_PATTERN = 62


class PreparedBlock:
    """Immutable per-block candidate structures, built once per block.

    ``streets`` must already be deduplicated (first-occurrence order); the caller
    maps returned positions back through its own position table.
    """

    __slots__ = ("streets", "n", "codes", "lens", "ts_streets", "ts_codes",
                 "ts_lens", "token_sets", "tok_len_sum", "max_code")

    def __init__(self, streets: List[str]):
        self.streets = streets
        self.n = len(streets)
        self.ts_streets = [_token_sorted(s) for s in streets]
        self.codes, self.lens, mc1 = _code_matrix(streets)
        self.ts_codes, self.ts_lens, mc2 = _code_matrix(self.ts_streets)
        self.max_code = max(mc1, mc2)
        self.token_sets = [frozenset(s.split()) for s in streets]
        # sum(len(t)+1) over a candidate's unique tokens (join length + 1)
        self.tok_len_sum = [sum(len(t) + 1 for t in ts) for ts in self.token_sets]


def _code_matrix(strings: List[str]) -> Tuple[np.ndarray, np.ndarray, int]:
    n = len(strings)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    lmax = int(lens.max()) if n else 0
    codes = np.zeros((n, lmax), dtype=np.int32)
    for i, s in enumerate(strings):
        if s:
            codes[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)[
                : len(s)
            ].astype(np.int32)
    mc = int(codes.max()) if codes.size else 0
    return codes, lens, mc


def _vector_lcs(query: str, codes: np.ndarray, lens: np.ndarray, max_code: int
                ) -> np.ndarray:
    """LCS(query, candidate_i) for all i — bit-parallel over uint64 lanes."""
    lq = len(query)
    n = codes.shape[0]
    if lq == 0 or n == 0:
        return np.zeros(n, dtype=np.int64)
    lut = np.zeros(max_code + 2, dtype=np.uint64)
    bit = 1
    for ch in query:
        c = ord(ch)
        if c <= max_code:
            lut[c] |= np.uint64(bit)
        bit <<= 1
    mask = np.uint64((1 << lq) - 1)
    v = np.full(n, mask, dtype=np.uint64)
    lmax = codes.shape[1]
    active_rows = lens  # candidates shorter than k keep their final v
    for k in range(lmax):
        m = lut[codes[:, k]]
        u = v & m
        nv = ((v + u) | (v & ~m)) & mask
        v = np.where(active_rows > k, nv, v)
    # popcount via uint8 view
    pop = np.unpackbits(v.view(np.uint8).reshape(n, 8), axis=1).sum(axis=1)
    return lq - pop.astype(np.int64)


def _ratio_from_lcs(lcs: np.ndarray, la: int, lb: np.ndarray) -> np.ndarray:
    total = la + lb
    out = np.where(total > 0, 100.0 * (2.0 * lcs) / np.maximum(total, 1), 100.0)
    return out


def _token_set_extract_one(
    query: str, blk: PreparedBlock, early_exit: float = 100.0
) -> Tuple[float, int]:
    """extractOne under token_set_ratio with lazy diff-DP; returns (score, idx)."""
    qt = frozenset(query.split())
    q_toks = {t: len(t) for t in qt}
    best = -1.0
    best_i = -1
    for i in range(blk.n):
        ct = blk.token_sets[i]
        inter = qt & ct
        n_inter = len(inter)
        sect_len = (sum(len(t) + 1 for t in inter) - 1) if n_inter else 0
        dab_len_p1 = sum(l + 1 for t, l in q_toks.items() if t not in ct)
        dab_len = dab_len_p1 - 1 if dab_len_p1 else 0
        dba_len_p1 = blk.tok_len_sum[i] - (sect_len + 1 if n_inter else 0)
        dba_len = dba_len_p1 - 1 if dba_len_p1 else 0
        # s1 = strip(sect + " " + dab), s2 = strip(sect + " " + dba)
        s1_len = sect_len + 1 + dab_len if (n_inter and dab_len_p1) else \
            (sect_len if n_inter else dab_len)
        s2_len = sect_len + 1 + dba_len if (n_inter and dba_len_p1) else \
            (sect_len if n_inter else dba_len)
        # ratio(sect, s1): sect is a prefix of s1 -> LCS == sect_len
        t1 = sect_len + s1_len
        cf1 = 100.0 * (2.0 * sect_len) / t1 if t1 > 0 else 100.0
        t2 = sect_len + s2_len
        cf2 = 100.0 * (2.0 * sect_len) / t2 if t2 > 0 else 100.0
        sc = cf1 if cf1 >= cf2 else cf2
        # third component: ratio(s1, s2)
        if not dab_len_p1:
            dp = cf2  # s1 == sect exactly
        elif not dba_len_p1:
            dp = cf1
        else:
            prefix = sect_len + 1 if n_inter else 0
            t3 = s1_len + s2_len
            ub = 100.0 * (2.0 * (prefix + min(dab_len, dba_len))) / t3 if t3 else 100.0
            need = best if best > sc else sc
            if ub > need:
                dab = " ".join(sorted(t for t in qt if t not in ct))
                dba = " ".join(sorted(t for t in ct if t not in qt))
                lcs3 = prefix + lcs_length(dab, dba)
                dp = 100.0 * (2.0 * lcs3) / t3 if t3 else 100.0
            else:
                dp = -1.0  # provably cannot change max(cf1, cf2, dp) beyond `need`
        if dp > sc:
            sc = dp
        if sc > best:
            best = sc
            best_i = i
            if best >= early_exit:
                break
    return best, best_i


def best_match_block(
    query: str,
    blk: PreparedBlock,
    threshold: float,
) -> Optional[Tuple[float, int, str]]:
    """Winner of the reference's 4-strategy loop over the block's candidates.

    Returns ``(score, index_in_block, strategy)`` with the exact semantics of
    ``best_match_multi_strategy`` (per-strategy extractOne lowest-index ties,
    strict-``>`` across the strategy order), or None when no candidate reaches a
    positive score. Results below ``threshold`` are still returned (the caller
    applies the threshold), but ``threshold`` tightens the partial_ratio pruning
    cutoff, so pass the real one.
    """
    if blk.n == 0 or not query:
        return None
    lq = len(query)
    ts_query = _token_sorted(query)
    if lq > _MAX_PATTERN or len(ts_query) > _MAX_PATTERN:
        return None  # caller falls back to the scalar path

    # strategy 1: token_sort_ratio (vectorized)
    ts_lcs = _vector_lcs(ts_query, blk.ts_codes, blk.ts_lens, blk.max_code)
    ts_scores = _ratio_from_lcs(ts_lcs, len(ts_query), blk.ts_lens)
    i0 = int(np.argmax(ts_scores))
    s0 = float(ts_scores[i0])

    best_score, best_i, best_name = (s0, i0, "token_sort_ratio") if s0 > 0.0 else (
        0.0, -1, "")
    if best_score < 100.0:
        # strategy 2: token_set_ratio (closed forms + lazy DP)
        s1, i1 = _token_set_extract_one(query, blk)
        if s1 > best_score:
            best_score, best_i, best_name = s1, i1, "token_set_ratio"

    # full-string LCS powers both the ratio strategy and the partial bound
    r_lcs = _vector_lcs(query, blk.codes, blk.lens, blk.max_code)
    r_scores = _ratio_from_lcs(r_lcs, lq, blk.lens)
    i3 = int(np.argmax(r_scores))
    s3 = float(r_scores[i3])

    if best_score < 100.0:
        # strategy 3: partial_ratio, pruned by the window-maximizer bound
        l_short = np.minimum(lq, blk.lens)
        denom = l_short + r_lcs
        bounds = np.where(denom > 0, 100.0 * (2.0 * r_lcs) / np.maximum(denom, 1), 0.0)
        cutoff = max(threshold, best_score, s3)
        p_best = -1.0
        p_i = -1
        for i in np.nonzero(bounds >= cutoff)[0]:
            sc = partial_ratio(query, blk.streets[int(i)])
            if sc > p_best:
                p_best = sc
                p_i = int(i)
                if p_best >= 100.0:
                    break
        if p_best > best_score:
            best_score, best_i, best_name = p_best, p_i, "partial_ratio"

    # strategy 4: ratio
    if s3 > best_score:
        best_score, best_i, best_name = s3, i3, "ratio"

    if best_i < 0 or best_score <= 0.0:
        return None
    return best_score, best_i, best_name
