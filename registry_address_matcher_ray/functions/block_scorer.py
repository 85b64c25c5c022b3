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

    __slots__ = ("streets", "n", "codes", "lens_sorted", "inv", "lens",
                 "ts_streets", "ts_codes", "ts_lens_sorted", "ts_inv", "ts_lens",
                 "token_sets", "tok_len_sum", "max_code", "postings")

    def __init__(self, streets: List[str]):
        self.streets = streets
        self.n = len(streets)
        self.ts_streets = [_token_sorted(s) for s in streets]
        self.codes, self.lens_sorted, mc1, self.lens, self.inv = _code_matrix(streets)
        (self.ts_codes, self.ts_lens_sorted, mc2,
         self.ts_lens, self.ts_inv) = _code_matrix(self.ts_streets)
        self.max_code = max(mc1, mc2)
        self.token_sets = [frozenset(s.split()) for s in streets]
        # sum(len(t)+1) over a candidate's unique tokens (join length + 1)
        self.tok_len_sum = np.fromiter(
            (sum(len(t) + 1 for t in ts) for ts in self.token_sets),
            dtype=np.int64, count=self.n)
        # token -> candidate indices containing it (for vectorized intersections)
        post: dict = {}
        for i, ts in enumerate(self.token_sets):
            for t in ts:
                post.setdefault(t, []).append(i)
        self.postings = {t: np.asarray(ix, dtype=np.int64) for t, ix in post.items()}


def _code_matrix(strings: List[str]):
    """(length-desc-sorted TRANSPOSED codes matrix (lmax, n), sorted lens, max
    code, lens in original order, inverse permutation to original order).

    Transposed layout makes each char-step's slice ``codes_T[k, :active]``
    contiguous; uint16 suffices (BMP code points; wider chars fall back to the
    scalar path via the caller's length/max-code gate).
    """
    n = len(strings)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    lmax = int(lens.max()) if n else 0
    order = np.argsort(-lens, kind="stable")
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    codes = np.zeros((n, lmax), dtype=np.uint16)
    mc = 0
    for r, i in enumerate(order):
        s = strings[int(i)]
        if s:
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)[: len(s)]
            m = int(cp.max())
            if m > mc:
                mc = m
            codes[r, : len(s)] = np.minimum(cp, 0xFFFF).astype(np.uint16)
    return np.ascontiguousarray(codes.T), lens[order], mc, lens, inv


#: reusable per-call scratch (grown on demand; module-level = per worker process)
_SCRATCH: dict = {}


def _scratch(n: int):
    buf = _SCRATCH.get("buf")
    if buf is None or buf.shape[1] < n:
        buf = np.empty((4, max(n, 1024)), dtype=np.uint64)
        _SCRATCH["buf"] = buf
    return buf


_POP_M1 = np.uint64(0x5555555555555555)
_POP_M2 = np.uint64(0x3333333333333333)
_POP_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_POP_H01 = np.uint64(0x0101010101010101)
_U1, _U2, _U4, _U56 = np.uint64(1), np.uint64(2), np.uint64(4), np.uint64(56)


def _popcount64(v: np.ndarray) -> np.ndarray:
    """SWAR popcount per uint64 lane — ~5x lighter than unpackbits+sum
    (no (n, 64) byte expansion; a handful of n-length temporaries)."""
    with np.errstate(over="ignore"):
        v = v - ((v >> _U1) & _POP_M1)
        v = (v & _POP_M2) + ((v >> _U2) & _POP_M2)
        v = (v + (v >> _U4)) & _POP_M4
        return ((v * _POP_H01) >> _U56).astype(np.int64)


def _query_lut(max_code: int):
    """Reusable query-bitmask lookup table: only the PREVIOUS query's entries
    are zeroed (tens of writes) instead of reallocating+zeroing the whole
    code-point range per call."""
    size = min(max_code, 0xFFFF) + 2
    lut = _SCRATCH.get("lut")
    if lut is None or len(lut) < size:
        lut = np.zeros(max(size, 2048), dtype=np.uint64)
        _SCRATCH["lut"] = lut
        _SCRATCH["lut_dirty"] = []
    else:
        for c in _SCRATCH["lut_dirty"]:
            lut[c] = 0
    dirty: list = []
    _SCRATCH["lut_dirty"] = dirty
    return lut, dirty


def _vector_lcs(query: str, codes_t: np.ndarray, lens_desc: np.ndarray,
                max_code: int, inv_perm: np.ndarray) -> np.ndarray:
    """LCS(query, candidate_i) for all i — bit-parallel over uint64 lanes.

    Candidates are length-desc sorted (each step touches only the still-active
    contiguous prefix); all intermediates live in preallocated scratch buffers,
    so a call allocates nothing in the hot loop.
    """
    lq = len(query)
    n = codes_t.shape[1] if codes_t.ndim == 2 else 0
    if lq == 0 or n == 0:
        return np.zeros(n, dtype=np.int64)
    lut, dirty = _query_lut(max_code)
    bit = 1
    for ch in query:
        c = ord(ch)
        if c < len(lut):
            lut[c] |= np.uint64(bit)
            dirty.append(c)
        bit <<= 1
    mask = np.uint64((1 << lq) - 1)
    v = np.full(n, mask, dtype=np.uint64)
    scratch = _scratch(n)
    lmax = codes_t.shape[0]
    active = n
    for k in range(lmax):
        # rows are length-desc sorted: rows with len <= k are a suffix
        while active and lens_desc[active - 1] <= k:
            active -= 1
        if not active:
            break
        va = v[:active]
        m = scratch[0, :active]
        np.take(lut, codes_t[k, :active], out=m)
        u = scratch[1, :active]
        np.bitwise_and(va, m, out=u)          # u = v & m
        np.invert(m, out=m)
        np.bitwise_and(va, m, out=m)          # m = v & ~m
        np.add(va, u, out=va)                 # v += u
        np.bitwise_or(va, m, out=va)          # v = (v+u) | (v&~m)
        np.bitwise_and(va, mask, out=va)
    pop = _popcount64(v)
    return (lq - pop)[inv_perm]


def _ratio_from_lcs(lcs: np.ndarray, la: int, lb: np.ndarray) -> np.ndarray:
    total = la + lb
    out = np.where(total > 0, 100.0 * (2.0 * lcs) / np.maximum(total, 1), 100.0)
    return out


def _token_set_extract_one(
    query: str, blk: PreparedBlock, threshold: float,
    ts_lcs: Optional[np.ndarray] = None,
) -> Tuple[float, int]:
    """extractOne under token_set_ratio, vectorized closed forms + pruned diff-DP.

    Per-candidate closed forms (``sect`` is a prefix of both combined strings, so
    two of the three component ratios need no DP) are computed with numpy via the
    block's token postings lists. The third component's DP runs only for candidates
    whose upper bound ``200*(|sect|+1+min(|dab|,|dba|))/(|s1|+|s2|)`` reaches
    ``max(threshold, best-closed-form)`` — any candidate skipped is provably unable
    to be (or displace) an at/above-threshold extractOne winner, so the returned
    winner is exact whenever its score matters to the caller (>= threshold);
    below-threshold returns may understate, which callers discard.
    """
    qt = frozenset(query.split())
    n = blk.n
    q_total_p1 = sum(len(t) + 1 for t in qt)
    inter_p1 = np.zeros(n, dtype=np.int64)
    n_inter = np.zeros(n, dtype=np.int64)
    for t in qt:
        ix = blk.postings.get(t)
        if ix is not None:
            inter_p1[ix] += len(t) + 1
            n_inter[ix] += 1
    has_inter = n_inter > 0
    sect_len = np.where(has_inter, inter_p1 - 1, 0)
    dab_p1 = q_total_p1 - inter_p1
    dba_p1 = blk.tok_len_sum - inter_p1
    dab_len = np.maximum(dab_p1 - 1, 0)
    dba_len = np.maximum(dba_p1 - 1, 0)
    s1_len = np.where(has_inter & (dab_p1 > 0), sect_len + 1 + dab_len,
                      np.where(has_inter, sect_len, dab_len))
    s2_len = np.where(has_inter & (dba_p1 > 0), sect_len + 1 + dba_len,
                      np.where(has_inter, sect_len, dba_len))
    t1 = sect_len + s1_len
    t2 = sect_len + s2_len
    cf1 = np.where(t1 > 0, 100.0 * (2.0 * sect_len) / np.maximum(t1, 1), 100.0)
    cf2 = np.where(t2 > 0, 100.0 * (2.0 * sect_len) / np.maximum(t2, 1), 100.0)
    base = np.maximum(cf1, cf2)
    # when either diff is empty the third component equals cf2/cf1 -> folded in base
    both = (dab_p1 > 0) & (dba_p1 > 0)
    prefix = np.where(has_inter, sect_len + 1, 0)
    t3 = s1_len + s2_len
    # LCS(dab, dba) <= min(|dab|, |dba|) and <= LCS of the sorted-token strings
    # (dab/dba are subsequences of those, and LCS is monotone under subsequence)
    lcs_cap = np.minimum(dab_len, dba_len)
    if ts_lcs is not None:
        lcs_cap = np.minimum(lcs_cap, ts_lcs)
    ub = np.where(
        t3 > 0,
        100.0 * (2.0 * (prefix + lcs_cap)) / np.maximum(t3, 1),
        100.0,
    )
    best0_i = int(np.argmax(base))
    best0 = float(base[best0_i])
    need = max(threshold, best0)
    scores = base
    survivors = np.nonzero(both & (ub >= need))[0]
    if survivors.size:
        scores = base.copy()
        for i in survivors:
            i = int(i)
            ct = blk.token_sets[i]
            dab = " ".join(sorted(t for t in qt if t not in ct))
            dba = " ".join(sorted(t for t in ct if t not in qt))
            lcs3 = int(prefix[i]) + lcs_length(dab, dba)
            dp = 100.0 * (2.0 * lcs3) / float(t3[i])
            if dp > scores[i]:
                scores[i] = dp
    bi = int(np.argmax(scores))
    return float(scores[bi]), bi


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
    ts_lcs = _vector_lcs(ts_query, blk.ts_codes, blk.ts_lens_sorted, blk.max_code,
                         blk.ts_inv)
    ts_scores = _ratio_from_lcs(ts_lcs, len(ts_query), blk.ts_lens)
    i0 = int(np.argmax(ts_scores))
    s0 = float(ts_scores[i0])

    best_score, best_i, best_name = (s0, i0, "token_sort_ratio") if s0 > 0.0 else (
        0.0, -1, "")
    if best_score < 100.0:
        # strategy 2: token_set_ratio (closed forms + lazy DP)
        s1, i1 = _token_set_extract_one(query, blk, threshold, ts_lcs)
        if s1 > best_score:
            best_score, best_i, best_name = s1, i1, "token_set_ratio"

    # full-string LCS powers both the ratio strategy and the partial bound
    r_lcs = _vector_lcs(query, blk.codes, blk.lens_sorted, blk.max_code, blk.inv)
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


def per_strategy_bests_block(
    query: str,
    blk: PreparedBlock,
    threshold: float,
) -> Optional[Tuple[Optional[Tuple[float, int]], ...]]:
    """Vectorized counterpart of ``scorers.per_strategy_bests``: per-strategy
    (max score, lowest index) over the block's candidates, in STRATEGIES order.

    Contract (same as the block kernel's pruned strategies): each strategy's
    reported best is EXACT — value and min-index tie-break — whenever its true
    best is >= ``threshold``; below-threshold values may understate (partial /
    token_set pruning). That is sufficient for the salted-shuffle shard merge
    (stages/matching.py): sub-threshold values can neither produce an output
    row nor displace an at/above-threshold winner, so the merged result is
    bit-identical to scalar scoring. Returns None when the query falls outside
    the vector kernel's envelope (caller uses the scalar path).
    """
    if blk.n == 0 or not query:
        return None
    lq = len(query)
    ts_query = _token_sorted(query)
    if lq > _MAX_PATTERN or len(ts_query) > _MAX_PATTERN:
        return None
    if max(map(ord, query)) > 0xFFFF or blk.max_code > 0xFFFF:
        return None

    # token_sort_ratio — exact for every candidate
    ts_lcs = _vector_lcs(ts_query, blk.ts_codes, blk.ts_lens_sorted,
                         blk.max_code, blk.ts_inv)
    ts_scores = _ratio_from_lcs(ts_lcs, len(ts_query), blk.ts_lens)
    i0 = int(np.argmax(ts_scores))   # argmax keeps the FIRST (lowest) index
    b_tsort = (float(ts_scores[i0]), i0)

    # token_set_ratio — exact at/above threshold (closed forms + pruned DP)
    s1, i1 = _token_set_extract_one(query, blk, threshold, ts_lcs)
    b_tset = (float(s1), int(i1))

    # full-string LCS powers ratio exactly and the partial upper bound
    r_lcs = _vector_lcs(query, blk.codes, blk.lens_sorted, blk.max_code, blk.inv)
    r_scores = _ratio_from_lcs(r_lcs, lq, blk.lens)
    i3 = int(np.argmax(r_scores))
    b_ratio = (float(r_scores[i3]), i3)

    # partial_ratio — bound-pruned at the threshold only (NOT at other
    # strategies' scores: the shard merge needs this strategy's own max)
    l_short = np.minimum(lq, blk.lens)
    denom = l_short + r_lcs
    bounds = np.where(denom > 0, 100.0 * (2.0 * r_lcs) / np.maximum(denom, 1),
                      0.0)
    p_best, p_i = -1.0, -1
    for i in np.nonzero(bounds >= threshold)[0]:
        sc = partial_ratio(query, blk.streets[int(i)])
        if sc > p_best:
            p_best, p_i = sc, int(i)
            if p_best >= 100.0:
                break
    b_partial = None if p_i < 0 else (float(p_best), p_i)

    return (b_tsort, b_tset, b_partial, b_ratio)
