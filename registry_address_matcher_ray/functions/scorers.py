"""String-similarity scorers with published rapidfuzz semantics.

The reference delegates scoring to ``rapidfuzz`` (``/root/reference/address.py:656-668``,
``/root/reference/src/matching/engine.py:91-104``); rapidfuzz is not available in this
environment, so the four scorers are reimplemented from scratch against the *published*
rapidfuzz semantics (scores in [0, 100]):

- ``ratio(a, b)``          = ``100 * (1 - indel(a,b) / (|a|+|b|))`` where ``indel`` is the
  edit distance with insert/delete cost 1 and substitution cost 2, i.e.
  ``|a| + |b| - 2*LCS(a, b)``.
- ``partial_ratio(a, b)``  = best ``ratio`` of the shorter string against any alignment
  window of the longer (windows of length ``len(shorter)``, clipped at both edges).
- ``token_sort_ratio``     = ``ratio`` over whitespace tokens sorted and re-joined.
- ``token_set_ratio``      = max pairwise ``ratio`` among {sorted intersection,
  intersection + sorted(A-B), intersection + sorted(B-A)}.
- ``extract_one(q, choices, scorer)`` mirrors ``rapidfuzz.process.extractOne``: returns
  ``(choice, score, index)`` of the maximum; ties keep the FIRST (lowest index) — this
  tie-break is a determinism requirement of the reference's top-1 selection
  (``/root/reference/address.py:668-682``).

LCS length uses the bit-parallel Crochemore/Allison-Dix algorithm (O(n*m/w) with Python
big-int words), so per-pair cost on short address strings is ~1 microsecond — these
kernels run inside actor-pool ``map_batches`` stages over whole candidate blocks, with a
per-actor pair cache on top (see ``stages/matching.py``).

``jaro_winkler`` and ``levenshtein_ratio`` are additional scorers named by the target
spec (BASELINE.json north_star); they are exposed through the same registry.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

__all__ = [
    "ratio",
    "partial_ratio",
    "token_sort_ratio",
    "token_set_ratio",
    "jaro_winkler",
    "levenshtein_ratio",
    "extract_one",
    "best_match_multi_strategy",
    "STRATEGIES",
    "SCORER_REGISTRY",
]


def lcs_length(a: str, b: str) -> int:
    """Length of the longest common subsequence (bit-parallel)."""
    la = len(a)
    if la == 0 or len(b) == 0:
        return 0
    # position bitmasks for the (shorter-as-pattern is not required; use a)
    pm: dict = {}
    bit = 1
    for ch in a:
        pm[ch] = pm.get(ch, 0) | bit
        bit <<= 1
    mask = (1 << la) - 1
    v = mask
    get = pm.get
    for ch in b:
        m = get(ch, 0)
        u = v & m
        v = ((v + u) | (v & ~m)) & mask
    # LCS = number of zero bits among the low la bits
    return la - bin(v).count("1")


def indel_distance(a: str, b: str) -> int:
    """Insert/delete edit distance = |a| + |b| - 2*LCS(a, b)."""
    return len(a) + len(b) - 2 * lcs_length(a, b)


def ratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.ratio`` semantics, in [0, 100]."""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return 100.0 * (2.0 * lcs_length(a, b)) / total


def partial_ratio(a: str, b: str) -> float:
    """Best ``ratio`` of the shorter string vs. alignment windows of the longer.

    Windows are the contiguous substrings of the longer string of length
    ``len(shorter)``, clipped at both edges (so prefixes/suffixes shorter than the
    pattern are also considered). Early-exits at 100.
    """
    s1, s2 = (a, b) if len(a) <= len(b) else (b, a)
    l1, l2 = len(s1), len(s2)
    if l1 == 0:
        return 100.0 if l2 == 0 else 0.0
    if s1 == s2:
        return 100.0
    # Precompute the pattern bitmask once; slide the text through.
    pm: dict = {}
    bit = 1
    for ch in s1:
        pm[ch] = pm.get(ch, 0) | bit
        bit <<= 1
    mask = (1 << l1) - 1
    get = pm.get

    def _ratio_window(w: str) -> float:
        v = mask
        for ch in w:
            m = get(ch, 0)
            u = v & m
            v = ((v + u) | (v & ~m)) & mask
        lcs = l1 - bin(v).count("1")
        return 100.0 * 2.0 * lcs / (l1 + len(w))

    best = 0.0
    for start in range(-(l1 - 1), l2):
        w = s2[max(0, start) : start + l1]
        if not w:
            continue
        sc = _ratio_window(w)
        if sc > best:
            best = sc
            if best >= 100.0:
                break
    return best


def _token_sorted(s: str) -> str:
    return " ".join(sorted(s.split()))


def token_sort_ratio(a: str, b: str) -> float:
    """``ratio`` over whitespace tokens sorted and re-joined."""
    return ratio(_token_sorted(a), _token_sorted(b))


def token_set_ratio(a: str, b: str) -> float:
    """Max pairwise ``ratio`` among intersection/difference token strings.

    With token sets A, B: t0 = sorted(A & B), t1 = t0 + sorted(A - B),
    t2 = t0 + sorted(B - A), all space-joined; result is
    max(ratio(t0,t1), ratio(t0,t2), ratio(t1,t2)) — hence 100 whenever one
    side's tokens are a subset of the other's (and the intersection is nonempty).
    """
    ta, tb = set(a.split()), set(b.split())
    if not ta and not tb:
        return ratio(a, b)
    inter = sorted(ta & tb)
    diff_ab = sorted(ta - tb)
    diff_ba = sorted(tb - ta)
    sect = " ".join(inter)
    s1 = (sect + " " + " ".join(diff_ab)).strip()
    s2 = (sect + " " + " ".join(diff_ba)).strip()
    return max(ratio(sect, s1), ratio(sect, s2), ratio(s1, s2))


def levenshtein_ratio(a: str, b: str) -> float:
    """Normalized Levenshtein similarity (unit substitution cost), in [0, 100].

    ``100 * (1 - lev(a,b) / max(|a|,|b|))``. Bit-parallel Myers algorithm.
    """
    if a == b:
        return 100.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if la > lb:
        a, b, la, lb = b, a, lb, la
    pm: dict = {}
    bit = 1
    for ch in a:
        pm[ch] = pm.get(ch, 0) | bit
        bit <<= 1
    mask = (1 << la) - 1
    high = 1 << (la - 1)
    vp, vn = mask, 0
    dist = la
    get = pm.get
    for ch in b:
        x = get(ch, 0) | vn
        d0 = (((x & vp) + vp) ^ vp) | x
        hp = vn | ~(d0 | vp)
        hn = d0 & vp
        if hp & high:
            dist += 1
        if hn & high:
            dist -= 1
        hp = ((hp << 1) | 1) & mask
        hn = (hn << 1) & mask
        vp = hn | ~(d0 | hp)
        vn = d0 & hp
        vp &= mask
        vn &= mask
    return 100.0 * (1.0 - dist / lb)


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler similarity in [0, 100] (standard published definition)."""
    if a == b:
        return 100.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ca:
                a_flags[i] = b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    transpositions //= 2
    jaro = (matches / la + matches / lb + (matches - transpositions) / matches) / 3.0
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix == 4:
            break
        prefix += 1
    return 100.0 * (jaro + prefix * prefix_weight * (1.0 - jaro))


def extract_one(
    query: str,
    choices: Sequence[str],
    scorer: Callable[[str, str], float],
) -> Optional[Tuple[str, float, int]]:
    """``rapidfuzz.process.extractOne`` semantics: max score, FIRST index on ties."""
    best: Optional[Tuple[str, float, int]] = None
    best_score = -1.0
    for i, choice in enumerate(choices):
        sc = scorer(query, choice)
        if sc > best_score:
            best_score = sc
            best = (choice, sc, i)
            if sc >= 100.0:
                break
    return best


# Strategy order of the reference's fuzzy loop (/root/reference/address.py:656-661);
# the loop uses strict ``>`` so equal-scoring strategies resolve in this order.
STRATEGIES: Tuple[Tuple[str, Callable[[str, str], float]], ...] = (
    ("token_sort_ratio", token_sort_ratio),
    ("token_set_ratio", token_set_ratio),
    ("partial_ratio", partial_ratio),
    ("ratio", ratio),
)

SCORER_REGISTRY: dict = {
    "ratio": ratio,
    "partial_ratio": partial_ratio,
    "token_sort_ratio": token_sort_ratio,
    "token_set_ratio": token_set_ratio,
    "jaro_winkler": jaro_winkler,
    "levenshtein_ratio": levenshtein_ratio,
}


def per_strategy_bests(
    query: str, choices: Sequence[str]
) -> Tuple[Optional[Tuple[float, int]], ...]:
    """Per-strategy extractOne results: ``((score, first_max_index) | None) x 4``.

    The decomposed form of :func:`best_match_multi_strategy` for sharded
    (salted) candidate blocks: per-strategy maxima with lowest-index tie-breaks
    merge exactly across shards (max score, then min candidate order), and the
    strict-``>`` strategy loop applied to the merged values reproduces the
    unsharded winner bit-for-bit (a later strategy can never displace an equal
    earlier one, mirroring the reference loop /root/reference/address.py:667-672).
    """
    out = []
    for _name, scorer in STRATEGIES:
        res = extract_one(query, choices, scorer)
        out.append(None if res is None else (res[1], res[2]))
    return tuple(out)


def best_match_multi_strategy(
    query: str, choices: Sequence[str]
) -> Optional[Tuple[float, int, str]]:
    """Best candidate over the 4-strategy loop of /root/reference/address.py:656-682.

    Returns ``(score, choice_index, strategy_name)`` or ``None`` for empty choices.
    Replicates both tie-breaks: within a strategy the lowest index wins; across
    strategies the earlier strategy wins (strict ``>`` on the running best).
    """
    best_score = 0.0
    best_idx: Optional[int] = None
    best_strategy = ""
    for name, scorer in STRATEGIES:
        res = extract_one(query, choices, scorer)
        if res is not None and res[1] > best_score:
            best_score = res[1]
            best_idx = res[2]
            best_strategy = name
            if best_score >= 100.0:
                break
    if best_idx is None:
        return None
    return best_score, best_idx, best_strategy
