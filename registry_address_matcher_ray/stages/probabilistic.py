"""Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter, JASA 1969).

The reference scores pairs with ad-hoc fuzzy-string thresholds
(`/root/reference/address.py:420-520`); a probabilistic linker instead LEARNS
how discriminating each field is: for every candidate pair it computes a
binary agreement vector over k comparison fields, fits per-field match/unmatch
probabilities (m_i, u_i) with EM over the 2^k agreement-pattern histogram
(Winkler 1988's unsupervised formulation), and scores each pair with the
log-likelihood-ratio match weight  sum_i [gamma_i ? log2(m_i/u_i)
: log2((1-m_i)/(1-u_i))].

Distributed shape (100-TB-safe):

- :func:`comparison_vectors` — candidate pairs come from the same house-number
  blocking the fuzzy matcher uses, with the matcher's auto plan selection:
  under the byte threshold the cad projection is broadcast once,
  dictionary-encoded, and probe batches expand their block pairs locally
  (per-worker cached hash probes, per-yield fan-out bounded by
  ``MAX_EXPAND_PAIRS`` against hot block keys); above it a hash equi-join
  shuffle moves O(rows) key-projected rows. Both plans are row-identical.
  Output is one row per candidate pair with its pattern id (0..2^k-1).
- :func:`fs_pattern_counts` — per-batch partial histogram (at most 2^k rows
  per batch leave the combiner) + one tiny groupby: the EM input is at most
  2^k rows regardless of corpus size.
- :func:`fs_em` — plain-numpy EM on that histogram, driver-side by design
  (input is <= 2^k floats; iteration count fixed, deterministic init — no
  randomness, so results are partition- and run-invariant).
- :func:`fs_match_weights` — re-runs the vectorized comparison join and maps
  each pattern to its precomputed weight via a 2^k lookup table (fancy
  indexing, no per-row Python).

`match_fs_patterns` / `match_fs_weights` have exact DuckDB oracles in
``__ray_entry__.py`` (the comparisons and the fixed-parameter weight are
relational); the EM fit itself is iterative (not SQL-expressible) and is
pytest-gated against an independent reference implementation plus
partition-invariance checks (``tests/test_fellegi_sunter.py``).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = [
    "DEFAULT_FIELDS",
    "comparison_vectors",
    "fs_pattern_counts",
    "fs_em",
    "fs_match_weights",
    "fs_value_weights",
]

# (name, column, kind) — kind "exact" compares full values, "prefix4"
# compares the first 4 codepoints (a cheap typo-tolerant agreement level).
# Most-significant bit first: pattern = sum_i gamma_i << (k-1-i).
DEFAULT_FIELDS: Tuple[Tuple[str, str, str], ...] = (
    ("street", "STREET_NORM", "exact"),
    ("street4", "STREET_NORM", "prefix4"),
    ("building", "BUILDING_NORM", "exact"),
    ("full", "FULL_ADDRESS", "exact"),
)


def _key_proj(id_out: str, fields, block_col: str, prefix: str):
    cols = sorted({c for _, c, _ in fields})

    def _f(b: pa.Table) -> pa.Table:
        k = pc.fill_null(b.column(block_col), "")
        keep = pc.not_equal(k, "")
        out = {id_out: b.column("ADDRESS_ID").filter(keep),
               prefix + "k": k.filter(keep)}
        for c in cols:
            out[prefix + c] = pc.fill_null(b.column(c), "").filter(keep)
        return pa.table(out)

    return _f


def _field_values(tbl: pa.Table, col: str, kind: str, prefix: str) -> pa.Array:
    """The compared value for one field: the column itself, or its 4-codeunit
    prefix — sliced with the SAME Arrow kernel in every plan so broadcast and
    shuffle agree bit-for-bit on multi-byte text."""
    arr = tbl.column(prefix + col)
    if kind == "prefix4":
        arr = pc.utf8_slice_codeunits(arr, 0, 4)
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _gather_cad_projection(cad, fields, block_col) -> pa.Table:
    """Collect the cad key projection once (bounded by the auto-plan byte
    threshold — the same premise as the matcher's broadcast plans)."""
    return pa.concat_tables(
        cad.map_batches(
            _key_proj("ADDRESS_ID_CAD", fields, block_col, "c_"),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow", batch_size=None))


def _block_groups(cadp: pa.Table):
    """Group cad rows by block key: (key values, row order, starts, ends) —
    rows re-ordered so each key's rows are a contiguous [start, end) slice
    addressed by the key's dense code."""
    kcodes, kuniq = pd.factorize(cadp.column("c_k").to_pandas(), sort=False)
    order = np.argsort(kcodes, kind="stable")
    starts = np.searchsorted(kcodes[order], np.arange(len(kuniq)))
    ends = np.append(starts[1:], len(kcodes)).astype(np.int64)
    return (np.asarray(kuniq, dtype=object), order,
            starts.astype(np.int64), ends)


#: per-emit pair fan-out bound for the broadcast expansion: a hot block key
#: (one house number covering a large cad slice) multiplies a probe batch by
#: the block size, so expansion is chunked to ~this many pairs per yielded
#: table (~150 MiB working set) regardless of skew — the broadcast plan's
#: analogue of the shuffle plan's hot-block salting
MAX_EXPAND_PAIRS = 4_000_000


def _expand_pairs(g: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Expand probe rows (group code per row, -1 pruned by the caller) to the
    per-pair (probe row index, cad row index) arrays."""
    cnt = ends[g] - starts[g]
    total = int(cnt.sum())
    reps = np.repeat(np.arange(len(g), dtype=np.int64), cnt)
    off = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(cnt) - cnt, cnt)
    return reps, starts[g][reps] + off


def _probe_slices(g: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                  max_pairs: int):
    """Split kept probe rows into [lo, hi) runs whose summed block fan-out is
    <= ``max_pairs`` (always >= 1 row per run, so a single ultra-hot row still
    emits — as ONE table of its own rather than multiplying its neighbours)."""
    cnt = (ends[g] - starts[g]).astype(np.int64)
    lo = 0
    n = len(g)
    while lo < n:
        acc = cnt[lo]
        hi = lo + 1
        while hi < n and acc + cnt[hi] <= max_pairs:
            acc += cnt[hi]
            hi += 1
        yield lo, hi
        lo = hi


def _comparison_vectors_broadcast(
    spr: ray.data.Dataset,
    cad: ray.data.Dataset,
    fields,
    block_col: str,
    probe_batch_size: int,
    max_expand_pairs: int,
) -> ray.data.Dataset:
    """Broadcast plan: the cad key projection is gathered once (bounded by the
    auto-plan byte threshold, the same premise as the matcher's broadcast
    plans), each compared field is dictionary-encoded over the cad vocabulary,
    and every probe batch expands its block pairs locally — no hash-join
    shuffle, no string payload per pair. String equality is preserved exactly:
    values sharing a code are equal, and a probe value absent from the cad
    vocabulary (code -1) can never agree with any cad value (codes >= 0)."""
    from .matching import _worker_state, put_broadcast, resolve_broadcast

    k = len(fields)
    cadp = _gather_cad_projection(cad, fields, block_col)
    kuniq, order, starts, ends = _block_groups(cadp)

    take = pa.array(order, pa.int64())
    cid = pc.take(cadp.column("ADDRESS_ID_CAD").combine_chunks(), take)
    vocab_vals: List[np.ndarray] = []
    ccodes = np.empty((k, len(order)), np.int64)
    for i, (_, col, kind) in enumerate(fields):
        codes, uniq = pd.factorize(
            _field_values(cadp, col, kind, "c_").to_pandas(), sort=False)
        vocab_vals.append(np.asarray(uniq, dtype=object))
        ccodes[i] = codes[order]
    ref = put_broadcast((kuniq, vocab_vals, ccodes, cid, starts, ends))
    state_key = ("fs_cmp_bcast", ref.ref.hex())

    left = spr.map_batches(
        _key_proj("ADDRESS_ID_SPR", fields, block_col, "s_"),
        batch_format="pyarrow")
    empty = pa.table({
        "ADDRESS_ID_SPR": pa.array([], cid.type),
        "ADDRESS_ID_CAD": pa.array([], cid.type),
        "pattern": pa.array([], pa.int64()),
    })

    def _build_state():
        # pd.Index.get_indexer = C hash probe returning -1 on miss; the
        # Index engines (hash tables) are built ONCE per worker process and
        # reused by every task (memory: ray-data-gotchas — per-worker cache)
        kvals, vvals, ccodes, cid, starts, ends = resolve_broadcast(ref)
        return (pd.Index(kvals), [pd.Index(v) for v in vvals],
                ccodes, cid, starts, ends)

    def _emit(b: pa.Table):
        key_idx, vocab_idx, ccodes, cid, starts, ends = _worker_state(
            state_key, _build_state)
        g = key_idx.get_indexer(
            b.column("s_k").to_numpy(zero_copy_only=False))
        keep = g >= 0
        if not keep.any():
            yield empty
            return
        b = b.filter(pa.array(keep))
        g = g[keep]
        scs = [vocab_idx[i].get_indexer(
                   _field_values(b, col, kind, "s_")
                   .to_numpy(zero_copy_only=False))
               for i, (_, col, kind) in enumerate(fields)]
        sid = b.column("ADDRESS_ID_SPR").combine_chunks()
        for lo, hi in _probe_slices(g, starts, ends, max_expand_pairs):
            reps, cidx = _expand_pairs(g[lo:hi], starts, ends)
            if len(reps) == 0:
                continue
            reps += lo
            # int64 accumulator (matches _pattern_array in the shuffle
            # plan): uint8 silently overflowed for custom field sets with
            # more than 8 comparison fields.
            pat = np.zeros(len(reps), np.int64)
            for i in range(k):
                np.bitwise_or(
                    pat,
                    np.left_shift(
                        (scs[i][reps] == ccodes[i][cidx]).astype(np.int64),
                        k - 1 - i),
                    out=pat)
            yield pa.table({
                "ADDRESS_ID_SPR": pc.take(sid, pa.array(reps, pa.int64())),
                "ADDRESS_ID_CAD": pc.take(cid, pa.array(cidx, pa.int64())),
                "pattern": pa.array(pat, pa.int64()),
            })

    return left.map_batches(
        _emit, batch_format="pyarrow", batch_size=probe_batch_size)


def _pattern_array(b: pa.Table, fields) -> pa.Array:
    """Vectorized agreement bitmask per joined row (spr cols ``s_*``, cad
    ``c_*``)."""
    k = len(fields)
    pat = np.zeros(b.num_rows, np.int64)
    for i, (_, col, kind) in enumerate(fields):
        a, c = b.column("s_" + col), b.column("c_" + col)
        if kind == "prefix4":
            a, c = pc.utf8_slice_codeunits(a, 0, 4), pc.utf8_slice_codeunits(c, 0, 4)
        agree = pc.equal(a, c).to_numpy(zero_copy_only=False)
        pat |= agree.astype(np.int64) << (k - 1 - i)
    return pa.array(pat, pa.int64())


def comparison_vectors(
    spr: ray.data.Dataset,
    cad: ray.data.Dataset,
    fields: Sequence[Tuple[str, str, str]] = DEFAULT_FIELDS,
    block_col: str = "HOUSE_NORM",
    num_partitions: int = 0,
    plan: str = "auto",
    broadcast_threshold_bytes: int = 2 << 30,
    probe_batch_size: int = 1024,
    max_expand_pairs: "int | None" = None,
) -> ray.data.Dataset:
    """Candidate pairs (house-number blocking, the fuzzy matcher's premise)
    with their k-field agreement ``pattern`` (int in [0, 2^k)).

    ``plan`` mirrors the matcher's physical-plan selection (SURVEY §7.3(4)):
    ``"auto"`` measures the cad side's byte size and picks ``"broadcast"``
    (gather + dictionary-encode the cad projection once, expand pairs locally
    per probe batch — no shuffle) when it fits ``broadcast_threshold_bytes``,
    else ``"shuffle"`` (hash equi-join, both sides large). Both plans emit
    identical (ids, pattern) rows.

    ``num_partitions=0`` sizes the shuffle join by cluster CPUs: the join's
    OUTPUT (blocked pairs, quadratic in block size) dwarfs its inputs, and
    each partition is one join-actor emit task — 8 partitions on 32 CPUs
    measured 163 s at sf0.1 vs 35 s at 32 (the emit, not the shuffle, is the
    cost). ``probe_batch_size`` bounds the broadcast plan's per-task pair
    fan-out (a probe row emits one pair per blocked cad row)."""
    if plan == "auto":
        # Unknown size (size_bytes() is None on some lazy plans) routes to
        # the fail-safe shuffle plan: broadcast gathers the whole cad
        # projection on the driver, so it must only run when the bound is
        # KNOWN to hold.
        nbytes = cad.size_bytes()
        plan = ("broadcast"
                if nbytes is not None and nbytes <= broadcast_threshold_bytes
                else "shuffle")
    if plan == "broadcast":
        return _comparison_vectors_broadcast(
            spr, cad, fields, block_col, probe_batch_size,
            max_expand_pairs or MAX_EXPAND_PAIRS)
    if plan != "shuffle":
        raise ValueError("plan must be 'auto', 'broadcast' or 'shuffle'")
    if not num_partitions:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))
    left = spr.map_batches(
        _key_proj("ADDRESS_ID_SPR", fields, block_col, "s_"),
        batch_format="pyarrow")
    right = cad.map_batches(
        _key_proj("ADDRESS_ID_CAD", fields, block_col, "c_"),
        batch_format="pyarrow")
    joined = left.join(right, join_type="inner",
                       num_partitions=num_partitions,
                       on=("s_k",), right_on=("c_k",))

    def _emit(b: pa.Table) -> pa.Table:
        return pa.table({
            "ADDRESS_ID_SPR": b.column("ADDRESS_ID_SPR"),
            "ADDRESS_ID_CAD": b.column("ADDRESS_ID_CAD"),
            "pattern": _pattern_array(b, fields),
        })

    return joined.map_batches(_emit, batch_format="pyarrow")


def fs_pattern_counts(
    spr: ray.data.Dataset,
    cad: ray.data.Dataset,
    fields: Sequence[Tuple[str, str, str]] = DEFAULT_FIELDS,
    block_col: str = "HOUSE_NORM",
    vecs: "ray.data.Dataset | None" = None,
) -> ray.data.Dataset:
    """Agreement-pattern histogram: at most 2^k rows (pattern, n).

    Per-batch ``np.bincount`` partial histograms mean the final groupby
    shuffles at most 2^k rows per block — the EM input never scales with the
    corpus.
    """
    k = len(fields)
    if vecs is None:
        vecs = comparison_vectors(spr, cad, fields, block_col)

    def _partial(b: pa.Table) -> pa.Table:
        cnt = np.bincount(
            b.column("pattern").to_numpy(zero_copy_only=False),
            minlength=1 << k)
        nz = np.nonzero(cnt)[0]
        return pa.table({"pattern": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    # fold the <=2^k-row partials DRIVER-SIDE: a distributed groupby here
    # spins a second shuffle-aggregator pool that contends with the join's
    # actor pool for CPU slots and was measured 3.7x slower end-to-end
    # (249 s -> 67 s at sf0.1); the driver transfer is 2^k rows per batch,
    # bounded regardless of corpus size (memory: ray-data-gotchas —
    # bounded driver-local finish)
    parts = (vecs.map_batches(_partial, batch_format="pyarrow")
             .to_pandas())
    folded = (parts.groupby("pattern", as_index=False)["n"].sum()
              .sort_values("pattern").reset_index(drop=True)
              .astype({"pattern": "int64", "n": "int64"}))
    return ray.data.from_pandas(folded)


def fs_em(
    counts: pd.DataFrame,
    k: int,
    iters: int = 200,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_p: float = 0.05,
    clamp: float = 1e-6,
) -> Dict[str, object]:
    """Unsupervised EM fit of (m_i, u_i, p) from the pattern histogram.

    ``counts`` has columns (pattern, n); k is the field count. Conditional
    independence of fields given match status (the classic FS assumption).
    Deterministic: fixed init, fixed iteration count, no randomness. Input is
    <= 2^k rows, so this runs driver-side regardless of corpus size.
    """
    pats = counts["pattern"].to_numpy(np.int64)
    n = counts["n"].to_numpy(np.float64)
    # gamma[j, i] = bit i of pattern j (MSB-first field order)
    gamma = ((pats[:, None] >> (k - 1 - np.arange(k))) & 1).astype(np.float64)
    m = np.full(k, init_m)
    u = np.full(k, init_u)
    p = init_p
    for _ in range(iters):
        lm = gamma @ np.log(m) + (1 - gamma) @ np.log(1 - m)
        lu = gamma @ np.log(u) + (1 - gamma) @ np.log(1 - u)
        num = p * np.exp(lm)
        w = num / (num + (1 - p) * np.exp(lu))  # E-step responsibility
        wm, wu = w * n, (1 - w) * n
        sm, su = wm.sum(), wu.sum()
        m = np.clip((gamma * wm[:, None]).sum(0) / max(sm, clamp),
                    clamp, 1 - clamp)
        u = np.clip((gamma * wu[:, None]).sum(0) / max(su, clamp),
                    clamp, 1 - clamp)
        p = min(max(sm / max(n.sum(), clamp), clamp), 1 - clamp)
    return {"m": m, "u": u, "p": float(p)}


def _weight_table(m: np.ndarray, u: np.ndarray) -> np.ndarray:
    """weight[pattern] for all 2^k patterns: sum of per-field log2 ratios."""
    k = len(m)
    pats = np.arange(1 << k)
    agree_w = np.log2(m / u)
    disagree_w = np.log2((1 - m) / (1 - u))
    # accumulate field-by-field (left-to-right) so the float summation order
    # matches the DuckDB oracle's `CASE + CASE + ...` expression exactly
    wt = np.zeros(1 << k, np.float64)
    for i in range(k):
        bit = (pats >> (k - 1 - i)) & 1
        wt += np.where(bit == 1, agree_w[i], disagree_w[i])
    return wt


def fs_match_weights(
    spr: ray.data.Dataset,
    cad: ray.data.Dataset,
    m: Sequence[float],
    u: Sequence[float],
    fields: Sequence[Tuple[str, str, str]] = DEFAULT_FIELDS,
    block_col: str = "HOUSE_NORM",
    upper: float = 3.0,
    lower: float = 0.0,
    round_to: int = 6,
    vecs: "ray.data.Dataset | None" = None,
) -> ray.data.Dataset:
    """Per-pair FS match weight + link/possible/non_link decision.

    ``vecs`` lets the caller reuse one comparison-vector pass for both the
    EM histogram and the weight scoring (materialize it, or at full scale
    write it to a stage-boundary parquet checkpoint) — the candidate join
    is the dominant cost and need not run twice.

    ``m``/``u`` are per-field probabilities (from :func:`fs_em` or priors).
    The per-batch map is a 2^k table lookup via fancy indexing — no per-row
    Python. Decision rule: weight >= ``upper`` -> link, < ``lower`` ->
    non_link, else possible (the FS three-region rule).
    """
    wt = np.round(_weight_table(np.asarray(m, np.float64),
                                np.asarray(u, np.float64)), round_to)
    if vecs is None:
        # Loud, not silent: in the fs_pattern_counts -> fs_em ->
        # fs_match_weights composition this re-runs the dominant candidate
        # join; pass vecs=comparison_vectors(...).materialize() to share it.
        import logging
        logging.getLogger(__name__).info(
            "fs_match_weights: vecs=None, running the candidate join "
            "(pass a materialized comparison_vectors() to reuse one pass)")
        vecs = comparison_vectors(spr, cad, fields, block_col)

    dec_values = pa.array(["non_link", "possible", "link"], pa.string())

    def _score(b: pa.Table) -> pa.Table:
        pat = b.column("pattern").to_numpy(zero_copy_only=False)
        w = wt[pat]
        # decision as a 3-value gather (C string build, no numpy-unicode
        # round-trip): 0=non_link, 1=possible, 2=link
        code = (w >= lower).astype(np.int8) + (w >= upper)
        return pa.table({
            "ADDRESS_ID_SPR": b.column("ADDRESS_ID_SPR"),
            "ADDRESS_ID_CAD": b.column("ADDRESS_ID_CAD"),
            "pattern": b.column("pattern"),
            "fs_weight": pa.array(w, pa.float64()),
            "decision": pc.take(dec_values, pa.array(code, pa.int8())),
        })

    return vecs.map_batches(_score, batch_format="pyarrow")


def fs_value_weights(
    spr: ray.data.Dataset,
    cad: ray.data.Dataset,
    m_street: float = 0.95,
    fields: Sequence[Tuple[str, str, str]] = DEFAULT_FIELDS,
    block_col: str = "HOUSE_NORM",
    value_col: str = "STREET_NORM",
    u_floor: float = 1e-9,
    round_to: int = 6,
    max_expand_pairs: "int | None" = None,
) -> ray.data.Dataset:
    """Value-specific agreement weights (Winkler's frequency-based
    refinement of Fellegi-Sunter): agreeing on a RARE street name is far
    stronger evidence than agreeing on a common one, so the street
    agreement weight becomes ``log2(m / u_v)`` with
    ``u_v = (n_spr(v)/N_spr) * (n_cad(v)/N_cad)`` — the chance two random
    records agree on value ``v`` — instead of one global u.

    Distributed shape: two O(distinct values) count aggregates; the value
    frequency tables AND the cad block projection (bounded, the broadcast-plan
    premise) are `ray.put`-broadcast ONCE, and each probe batch expands its
    block pairs locally with per-worker cached hash probes — no per-pair
    shuffle join, same plan as :func:`comparison_vectors`. Pairs that
    DISAGREE on the street get weight 0 from this component (only the
    agreement evidence is value-specific here). Output: (ids, street value,
    u_v, fs_value_weight).
    """
    from .matching import _worker_state, put_broadcast, resolve_broadcast

    def _freqs(reg):
        def _proj(b: pa.Table) -> pa.Table:
            v = pc.fill_null(pc.cast(b.column(value_col), pa.string()), "")
            return pa.table({"v": v})
        counted = (reg.map_batches(_proj, batch_format="pyarrow")
                   .groupby("v").count().to_pandas())
        counted.columns = ["v", "n"]
        return counted

    max_expand_pairs = max_expand_pairs or MAX_EXPAND_PAIRS
    fsq, fcq = _freqs(spr), _freqs(cad)
    fs_vals = np.asarray(fsq.v, dtype=object)
    fs_freq = (fsq.n / int(fsq.n.sum())).to_numpy(np.float64)

    cadp = _gather_cad_projection(cad, fields, block_col)
    kuniq, order, starts, ends = _block_groups(cadp)
    take = pa.array(order, pa.int64())
    cid = pc.take(cadp.column("ADDRESS_ID_CAD").combine_chunks(), take)
    ccodes, cuniq = pd.factorize(
        cadp.column("c_" + value_col).to_pandas(), sort=False)
    ccodes = ccodes[order]
    # per-cad-row frequency of its street value in the FULL cad registry
    fc_map = dict(zip(fcq.v, fcq.n / int(fcq.n.sum())))
    cfreq = np.array([fc_map.get(v, 0.0) for v in cuniq],
                     np.float64)[ccodes]
    ref = put_broadcast((kuniq, np.asarray(cuniq, dtype=object), ccodes,
                         cfreq, cid, starts, ends, fs_vals, fs_freq))
    state_key = ("fs_val_bcast", ref.ref.hex())

    def _build_state():
        (kvals, cvals, ccodes, cfreq, cid, starts, ends,
         fs_vals, fs_freq) = resolve_broadcast(ref)
        return (pd.Index(kvals), pd.Index(cvals), ccodes, cfreq, cid,
                starts, ends, pd.Index(fs_vals), fs_freq)

    left = spr.map_batches(
        _key_proj("ADDRESS_ID_SPR", fields, block_col, "s_"),
        batch_format="pyarrow")

    def _empty_for(b: pa.Table) -> pa.Table:
        # Sentinel built from the ACTUAL projected batch types (spr id /
        # value columns may be large_string or a different id type than
        # cad's) so no-hit batches unify with scored ones downstream.
        return pa.table({
            "ADDRESS_ID_SPR":
                pa.array([], b.schema.field("ADDRESS_ID_SPR").type),
            "ADDRESS_ID_CAD": pa.array([], cid.type),
            "street": pa.array([], b.schema.field("s_" + value_col).type),
            "street_agree": pa.array([], pa.bool_()),
            "u_v": pa.array([], pa.float64()),
            "fs_value_weight": pa.array([], pa.float64()),
        })

    def _score(b: pa.Table):
        (key_idx, cval_idx, ccodes, cfreq, cid, starts, ends,
         fs_idx, fs_freq) = _worker_state(state_key, _build_state)
        g = key_idx.get_indexer(
            b.column("s_k").to_numpy(zero_copy_only=False))
        keep = g >= 0
        if not keep.any():
            yield _empty_for(b)
            return
        b = b.filter(pa.array(keep))
        g = g[keep]
        sv = b.column("s_" + value_col).to_numpy(zero_copy_only=False)
        sc = cval_idx.get_indexer(sv)           # cad-vocab code, -1 if absent
        sfi = fs_idx.get_indexer(sv)            # spr value frequency
        sfreq = np.where(sfi >= 0, fs_freq[np.maximum(sfi, 0)], 0.0)
        sid = b.column("ADDRESS_ID_SPR").combine_chunks()
        sval = b.column("s_" + value_col).combine_chunks()
        for lo, hi in _probe_slices(g, starts, ends, max_expand_pairs):
            reps, cidx = _expand_pairs(g[lo:hi], starts, ends)
            if len(reps) == 0:
                continue
            reps += lo
            agree = sc[reps] == ccodes[cidx]
            u_v = np.maximum(sfreq[reps] * cfreq[cidx], u_floor)
            w = np.where(agree, np.log2(m_street / u_v), 0.0)
            reps_a = pa.array(reps, pa.int64())
            yield pa.table({
                "ADDRESS_ID_SPR": pc.take(sid, reps_a),
                "ADDRESS_ID_CAD": pc.take(cid, pa.array(cidx, pa.int64())),
                "street": pc.take(sval, reps_a),
                "street_agree": pa.array(agree),
                "u_v": pa.array(np.round(u_v, 12), pa.float64()),
                "fs_value_weight": pa.array(np.round(w, round_to),
                                            pa.float64()),
            })

    return left.map_batches(_score, batch_format="pyarrow", batch_size=1024)
