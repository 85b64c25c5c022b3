"""Normalization / derived columns / blocking keys / page extraction stages.

All stages here are STATELESS zero-shuffle ``map_batches`` transforms over Arrow
batches (``batch_format="pyarrow"``): new columns in, new columns out, streaming
through Ray Data's executor. Reference parity:

- :func:`preprocess_registry` = operators M1-M7 (``/root/reference/address.py:240-284``):
  fillna('') on the three raw columns, byte-identical ``*_NORM`` derivation,
  ``FULL_ADDRESS`` (space-concat + strip), the reference blocking key
  ``SEARCH_KEY = STREET_NORM + "_" + HOUSE_NORM`` and ``COMPLETENESS_SCORE``
  (faithfully computed AFTER the fillna, hence the reference's constant-1.0 behavior —
  SURVEY §2.12.4 replicate-decision).
- :func:`extract_pages` = graft operator M14: deterministic html->text, byte-stable
  per url across runs/parallelism.
- :func:`pages_to_registry_records` parses embedded ``ADDR|...`` lines from page text
  into registry-shaped records (flat_map-style: 0..n records per page).
- :func:`add_minhash_bands` = graft operator T7: seeded MinHash-LSH band keys over
  character shingles of a text column, for near-candidate generation via
  ``groupby(band)`` (used by stages/dedup.py and as an alternative blocking path).

At 100 TB these stages scale embarrassingly: no shuffle, dictionary-encoded
normalization cost is O(#distinct strings) per batch, and the ordering column
``_ord`` needed by the order-sensitive dedup rules (D4 last-wins / O3 tie-breaks) is
derived from the stable unique id, not from physical row position.
"""

from __future__ import annotations

import zlib
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.extract import extract_text
from ..functions.normalize import normalize_array
from ..sources.synth import parse_addr_line

DERIVED_COLUMNS = (
    "STREET_NORM", "HOUSE_NORM", "BUILDING_NORM",
    "FULL_ADDRESS", "SEARCH_KEY", "COMPLETENESS_SCORE",
)


def _preprocess_batch(batch: pa.Table) -> pa.Table:
    cols = {name: batch.column(name) for name in batch.column_names}
    for c in ("STREET_NAME", "HOUSE", "BUILDING"):
        cols[c] = pc.fill_null(pc.cast(cols[c], pa.string()), "")
    street_n = normalize_array(cols["STREET_NAME"])
    house_n = normalize_array(cols["HOUSE"])
    building_n = normalize_array(cols["BUILDING"])
    full = pc.utf8_trim_whitespace(
        pc.binary_join_element_wise(street_n, house_n, building_n, " ")
    )
    search_key = pc.binary_join_element_wise(street_n, house_n, "_")
    # Reference computes notna AFTER fillna -> constant 1.0; replicated faithfully.
    completeness = pc.divide(
        pc.add(
            pc.add(
                pc.cast(pc.is_valid(cols["STREET_NAME"]), pa.int64()),
                pc.cast(pc.is_valid(cols["HOUSE"]), pa.int64()),
            ),
            pc.cast(pc.is_valid(cols["BUILDING"]), pa.int64()),
        ),
        pa.scalar(3.0),
    )
    out = batch
    for c in ("STREET_NAME", "HOUSE", "BUILDING"):
        out = out.set_column(out.column_names.index(c), c, cols[c])
    for name, arr in (
        ("STREET_NORM", street_n),
        ("HOUSE_NORM", house_n),
        ("BUILDING_NORM", building_n),
        ("FULL_ADDRESS", full),
        ("SEARCH_KEY", search_key),
        ("COMPLETENESS_SCORE", completeness),
    ):
        out = out.append_column(name, arr)
    return out


def preprocess_registry(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Add the six derived columns (M1-M7), vectorized, zero shuffle."""
    return ds.map_batches(_preprocess_batch, batch_format="pyarrow")


def add_order_column(ds: ray.data.Dataset, id_col: str = "ADDRESS_ID") -> ray.data.Dataset:
    """Deterministic total-order column ``_ord`` for order-sensitive rules.

    The reference's last-wins build dict (D4) and candidate ordering (O3) depend on
    DataFrame row order; Ray Data shuffles destroy physical order, so the engine
    keys those rules on the stable unique id instead (fixture ids are monotone in
    row order). Documented partitioning assumption: ``id_col`` is unique.
    """
    def _add(batch: pa.Table) -> pa.Table:
        return batch.append_column("_ord", pc.cast(batch.column(id_col), pa.string()))
    return ds.map_batches(_add, batch_format="pyarrow")


# ---------------------------------------------------------------- pages (graft)


def _extract_batch(batch: pa.Table) -> pa.Table:
    html_col = batch.column("html")
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    texts = pa.array([extract_text(v) for v in html_col.to_pylist()], pa.string())
    name = "extracted_text"
    if name in batch.column_names:
        batch = batch.drop_columns([name])
    return batch.append_column(name, texts)


def extract_pages(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Deterministic html->text extraction (M14); adds ``extracted_text``."""
    return ds.map_batches(_extract_batch, batch_format="pyarrow")


def _parse_records_batch(batch: pa.Table) -> pa.Table:
    text_col = "extracted_text" if "extracted_text" in batch.column_names else "text"
    urls = batch.column("url").to_pylist()
    texts = batch.column(text_col).to_pylist()
    out = {"url": [], "ADDRESS_ID": [], "STREET_NAME": [], "HOUSE": [], "BUILDING": []}
    for url, text in zip(urls, texts):
        if not text:
            continue
        for line in text.split("\n"):
            rec = parse_addr_line(line)
            if rec is not None:
                out["url"].append(url)
                out["ADDRESS_ID"].append(rec[0])
                out["STREET_NAME"].append(rec[1])
                out["HOUSE"].append(rec[2])
                out["BUILDING"].append(rec[3])
    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "ADDRESS_ID": pa.array(out["ADDRESS_ID"], pa.string()),
            "STREET_NAME": pa.array(out["STREET_NAME"], pa.string()),
            "HOUSE": pa.array(out["HOUSE"], pa.string()),
            "BUILDING": pa.array(out["BUILDING"], pa.string()),
        }
    )


def pages_to_registry_records(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Parse embedded address lines into registry-shaped records (0..n per page)."""
    return ds.map_batches(_parse_records_batch, batch_format="pyarrow")


def add_token_sortkey(
    ds: ray.data.Dataset, col: str = "STREET_NORM", out_col: str = "TOKEN_SORTKEY"
) -> ray.data.Dataset:
    """north_star composite blocking key: normalized-token sortkey.

    ``" ".join(sorted(value.split()))`` per row — rows whose token multisets
    coincide under reordering share a key (the dataset-level counterpart of the
    scorer-internal ``_token_sorted``; VERDICT r1 missing #5). Dict-encoded per
    batch so the scalar sort runs once per DISTINCT value; stateless, zero
    shuffle. Block with ``groupby(out_col)`` downstream.
    """
    from ..functions.scorers import _token_sorted

    def _add(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        enc = pc.dictionary_encode(pc.fill_null(pc.cast(arr, pa.string()), ""))
        mapped = pa.array(
            [_token_sorted(u) for u in enc.dictionary.to_pylist()], pa.string())
        out = pc.take(mapped, enc.indices)
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, out)

    return ds.map_batches(_add, batch_format="pyarrow")


# ------------------------------------------------------------ MinHash-LSH bands


_SHINGLE_P = np.uint64(1099511628211)  # FNV prime; wrap-around mul is the mix


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-byte shingle hashes, vectorized (polynomial rolling hash).

    Deterministic across processes/partitions (no salted str hash). The hash is a
    degree-k polynomial in the FNV prime over the raw bytes, computed with k
    shifted vector multiplies instead of a per-position Python loop.
    """
    data = text.encode("utf-8")
    n = len(data)
    if n < k:
        return np.array([zlib.crc32(data)], dtype=np.uint64)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = h * _SHINGLE_P + arr[j : j + m]
    return np.unique(h)


class MinHasher:
    """Seeded universal-hash MinHash; deterministic across runs and partitions."""

    MERSENNE = (1 << 61) - 1

    def __init__(self, num_perm: int = 64, seed: int = 1729):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, self.MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, self.MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, self.MERSENNE, dtype=np.uint64)
        # (num_perm, n) universal hashes -> row-min
        vals = (np.outer(self.a, shingles) + self.b[:, None]) % self.MERSENNE
        return vals.min(axis=1)

    def signatures_batch(self, shingle_sets: "list[np.ndarray]") -> np.ndarray:
        """Signatures for a whole batch in ONE vectorized pass.

        Concatenate every document's shingles, hash the flat array once
        (num_perm x total), then per-document row-mins via
        ``np.minimum.reduceat`` over the offsets — identical values to
        :meth:`signature` per doc, ~an order of magnitude fewer numpy calls.
        """
        n = len(shingle_sets)
        out = np.full((n, self.num_perm), self.MERSENNE, dtype=np.uint64)
        nonempty = [i for i in range(n) if len(shingle_sets[i])]
        if not nonempty:
            return out
        flat = np.concatenate([shingle_sets[i] for i in nonempty])
        lens = np.fromiter((len(shingle_sets[i]) for i in nonempty),
                           dtype=np.int64, count=len(nonempty))
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        with np.errstate(over="ignore"):
            vals = (self.a[:, None] * flat[None, :] + self.b[:, None]) % self.MERSENNE
        mins = np.minimum.reduceat(vals, offsets, axis=1)  # (num_perm, k)
        out[nonempty, :] = mins.T
        return out


def add_minhash_bands(
    ds: ray.data.Dataset,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 1729,
    out_prefix: str = "band",
) -> ray.data.Dataset:
    """Add ``bands`` LSH band-hash columns (T7). Stateless, seeded, deterministic.

    Two rows sharing any band column value are near-duplicate candidates; generate
    candidates with ``groupby(band_i)`` per band (see stages/dedup.py).
    """
    rows_per_band = num_perm // bands

    def _band_batch(batch: pa.Table) -> pa.Table:
        # per-worker cached MinHasher (stateless tasks reuse warm workers; no
        # actor pool to spawn) — see stages/matching.py::_worker_state
        from .matching import _worker_state

        mh = _worker_state(("minhasher", num_perm, seed),
                           lambda: MinHasher(num_perm=num_perm, seed=seed))
        texts = batch.column(text_col).to_pylist()
        sigs = mh.signatures_batch(
            [_shingle_hashes(t or "", shingle_k) for t in texts]
        ) if texts else np.zeros((0, num_perm), dtype=np.uint64)
        out = batch
        for b in range(bands):
            seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            # stable 64-bit mix of the band segment
            mixed = np.zeros(len(texts), dtype=np.uint64)
            for j in range(seg.shape[1] if len(texts) else 0):
                mixed = (mixed * np.uint64(1099511628211)) ^ seg[:, j]
            out = out.append_column(
                f"{out_prefix}_{b}", pa.array(mixed.astype("int64"), pa.int64())
            )
        return out

    return ds.map_batches(_band_batch, batch_format="pyarrow")


def lsh_params(threshold: float, num_perm: int = 64,
               fp_weight: float = 0.5) -> tuple:
    """Choose (bands, rows_per_band) for a target Jaccard ``threshold``.

    Standard MinHash-LSH tuning (Leskovec/Rajaraman/Ullman MMDS §3.4, the
    datasketch optimizer): candidate probability at similarity s is
    ``1 - (1 - s^r)^b``; pick the (b, r) with b*r <= num_perm minimizing the
    weighted sum of the false-positive integral below the threshold and the
    false-negative integral above it (midpoint rule). ``fp_weight`` trades
    candidate volume (FP -> wasted verify work) against recall (FN).

    Returns ``(bands, rows_per_band)`` suitable for
    :func:`add_minhash_bands` (bands=b; it derives r = num_perm // bands).
    """
    if not (0.0 < threshold < 1.0):
        raise ValueError("threshold must be in (0, 1)")
    xs = (np.arange(500) + 0.5) / 500.0
    below = xs < threshold
    best, best_err = (1, num_perm), float("inf")
    for b in range(1, num_perm + 1):
        r = num_perm // b
        if r < 1:
            break
        p = 1.0 - np.power(1.0 - np.power(xs, r), b)
        fp = float(p[below].sum()) / 500.0
        fn = float((1.0 - p[~below]).sum()) / 500.0
        err = fp_weight * fp + (1.0 - fp_weight) * fn
        if err < best_err:
            best, best_err = (b, r), err
    return best


def sorted_neighborhood_pairs(
    spr: ray.data.Dataset,
    cad: ray.data.Dataset,
    key_col: str = "SEARCH_KEY",
    id_col: str = "ADDRESS_ID",
    window: int = 3,
    bucket_rows: int = 4096,
) -> ray.data.Dataset:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD 1995): union
    both registries with a source tag, sort by ``(key, source, id)``, slide a
    window of ``window`` rows over the global order, and emit every
    CROSS-source candidate pair inside the window as
    ``(ADDRESS_ID_SPR, ADDRESS_ID_CAD, rank_dist)``.

    A complement to the equality blocking the reference uses
    (`/root/reference/address.py:305-330` builds exact street/key indexes):
    sorted-neighborhood also pairs records whose keys are merely ADJACENT in
    sort order (typo in the last characters, missing house number), at a cost
    linear in corpus size instead of quadratic.

    Distributed plan: one range-partitioning sort via
    :func:`~..stages.analytics.global_rank` (dense 0-based rank ``rn``; no
    row-level data reaches the driver), then each row is routed to rank bucket
    ``rn // bucket_rows`` — plus a CARRY copy to the previous bucket for the
    first ``window-1`` rows of each bucket, so windows never break at bucket
    boundaries. One ``groupby(bucket)`` co-locates each bucket; inside a
    group the ranks are CONSECUTIVE integers by construction, so the pairs at
    rank distance d are exactly ``zip(arr[:-d], arr[d:])`` — fully vectorized,
    no per-row loop. Each unordered pair is emitted by exactly one bucket
    (the one that owns the smaller rank). Shuffle volume is O(n) id-sized
    rows x 2 copies max; group size is bounded by ``bucket_rows + window``.

    Assumes ``id_col`` is unique within each registry (the same premise every
    linkage stage documents), making the sort composite key unique — ties in
    ``key_col`` are broken deterministically by (source, id).
    """
    if window < 2:
        raise ValueError("window must be >= 2 (a 1-row window has no pairs)")
    w = window - 1
    if w >= bucket_rows:
        raise ValueError("bucket_rows must exceed window-1")

    from .analytics import global_rank

    def _tag(src: str):
        def _f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "k": pc.cast(batch.column(key_col), pa.string()),
                "src": pa.array([src] * batch.num_rows, pa.string()),
                "id": pc.cast(batch.column(id_col), pa.string()),
            })
        return _f

    u = spr.map_batches(_tag("s"), batch_format="pyarrow").union(
        cad.map_batches(_tag("c"), batch_format="pyarrow"))
    ranked = global_rank(u, ["k", "src", "id"], rank_col="rn")

    def _route(batch: pa.Table) -> pa.Table:
        rn = batch.column("rn").to_numpy(zero_copy_only=False)
        b = rn // bucket_rows
        carry = (rn % bucket_rows < w) & (b > 0)
        idx = np.concatenate([np.arange(len(rn)), np.nonzero(carry)[0]])
        bkt = np.concatenate([b, b[carry] - 1])
        t = batch.select(["rn", "src", "id"]).take(pa.array(idx, pa.int64()))
        return t.append_column("b", pa.array(bkt, pa.int64()))

    routed = ranked.map_batches(_route, batch_format="pyarrow")

    def _pairs(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        g = g.sort_values("rn", kind="mergesort")
        rn = g["rn"].to_numpy()
        src = g["src"].to_numpy()
        ids = g["id"].to_numpy()
        own = (rn // bucket_rows) == int(g["b"].iloc[0])
        a_l, b_l, d_l = [], [], []
        for d in range(1, w + 1):
            if len(rn) <= d:
                break
            # ranks are consecutive ints within the group, so position t+d IS
            # rank rn[t]+d; keep pairs anchored at an OWN row, cross-source
            keep = own[:-d] & (src[:-d] != src[d:])
            if keep.any():
                lo_s = src[:-d][keep] == "s"
                lo, hi = ids[:-d][keep], ids[d:][keep]
                a_l.append(np.where(lo_s, lo, hi))
                b_l.append(np.where(lo_s, hi, lo))
                d_l.append(np.full(int(keep.sum()), d, np.int64))
        if not a_l:
            return pd.DataFrame({
                "ADDRESS_ID_SPR": pd.Series([], dtype="str"),
                "ADDRESS_ID_CAD": pd.Series([], dtype="str"),
                "rank_dist": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "ADDRESS_ID_SPR": np.concatenate(a_l),
            "ADDRESS_ID_CAD": np.concatenate(b_l),
            "rank_dist": np.concatenate(d_l)})

    return routed.groupby("b").map_groups(_pairs, batch_format="pandas")


def _edit1_check(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 for a != b (unit costs)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        # exactly one substitution position allowed
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is one longer: a must equal b with one char dropped
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit1_value_pairs(
    ds: ray.data.Dataset,
    col: str = "STREET_NORM",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """All DISTINCT value pairs of ``col`` at Levenshtein distance exactly 1,
    via FastSS deletion neighborhoods (Bocek et al., 2007) — the
    typo-pair discovery step for fuzzy blocking-key repair, complete by
    construction.

    Rule: ``d(a,b) <= 1  iff  N(a) ∩ N(b) != ∅`` where ``N(x) = {x} ∪
    {x with one char deleted}`` — a substitution meets at the common
    deletion position, an indel meets at the shorter string itself. Shared
    variants can also arise for d=2 (e.g. "ab"/"ba" share variant "a"), so
    every candidate is re-verified with the exact O(len) check.

    Distributed shape: the self-join runs over the DISTINCT value vocabulary
    (one groupby), never the corpus; each value emits len+1 id-sized variant
    rows; one ``groupby(variant)`` co-locates candidates (group size is
    values-per-variant, bounded by near-duplicate density, not corpus size);
    cross-group duplicate pairs collapse in a final distinct groupby. Output:
    ``(a, b, dist)`` with a < b, dist == 1.
    """

    def _distinct(b: pa.Table) -> pa.Table:
        v = pc.fill_null(pc.cast(b.column(col), pa.string()), "")
        t = pa.table({"v": v}).filter(pc.not_equal(v, ""))
        return t

    vocab = (ds.map_batches(_distinct, batch_format="pyarrow")
             .groupby("v").count()
             .map_batches(lambda b: b.select(["v"]), batch_format="pyarrow"))

    def _variants(b: pa.Table) -> pa.Table:
        vars_, vals = [], []
        for v in b.column("v").to_pylist():
            vars_.append(v)
            vals.append(v)
            for i in range(len(v)):
                vars_.append(v[:i] + v[i + 1:])
                vals.append(v)
        return pa.table({"var": pa.array(vars_, pa.string()),
                         "v": pa.array(vals, pa.string())})

    melted = vocab.map_batches(_variants, batch_format="pyarrow")

    def _pairs(g):
        import pandas as pd

        vals = sorted(set(g["v"]))
        a_l, b_l = [], []
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                if _edit1_check(vals[i], vals[j]):
                    a_l.append(vals[i])
                    b_l.append(vals[j])
        return pd.DataFrame({"a": a_l, "b": b_l})

    cand = melted.groupby("var").map_groups(_pairs, batch_format="pandas")
    return (cand.groupby(["a", "b"]).count()
            .map_batches(lambda b: pa.table({
                "a": b.column("a"), "b": b.column("b"),
                "dist": pa.array([1] * b.num_rows, pa.int64())}),
                batch_format="pyarrow"))


def _token_rows(ds: ray.data.Dataset, id_out: str, col: str) -> ray.data.Dataset:
    """Distinct (record id, token) rows of ``col``'s space-split tokens —
    fully vectorized explode (split_pattern + list_parent_indices)."""

    def _explode(b: pa.Table) -> pa.Table:
        v = pc.fill_null(pc.cast(b.column(col), pa.string()), "")
        toks = pc.split_pattern(v, " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = pc.take(pc.cast(b.column("ADDRESS_ID"), pa.string()), parent)
        keep = pc.not_equal(flat, "")
        return pa.table({id_out: ids.filter(keep), "tok": flat.filter(keep)})

    # distinct per (id, token): weight must count SHARED DISTINCT blocks
    return (ds.map_batches(_explode, batch_format="pyarrow")
            .groupby([id_out, "tok"]).count()
            .map_batches(lambda b: b.select([id_out, "tok"]),
                         batch_format="pyarrow"))


def metablocking_cbs_pairs(
    spr: ray.data.Dataset,
    cad: ray.data.Dataset,
    col: str = "STREET_NORM",
    min_weight: int = 2,
    max_block: int = 500,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Meta-blocking with common-blocks (CBS) weighting (Papadakis et al.,
    TKDE 2013): token blocks over ``col``, cross-source pairs weighted by the
    number of DISTINCT shared token blocks, oversize blocks purged, pairs
    below ``min_weight`` pruned.

    Token blocking alone floods the scorer with every pair sharing ANY word;
    meta-blocking keeps only pairs co-occurring in >= ``min_weight`` blocks —
    the standard candidate-cleaning step between blocking and pairwise
    scoring. Complements the equality/sorted-neighborhood/LSH generators in
    this module.

    Distributed shape: two vectorized token explodes (O(tokens) id-sized
    rows), then JOIN-FREE block processing — a single tagged-union
    ``groupby(tok)`` co-locates each token block; inside a group the purge
    check (group size > ``max_block`` -> emit nothing) bounds the cross-pair
    emit at max_block², fully vectorized via np.meshgrid. A final
    groupby-count turns within-block pairs into CBS weights. Two groupbys,
    zero ``Dataset.join``s — deliberately, because chained join pools can
    deadlock the streaming executor under tight CPU budgets (see
    memory: ray-data-gotchas).
    """

    def _tag(name: str):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table({"tok": b.column("tok"),
                             "id": b.column(name),
                             "src": pa.array(
                                 [name] * b.num_rows, pa.string())})
        return _f

    st = _token_rows(spr, "sid", col).map_batches(
        _tag("sid"), batch_format="pyarrow")
    ct = _token_rows(cad, "cid", col).map_batches(
        _tag("cid"), batch_format="pyarrow")

    def _block_pairs(g):
        import pandas as pd

        if len(g) > max_block:
            return pd.DataFrame({"sid": pd.Series([], dtype="str"),
                                 "cid": pd.Series([], dtype="str")})
        sids = g.loc[g["src"] == "sid", "id"].to_numpy()
        cids = g.loc[g["src"] == "cid", "id"].to_numpy()
        if not len(sids) or not len(cids):
            return pd.DataFrame({"sid": pd.Series([], dtype="str"),
                                 "cid": pd.Series([], dtype="str")})
        si, ci = np.meshgrid(sids, cids, indexing="ij")
        return pd.DataFrame({"sid": si.ravel(), "cid": ci.ravel()})

    from .analytics import ensure_arrow_schema

    pairs = ensure_arrow_schema(
        st.union(ct).groupby("tok").map_groups(
            _block_pairs, batch_format="pandas"),
        pa.schema([("sid", pa.string()), ("cid", pa.string())]))

    weighted = ensure_arrow_schema(
        pairs.groupby(["sid", "cid"]).count()
        .map_batches(lambda b: b.rename_columns(["sid", "cid", "weight"])
                     if b.num_columns else b, batch_format="pyarrow"),
        pa.schema([("sid", pa.string()), ("cid", pa.string()),
                   ("weight", pa.int64())]))

    def _prune(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b.column("weight"), min_weight))
        return pa.table({
            "ADDRESS_ID_SPR": b.column("sid"),
            "ADDRESS_ID_CAD": b.column("cid"),
            "weight": pc.cast(b.column("weight"), pa.int64()),
        })

    return weighted.map_batches(_prune, batch_format="pyarrow")


def soundex_keys(
    ds: ray.data.Dataset, id_col: str, text_col: str,
) -> ray.data.Dataset:
    """Distinct ``(id, token, code)`` phonetic blocking keys of ``text_col``.

    Tokenize (lowercase-preserving space split, drop empties), then the
    Soundex class key from :mod:`..functions.phonetic` — one zero-shuffle
    ``map_batches``; dedup is batch-local, which is globally exact because a
    record's tokens never span batches. Blocking on ``code`` instead of the
    raw token makes the candidate join typo-tolerant (SMITH/SMYTH share a
    block) at the cost of larger blocks — pair generation reuses the same
    machinery as the exact keys (e.g. :func:`metablocking_cbs_pairs` or the
    matcher's equality join on a derived column).
    """
    import pandas as pd

    from ..functions.phonetic import soundex_series

    def _keys(b: pa.Table) -> pa.Table:
        v = pc.fill_null(pc.cast(b.column(text_col), pa.string()), "")
        toks = pc.split_pattern(v, " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = pc.take(b.column(id_col), parent)
        keep = pc.not_equal(flat, "")
        df = pd.DataFrame({id_col: ids.filter(keep).to_pandas(),
                           "token": flat.filter(keep).to_pandas()})
        df = df.drop_duplicates()
        df["code"] = soundex_series(df["token"])
        return pa.Table.from_pandas(df.reset_index(drop=True),
                                    preserve_index=False)

    return ds.select_columns([id_col, text_col]).map_batches(
        _keys, batch_format="pyarrow")


def soundex_block_sizes(
    ds: ray.data.Dataset, id_col: str, text_col: str,
) -> ray.data.Dataset:
    """Records per phonetic block: ``(code, n)`` with n = distinct ids.

    The block-volume pre-pass a caller runs before committing to phonetic
    blocking (same decision table as ``match_blocking_stats``). The
    batch-local drop_duplicates is only a shuffle-volume COMBINER; the
    ``groupby((id, code))`` makes the distinct GLOBAL, so the count stays
    exact when Ray splits the keys output at arbitrary row offsets (blocks
    over ``target_max_block_size``) or when ``id_col`` repeats across input
    rows — batch locality is never assumed here.
    """
    from ray.data.aggregate import Count

    keys = soundex_keys(ds, id_col, text_col)

    def _partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = b.select([id_col, "code"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df.reset_index(drop=True),
                                    preserve_index=False)

    distinct = (keys.map_batches(_partial, batch_format="pyarrow")
                .groupby([id_col, "code"]).count())
    return (distinct
            .map_batches(lambda b: b.select(["code"]),
                         batch_format="pyarrow")
            .groupby("code").aggregate(Count(alias_name="n")))
