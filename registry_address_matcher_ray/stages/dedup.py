"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Training-data-pipeline operators over the ``documents`` table (not in the
reference — its fuzzy matcher is the near-*match* operator; these are the
document-level near-*dup* family the target spec adds). All deterministic
(seeded minhash, md5-based simhash, crc shingles) and partition-invariant.

Shapes (the canonical Ray Data constructions):

- exact:    content key -> ``groupby(key)`` -> keep min-id row per group.
- MinHash:  shingle -> minhash signature -> band keys (stateless map_batches, T7)
            -> melt to (band, hash) rows -> ``groupby`` -> candidate pairs per
            bucket (size-capped, logged) -> verify n-gram Jaccard -> edges ->
            connected components (stages/cluster.py) -> canonical = min id.
- SimHash:  64-bit signature -> 4x16-bit bands (pigeonhole: hamming<=3 implies an
            exact band match) -> candidate pairs -> verify hamming -> components.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions import textfns
from . import blocking, cluster


def exact_dedup(
    ds: ray.data.Dataset, key_col: str, id_col: str
) -> ray.data.Dataset:
    """Keep exactly one row (min ``id_col``) per distinct ``key_col`` value."""

    def _keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1)

    return ds.groupby(key_col).map_groups(_keep_min, batch_format="pandas")


def exact_dedup_by_fingerprint(
    ds: ray.data.Dataset, text_col: str, id_col: str
) -> ray.data.Dataset:
    """Exact dedup on the md5 fingerprint of the canonicalized text."""

    def _fp(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        fps = pa.array([textfns.fingerprint(t) for t in col.to_pylist()], pa.string())
        return batch.append_column("_fp", fps)

    with_fp = ds.map_batches(_fp, batch_format="pyarrow")
    return exact_dedup(with_fp, "_fp", id_col).drop_columns(["_fp"])


def _candidate_pairs_from_groups(
    grouped: ray.data.Dataset, id_col: str, payload_col: Optional[str],
    max_group: int,
) -> ray.data.Dataset:
    """Within each bucket group emit all id-ordered pairs (group size capped)."""

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").head(max_group)
        ids = g[id_col].tolist()
        pay = g[payload_col].tolist() if payload_col else [None] * len(ids)
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                rows.append((ids[i], ids[j], pay[i], pay[j]))
        if not rows:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "pay_a": pd.Series([], dtype="object"),
                                 "pay_b": pd.Series([], dtype="object")})
        out = pd.DataFrame(rows, columns=["id_a", "id_b", "pay_a", "pay_b"])
        return out

    return grouped.map_groups(_pairs, batch_format="pandas")


def _dedup_pairs(pairs: ray.data.Dataset) -> ray.data.Dataset:
    def _first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(_first, batch_format="pandas")


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    max_group: int = 200,
    seed: int = 1729,
) -> Dict[str, ray.data.Dataset]:
    """MinHash+LSH near-dup: returns {"pairs": verified pairs, "clusters": labels}.

    ``pairs``:    (id_a, id_b, jaccard) with ngram-Jaccard >= threshold.
    ``clusters``: (node, cluster_id) over verified pairs (min-id canonical).
    Buckets larger than ``max_group`` are truncated (deterministically, by id) —
    a documented coverage cap for pathological hot buckets.
    """
    banded = blocking.add_minhash_bands(
        ds.select_columns([id_col, text_col]),
        text_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k, seed=seed,
    )

    def _melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids, texts, bidx, bhash = [], [], [], []
        id_vals = batch.column(id_col).to_pylist()
        t_vals = batch.column(text_col).to_pylist()
        for b in range(bands):
            h = batch.column(f"band_{b}").to_pylist()
            ids.extend(id_vals)
            texts.extend(t_vals)
            bidx.extend([b] * n)
            bhash.extend(h)
        return pa.table(
            {
                "band_idx": pa.array(bidx, pa.int32()),
                "band_hash": pa.array(bhash, pa.int64()),
                id_col: pa.array(ids),
                text_col: pa.array(texts),
            }
        )

    melted = banded.map_batches(_melt, batch_format="pyarrow")
    grouped = melted.groupby(["band_idx", "band_hash"])
    pairs = _candidate_pairs_from_groups(grouped, id_col, text_col, max_group)
    pairs = _dedup_pairs(pairs)

    thr = float(jaccard_threshold)

    def _verify(batch: pa.Table) -> pa.Table:
        a = batch.column("pay_a").to_pylist()
        b = batch.column("pay_b").to_pylist()
        jac = [textfns.jaccard(textfns.ngram_set(x), textfns.ngram_set(y)) for x, y in zip(a, b)]
        out = pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out.column("jaccard"), thr))

    verified = pairs.map_batches(_verify, batch_format="pyarrow").materialize()
    clusters = cluster.connected_components(verified, "id_a", "id_b")
    return {"pairs": verified, "clusters": clusters}


def simhash_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    hamming_threshold: int = 3,
    max_group: int = 500,
) -> Dict[str, ray.data.Dataset]:
    """SimHash near-dup: 4x16-bit band blocking + hamming verification."""

    def _sig(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sigs = [textfns.simhash64(t) for t in col.to_pylist()]
        out = pa.table(
            {
                id_col: batch.column(id_col),
                "simhash": pa.array([s - (1 << 63) if s >= (1 << 63) else s for s in sigs], pa.int64()),
            }
        )
        for b in range(4):
            out = out.append_column(
                f"sh_band_{b}", pa.array([(s >> (16 * b)) & 0xFFFF for s in sigs], pa.int32())
            )
        return out

    sigds = ds.select_columns([id_col, text_col]).map_batches(_sig, batch_format="pyarrow")

    def _melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids, sh, bidx, bhash = [], [], [], []
        id_vals = batch.column(id_col).to_pylist()
        s_vals = batch.column("simhash").to_pylist()
        for b in range(4):
            h = batch.column(f"sh_band_{b}").to_pylist()
            ids.extend(id_vals)
            sh.extend(s_vals)
            bidx.extend([b] * n)
            bhash.extend(h)
        return pa.table(
            {
                "band_idx": pa.array(bidx, pa.int32()),
                "band_hash": pa.array(bhash, pa.int64()),
                id_col: pa.array(ids),
                "simhash": pa.array(sh, pa.int64()),
            }
        )

    melted = sigds.map_batches(_melt, batch_format="pyarrow")
    pairs = _candidate_pairs_from_groups(
        melted.groupby(["band_idx", "band_hash"]), id_col, "simhash", max_group
    )
    pairs = _dedup_pairs(pairs)
    thr = int(hamming_threshold)

    def _verify(batch: pa.Table) -> pa.Table:
        a = batch.column("pay_a").to_pylist()
        b = batch.column("pay_b").to_pylist()
        ham = [textfns.hamming64(int(x) & ((1 << 64) - 1), int(y) & ((1 << 64) - 1))
               for x, y in zip(a, b)]
        out = pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "hamming": pa.array(ham, pa.int64()),
            }
        )
        return out.filter(pc.less_equal(out.column("hamming"), thr))

    verified = pairs.map_batches(_verify, batch_format="pyarrow").materialize()
    clusters = cluster.connected_components(verified, "id_a", "id_b")
    return {"pairs": verified, "clusters": clusters}


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    **lsh_kwargs,
) -> ray.data.Dataset:
    """Near-dup pairs by n-gram Jaccard, MinHash-LSH-blocked (lower threshold ->
    widen the LSH net by lowering bands' rows via num_perm/bands kwargs)."""
    res = minhash_lsh_dedup(
        ds, text_col, id_col, jaccard_threshold=threshold, **lsh_kwargs
    )
    return res["pairs"]
