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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions import textfns
from ..state import metrics as _metrics
from . import blocking, cluster


#: winner-resolution plan cutover: above this many distinct winners the
#: driver-gathered ``is_in`` broadcast would not hold (on a 100-TB corpus
#: distinct content keys ~ corpus size) and the equi-join path runs instead
WINNER_BROADCAST_LIMIT = 2_000_000


def _winner_join_partitions(ds: ray.data.Dataset) -> int:
    # ~128 MiB per hash-join partition: Ray's hash join spins one aggregator
    # ACTOR per partition, so block-count-sized partitioning dominates wall
    # time on small inputs (measured: 64 partitions 18.6 s vs 8 partitions
    # ~2 s for a 40 MiB side) while too few would bottleneck the exchange at
    # scale — the bytes rule scales the count with the data
    try:
        est = ds.size_bytes() or 0
        return max(4, min(512, -(-est // (128 << 20))))
    except Exception:
        return 32


def exact_dedup(
    ds: ray.data.Dataset, key_col: str, id_col: str,
    winner_broadcast_limit: Optional[int] = None,
) -> ray.data.Dataset:
    """Keep exactly one row (min ``id_col``) per distinct ``key_col`` value.

    Fully vectorized: per-batch partial keep-min (pandas C kernels), then a
    ``groupby(key).min(id)`` aggregate over the survivors. Winner resolution
    auto-selects its physical plan: up to ``winner_broadcast_limit`` distinct
    winners the id set is gathered once and broadcast as an ``is_in`` filter
    (no second shuffle); above it the winners stay distributed and survivors
    are selected by an equi-join on the winning id — never driver-gathered.
    """
    limit = WINNER_BROADCAST_LIMIT if winner_broadcast_limit is None else winner_broadcast_limit

    def _partial(df: pd.DataFrame) -> pa.Table:
        out = df.sort_values(id_col, kind="mergesort").drop_duplicates(
            subset=[key_col], keep="first")
        # Arrow out without pandas metadata (feeds the winner groupby; a
        # metadata-bearing schema is unhashable and Ray warns per shuffle task)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    partial = ds.map_batches(_partial, batch_format="pandas").materialize()
    winners = partial.groupby(key_col).min(id_col).materialize()
    win_col = f"min({id_col})"
    if winners.count() > limit:
        ids_only = winners.map_batches(
            lambda b: pa.table({"_win_id": b.column(win_col)}),
            batch_format="pyarrow")
        return partial.join(
            ids_only, join_type="inner",
            num_partitions=_winner_join_partitions(partial),
            on=(id_col,), right_on=("_win_id",))

    ids = [b.column(win_col) for b in winners.iter_batches(batch_format="pyarrow")
           if b.num_rows]
    if not ids:
        return partial
    value_set = pc.unique(pa.concat_arrays(
        [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in ids]))
    vs_ref = ray.put(value_set)

    def _flt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column(id_col), value_set=ray.get(vs_ref)))

    return partial.map_batches(_flt, batch_format="pyarrow")


def exact_dedup_by_fingerprint(
    ds: ray.data.Dataset, text_col: str, id_col: str,
    winner_broadcast_limit: Optional[int] = None,
) -> ray.data.Dataset:
    """Exact dedup on the md5 fingerprint of the canonicalized text."""

    def _fp(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        fps = pa.array([textfns.fingerprint(t) for t in col.to_pylist()], pa.string())
        return batch.append_column("_fp", fps)

    with_fp = ds.map_batches(_fp, batch_format="pyarrow")
    return exact_dedup(
        with_fp, "_fp", id_col,
        winner_broadcast_limit=winner_broadcast_limit).drop_columns(["_fp"])


def exact_dedup_keep_longest(
    ds: ray.data.Dataset, key_col: str, id_col: str, text_col: str,
    winner_broadcast_limit: Optional[int] = None,
) -> ray.data.Dataset:
    """Keep the LONGEST row per distinct ``key_col`` (ties: min ``id_col``) —
    the training-data dedup policy that keeps the most complete duplicate.

    Same scale shape as :func:`exact_dedup` (per-batch partial keep-best, one
    tiny winner aggregate, auto broadcast-vs-join winner resolution), but the
    global argmax rides an ordinary ``groupby(key).max`` over a packed int64
    ``len(text) * 2^32 + (2^32-1 - id)`` — no per-group Python, and the
    (longest, then min-id) preference decodes from one Max.
    Assumes ``id < 2^32`` and ``len < 2^31`` (asserted per batch).
    """
    limit = WINNER_BROADCAST_LIMIT if winner_broadcast_limit is None else winner_broadcast_limit
    _LOW = (1 << 32) - 1

    def _partial(df: pd.DataFrame) -> pa.Table:
        df = df.assign(_len=df[text_col].str.len().fillna(0))
        df = df.sort_values([key_col, "_len", id_col],
                            ascending=[True, False, True], kind="mergesort")
        out = df.drop_duplicates(subset=[key_col], keep="first").drop(columns=["_len"])
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    partial = ds.map_batches(_partial, batch_format="pandas").materialize()

    def _pack(batch: pa.Table) -> pa.Table:
        ln = pc.fill_null(
            pc.cast(pc.utf8_length(batch.column(text_col)), pa.int64()), 0)
        iid = pc.cast(batch.column(id_col), pa.int64())
        max_id = pc.max(iid).as_py()
        assert max_id is None or 0 <= max_id <= _LOW, "id must fit in uint32"
        max_ln = pc.max(ln).as_py()
        assert max_ln is None or max_ln < (1 << 31), "text length must be < 2^31"
        packed = pc.add(pc.multiply(ln, _LOW + 1), pc.subtract(_LOW, iid))
        return pa.table({key_col: batch.column(key_col), "_packed": packed})

    winners = (partial.map_batches(_pack, batch_format="pyarrow")
               .groupby(key_col).max("_packed").materialize())
    if winners.count() > limit:
        # winners stay distributed: decode the id from the packed max per
        # batch and equi-join the survivors on it (int64-cast join key added
        # to the probe side; Dataset.join drops the right key column)
        def _decode(b: pa.Table) -> pa.Table:
            packed = b.column("max(_packed)")
            return pa.table(
                {"_win_id": pc.subtract(_LOW, pc.bit_wise_and(packed, _LOW))})

        def _addkey(b: pa.Table) -> pa.Table:
            return b.append_column(
                "_idc", pc.cast(b.column(id_col), pa.int64()))

        joined = partial.map_batches(_addkey, batch_format="pyarrow").join(
            winners.map_batches(_decode, batch_format="pyarrow"),
            join_type="inner",
            num_partitions=_winner_join_partitions(partial),
            on=("_idc",), right_on=("_win_id",))
        return joined.drop_columns(["_idc"])

    ids = []
    for b in winners.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            packed = b.column("max(_packed)")
            ids.append(pc.subtract(_LOW, pc.bit_wise_and(packed, _LOW)))
    if not ids:
        return partial
    value_set = pc.unique(pa.concat_arrays(
        [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in ids]))
    vs_ref = ray.put(value_set)

    def _flt(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(batch.column(id_col), pa.int64()),
                        value_set=ray.get(vs_ref))
        return batch.filter(keep)

    return partial.map_batches(_flt, batch_format="pyarrow")


#: keep_latest_dedup finishes driver-side below this partial size — the same
#: bounded fast path the connected-components op uses for <=5M edges; above
#: it the distributed (groupby + join + exact_dedup) plan runs
KEEP_LATEST_LOCAL_BYTES = 256 << 20


def keep_latest_dedup(
    ds: ray.data.Dataset, key_col: str, ts_col: str, id_col: str,
    winner_broadcast_limit: Optional[int] = None,
    local_limit_bytes: Optional[int] = None,
) -> ray.data.Dataset:
    """Keep the NEWEST row per key (max ``ts_col``; ties -> min ``id_col``) —
    the Common-Crawl "latest snapshot wins" policy for re-crawled canonical
    URLs (pair with ``functions.urls.canonicalize_url``).

    Scale shape: per-batch partial keep-best (at most one row per key per
    batch leaves the map stage) collapses the input to O(keys x batches)
    rows. A partial within ``local_limit_bytes`` finishes with one vectorized
    driver-side pass (three Ray aggregates cost ~15 s of fixed shuffle-actor
    time at small scale); above the bound the distributed plan runs: one
    ``groupby(key).max(ts)``, an equi-join back to keep only rows AT the
    per-key max timestamp, then :func:`exact_dedup` (min-id, auto
    broadcast-vs-join winner plan) breaks exact-timestamp ties. No
    driver-sized gathers beyond the bounded fast path / winner broadcast.
    """
    local_bytes = (KEEP_LATEST_LOCAL_BYTES
                   if local_limit_bytes is None else local_limit_bytes)

    def _best(df: pd.DataFrame) -> pd.DataFrame:
        # NULL timestamps never win and an all-NULL key yields no row —
        # matching SQL's NULL-ignoring max() + inner-join-on-ts semantics
        df = df.dropna(subset=[ts_col])
        df = df.sort_values([key_col, ts_col, id_col],
                            ascending=[True, False, True], kind="mergesort")
        return df.drop_duplicates(subset=[key_col], keep="first")

    def _partial(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            _best(df), preserve_index=False).replace_schema_metadata(None)

    partial = ds.map_batches(_partial, batch_format="pandas").materialize()
    if (partial.size_bytes() or 0) <= local_bytes:
        out = _best(partial.to_pandas())
        return ray.data.from_arrow(pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None))
    ts_type = partial.schema().base_schema.field(ts_col).type
    maxts = partial.groupby(key_col).max(ts_col)
    max_col = f"max({ts_col})"
    # the aggregate emits pandas blocks (dict metadata, column-less empties);
    # normalize before the join — same hazard ensure_arrow_schema documents
    _schema = pa.schema([(key_col, partial.schema().base_schema.field(key_col).type),
                         (max_col, ts_type)])
    _empty = pa.table({f.name: pa.array([], f.type) for f in _schema})

    def _norm(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or b.num_rows == 0:
            return _empty
        return b.select(_schema.names).cast(_schema).replace_schema_metadata(None)

    at_max = partial.join(
        maxts.map_batches(_norm, batch_format="pyarrow"),
        join_type="inner", num_partitions=_winner_join_partitions(partial),
        on=(key_col,))

    def _flt_max(batch: pa.Table) -> pa.Table:
        keep = pc.equal(pc.cast(batch.column(ts_col), ts_type),
                        batch.column(max_col))
        return batch.filter(keep).drop_columns([max_col])

    ties = at_max.map_batches(_flt_max, batch_format="pyarrow")
    return exact_dedup(ties, key_col, id_col,
                       winner_broadcast_limit=winner_broadcast_limit)


def snapshot_diff(
    old: ray.data.Dataset, new: ray.data.Dataset, key_col: str,
) -> ray.data.Dataset:
    """Reconcile two crawl snapshots by key: ``added`` / ``removed`` /
    ``common`` canonical URLs (pair with ``functions.urls.canonicalize_url``).

    No join: each side reduces per batch to DISTINCT keys with presence
    flags, the tagged union shuffles O(distinct keys x batches) tiny rows,
    and one ``groupby(key).max(flags)`` settles presence (max, not sum — a
    key seen in several batches of one side must not masquerade as present
    in both). Output: ``(key_col, status)``.
    """
    from ray.data.aggregate import Max

    def _tag(is_old: int, is_new: int):
        def _f(b: pa.Table) -> pa.Table:
            col = b.column(key_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            keys = pc.unique(col)
            n = len(keys)
            return pa.table({
                key_col: keys,
                "_old": pa.array(np.full(n, is_old, dtype=np.int64)),
                "_new": pa.array(np.full(n, is_new, dtype=np.int64)),
            })
        return _f

    u = (old.select_columns([key_col]).map_batches(_tag(1, 0), batch_format="pyarrow")
         .union(new.select_columns([key_col]).map_batches(_tag(0, 1),
                                                          batch_format="pyarrow")))
    agg = u.groupby(key_col).aggregate(Max("_old", alias_name="_o"),
                                       Max("_new", alias_name="_n"))

    def _status(b: pa.Table) -> pa.Table:
        if b.num_columns == 0:
            return pa.table({key_col: pa.array([], pa.string()),
                             "status": pa.array([], pa.string())})
        o = b.column("_o").to_numpy(zero_copy_only=False) > 0
        n = b.column("_n").to_numpy(zero_copy_only=False) > 0
        status = np.where(o & n, "common", np.where(o, "removed", "added"))
        return pa.table({key_col: b.column(key_col),
                         "status": pa.array(status, pa.string())})

    return agg.map_batches(_status, batch_format="pyarrow")


def fingerprint_dedup_keep_longest(
    ds: ray.data.Dataset, text_col: str, id_col: str,
    winner_broadcast_limit: Optional[int] = None,
) -> ray.data.Dataset:
    """Keep-longest dedup on the md5 fingerprint of the canonicalized text."""

    def _fp(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        fps = pa.array([textfns.fingerprint(t) for t in col.to_pylist()], pa.string())
        return batch.append_column("_fp", fps)

    with_fp = ds.map_batches(_fp, batch_format="pyarrow")
    return exact_dedup_keep_longest(
        with_fp, "_fp", id_col, text_col,
        winner_broadcast_limit=winner_broadcast_limit).drop_columns(["_fp"])


def _bucket_candidate_pairs(
    melted: ray.data.Dataset, bucket_col: str, id_col: str, max_group: int,
    stage: str = "bucket_candidates",
) -> ray.data.Dataset:
    """Distinct id-ordered candidate pairs from bucket co-membership.

    Scale shape: singleton buckets (the overwhelming majority) are eliminated by a
    vectorized ``groupby(bucket).count()`` BEFORE any per-group Python runs — only
    rows in buckets with >= 2 members (broadcast ``is_in`` filter on the hot bucket
    set; O(#duplicate buckets), logged) reach the per-group pairing, and pair dedup
    is a vectorized ``groupby(id_a, id_b).count()``. Buckets larger than
    ``max_group`` are truncated deterministically (by id); truncation is counted
    fire-and-forget on one zero-CPU metrics actor (``state.metrics``) and the
    caller logs ONE end-of-stage summary under ``stage`` — never one line per
    bucket.
    """
    trunc_actor = _metrics.truncation_actor()
    counts = melted.groupby(bucket_col).count()

    def _gt1(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("count()"), 1)) \
                    .select([bucket_col])

    hot = [b for b in counts.map_batches(_gt1, batch_format="pyarrow")
           .iter_batches(batch_format="pyarrow") if b.num_rows]
    if not hot:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}))
    hot_set = pc.unique(pa.concat_arrays(
        [t.column(bucket_col).combine_chunks() for t in hot]))
    hot_ref = ray.put(hot_set)

    def _flt(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column(bucket_col), value_set=ray.get(hot_ref)))

    dup_rows = melted.map_batches(_flt, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > max_group:
            n, cap = len(g), max_group
            trunc_actor.add.remote(  # fire-and-forget, no hot-path log line
                stage, 1, n - cap,
                n * (n - 1) // 2 - cap * (cap - 1) // 2)
        ids = g[id_col].sort_values(kind="mergesort").head(max_group).tolist()
        rows = [(ids[i], ids[j])
                for i in range(len(ids)) for j in range(i + 1, len(ids))]
        return pd.DataFrame(rows, columns=["id_a", "id_b"]) if rows else \
            pd.DataFrame({"id_a": pd.Series([], dtype=g[id_col].dtype),
                          "id_b": pd.Series([], dtype=g[id_col].dtype)})

    pairs = dup_rows.groupby(bucket_col).map_groups(_pairs, batch_format="pandas")
    # Local (per-batch) dedup only: cross-band duplicate pairs are a few percent,
    # so re-verifying them is far cheaper than a global pair-key shuffle here;
    # callers dedup the (small) verified output with _distinct_pairs_with_value.
    return pairs.map_batches(
        lambda df: df.drop_duplicates(subset=["id_a", "id_b"]),
        batch_format="pandas")


def _distinct_pairs_with_value(
    pairs: ray.data.Dataset, value_col: str, id_type: pa.DataType
) -> ray.data.Dataset:
    """Distinct (id_a, id_b) rows, keeping ``value_col`` (identical per pair).

    Single-key groupby on a packed pair string (Ray's multi-key groupby aggregate
    is an order of magnitude slower than single-key at this shape).
    """
    def _pack(batch: pa.Table) -> pa.Table:
        pk = pc.binary_join_element_wise(
            pc.cast(batch.column("id_a"), pa.string()),
            pc.cast(batch.column("id_b"), pa.string()), "\x00")
        return pa.table({"pk": pk, value_col: batch.column(value_col)})

    packed = pairs.map_batches(_pack, batch_format="pyarrow")
    agg = packed.groupby("pk").max(value_col)

    def _unpack(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("pk"), "\x00")
        return pa.table({
            "id_a": pc.cast(pc.list_element(parts, 0), id_type),
            "id_b": pc.cast(pc.list_element(parts, 1), id_type),
            value_col: batch.column(f"max({value_col})"),
        })

    return agg.map_batches(_unpack, batch_format="pyarrow")


def _candidate_id_set(pairs: ray.data.Dataset) -> pa.Array:
    """Distinct ids appearing in candidate pairs (small: O(near-dup rows))."""
    parts = []
    for b in pairs.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            parts.append(b.column("id_a").combine_chunks())
            parts.append(b.column("id_b").combine_chunks())
    if not parts:
        return pa.array([], pa.int64())
    return pc.unique(pa.concat_arrays(parts))


def _semi_join_ids_arrow(
    ds: ray.data.Dataset, id_col: str, ids: pa.Array
) -> ray.data.Dataset:
    """Rows whose ``id_col`` is in the broadcast ``ids`` set (vectorized)."""
    ids_ref = ray.put(ids)

    def _flt(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column(id_col), value_set=ray.get(ids_ref)))

    return ds.map_batches(_flt, batch_format="pyarrow")


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
        # ids only through the shuffle — the text payload NEVER enters the
        # all-to-all exchange (it would be replicated x bands otherwise).
        # Fully vectorized: the id column is repeated as CHUNK REFERENCES
        # (zero-copy) and the bucket keys fill one preallocated int64 array.
        n = batch.num_rows
        idc = batch.column(id_col)
        if isinstance(idc, pa.ChunkedArray):
            idc = idc.combine_chunks()
        bkey = np.empty(n * bands, dtype=np.int64)
        for b in range(bands):
            h = batch.column(f"band_{b}").to_numpy(zero_copy_only=False)
            # fold the band index into the bucket key (single int64 group key)
            bkey[b * n:(b + 1) * n] = (
                h.astype("int64") * np.int64(31)) ^ np.int64(b * 0x9E3779B9)
        return pa.table({
            "bucket": pa.array(bkey, pa.int64()),
            id_col: pa.chunked_array([idc] * bands) if bands else idc,
        })

    melted = banded.map_batches(_melt, batch_format="pyarrow")
    # pairs feed two consumers (candidate-id gather + verify) — materialize once
    pairs = _bucket_candidate_pairs(melted, "bucket", id_col, max_group,
                                    stage="minhash_lsh").materialize()
    _metrics.log_truncation_summary("minhash_lsh")

    thr = float(jaccard_threshold)
    # Semi-join the text payloads down to the candidate-id set BEFORE any
    # driver-side gather: the broadcast id->text dict is O(candidate ids), never
    # O(corpus). (Round-1 defect: the dict was built over the full dataset.)
    cand_ids = _candidate_id_set(pairs)
    texts_ref = ray.put({
        r[0]: r[1]
        for b in _semi_join_ids_arrow(
            ds.select_columns([id_col, text_col]), id_col, cand_ids
        ).iter_batches(batch_format="pyarrow")
        for r in zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist())
    })

    class _VerifyState:
        def __init__(self):
            self.texts = ray.get(texts_ref)
            self.ngrams: Dict = {}

        def _ng(self, i):
            s = self.ngrams.get(i)
            if s is None:
                s = textfns.ngram_set(self.texts.get(i) or "")
                self.ngrams[i] = s
            return s

    vkey = ("minhash-verify", texts_ref.hex())

    def _verify(batch: pa.Table) -> pa.Table:
        from .matching import _worker_state

        st = _worker_state(vkey, _VerifyState)
        a = batch.column("id_a").to_pylist()
        b = batch.column("id_b").to_pylist()
        jac = [textfns.jaccard(st._ng(x), st._ng(y)) for x, y in zip(a, b)]
        out = pa.table({
            "id_a": batch.column("id_a"),
            "id_b": batch.column("id_b"),
            "jaccard": pa.array(jac, pa.float64()),
        })
        return out.filter(pc.greater_equal(out.column("jaccard"), thr))

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    verified = _distinct_pairs_with_value(
        pairs.map_batches(_verify, batch_format="pyarrow"),
        "jaccard", id_type,
    ).materialize()
    clusters = cluster.connected_components(verified, "id_a", "id_b")
    return {"pairs": verified, "clusters": clusters}


def minhash_dedup_against(
    new_ds: ray.data.Dataset,
    ref_ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    max_group: int = 200,
    seed: int = 1729,
) -> Dict[str, ray.data.Dataset]:
    """CROSS-corpus near-dup filter: drop rows of ``new_ds`` that are
    MinHash-LSH near-duplicates of anything in ``ref_ds`` — the "don't
    re-ingest what the training set already contains" pass a recurring
    crawl runs before appending a new snapshot.

    Same machinery as :func:`minhash_lsh_dedup` (identical seeded band
    keys on BOTH sides, ids-only melt, hot-bucket cap counted on the
    truncation metrics actor, candidate-bounded exact-Jaccard verify) but
    pair generation emits ONLY cross-side (ref_id, new_id) pairs — within-
    corpus duplicates are out of scope here. Both corpora must share the
    id column type; ids may collide across corpora (the verify keys texts
    by side).

    Returns ``{"pairs": (id_a=ref, id_b=new, jaccard) verified distinct,
    "filtered": new_ds rows with no verified ref near-dup}``.
    """
    def _banded(ds):
        return blocking.add_minhash_bands(
            ds.select_columns([id_col, text_col]), text_col,
            num_perm=num_perm, bands=bands, shingle_k=shingle_k, seed=seed)

    def _melt_side(side: int):
        def _melt(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            idc = batch.column(id_col)
            if isinstance(idc, pa.ChunkedArray):
                idc = idc.combine_chunks()
            bkey = np.empty(n * bands, dtype=np.int64)
            for b in range(bands):
                h = batch.column(f"band_{b}").to_numpy(zero_copy_only=False)
                bkey[b * n:(b + 1) * n] = (
                    h.astype("int64") * np.int64(31)) ^ np.int64(b * 0x9E3779B9)
            return pa.table({
                "bucket": pa.array(bkey, pa.int64()),
                id_col: pa.chunked_array([idc] * bands) if bands else idc,
                "side": pa.array(np.full(n * bands, side, np.int8)),
            })
        return _melt

    melted = (_banded(ref_ds).map_batches(_melt_side(0),
                                          batch_format="pyarrow")
              .union(_banded(new_ds).map_batches(_melt_side(1),
                                                 batch_format="pyarrow")))

    trunc_actor = _metrics.truncation_actor()

    def _cross_pairs(g: pd.DataFrame) -> pd.DataFrame:
        refs = g.loc[g["side"] == 0, id_col].drop_duplicates()
        news = g.loc[g["side"] == 1, id_col].drop_duplicates()
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=g[id_col].dtype),
                              "id_b": pd.Series([], dtype=g[id_col].dtype)})
        if refs.empty or news.empty:
            return empty
        nr, nn = len(refs), len(news)
        if nr > max_group or nn > max_group:
            kept_r, kept_n = min(nr, max_group), min(nn, max_group)
            trunc_actor.add.remote(
                "minhash_cross", 1, (nr - kept_r) + (nn - kept_n),
                nr * nn - kept_r * kept_n)
        refs = refs.sort_values(kind="mergesort").head(max_group).to_numpy()
        news = news.sort_values(kind="mergesort").head(max_group).to_numpy()
        return pd.DataFrame({
            "id_a": np.repeat(refs, len(news)),
            "id_b": np.tile(news, len(refs)),
        })

    pairs = (melted.groupby("bucket")
             .map_groups(_cross_pairs, batch_format="pandas")
             .map_batches(lambda df: df.drop_duplicates(["id_a", "id_b"]),
                          batch_format="pandas")).materialize()
    _metrics.log_truncation_summary("minhash_cross")

    thr = float(jaccard_threshold)
    # candidate-bounded text gather, keyed by SIDE (ids may collide)
    ids_a, ids_b = [], []
    for b in pairs.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            ids_a.append(b.column("id_a").combine_chunks())
            ids_b.append(b.column("id_b").combine_chunks())
    if not ids_a:
        empty_pairs = ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
        return {"pairs": empty_pairs, "filtered": new_ds}
    ref_ids = pc.unique(pa.concat_arrays(ids_a))
    new_ids = pc.unique(pa.concat_arrays(ids_b))
    texts: Dict = {}
    for side, src, idset in (("r", ref_ds, ref_ids), ("n", new_ds, new_ids)):
        for b in _semi_join_ids_arrow(
                src.select_columns([id_col, text_col]), id_col, idset
        ).iter_batches(batch_format="pyarrow"):
            for r in zip(b.column(id_col).to_pylist(),
                         b.column(text_col).to_pylist()):
                texts[(side, r[0])] = r[1]
    texts_ref = ray.put(texts)

    class _XVerifyState:
        def __init__(self):
            self.texts = ray.get(texts_ref)
            self.ngrams: Dict = {}

        def _ng(self, key):
            s = self.ngrams.get(key)
            if s is None:
                s = textfns.ngram_set(self.texts.get(key) or "")
                self.ngrams[key] = s
            return s

    vkey = ("minhash-xverify", texts_ref.hex())

    def _verify(batch: pa.Table) -> pa.Table:
        from .matching import _worker_state

        st = _worker_state(vkey, _XVerifyState)
        a = batch.column("id_a").to_pylist()
        b = batch.column("id_b").to_pylist()
        jac = [textfns.jaccard(st._ng(("r", x)), st._ng(("n", y)))
               for x, y in zip(a, b)]
        out = pa.table({
            "id_a": batch.column("id_a"),
            "id_b": batch.column("id_b"),
            "jaccard": pa.array(jac, pa.float64()),
        })
        return out.filter(pc.greater_equal(out.column("jaccard"), thr))

    sch = new_ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    verified = _distinct_pairs_with_value(
        pairs.map_batches(_verify, batch_format="pyarrow"),
        "jaccard", id_type,
    ).materialize()

    # drop matched new ids (broadcast set bounded by near-dup volume)
    matched = []
    for b in verified.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            matched.append(b.column("id_b").combine_chunks())
    if matched:
        drop_ref = ray.put(pc.unique(pa.concat_arrays(matched)))

        def _keep(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(pc.is_in(
                batch.column(id_col), value_set=ray.get(drop_ref))))

        filtered = new_ds.map_batches(_keep, batch_format="pyarrow")
    else:
        filtered = new_ds
    return {"pairs": verified, "filtered": filtered}


def neardup_keep_best(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    winner_broadcast_limit: Optional[int] = None,
    num_partitions: Optional[int] = None,
    clusters: Optional[ray.data.Dataset] = None,
    **lsh_kwargs,
) -> Dict[str, ray.data.Dataset]:
    """Quality-aware near-dup RETENTION — the composition a SlimPajama-class
    pipeline actually runs: MinHash-LSH near-dup clusters
    (:func:`minhash_lsh_dedup`, or pass precomputed ``clusters``
    ``(node, cluster_id)`` labels — e.g. SimHash or exact-Jaccard components
    — to reuse an existing blocking pass), then keep exactly ONE document per
    cluster
    (the LONGEST text; ties -> smallest id) while unclustered docs pass
    through untouched. Returns ``{"kept": surviving corpus rows,
    "dropped": (node, cluster_id) rows removed, "clusters": labels}``.

    Scale shape — the plan auto-switches on the cluster-member count
    (``WINNER_BROADCAST_LIMIT``, same cutover as the linkage exclusion
    stage), and either way only ids and lengths move, never the text
    payload:

    - at or below the limit, the node->cluster map broadcasts once via
      ``ray.put``, ONE corpus pass emits the member (node, cluster, len)
      partials, winners resolve on the driver, and the corpus is filtered
      with a broadcast ``pc.is_in`` — zero shuffles, zero join actors;
    - above it (an exact-heavy 100-TB corpus can have a corpus-sized
      near-dup set), lengths equi-join to the labels, one ``map_groups``
      shuffle resolves winners per cluster (groups bounded by
      ``minhash_lsh_dedup``'s ``max_group`` cap), and the drop list
      anti-joins back via the hash-partitioned ``left_anti`` plan
      (``matching.filter_out_ids_join``) — nothing gathers to the driver.

    LSH clusters are approximate-by-construction, so this op is rows-only
    for the driver; retention semantics (longest survives, ties to min id,
    unclustered untouched) and both-plan row-identity are pinned in pytest.
    """
    from .matching import filter_out_ids, filter_out_ids_join

    limit = (WINNER_BROADCAST_LIMIT if winner_broadcast_limit is None
             else winner_broadcast_limit)
    if clusters is None:
        clusters = minhash_lsh_dedup(
            ds, text_col, id_col, **lsh_kwargs)["clusters"]
    clusters = clusters.materialize()  # small: near-dup docs only
    if clusters.count() == 0:
        # no near-dups anywhere: an empty clusters set is all zero-column
        # blocks (see the map_groups note below) — skip the join machinery
        empty = ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "cluster_id": pa.array([], pa.string()),
        }))
        return {"kept": ds, "dropped": empty, "clusters": clusters}

    if num_partitions is None:
        num_partitions = _winner_join_partitions(ds)

    if clusters.count() <= limit:
        # BROADCAST plan (label set fits the driver/object store): ship the
        # node->cluster map once via ray.put, ONE corpus pass emits the
        # member (node, cluster_id, len) partials — ids and lengths only,
        # never the text payload — and the <= limit-row winner resolution
        # runs on the driver; final pass is the broadcast is_in anti-filter.
        # No hash-join actors, no groupby shuffle: at small cluster counts
        # the distributed plan's fixed costs dominate its work.
        lab_map: Dict[str, str] = {}
        for b in clusters.iter_batches(batch_format="pyarrow"):
            if "node" not in b.column_names:
                continue  # zero-column empty blocks (see plan B note)
            for nd, cid in zip(b.column("node").to_pylist(),
                               b.column("cluster_id").to_pylist()):
                lab_map[str(nd)] = str(cid)
        keys_ref = ray.put(pa.array(sorted(lab_map), pa.string()))

        def _member_lens(batch: pa.Table) -> pa.Table:
            ids = pc.cast(batch.column(id_col), pa.string())
            txt = pc.fill_null(
                pc.cast(batch.column(text_col), pa.string()), "")
            t = pa.table({"node": ids,
                          "_len": pc.cast(pc.utf8_length(txt), pa.int64())})
            return t.filter(pc.is_in(ids, value_set=ray.get(keys_ref)))

        lab_pd = (ds.map_batches(_member_lens, batch_format="pyarrow")
                  .to_pandas())
        lab_pd["cluster_id"] = lab_pd["node"].map(lab_map)
        win = (lab_pd.sort_values(["_len", "node"],
                                  ascending=[False, True])
               .groupby("cluster_id").head(1))
        drop_pd = (lab_pd.loc[~lab_pd["node"].isin(set(win["node"])),
                              ["node", "cluster_id"]]
                   .sort_values("node").reset_index(drop=True))
        kept = filter_out_ids(ds, id_col, set(drop_pd["node"]))
        return {"kept": kept,
                "dropped": ray.data.from_pandas(drop_pd),
                "clusters": clusters}

    # DISTRIBUTED plan (cluster labels above the broadcast limit — on an
    # exact-heavy 100-TB corpus the near-dup member set is corpus-sized):
    # equi-join lengths to labels, resolve winners with one map_groups
    # shuffle, anti-join the drop list; nothing is gathered to the driver.
    def _lens(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
        return pa.table({
            # cluster labels carry STRING node ids (connected_components'
            # canonical form) — align the corpus key once here; the final
            # anti-join casts back (filter_out_ids_join right-side cast)
            id_col: pc.cast(batch.column(id_col), pa.string()),
            "_len": pc.cast(pc.utf8_length(txt), pa.int64()),
        })

    lab = clusters.join(
        ds.map_batches(_lens, batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions,
        on=("node",), right_on=(id_col,),
    ).materialize()  # (node, cluster_id, _len) — cluster members only

    def _drops(g: pd.DataFrame) -> pd.DataFrame:
        # longest text survives; ties -> smallest node id (string order — the
        # clusters' canonical node form); everything else in the group drops
        win = g.sort_values(["_len", "node"],
                            ascending=[False, True])["node"].iloc[0]
        return g.loc[g["node"] != win, ["node", "cluster_id"]]

    # ONE shuffle by cluster_id over the lab table (groups are single
    # near-dup clusters, bounded by minhash_lsh_dedup's max_group cap).
    # map_groups emits ZERO-COLUMN empty blocks on empty partitions and map
    # ops pass empty blocks through untouched, which breaks downstream hash
    # joins ("no match for key field") — the repartition consolidates blocks
    # to a uniform schema (ids-only rows, same cost class as the groupby).
    dropped = (lab.groupby("cluster_id")
               .map_groups(_drops, batch_format="pandas")
               .repartition(max(2, num_partitions // 4))
               .materialize())

    kept = filter_out_ids_join(ds, id_col, dropped, "node",
                               num_partitions=num_partitions)
    return {"kept": kept, "dropped": dropped, "clusters": clusters}


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

    sigds = ds.select_columns([id_col, text_col]).map_batches(
        _sig, batch_format="pyarrow").materialize()

    def _melt(batch: pa.Table) -> pa.Table:
        # same vectorized ids-only melt as the MinHash path (4 fixed bands)
        n = batch.num_rows
        idc = batch.column(id_col)
        if isinstance(idc, pa.ChunkedArray):
            idc = idc.combine_chunks()
        bkey = np.empty(n * 4, dtype=np.int64)
        for b in range(4):
            h = batch.column(f"sh_band_{b}").to_numpy(zero_copy_only=False)
            bkey[b * n:(b + 1) * n] = (
                h.astype("int64") * np.int64(31)) ^ np.int64(b * 0x9E3779B9)
        return pa.table({
            "bucket": pa.array(bkey, pa.int64()),
            id_col: pa.chunked_array([idc] * 4),
        })

    melted = sigds.map_batches(_melt, batch_format="pyarrow")
    pairs = _bucket_candidate_pairs(melted, "bucket", id_col, max_group,
                                    stage="simhash").materialize()
    _metrics.log_truncation_summary("simhash")
    thr = int(hamming_threshold)

    # signatures semi-joined to the candidate ids — O(candidate ids) broadcast,
    # never O(corpus) (round-1 defect fixed, same shape as minhash verify)
    cand_ids = _candidate_id_set(pairs)
    sig_ref = ray.put({
        r[0]: r[1]
        for b in _semi_join_ids_arrow(
            sigds.select_columns([id_col, "simhash"]), id_col, cand_ids
        ).iter_batches(batch_format="pyarrow")
        for r in zip(b.column(id_col).to_pylist(), b.column("simhash").to_pylist())
    })

    vkey = ("simhash-verify", sig_ref.hex())

    def _verify(batch: pa.Table) -> pa.Table:
        from .matching import _worker_state

        sig = _worker_state(vkey, lambda: ray.get(sig_ref))
        a = batch.column("id_a").to_pylist()
        b = batch.column("id_b").to_pylist()
        mask = (1 << 64) - 1
        ham = [textfns.hamming64(int(sig[x]) & mask, int(sig[y]) & mask)
               for x, y in zip(a, b)]
        out = pa.table({
            "id_a": batch.column("id_a"),
            "id_b": batch.column("id_b"),
            "hamming": pa.array(ham, pa.int64()),
        })
        return out.filter(pc.less_equal(out.column("hamming"), thr))

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    verified = _distinct_pairs_with_value(
        pairs.map_batches(_verify, batch_format="pyarrow"),
        "hamming", id_type,
    ).materialize()
    clusters = cluster.connected_components(verified, "id_a", "id_b")
    return {"pairs": verified, "clusters": clusters}


def ngram_jaccard_matrix(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    ids_below: int,
    n: int = 3,
) -> pd.DataFrame:
    """Exact pairwise n-gram overlap for a keyed subset, as a distributed
    relational plan (gram inverted index): melt (id, distinct gram) rows,
    self-equi-join on gram, per-pair count — the same plan a SQL engine runs,
    so it is DuckDB-oracle-checkable. Integer outputs (intersection / union
    sizes) keep the comparison float-free.

    Returns (id_a, id_b, inter, uni) for every id pair below ``ids_below``
    (including zero-overlap pairs).
    """
    import re as _re

    ws = _re.compile(r"\s+")

    def _grams(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_g = [], []
        for i, t in zip(ids, texts):
            if i >= ids_below:
                continue
            canon = ws.sub(" ", (t or "").lower()).strip()
            if len(canon) < n:
                continue
            for g in {canon[j:j + n] for j in range(len(canon) - n + 1)}:
                out_id.append(i)
                out_g.append(g)
        return pa.table({id_col: pa.array(out_id, batch.schema.field(id_col).type),
                         "gram": pa.array(out_g, pa.string())})

    grams = ds.select_columns([id_col, text_col]).map_batches(
        _grams, batch_format="pyarrow").materialize()
    # per-doc distinct-gram counts (small: ids_below docs)
    counts = {r[id_col]: r["count()"] for r in grams.groupby(id_col).count().iter_rows()}
    # pairwise intersections via gram self-join + pair groupby
    right = grams.map_batches(
        lambda b: pa.table({"id_b": b.column(id_col), "gram_b": b.column("gram")}),
        batch_format="pyarrow")
    joined = grams.join(right, join_type="inner", num_partitions=8,
                        on=("gram",), right_on=("gram_b",))

    def _ordered(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch.column(id_col), batch.column("id_b"))
        t = batch.filter(keep)
        pk = pc.binary_join_element_wise(
            pc.cast(t.column(id_col), pa.string()),
            pc.cast(t.column("id_b"), pa.string()), "\x00")
        return pa.table({"pk": pk})

    inter = {r["pk"]: r["count()"] for r in joined.map_batches(
        _ordered, batch_format="pyarrow").groupby("pk").count().iter_rows()}
    rows = []
    ids_sorted = sorted(counts)
    for i, a in enumerate(ids_sorted):
        for b in ids_sorted[i + 1:]:
            iv = int(inter.get(f"{a}\x00{b}", 0))
            rows.append((a, b, iv, int(counts[a]) + int(counts[b]) - iv))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "inter", "uni"])


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


def line_dedup(
    ds: ray.data.Dataset, text_col: str, id_col: str, num_partitions: int = 16
) -> ray.data.Dataset:
    """C4-style global line-level dedup (Raffel et al. 2020 §2.2's "discard
    repeated lines" rule, deterministic variant): a non-blank line occurring
    anywhere else in the corpus is kept only at its first occurrence — min
    ``(doc_id, line_no)`` — blank lines are structural and always kept. Docs
    whose every line is removed drop out (matching the SQL oracle's GROUP BY).

    Scale shape: explode to one row per line -> ``groupby(line).min`` over a
    packed ``doc_id * 2^32 + line_no`` int64 -> *equi-join* winners back on the
    line text -> filter -> per-doc reassembly. Winner resolution is a join, not
    a broadcast, so the distinct-line table never lands on one node; reassembly
    groups are single documents (bounded size).
    """

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        assert (df[id_col] < (1 << 31)).all(), "doc id must fit in int32"
        out = df[[id_col]].copy()
        out["line"] = df[text_col].fillna("").str.split("\n")
        out = out.explode("line")
        out["line"] = out["line"].fillna("")
        out["line_no"] = out.groupby(level=0).cumcount()
        out["_packed"] = out[id_col].astype("int64") * (1 << 32) + out["line_no"]
        return out.reset_index(drop=True)

    exploded = ds.map_batches(_explode, batch_format="pandas").materialize()

    winners = (
        exploded.filter(expr="line != ''")
        .map_batches(lambda b: b.select(["line", "_packed"]), batch_format="pyarrow")
        .groupby("line")
        .min("_packed")
        .map_batches(lambda b: b.rename_columns(["line", "_w"]),
                     batch_format="pyarrow")
    )

    joined = exploded.join(
        winners, join_type="left_outer", num_partitions=num_partitions,
        on=("line",), right_on=("line",),
    )

    def _keep(batch: pa.Table) -> pa.Table:
        w = batch.column("_w")
        keep = pc.or_kleene(pc.is_null(w), pc.equal(batch.column("_packed"), w))
        return batch.filter(pc.fill_null(keep, False))

    kept = joined.map_batches(_keep, batch_format="pyarrow")

    def _rebuild(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("line_no")
        return pd.DataFrame({
            id_col: [df[id_col].iloc[0]],
            text_col: ["\n".join(df["line"])],
        })

    return kept.groupby(id_col).map_groups(_rebuild, batch_format="pandas")


def boilerplate_removed(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    max_df: int,
    num_partitions: int = 16,
    broadcast_limit: int = 2_000_000,
    fold_input_limit: int = 1 << 30,
) -> ray.data.Dataset:
    """CCNet/RefinedWeb-style boilerplate line removal: drop every non-blank
    line that occurs in ``max_df`` or more DISTINCT documents (nav bars,
    cookie banners, footers — the complement of :func:`line_dedup`, which
    keeps first occurrences; this keeps none).

    Scale shape: explode to one row per line (rows are whole documents, so
    per-batch ``(doc, line)`` dedup for the document-frequency count is
    exact) -> ``groupby(line).sum`` over batch-partial df counts -> filter to
    the boilerplate set. The set is small by construction (only lines shared
    by >= ``max_df`` docs), so winner resolution auto-selects like
    :func:`exact_dedup`: up to ``broadcast_limit`` lines it is ``ray.put``
    once and each exploded batch filters locally (NO shuffle); above the
    limit it falls back to an *equi-join* against the exploded lines. Blank
    lines are structural and always kept; a doc whose every line is removed
    drops out (same GROUP BY semantics as :func:`line_dedup`).

    Inputs up to ``fold_input_limit`` bytes skip the distributed df
    aggregate entirely: the per-batch partial tables are folded in one
    vectorized pandas groupby on the driver and the strip+rebuild runs
    inside each whole-document batch (Ray's sort-based aggregate costs
    ~0.7 ms of Python per partial row — it dominated the corpus-prep
    flagship's wall time). Identical output on all three plans
    (pytest-parametrized).
    """

    from ray.data.aggregate import Sum

    def _df_partial(df: pd.DataFrame) -> pd.DataFrame:
        # Runs on ds (one INPUT row = one whole document), NOT on exploded:
        # Ray splits a task's OUTPUT blocks at arbitrary row offsets once
        # they exceed target_max_block_size, so exploded line rows of one
        # doc could straddle batches and per-batch dedup would overcount df
        # (the soundex_block_sizes lesson from the round-3 advisory).
        lines = df[[id_col]].copy()
        lines["line"] = df[text_col].fillna("").str.split("\n")
        lines = lines.explode("line")
        pairs = lines.loc[lines["line"].fillna("") != "",
                          [id_col, "line"]].drop_duplicates()
        counts = pairs["line"].value_counts()
        return pd.DataFrame({"line": counts.index, "_c": counts.to_numpy()})

    from .analytics import ensure_arrow_schema

    partial = ds.map_batches(_df_partial, batch_format="pandas")

    if (ds.size_bytes() or 0) <= fold_input_limit:
        # driver-fold fast path: the per-batch partial df tables are a few
        # bytes per distinct line; below ``fold_input_limit`` of input text
        # they are folded in ONE vectorized pandas groupby on the driver —
        # Ray's sort-based aggregate costs ~0.7 ms of Python PER PARTIAL ROW
        # (measured: 114k partial rows = 12-15 s wall at 32 CPUs), which
        # dwarfed every other stage of the corpus-prep flagship. Identical
        # counts; the distributed aggregate below is the >limit scale path.
        parts = list(partial.iter_batches(batch_format="pandas"))
        if parts:
            allp = pd.concat(parts, ignore_index=True)
            dfc = allp.groupby("line", sort=False)["_c"].sum()
            boiler_set = frozenset(dfc.index[dfc >= int(max_df)])
        else:
            boiler_set = frozenset()
        if not boiler_set:
            def _ident0(b: pa.Table) -> pa.Table:
                return pa.table({
                    id_col: b.column(id_col),
                    text_col: pc.fill_null(pc.cast(b.column(text_col),
                                                   pa.string()), ""),
                })

            return ds.map_batches(_ident0, batch_format="pyarrow")
        ref0 = ray.put(boiler_set)

        def _strip0(df: pd.DataFrame) -> pd.DataFrame:
            bl = ray.get(ref0)
            ids, texts = [], []
            for i, t in zip(df[id_col], df[text_col].fillna("")):
                kept_lines = [ln for ln in t.split("\n")
                              if ln == "" or ln not in bl]
                if kept_lines:      # all-boilerplate docs drop out
                    ids.append(i)
                    texts.append("\n".join(kept_lines))
            return pd.DataFrame({id_col: ids, text_col: texts})

        return ds.map_batches(_strip0, batch_format="pandas")

    boiler = ensure_arrow_schema(
        partial
        .groupby("line")
        .aggregate(Sum("_c", alias_name="_boiler"))
        .filter(expr=f"_boiler >= {int(max_df)}"),
        pa.schema([("line", pa.string()), ("_boiler", pa.int64())]),
    ).materialize()

    n_boiler = boiler.count()
    if n_boiler == 0:
        # nothing to strip; the identity result is exact (normalize text
        # nulls the way _explode would)
        def _ident(b: pa.Table) -> pa.Table:
            return pa.table({
                id_col: b.column(id_col),
                text_col: pc.fill_null(pc.cast(b.column(text_col),
                                               pa.string()), ""),
            })

        return ds.map_batches(_ident, batch_format="pyarrow")

    if n_boiler <= broadcast_limit:
        # broadcast plan: strip + rebuild WITHIN each whole-document batch
        # — no explode dataset, no groupby(id).map_groups rebuild (per-group
        # Python calls dominated this stage's wall time at ~20k docs). A doc
        # whose every line is removed drops out, blank lines are structural
        # — identical semantics to the join plan's GROUP BY rebuild.
        ref = ray.put(frozenset(
            boiler.select_columns(["line"]).to_pandas()["line"]))

        def _strip(df: pd.DataFrame) -> pd.DataFrame:
            bl = ray.get(ref)
            ids, texts = [], []
            for i, t in zip(df[id_col], df[text_col].fillna("")):
                kept_lines = [ln for ln in t.split("\n")
                              if ln == "" or ln not in bl]
                if kept_lines:          # all-boilerplate docs drop out
                    ids.append(i)
                    texts.append("\n".join(kept_lines))
            return pd.DataFrame({id_col: ids, text_col: texts})

        return ds.map_batches(_strip, batch_format="pandas")

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col]].copy()
        out["line"] = df[text_col].fillna("").str.split("\n")
        out = out.explode("line")
        out["line"] = out["line"].fillna("")
        out["line_no"] = out.groupby(level=0).cumcount()
        return out.reset_index(drop=True)

    exploded = ds.map_batches(_explode, batch_format="pandas")
    joined = exploded.join(
        boiler, join_type="left_outer", num_partitions=num_partitions,
        on=("line",), right_on=("line",),
    )
    kept = joined.map_batches(
        lambda b: b.filter(pc.is_null(b.column("_boiler"))),
        batch_format="pyarrow",
    )

    def _rebuild(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("line_no")
        return pd.DataFrame({
            id_col: [df[id_col].iloc[0]],
            text_col: ["\n".join(df["line"])],
        })

    return kept.groupby(id_col).map_groups(_rebuild, batch_format="pandas")


# ---------------------------------------------------------------------------
# Exact-substring duplication (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — the ExactSubstr criterion, expressed as a
# shingle-hash pipeline instead of a distributed suffix array)
# ---------------------------------------------------------------------------

#: two independent odd multipliers -> two 64-bit polynomial rolling-hash
#: lanes = a 128-bit shingle key; odd => invertible mod 2^64, so the
#: prefix-sum window trick below stays exact under uint64 wraparound
_RH_A1 = 0x9E3779B97F4A7C15
_RH_A2 = 0xC2B2AE3D27D4EB4F
_RH_INV1 = pow(_RH_A1, -1, 1 << 64)
_RH_INV2 = pow(_RH_A2, -1, 1 << 64)


def _rolling_windows(h: np.ndarray, k: int, a: int, inv_a: int) -> np.ndarray:
    """All k-window polynomial hashes of ``h`` (uint64, mod 2^64), O(n).

    ``w[i] = sum_j h[i+j] * a^j`` computed as ``(p[i+k] - p[i]) * a^-i`` over
    the prefix sums ``p`` of ``h * a^pos`` — everything vectorized numpy
    uint64 wraparound arithmetic, no Python loop.
    """
    n = len(h)
    a64, inv64 = np.uint64(a), np.uint64(inv_a)
    pows = np.ones(n, dtype=np.uint64)
    np.cumprod(np.full(n, a64, dtype=np.uint64), out=pows)
    pows = np.concatenate(([np.uint64(1)], pows[:-1]))
    inv_pows = np.ones(n - k + 1, dtype=np.uint64)
    if n - k + 1 > 1:
        np.cumprod(np.full(n - k + 1, inv64, dtype=np.uint64), out=inv_pows)
        inv_pows = np.concatenate(([np.uint64(1)], inv_pows[:-1]))
    prefix = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(h * pows, out=prefix[1:])
    return (prefix[k:] - prefix[: n - k + 1]) * inv_pows


def _tok_split(t, lowercase: bool) -> List[str]:
    t = "" if t is None else t
    return (t.lower() if lowercase else t).split(" ")


def _token_hashes(ts: List[str], cache: dict) -> Tuple[np.ndarray, np.ndarray]:
    import hashlib

    for t in ts:
        if t not in cache:
            d = hashlib.blake2b(t.encode(), digest_size=16).digest()
            cache[t] = (int.from_bytes(d[:8], "little"),
                        int.from_bytes(d[8:], "little"))
    h = np.array([cache[t] for t in ts], dtype=np.uint64)
    return h[:, 0], h[:, 1]


def _shingle_batch(b: pa.Table, text_col: str, id_col: str, k: int,
                   lowercase: bool) -> pa.Table:
    """One (id, pos, d1, d2) row per k-token window of every doc in the batch
    — the shared volume stage of the ExactSubstr family (stats + rewrite)."""
    cache: dict = {}
    ids_out, pos_out, d1_out, d2_out = [], [], [], []
    for rid, txt in zip(b.column(id_col).to_pylist(),
                        b.column(text_col).to_pylist()):
        ts = _tok_split(txt, lowercase)
        n = len(ts)
        if n < k:
            continue
        h1, h2 = _token_hashes(ts, cache)
        # int64 view of the uint64 lanes: bit-identical keys, and
        # Ray's hash shuffle handles int64 natively (uint64 falls back
        # to pickled-object blocks, which breaks the Arrow join)
        d1_out.append(_rolling_windows(h1, k, _RH_A1, _RH_INV1).view(np.int64))
        d2_out.append(_rolling_windows(h2, k, _RH_A2, _RH_INV2).view(np.int64))
        pos_out.append(np.arange(n - k + 1, dtype=np.int64))
        ids_out.append(np.full(n - k + 1, rid))
    if not ids_out:
        return pa.table({
            id_col: pa.array([], b.schema.field(id_col).type),
            "pos": pa.array([], pa.int64()),
            "d1": pa.array([], pa.int64()),
            "d2": pa.array([], pa.int64()),
        })
    return pa.table({
        id_col: pa.array(np.concatenate(ids_out)).cast(
            b.schema.field(id_col).type),
        "pos": pa.array(np.concatenate(pos_out), pa.int64()),
        "d1": pa.array(np.concatenate(d1_out), pa.int64()),
        "d2": pa.array(np.concatenate(d2_out), pa.int64()),
    })


def substring_dup_stats(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    k: int = 8,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-document exact-substring duplication stats at window ``k`` tokens.

    A k-token shingle is *duplicated* if its exact text occurs >= 2 times
    anywhere in the corpus (including inside the same document — Lee et al.'s
    ExactSubstr counts within-doc repeats). Output per doc: ``n_tokens``,
    ``n_dup_shingles`` (duplicated window starts), ``dup_tokens`` (tokens
    covered by the union of duplicated windows) and ``dup_token_fraction``.

    Scale shape: the volume stage emits one 24-byte row per token position
    (id, pos, two uint64 hash lanes — never shingle text); duplicate keys
    come from one ``groupby(d1, d2).count()``; occurrences are recovered by
    an equi-join on the 128-bit key (never a broadcast); window-union
    coverage runs per doc over *duplicated* occurrences only. Tokenization is
    ``lower().split(" ")`` (empties kept) so the DuckDB oracle's
    ``string_split(lower(text), ' ')`` sees identical positions. 128-bit
    keys make a hash collision (a false duplicate) astronomically unlikely;
    the oracle groups by shingle text and agrees on every tested corpus.
    """

    def _tok(t) -> List[str]:
        return _tok_split(t, lowercase=True)

    def _shingles(b: pa.Table) -> pa.Table:
        return _shingle_batch(b, text_col, id_col, k, lowercase=True)

    def _base(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pa.array(
                [len(_tok(t)) for t in b.column(text_col).to_pylist()],
                pa.int64()),
        })

    base = ds.map_batches(_base, batch_format="pyarrow")
    sh = ds.map_batches(_shingles, batch_format="pyarrow").materialize()
    if num_partitions is None:
        # hash-shuffle actor count dominates wall time on small inputs
        # (see _winner_join_partitions); size by the shingle-table bytes
        num_partitions = _winner_join_partitions(sh)

    dup_keys = (
        sh.groupby(["d1", "d2"]).count()
        .map_batches(lambda b: b.rename_columns(["d1", "d2", "cnt"]),
                     batch_format="pyarrow")
        .filter(expr="cnt >= 2")
        .map_batches(lambda b: b.select(["d1", "d2"]), batch_format="pyarrow")
        .materialize()
    )

    if dup_keys.count() == 0:
        def _zeros(b: pa.Table) -> pa.Table:
            z = pa.array(np.zeros(b.num_rows, dtype=np.int64))
            return b.append_column("n_dup_shingles", z).append_column(
                "dup_tokens", z).append_column(
                "dup_token_fraction", pa.array(np.zeros(b.num_rows)))
        return base.map_batches(_zeros, batch_format="pyarrow")

    occ = sh.join(dup_keys, join_type="inner", num_partitions=num_partitions,
                  on=("d1", "d2"))

    def _coverage(df: pd.DataFrame) -> pd.DataFrame:
        starts = np.sort(df["pos"].to_numpy())
        gaps = np.diff(starts)
        covered = int(np.minimum(gaps, k).sum()) + k
        return pd.DataFrame({
            id_col: [df[id_col].iloc[0]],
            "n_dup_shingles": pd.array([len(starts)], dtype="int64"),
            "dup_tokens": pd.array([covered], dtype="int64"),
        })

    from .analytics import ensure_arrow_schema

    # map_groups emits column-less ARROW blocks for empty hash partitions;
    # map_batches (and hence ensure_arrow_schema) never sees 0-column blocks,
    # so a downstream join's key FieldRef crashes on them. repartition()
    # concatenates them away — a cheap split/merge pass over the small
    # (docs-with-dups × 3 ints) table, not an all-to-all.
    # id type from the Arrow shingle stage (ds itself may be pandas-blocked)
    per_doc = ensure_arrow_schema(
        occ.groupby(id_col).map_groups(_coverage, batch_format="pandas"),
        pa.schema([(id_col, sh.schema().base_schema.field(id_col).type),
                   ("n_dup_shingles", pa.int64()),
                   ("dup_tokens", pa.int64())])).repartition(num_partitions)

    joined = base.join(per_doc, join_type="left_outer",
                       num_partitions=num_partitions, on=(id_col,))

    def _finish(b: pa.Table) -> pa.Table:
        nds = pc.fill_null(b.column("n_dup_shingles"), 0)
        cov = pc.fill_null(b.column("dup_tokens"), 0)
        ntok = b.column("n_tokens")
        frac = pc.round(pc.divide(
            pc.cast(cov, pa.float64()),
            pc.cast(pc.max_element_wise(ntok, 1), pa.float64())), 6)
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": ntok,
            "n_dup_shingles": pc.cast(nds, pa.int64()),
            "dup_tokens": pc.cast(cov, pa.int64()),
            "dup_token_fraction": frac,
        })

    return joined.map_batches(_finish, batch_format="pyarrow")


def substring_dedup_rewrite(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    k: int = 8,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Rewrite docs with duplicated k-token spans REMOVED, first occurrence
    kept — the removal half of Lee et al.'s ExactSubstr (the stats half is
    :func:`substring_dup_stats`).

    Rule (deterministic, SQL-checkable): for every shingle text occurring
    >= 2 times corpus-wide, the globally-first occurrence (min
    ``(doc_id, pos)``) is the winner; every other occurrence marks its k
    tokens for deletion. A doc's output text is its surviving tokens joined
    by a single space (possibly ``""``). Tokenization is case-SENSITIVE
    ``split(" ")`` so the rewrite preserves the original token bytes.

    Scale shape: same ids-only shingle volume stage and 128-bit-key shuffle
    as the stats op; the winner per duplicate group is one
    ``groupby.min`` over a packed ``doc_id * 2^32 + pos`` int64 (requires
    integer ids < 2^31, asserted); loser spans join back on the key; token
    deletion runs per doc over its loser spans only.
    """

    def _shingles(b: pa.Table) -> pa.Table:
        ids = b.column(id_col)
        if b.num_rows:
            mx = pc.max(pc.cast(ids, pa.int64())).as_py()
            assert mx is None or 0 <= mx < (1 << 31), "doc id must fit in int32"
        return _shingle_batch(b, text_col, id_col, k, lowercase=False)

    sh = ds.map_batches(_shingles, batch_format="pyarrow").materialize()
    if num_partitions is None:
        num_partitions = _winner_join_partitions(sh)

    dup_keys = (
        sh.groupby(["d1", "d2"]).count()
        .map_batches(lambda b: b.rename_columns(["d1", "d2", "cnt"]),
                     batch_format="pyarrow")
        .filter(expr="cnt >= 2")
        .map_batches(lambda b: b.select(["d1", "d2"]), batch_format="pyarrow")
        .materialize()
    )

    if dup_keys.count() == 0:
        def _ident(b: pa.Table) -> pa.Table:
            return pa.table({id_col: b.column(id_col),
                             text_col: pc.fill_null(
                                 pc.cast(b.column(text_col), pa.string()), "")})
        return ds.map_batches(_ident, batch_format="pyarrow")

    def _pack(b: pa.Table) -> pa.Table:
        packed = pc.add(
            pc.multiply(pc.cast(b.column(id_col), pa.int64()), 1 << 32),
            b.column("pos"))
        return b.append_column("_packed", packed)

    occ = (sh.join(dup_keys, join_type="inner", num_partitions=num_partitions,
                   on=("d1", "d2"))
           .map_batches(_pack, batch_format="pyarrow").materialize())

    from .analytics import ensure_arrow_schema

    # hash aggregates emit column-less blocks for empty partitions; pin the
    # schema and repartition them away before the join (ray-data-gotchas)
    winners = ensure_arrow_schema(
        occ.map_batches(lambda b: b.select(["d1", "d2", "_packed"]),
                        batch_format="pyarrow")
        .groupby(["d1", "d2"]).min("_packed")
        .map_batches(lambda b: b.rename_columns(["d1", "d2", "_w"]),
                     batch_format="pyarrow"),
        pa.schema([("d1", pa.int64()), ("d2", pa.int64()),
                   ("_w", pa.int64())])).repartition(num_partitions)

    losers = (occ.join(winners, join_type="inner",
                       num_partitions=num_partitions, on=("d1", "d2"))
              .map_batches(
                  lambda b: b.filter(pc.not_equal(b.column("_packed"),
                                                  b.column("_w")))
                             .select([id_col, "pos"]),
                  batch_format="pyarrow"))

    def _spans(df: pd.DataFrame) -> pd.DataFrame:
        # comma-joined string: Acero joins reject list-typed payload columns
        starts = ",".join(map(str, np.sort(df["pos"].to_numpy()).tolist()))
        return pd.DataFrame({
            id_col: [df[id_col].iloc[0]],
            "_starts": [starts],
        })

    per_doc = ensure_arrow_schema(
        losers.groupby(id_col).map_groups(_spans, batch_format="pandas"),
        pa.schema([(id_col, sh.schema().base_schema.field(id_col).type),
                   ("_starts", pa.string())])).repartition(num_partitions)

    joined = ds.map_batches(
        lambda b: pa.table({id_col: b.column(id_col),
                            text_col: pc.fill_null(
                                pc.cast(b.column(text_col), pa.string()), "")}),
        batch_format="pyarrow",
    ).join(per_doc, join_type="left_outer", num_partitions=num_partitions,
           on=(id_col,))

    def _rewrite(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        starts_col = b.column("_starts").to_pylist()
        out = []
        for txt, starts in zip(texts, starts_col):
            if not starts:
                out.append(txt)
                continue
            ts = txt.split(" ")
            drop = np.zeros(len(ts), dtype=bool)
            for st in map(int, starts.split(",")):
                drop[st:st + k] = True
            out.append(" ".join(t for t, d in zip(ts, drop) if not d))
        return pa.table({id_col: b.column(id_col),
                         text_col: pa.array(out, pa.string())})

    return joined.map_batches(_rewrite, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Benchmark decontamination (GPT-3 appendix C / The Pile style): flag or drop
# corpus documents that share any exact k-token shingle with a benchmark set.
# Not in the reference (it has no corpus ops at all); standard LM-corpus
# hygiene. Reuses the ExactSubstr two-lane rolling-hash volume machinery.
# ---------------------------------------------------------------------------

#: auto-plan cutover: above this many distinct benchmark shingles the
#: driver-gathered broadcast set would not hold and the shuffle join runs
BENCH_BROADCAST_LIMIT = 5_000_000


def _pair_membership(qd1: np.ndarray, qd2: np.ndarray,
                     bd1: np.ndarray, bd2: np.ndarray) -> np.ndarray:
    """Exact vectorized membership of (qd1, qd2) pairs in the lexsorted
    benchmark pair table (bd1, bd2) — both int64 views of the uint64 hash
    lanes, compared with one consistent ordering on both sides.

    searchsorted on lane 1 finds the d1-run; run-length-1 (the overwhelming
    case: 128-bit keys rarely share a lane value) resolves with one gather;
    longer runs binary-search lane 2 inside the run. No Python set, no
    per-row hashing.
    """
    if len(bd1) == 0 or len(qd1) == 0:
        return np.zeros(len(qd1), dtype=bool)
    lo = np.searchsorted(bd1, qd1, side="left")
    hi = np.searchsorted(bd1, qd1, side="right")
    out = np.zeros(len(qd1), dtype=bool)
    width = hi - lo
    single = width == 1
    if single.any():
        out[single] = bd2[lo[single]] == qd2[single]
    for i in np.nonzero(width > 1)[0]:
        s, e = int(lo[i]), int(hi[i])
        j = int(np.searchsorted(bd2[s:e], qd2[i]))
        out[i] = j < e - s and bd2[s + j] == qd2[i]
    return out


def _bench_shingle_keys(benchmark: ray.data.Dataset, text_col: str,
                        id_col: str, k: int) -> ray.data.Dataset:
    """Distinct (d1, d2) 128-bit shingle keys of the benchmark set."""
    from .analytics import ensure_arrow_schema

    sh = benchmark.map_batches(
        lambda b: _shingle_batch(b, text_col, id_col, k, lowercase=True),
        batch_format="pyarrow")
    keys = (
        sh.groupby(["d1", "d2"]).count()
        .map_batches(lambda b: b.select(["d1", "d2"])
                     if b.num_columns else b, batch_format="pyarrow")
    )
    # an empty benchmark aggregates to column-less blocks; pin the schema so
    # both the broadcast gather and the join key FieldRefs stay valid
    return ensure_arrow_schema(
        keys, pa.schema([("d1", pa.int64()), ("d2", pa.int64())]))


def contamination_stats(
    ds: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    text_col: str,
    id_col: str,
    k: int = 8,
    bench_text_col: Optional[str] = None,
    bench_id_col: Optional[str] = None,
    plan: str = "auto",
    broadcast_max_keys: int = BENCH_BROADCAST_LIMIT,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-document benchmark-overlap stats at window ``k`` tokens.

    A corpus document is *contaminated* if any exact k-token shingle of its
    lowercased text occurs anywhere in ``benchmark``. Output per corpus doc:
    ``n_tokens``, ``n_hit_shingles`` (count of its window starts whose
    shingle appears in the benchmark) and ``contaminated``.

    Physical plans:

    - ``broadcast`` (default when the benchmark's distinct-shingle count fits
      ``broadcast_max_keys``): the benchmark's distinct 128-bit keys are
      lexsorted once, ``ray.put`` once (two zero-copy int64 numpy lanes), and
      every corpus batch resolves membership with vectorized searchsorted —
      ONE streaming pass over the corpus, zero shuffles.
    - ``join`` (the scale path): corpus shingles melt to (id, d1, d2) rows
      and inner-join the benchmark key table on the 128-bit key — ids-only
      exchange, never shingle text — then ``groupby(id).count()`` and a
      left join back onto per-doc token counts.

    Tokenization is ``lower().split(" ")`` (empties kept), identical to
    ``substring_dup_stats``, so the DuckDB oracle's
    ``string_split(lower(text), ' ')`` sees the same positions.
    """
    bench_text_col = bench_text_col or text_col
    bench_id_col = bench_id_col or id_col
    bkeys = _bench_shingle_keys(benchmark, bench_text_col, bench_id_col, k)

    # one count of the SMALL side settles both the auto plan choice and the
    # empty-benchmark degenerate case (whose aggregate emits column-less
    # blocks that no downstream key reference survives)
    bkeys = bkeys.materialize()
    n_keys = bkeys.count()
    if plan == "auto":
        plan = "broadcast" if n_keys <= broadcast_max_keys else "join"

    def _base(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pa.array(
                [len(_tok_split(t, True))
                 for t in b.column(text_col).to_pylist()], pa.int64()),
        })

    if n_keys == 0:
        def _clean(b: pa.Table) -> pa.Table:
            base = _base(b)
            z = pa.array(np.zeros(b.num_rows, dtype=np.int64))
            return base.append_column("n_hit_shingles", z).append_column(
                "contaminated", pa.array(np.zeros(b.num_rows, dtype=bool)))
        return ds.map_batches(_clean, batch_format="pyarrow")

    if plan == "broadcast":
        kdf = bkeys.to_pandas()
        bd1 = kdf["d1"].to_numpy(dtype=np.int64, copy=True)
        bd2 = kdf["d2"].to_numpy(dtype=np.int64, copy=True)
        order = np.lexsort((bd2, bd1))
        ref = ray.put((np.ascontiguousarray(bd1[order]),
                       np.ascontiguousarray(bd2[order])))

        def _flag(b: pa.Table) -> pa.Table:
            bd1s, bd2s = ray.get(ref)
            cache: dict = {}
            nhits = np.zeros(b.num_rows, dtype=np.int64)
            ntoks = np.zeros(b.num_rows, dtype=np.int64)
            for i, txt in enumerate(b.column(text_col).to_pylist()):
                ts = _tok_split(txt, True)
                ntoks[i] = len(ts)
                if len(ts) < k:
                    continue
                h1, h2 = _token_hashes(ts, cache)
                w1 = _rolling_windows(h1, k, _RH_A1, _RH_INV1).view(np.int64)
                w2 = _rolling_windows(h2, k, _RH_A2, _RH_INV2).view(np.int64)
                nhits[i] = int(_pair_membership(w1, w2, bd1s, bd2s).sum())
            return pa.table({
                id_col: b.column(id_col),
                "n_tokens": pa.array(ntoks),
                "n_hit_shingles": pa.array(nhits),
                "contaminated": pa.array(nhits > 0),
            })

        return ds.map_batches(_flag, batch_format="pyarrow")

    if plan != "join":
        raise ValueError(f"unknown plan {plan!r}")

    sh = ds.map_batches(
        lambda b: _shingle_batch(b, text_col, id_col, k, lowercase=True),
        batch_format="pyarrow").materialize()
    if num_partitions is None:
        num_partitions = _winner_join_partitions(sh)
    hits = (
        sh.join(bkeys, join_type="inner", num_partitions=num_partitions,
                on=("d1", "d2"))
        .groupby(id_col).count()
        .map_batches(lambda b: b.rename_columns([id_col, "n_hit_shingles"]),
                     batch_format="pyarrow")
    )
    from .analytics import ensure_arrow_schema

    id_type = sh.schema().base_schema.field(id_col).type
    hits = ensure_arrow_schema(
        hits, pa.schema([(id_col, id_type), ("n_hit_shingles", pa.int64())]))
    base = ds.map_batches(_base, batch_format="pyarrow")
    joined = base.join(hits, join_type="left_outer",
                       num_partitions=num_partitions, on=(id_col,))

    def _finish(b: pa.Table) -> pa.Table:
        nh = pc.cast(pc.fill_null(b.column("n_hit_shingles"), 0), pa.int64())
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": b.column("n_tokens"),
            "n_hit_shingles": nh,
            "contaminated": pc.greater(nh, 0),
        })

    return joined.map_batches(_finish, batch_format="pyarrow")


def overlap_contamination(
    ds: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    text_col: str,
    id_col: str,
    k: int = 8,
    frac: float = 0.7,
    **kwargs,
) -> ray.data.Dataset:
    """PaLM-style overlap-FRACTION contamination (Chowdhery et al. 2022
    App. D — "70% of 8-grams seen at least once in training"): a document is
    dropped when at least ``frac`` of its k-token windows hit the benchmark
    shingle set, rather than on ANY single hit (the GPT-3 App. C rule of
    :func:`contamination_stats`).

    Built entirely on :func:`contamination_stats` (same plan auto-selection,
    same scale shape) plus one stateless batch map. The threshold compare is
    EXACT integer arithmetic — ``n_hit * 10^6 >= round(frac*10^6) *
    n_windows`` — so there is no float rounding to diverge from a SQL oracle.
    Output: ``(id_col, n_tokens, n_windows, n_hit_shingles, dropped)``;
    zero-window docs (< k tokens) are never dropped.
    """
    stats = contamination_stats(ds, benchmark, text_col, id_col, k=k,
                                **kwargs)
    fnum = int(round(frac * 1_000_000))

    def _flag(b: pa.Table) -> pa.Table:
        ntok = b.column("n_tokens").to_numpy(zero_copy_only=False)
        nhit = b.column("n_hit_shingles").to_numpy(zero_copy_only=False)
        nwin = np.maximum(ntok - k + 1, 0)
        dropped = (nwin > 0) & (nhit * 1_000_000 >= fnum * nwin)
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": b.column("n_tokens"),
            "n_windows": pa.array(nwin, pa.int64()),
            "n_hit_shingles": b.column("n_hit_shingles"),
            "dropped": pa.array(dropped),
        })

    return stats.map_batches(_flag, batch_format="pyarrow")


def decontaminate(
    ds: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    text_col: str,
    id_col: str,
    k: int = 8,
    **kwargs,
) -> ray.data.Dataset:
    """The surviving corpus: documents sharing NO exact k-token shingle with
    the benchmark set, original columns preserved. Stats plan selection and
    scale shape as in :func:`contamination_stats`."""
    stats = contamination_stats(ds, benchmark, text_col, id_col, k=k, **kwargs)
    keep = stats.filter(expr="contaminated == False").select_columns([id_col])
    n_parts = _winner_join_partitions(keep)
    from .analytics import ensure_arrow_schema

    keep = ensure_arrow_schema(
        keep, pa.schema([(id_col, stats.schema().base_schema
                          .field(id_col).type)]))
    # parquet-read corpora carry pandas schema metadata that Ray's hash
    # shuffle can't hash — strip it before the join
    clean = ds.map_batches(lambda b: b.replace_schema_metadata(None),
                           batch_format="pyarrow")
    return clean.join(keep, join_type="inner", num_partitions=n_parts,
                      on=(id_col,))


def decontaminate_spans(
    ds: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    text_col: str,
    id_col: str,
    k: int = 8,
    buffer: int = 0,
    bench_text_col: Optional[str] = None,
    bench_id_col: Optional[str] = None,
    plan: str = "auto",
    broadcast_max_keys: int = BENCH_BROADCAST_LIMIT,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """SPAN-level decontamination (Llama-2-style, Touvron et al. 2023 A.6):
    instead of dropping a contaminated document wholesale
    (:func:`decontaminate`), only the tokens covered by a benchmark-hit
    k-token window — extended ``buffer`` tokens on each side — are deleted;
    the rest of the document survives. The high-precision variant when the
    corpus is scarce or the contamination is a quoted snippet inside an
    otherwise-clean page.

    Rule (deterministic, SQL-checkable): matching is on lowercased
    ``split(" ")`` shingles (exactly :func:`contamination_stats`'s
    tokenization, empties kept); a hit at window start ``p`` marks original
    tokens ``[max(p-buffer, 0), p+k+buffer)`` for deletion; output text is
    the surviving ORIGINAL-case tokens joined by a single space (possibly
    ``""``). Docs with fewer than ``k`` tokens are never touched.

    Physical plans mirror :func:`contamination_stats`: ``broadcast`` (the
    lexsorted 128-bit benchmark key lanes ship once via ``ray.put``; one
    streaming corpus pass, zero shuffles); ``join`` (corpus shingles melt to
    ids+positions, inner-join the key table, hit positions re-group per doc
    and join back — the ExactSubstr-rewrite exchange shape, ids/positions
    only, never text).

    Output: ``(id_col, text_col, n_tokens, n_removed)``.
    """
    if buffer < 0:
        raise ValueError("buffer must be >= 0")
    bench_text_col = bench_text_col or text_col
    bench_id_col = bench_id_col or id_col
    bkeys = _bench_shingle_keys(benchmark, bench_text_col, bench_id_col, k)
    bkeys = bkeys.materialize()
    n_keys = bkeys.count()
    if plan == "auto":
        plan = "broadcast" if n_keys <= broadcast_max_keys else "join"

    def _cut(ts_orig: List[str], starts: np.ndarray) -> Tuple[str, int]:
        """Delete buffered k-windows at ``starts`` from the original tokens."""
        n = len(ts_orig)
        d = np.zeros(n + 1, dtype=np.int64)
        np.add.at(d, np.maximum(starts - buffer, 0), 1)
        np.add.at(d, np.minimum(starts + k + buffer, n), -1)
        drop = np.cumsum(d[:-1]) > 0
        kept = " ".join(t for t, x in zip(ts_orig, drop) if not x)
        return kept, int(drop.sum())

    if n_keys == 0 or plan == "broadcast":
        if n_keys:
            kdf = bkeys.to_pandas()
            bd1 = kdf["d1"].to_numpy(dtype=np.int64, copy=True)
            bd2 = kdf["d2"].to_numpy(dtype=np.int64, copy=True)
            order = np.lexsort((bd2, bd1))
            ref = ray.put((np.ascontiguousarray(bd1[order]),
                           np.ascontiguousarray(bd2[order])))
        else:
            ref = None

        def _rewrite_bc(b: pa.Table) -> pa.Table:
            lanes = ray.get(ref) if ref is not None else None
            cache: dict = {}
            texts, ntoks, nrem = [], [], []
            for txt in b.column(text_col).to_pylist():
                ts_orig = _tok_split(txt, False)
                ntoks.append(len(ts_orig))
                if lanes is None or len(ts_orig) < k:
                    texts.append(" ".join(ts_orig))
                    nrem.append(0)
                    continue
                h1, h2 = _token_hashes(_tok_split(txt, True), cache)
                w1 = _rolling_windows(h1, k, _RH_A1, _RH_INV1).view(np.int64)
                w2 = _rolling_windows(h2, k, _RH_A2, _RH_INV2).view(np.int64)
                hit = _pair_membership(w1, w2, lanes[0], lanes[1])
                if not hit.any():
                    texts.append(" ".join(ts_orig))
                    nrem.append(0)
                    continue
                kept, removed = _cut(ts_orig, np.nonzero(hit)[0])
                texts.append(kept)
                nrem.append(removed)
            return pa.table({
                id_col: b.column(id_col),
                text_col: pa.array(texts, pa.string()),
                "n_tokens": pa.array(ntoks, pa.int64()),
                "n_removed": pa.array(nrem, pa.int64()),
            })

        return ds.map_batches(_rewrite_bc, batch_format="pyarrow")

    if plan != "join":
        raise ValueError(f"unknown plan {plan!r}")

    from .analytics import ensure_arrow_schema

    sh = ds.map_batches(
        lambda b: _shingle_batch(b, text_col, id_col, k, lowercase=True),
        batch_format="pyarrow").materialize()
    if num_partitions is None:
        num_partitions = _winner_join_partitions(sh)
    hits = (sh.join(bkeys, join_type="inner", num_partitions=num_partitions,
                    on=("d1", "d2"))
            .map_batches(lambda b: b.select([id_col, "pos"]),
                         batch_format="pyarrow"))

    def _starts(df: pd.DataFrame) -> pd.DataFrame:
        csv = ",".join(map(str, np.sort(df["pos"].to_numpy()).tolist()))
        return pd.DataFrame({id_col: [df[id_col].iloc[0]], "_starts": [csv]})

    id_type = sh.schema().base_schema.field(id_col).type
    per_doc = ensure_arrow_schema(
        hits.groupby(id_col).map_groups(_starts, batch_format="pandas"),
        pa.schema([(id_col, id_type),
                   ("_starts", pa.string())])).repartition(num_partitions)
    base = ds.map_batches(
        lambda b: pa.table({id_col: b.column(id_col),
                            text_col: pc.fill_null(
                                pc.cast(b.column(text_col), pa.string()), "")}),
        batch_format="pyarrow")
    joined = base.join(per_doc, join_type="left_outer",
                       num_partitions=num_partitions, on=(id_col,))

    def _rewrite_join(b: pa.Table) -> pa.Table:
        texts, ntoks, nrem = [], [], []
        for txt, csv in zip(b.column(text_col).to_pylist(),
                            b.column("_starts").to_pylist()):
            ts_orig = ("" if txt is None else txt).split(" ")
            ntoks.append(len(ts_orig))
            if not csv:
                texts.append(" ".join(ts_orig))
                nrem.append(0)
                continue
            starts = np.fromiter(map(int, csv.split(",")), dtype=np.int64)
            kept, removed = _cut(ts_orig, starts)
            texts.append(kept)
            nrem.append(removed)
        return pa.table({
            id_col: b.column(id_col),
            text_col: pa.array(texts, pa.string()),
            "n_tokens": pa.array(ntoks, pa.int64()),
            "n_removed": pa.array(nrem, pa.int64()),
        })

    return joined.map_batches(_rewrite_join, batch_format="pyarrow")


def jaccard_join_exact(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    max_group: int = 1000,
) -> ray.data.Dataset:
    """EXACT word-token Jaccard self-join via prefix filtering (Chaudhuri et
    al. 2006 / Bayardo et al. 2007): every pair with
    ``jaccard(tokens(a), tokens(b)) >= threshold`` is emitted — COMPLETE, no
    false negatives, unlike the LSH-blocked :func:`ngram_jaccard_pairs`
    (recall's exactness is pinned by a brute-force completeness test).

    Candidate generation: each doc's distinct tokens are ranked by a FIXED
    global order (blake2b hash — consistency is all the prefix lemma needs,
    so there is no document-frequency table to build or broadcast) and only
    the first ``p = s - ceil(t*s) + 1`` tokens enter the exchange as
    (token-hash, id) rows; any qualifying pair must collide on at least one
    prefix bucket. Buckets, pairing, dedup and the candidate-bounded verify
    broadcast reuse the LSH machinery (ids-only shuffle, hot-bucket
    prefilter). ``max_group`` truncation (logged) is the one documented
    completeness cap for pathological hot prefixes. Tokenization is
    ``lower().split(" ")`` with empties dropped.

    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    import hashlib
    import math as _math

    thr = float(threshold)
    if not (0.0 < thr <= 1.0):
        raise ValueError("threshold must be in (0, 1]")

    def _prefix(batch: pa.Table) -> pa.Table:
        cache: Dict[str, int] = {}
        ids_out, bkt_out = [], []
        for rid, txt in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
            ts = {t for t in ("" if txt is None else txt).lower().split(" ")
                  if t}
            s = len(ts)
            if s == 0:
                continue
            hs = []
            for t in ts:
                h = cache.get(t)
                if h is None:
                    h = int.from_bytes(
                        hashlib.blake2b(t.encode(), digest_size=8).digest(),
                        "little") >> 1  # non-negative int64
                    cache[t] = h
                hs.append(h)
            hs.sort()
            p = s - int(_math.ceil(thr * s)) + 1
            bkt_out.extend(hs[:p])
            ids_out.extend([rid] * p)
        return pa.table({
            "bucket": pa.array(bkt_out, pa.int64()),
            id_col: pa.array(ids_out, batch.schema.field(id_col).type),
        })

    melted = ds.select_columns([id_col, text_col]).map_batches(
        _prefix, batch_format="pyarrow")
    pairs = _bucket_candidate_pairs(melted, "bucket", id_col, max_group,
                                    stage="jaccard_prefix").materialize()
    _metrics.log_truncation_summary("jaccard_prefix")

    cand_ids = _candidate_id_set(pairs)
    texts_ref = ray.put({
        r[0]: r[1]
        for b in _semi_join_ids_arrow(
            ds.select_columns([id_col, text_col]), id_col, cand_ids
        ).iter_batches(batch_format="pyarrow")
        for r in zip(b.column(id_col).to_pylist(),
                     b.column(text_col).to_pylist())
    })

    class _VerifyState:
        def __init__(self):
            self.texts = ray.get(texts_ref)
            self.sets: Dict = {}

        def _ts(self, i):
            s = self.sets.get(i)
            if s is None:
                s = {t for t in (self.texts.get(i) or "").lower().split(" ")
                     if t}
                self.sets[i] = s
            return s

    vkey = ("jaccard-exact-verify", texts_ref.hex())

    def _verify(batch: pa.Table) -> pa.Table:
        from .matching import _worker_state

        st = _worker_state(vkey, _VerifyState)
        a = batch.column("id_a").to_pylist()
        b = batch.column("id_b").to_pylist()
        jac = []
        for x, y in zip(a, b):
            sa, sb = st._ts(x), st._ts(y)
            u = len(sa | sb)
            jac.append(len(sa & sb) / u if u else 0.0)
        out = pa.table({
            "id_a": batch.column("id_a"),
            "id_b": batch.column("id_b"),
            "jaccard": pa.array(np.round(np.asarray(jac), 6), pa.float64()),
        })
        return out.filter(pc.greater_equal(out.column("jaccard"), thr))

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    return _distinct_pairs_with_value(
        pairs.map_batches(_verify, batch_format="pyarrow"),
        "jaccard", id_type).materialize()
