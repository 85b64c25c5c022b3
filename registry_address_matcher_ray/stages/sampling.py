"""Training-data sampling & splitting operators.

The reference pipeline has no dataset-split stage (it is a one-shot matcher,
SURVEY.md §0); a training-data engine at 100 TB needs deterministic,
shuffle-free splits and samples. Everything here is a stateless
``map_batches`` filter keyed on a cryptographic hash of a stable id — no
randomness, no global pass, identical output at any parallelism, and each
operator has an exact DuckDB oracle (``md5()`` hex-prefix thresholds compare
identically as strings on both sides).

- :func:`hash_split` — train/val/test assignment by md5(id) hex prefix.
- :func:`stratified_hash_sample` — keep ~frac of rows; because the hash is
  uniform and independent of any column, the rate holds within every stratum
  without a per-stratum pass.
- :func:`per_key_topn` — bounded per-key retention (e.g. "at most N docs per
  domain"): per-batch partial top-n combiner, then a final per-key top-n —
  the shuffle moves O(keys × n) rows, not the full table.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

__all__ = ["hash_split", "stratified_hash_sample", "per_key_topn",
           "pack_shuffled"]


_DUCK_KERNEL = None


def _duck():
    """Per-worker-process cached DuckDB connection used as a VECTORIZED md5
    kernel (~4x the per-row ``hashlib`` loop at 2M rows; same bit-exact
    digests, measured parity in tests/test_sampling.py). ``threads=1``:
    parallelism belongs to Ray's task/actor pool, not the kernel — a Ray
    worker holding 1 CPU must not fan out its own thread pool."""
    global _DUCK_KERNEL
    if _DUCK_KERNEL is None:
        import duckdb

        _DUCK_KERNEL = duckdb.connect()
        _DUCK_KERNEL.execute("SET threads=1")
    return _DUCK_KERNEL


def _as_str_array(values):
    """Values (Arrow column or Python sequence) -> Arrow string array with
    ``str(v)`` semantics (nulls -> 'None', ints -> decimal digits). The
    zero-copy Arrow path is taken ONLY for string/int types, where the cast
    provably equals ``str(v)``; floats/bools/timestamps render differently
    under Arrow/DuckDB casts ('2' vs '2.0', 'true' vs 'True'), so those fall
    back to the Python formatter to keep md5 keys identical across the
    kernel and the hashlib path (pytest-pinned)."""
    import pyarrow.compute as pc

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_string(values.type):
            return pc.fill_null(values, "None")
        if pa.types.is_integer(values.type):
            return pc.fill_null(pc.cast(values, pa.string()), "None")
        values = values.to_pylist()
    return pa.array([str(v) for v in values], pa.string())


def _md5_expr(values, expr: str) -> pa.ChunkedArray:
    """Evaluate a single md5-based SQL expression over ``values`` (bound as
    column ``s``), order-preserving (threads=1 + insertion-order scan)."""
    t_md5_in = pa.table({"s": _as_str_array(values)})
    con = _duck()
    con.register("t_md5_in", t_md5_in)
    try:
        out = con.execute(f"SELECT {expr} AS h FROM t_md5_in").arrow()
    finally:
        con.unregister("t_md5_in")
    return out.column("h")


def _md5_prefix4(values) -> List[str]:
    # vectorized md5 inside the task, never on the driver; bit-identical to
    # the pure-python fallback [md5(str(v)).hexdigest()[:4] for v in values]
    try:
        return _md5_expr(values, "substr(md5(s), 1, 4)").to_pylist()
    except ImportError:
        return [hashlib.md5(str(v).encode()).hexdigest()[:4] for v in values]


def _md5_uniform(values) -> np.ndarray:
    """Deterministic uniform in [0, 1) per value: last 8 md5 digest bytes
    little-endian / 2^64 — MUST stay bit-identical to the DuckDB oracle
    expression ``md5_number_lower(CAST(v AS VARCHAR)) / 2^64`` (the one
    determinism contract shared by weighted_sample / temperature_sample).
    Evaluated BY that DuckDB kernel, so engine and oracle share the code
    path; the hashlib fallback is pinned bit-equal in tests."""
    try:
        w = _md5_expr(values, "md5_number_lower(s)").to_numpy()
        return w.astype(np.float64) / float(1 << 64)
    except ImportError:
        return np.array(
            [int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:],
                            "little")
             for v in values],
            dtype=np.float64) / float(1 << 64)


def hash_split(
    ds: ray.data.Dataset,
    id_col: str,
    boundaries: Sequence[Tuple[str, str]] = (("train", "cccc"), ("val", "e666")),
    rest_label: str = "test",
    out_col: str = "split",
) -> ray.data.Dataset:
    """Assign every row a deterministic split label from ``md5(id)``.

    ``boundaries`` are (label, hex-upper-bound) pairs over the first 4 hex
    chars of the digest, checked in order; rows above all bounds get
    ``rest_label``. Defaults give ~80/10/10. Oracle:
    ``CASE WHEN substr(md5(CAST(id AS VARCHAR)),1,4) < 'cccc' ...``.
    """

    def _assign(batch: pa.Table) -> pa.Table:
        h = _md5_prefix4(batch.column(id_col))
        labels = []
        for hx in h:
            for lab, bound in boundaries:
                if hx < bound:
                    labels.append(lab)
                    break
            else:
                labels.append(rest_label)
        return pa.table({id_col: batch.column(id_col),
                         out_col: pa.array(labels, pa.string())})

    return ds.select_columns([id_col]).map_batches(_assign, batch_format="pyarrow")


def stratified_hash_sample(
    ds: ray.data.Dataset,
    id_col: str,
    max_hex: str = "1999",
) -> ray.data.Dataset:
    """Keep rows with ``md5(id)[:4] < max_hex`` (default ~10%) — a
    deterministic uniform sample whose rate holds inside every stratum
    (the hash is independent of all payload columns). Pure per-batch filter:
    no shuffle, no state, reproducible across runs and parallelism levels.
    """

    def _filter(batch: pa.Table) -> pa.Table:
        h = _md5_prefix4(batch.column(id_col))
        mask = pa.array([x < max_hex for x in h], pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")


def per_key_topn(
    ds: ray.data.Dataset,
    key_col: str,
    order_by: Sequence[Tuple[str, bool]],
    n: int,
    columns: Sequence[str] | None = None,
) -> ray.data.Dataset:
    """At most ``n`` rows per key, picked by ``order_by`` ((col, descending)
    pairs; later columns break ties — make the last one a unique id so the
    result is deterministic).

    Two-phase: each batch first reduces locally to its own per-key top-n
    (vectorized pandas sort + groupby.head), so the groupby shuffle then moves
    at most ``n`` rows per (key, batch) instead of the whole table; the final
    per-key task re-applies the same top-n. Skew-safe: a hot key contributes
    ``n`` rows per upstream batch, bounding the largest group at
    ``n × num_batches`` rather than the key's full row count.
    """
    cols = list(columns) if columns else None
    if cols and key_col not in cols:
        cols = [key_col] + cols
    sort_cols = [c for c, _ in order_by]
    ascending = [not d for _, d in order_by]

    def _local_topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        return g.groupby(key_col, sort=False).head(n)

    proj = ds.select_columns(cols) if cols else ds
    partial = proj.map_batches(_local_topn, batch_format="pandas")
    return partial.groupby(key_col).map_groups(_local_topn, batch_format="pandas")


def chunk_documents(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    chunk_tokens: int = 40,
    overlap: int = 8,
) -> "ray.data.Dataset":
    """Split docs into fixed-token training chunks with overlap — the
    standard LM-corpus prep step (context-window packing input). Chunk
    starts step by ``chunk_tokens - overlap``; the final chunk is the first
    one reaching the doc's end (no trailing fragment that would duplicate
    only overlap tokens). Every doc yields >= 1 chunk; tokenization is
    case-sensitive ``split(" ")`` so chunks keep original bytes and the
    DuckDB oracle slices the same positions.

    Output: ``(id_col, chunk_id, text, n_tokens)``. Stateless per-row
    flat-map — no shuffle at any scale.
    """
    import numpy as np
    import pyarrow as pa

    step = chunk_tokens - overlap
    assert step > 0, "overlap must be smaller than chunk_tokens"

    def _chunks(batch: pa.Table) -> pa.Table:
        ids_out, cid_out, txt_out, n_out = [], [], [], []
        for rid, txt in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
            ts = ("" if txt is None else txt).split(" ")
            n = len(ts)
            m = 1 + int(np.ceil(max(0, n - chunk_tokens) / step))
            for i in range(m):
                s = i * step
                piece = ts[s:s + chunk_tokens]
                ids_out.append(rid)
                cid_out.append(i)
                txt_out.append(" ".join(piece))
                n_out.append(len(piece))
        return pa.table({
            id_col: pa.array(ids_out, batch.schema.field(id_col).type),
            "chunk_id": pa.array(cid_out, pa.int64()),
            "text": pa.array(txt_out, pa.string()),
            "n_tokens": pa.array(n_out, pa.int64()),
        })

    return ds.map_batches(_chunks, batch_format="pyarrow")


def source_mix(
    ds: "ray.data.Dataset",
    source_col: str,
    id_col: str,
    weights: dict,
    default_weight: float = 1.0,
) -> "ray.data.Dataset":
    """Weighted data mixing: keep ~``weights[source]`` of each source's rows
    (1.0 = all), decided per row by the same deterministic md5(id) hex
    threshold :func:`hash_split` uses — shuffle-free, stratification exact in
    expectation within every source, identical output at any parallelism.
    Oracle: ``substr(md5(CAST(id AS VARCHAR)), 1, 4) < printf('%04x', w*65536)``.
    """
    import pyarrow as pa

    bounds = {s: format(min(65536, int(w * 65536)), "04x")
              for s, w in weights.items()}
    if int(default_weight * 65536) >= 65536:
        default_bound = "zzzz"  # above any hex digest prefix -> keep all
    else:
        default_bound = format(int(default_weight * 65536), "04x")

    def _flt(batch: pa.Table) -> pa.Table:
        hx = _md5_prefix4(batch.column(id_col))
        srcs = batch.column(source_col).to_pylist()
        keep = [h < bounds.get(s, default_bound) for h, s in zip(hx, srcs)]
        return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(_flt, batch_format="pyarrow")


def token_shards(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    budget: int = 10_000,
    counts: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Assign each doc to a token-budget shard: shard = floor(exclusive
    running token count / budget) under ``ORDER BY id`` — how a corpus is
    cut into ~equal-token output files for training. Rides the distributed
    prefix scan (:func:`analytics.global_running_sum`): one sort + an
    O(#blocks) metadata pass, no row ever reaches the driver.

    ``counts`` overrides the default whitespace counting with a precomputed
    ``(id_col, n_tokens)`` dataset — e.g. trained-BPE counts from
    :func:`..stages.tokenizer.bpe_token_counts`, so shards measure the
    tokens the model will actually see.

    Output: ``(id_col, n_tokens, shard)``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .analytics import global_running_sum

    def _ntok(batch: pa.Table) -> pa.Table:
        n = [len(("" if t is None else t).split(" "))
             for t in batch.column(text_col).to_pylist()]
        return pa.table({id_col: batch.column(id_col),
                         "n_tokens": pa.array(n, pa.int64())})

    counted = (counts if counts is not None
               else ds.map_batches(_ntok, batch_format="pyarrow"))
    running = global_running_sum(counted, [id_col], "n_tokens",
                                 out_col="_run", scale=1)

    def _shard(batch: pa.Table) -> pa.Table:
        run = pc.cast(batch.column("_run"), pa.int64())
        excl = pc.subtract(run, batch.column("n_tokens"))
        shard = pc.cast(pc.floor(pc.divide(
            pc.cast(excl, pa.float64()), float(budget))), pa.int64())
        return pa.table({id_col: batch.column(id_col),
                         "n_tokens": batch.column("n_tokens"),
                         "shard": shard})

    return running.map_batches(_shard, batch_format="pyarrow")


def weighted_sample(
    ds: ray.data.Dataset,
    id_col: str,
    weight_col: str,
    k: int,
) -> ray.data.Dataset:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row gets key ``u ** (1/w)`` with ``u`` a fixed
    uniform derived from ``md5(id)`` — the top-k keys are a weighted sample,
    and the fixed uniforms make the draw reproducible AND SQL-checkable
    (DuckDB: ``pow(md5_number_lower(id)/2^64, 1/w)``). This is the DSIR
    resampling step when ``weight_col`` holds ``exp(logratio)``-style
    importance weights.

    Scale shape: the key is a stateless per-batch expression; selection is a
    per-batch local top-k combiner followed by one tiny k-row final merge —
    never a global sort. Rows with weight <= 0 or null are excluded (they
    can never be sampled).
    """
    import pyarrow.compute as pc

    def _key(b: pa.Table) -> pa.Table:
        u = _md5_uniform(b.column(id_col))
        w = np.asarray(b.column(weight_col).to_pandas(), dtype=np.float64)
        valid = np.isfinite(w) & (w > 0.0)
        key = np.where(valid, np.power(u, 1.0 / np.where(valid, w, 1.0)),
                       -1.0)
        t = pa.table({
            id_col: b.column(id_col),
            weight_col: b.column(weight_col),
            "_sk": pa.array(key, pa.float64()),
        }).filter(pa.array(valid))
        if t.num_rows > k:  # local top-k combiner: at most k rows per batch
            order = pc.select_k_unstable(t, k, [("_sk", "descending")])
            t = t.take(order)
        return t

    keyed = ds.select_columns([id_col, weight_col]).map_batches(
        _key, batch_format="pyarrow")
    # final merge over <= k * #batches rows, then drop the key column
    out = keyed.sort(["_sk", id_col], descending=[True, False]).limit(k)
    return out.map_batches(lambda b: b.select([id_col, weight_col]),
                           batch_format="pyarrow")


def temperature_sample(
    ds: ray.data.Dataset,
    source_col: str,
    id_col: str,
    alpha: float = 0.7,
    frac: float = 0.5,
) -> ray.data.Dataset:
    """Temperature-based corpus RESAMPLING — the sampling step that realizes
    ``analytics.temperature_mix``'s weights (Conneau & Lample 2019 §3.1):
    row of source ``s`` is kept with probability ``p_s = min(1, frac * N *
    w_s / c_s)`` where ``w_s = c_s^alpha / sum c^alpha`` — so the expected
    output is ``~frac*N`` rows distributed by the temperature weights
    (exactly, unless a small source saturates at p=1).

    The decision is the deterministic md5-uniform compare of
    :func:`weighted_sample` (``u = md5(id) last-8-bytes LE / 2^64 < p_s``),
    so the draw is reproducible and SQL-checkable. One #sources-row count
    groupby; the retention table is O(#sources) driver floats; the filter
    itself is a stateless streaming pass — no shuffle of the corpus.
    """
    from ray.data.aggregate import Sum

    def _cnt(df) -> "pa.Table":
        vc = df[source_col].value_counts()
        return pa.table({source_col: pa.array(vc.index),
                         "_c": pa.array(vc.to_numpy(), pa.int64())})

    counts = (
        ds.select_columns([source_col])
        .map_batches(_cnt, batch_format="pandas")
        .groupby(source_col)
        .aggregate(Sum("_c", alias_name="n"))
        .to_pandas()
    )
    n = counts["n"].to_numpy(dtype="float64")
    pw = np.power(n, alpha)
    w = pw / pw.sum()
    p = np.minimum(1.0, frac * n.sum() * w / n)
    # key by str(value) on BOTH sides so non-string source columns (ints,
    # categoricals) look up the same retention prob they were counted under
    probs = {str(s): float(v) for s, v in zip(counts[source_col], p)}

    def _keep(b: pa.Table) -> pa.Table:
        u = _md5_uniform(b.column(id_col))
        ps = np.array([probs.get(str(s), 0.0)
                       for s in b.column(source_col).to_pylist()])
        return b.filter(pa.array(u < ps))

    return ds.map_batches(_keep, batch_format="pyarrow")


def global_shuffle(
    ds: ray.data.Dataset,
    id_col: str,
    seed: str = "0",
    pos_col: str = "shuffle_pos",
) -> ray.data.Dataset:
    """Deterministic seeded GLOBAL corpus shuffle — the standard final step
    of a training-data pipeline (dedup/filter stages leave source locality
    in the row order; training needs it destroyed).

    Every row gets ``pos_col`` = its dense 0-based rank under
    ``ORDER BY md5(seed || id), id`` — a seeded pseudo-random permutation
    that is reproducible across runs, machines and parallelism levels, and
    exactly SQL-checkable (DuckDB:
    ``row_number() OVER (ORDER BY md5(seed || CAST(id AS VARCHAR)), id)``).
    The id tiebreak makes the order total even under md5 collisions.

    Scale shape: the ONE all-to-all here is the range-partitioning sort on
    the 32-hex key — exactly the exchange a corpus shuffle requires, no way
    around moving every row once. Rank assignment rides
    :func:`analytics.global_rank`'s O(#blocks) block-offset metadata pass;
    no row-level data reaches the driver. Key material is 32 bytes + ids —
    payload columns ride the same sort exchange exactly once.
    """
    from .analytics import global_rank

    # seed is interpolated into the kernel expression; escape SQL quoting
    seed_sql = "'" + seed.replace("'", "''") + "'"

    def _key(b: pa.Table) -> pa.Table:
        try:
            k = _md5_expr(b.column(id_col), f"md5({seed_sql} || s)")
            k = k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
        except ImportError:
            k = pa.array(
                [hashlib.md5((seed + str(v)).encode()).hexdigest()
                 for v in b.column(id_col).to_pylist()],
                pa.string())
        return b.append_column("_sk", k)

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    ranked = global_rank(keyed, ["_sk", id_col], rank_col=pos_col)
    return ranked.drop_columns(["_sk"])


def shuffled_shards(
    ds: ray.data.Dataset,
    id_col: str,
    seed: str = "0",
    num_shards: int = 8,
    pos_col: str = "shuffle_pos",
) -> ray.data.Dataset:
    """Interleaved training shards over the seeded global shuffle:
    ``shard = pos % num_shards`` (round-robin over the SHUFFLED order, so
    every shard is itself a uniform sample of the corpus with sources
    interleaved) and ``pos_in_shard = pos // num_shards`` (the within-shard
    training order, stable across file fragments). Compose with
    :func:`token_shards` when shards must be ~equal tokens instead of
    ~equal docs."""
    import pyarrow.compute as pc

    out = global_shuffle(ds, id_col, seed, pos_col)

    def _shard(b: pa.Table) -> pa.Table:
        pos = pc.cast(b.column(pos_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        return (b.append_column("shard",
                                pa.array(pos % num_shards, pa.int64()))
                 .append_column("pos_in_shard",
                                pa.array(pos // num_shards, pa.int64())))

    return out.map_batches(_shard, batch_format="pyarrow")


def pack_sequences(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    seq_len: int = 2048,
    shard_budget: int = 1_000_000,
    counts: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Context-window sequence packing: assign each doc (ordered by id) to a
    fixed-``seq_len`` training sequence by NEXT-FIT — a sequence closes when
    the next doc would overflow it; docs longer than ``seq_len`` get a
    sequence of their own (the consumer truncates/splits downstream).

    Next-fit carries sequential state (the current fill), which cannot ride
    a plain prefix scan, so the engine uses the standard corpus-scale shape:
    docs are first cut into ``shard_budget``-token shards (the exact
    prefix-scan :func:`token_shards`), and packing runs INDEPENDENTLY per
    shard via ``groupby(shard).map_groups`` — embarrassingly parallel and
    deterministic at any partitioning. Sequence ids are globally unique and
    reconstructible: ``seq_id = shard * 2^32 + local_seq``. The shard-local
    boundary costs at most one under-filled sequence per shard (bounded,
    documented waste — the same trade every sharded packer makes).

    ``counts`` overrides whitespace token counting (e.g. trained-BPE counts).
    Output: ``(id_col, n_tokens, seq_id, seq_pos)`` with ``seq_pos`` the
    doc's index inside its sequence.
    """
    import pandas as pd
    import pyarrow as pa

    sharded = token_shards(ds, text_col, id_col, budget=shard_budget,
                           counts=counts)

    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        shard = int(g["shard"].iloc[0])
        seq_ids = np.empty(len(g), np.int64)
        seq_pos = np.empty(len(g), np.int64)
        local, fill, pos = 0, 0, 0
        for i, n in enumerate(g["n_tokens"].to_numpy()):
            if fill > 0 and fill + n > seq_len:
                local += 1
                fill, pos = 0, 0
            seq_ids[i] = (shard << 32) + local
            seq_pos[i] = pos
            fill += int(n)
            pos += 1
        out = g[[id_col, "n_tokens"]].copy()
        out["seq_id"] = seq_ids
        out["seq_pos"] = seq_pos
        return out

    return sharded.groupby("shard").map_groups(_pack, batch_format="pandas")


def pack_shuffled(
    ds: "ray.data.Dataset",
    seq_len: int = 2048,
    count_col: str = "n_tokens",
    shard_col: str = "shard",
    pos_col: str = "pos_in_shard",
) -> "ray.data.Dataset":
    """Next-fit sequence packing over the SHUFFLED TRAINING ORDER — the
    model-ready final stage of the training-prep flagship: input is
    :func:`shuffled_shards` output with a per-doc token-count column
    (whitespace or trained-BPE), output appends ``seq_id``/``seq_pos`` so
    each fixed-``seq_len`` training sequence is reconstructible by
    concatenating its docs in ``seq_pos`` order.

    Packing is the identical next-fit rule as :func:`pack_sequences` (a
    sequence closes when the next doc would overflow; an over-long doc gets
    its own sequence) but scans each SHUFFLE shard in ``pos_col`` order, so
    sequences are built from the randomized order the model will consume.
    ``seq_id = shard * 2^32 + local_seq`` stays globally unique.

    Scale shape: next-fit carries sequential state, so each shard packs in
    one ``groupby(shard).map_groups`` task — embarrassingly parallel across
    shards, deterministic at any partitioning. The groupby is the packing
    exchange; it doubles as the write-side grouping (whole shards reach the
    sink co-located). Size ``num_shards`` upstream so one shard fits a
    worker's heap — the same constraint every ``map_groups`` carries.
    All input columns (text payload included) ride through unchanged.
    """

    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(pos_col, kind="mergesort").reset_index(drop=True)
        shard = int(g[shard_col].iloc[0])
        seq_ids = np.empty(len(g), np.int64)
        seq_pos = np.empty(len(g), np.int64)
        local, fill, pos = 0, 0, 0
        for i, n in enumerate(g[count_col].to_numpy()):
            if fill > 0 and fill + n > seq_len:
                local += 1
                fill, pos = 0, 0
            seq_ids[i] = (shard << 32) + local
            seq_pos[i] = pos
            fill += int(n)
            pos += 1
        g["seq_id"] = seq_ids
        g["seq_pos"] = seq_pos
        return g

    return ds.groupby(shard_col).map_groups(_pack, batch_format="pandas")
