"""Aggregations, filters, top-k and anti-joins (SURVEY.md §2.5-2.7).

Each operator mirrors a reference computation (citations below) as a Ray Data
aggregate/groupby with partial (per-batch) pre-aggregation where it cuts shuffle
volume. All are SQL-expressible and cross-checked against DuckDB via
``__ray_entry__.oracle_sql()``.

- A1 quality metrics        /root/reference/address.py:729-741
- A2 score stats            /root/reference/address.py:861-867, 1564-1568
- A3 value counts           /root/reference/address.py:765, 1330
- A4 histogram (20 bins)    /root/reference/address.py:759-762
- A5 hourly counts          /root/reference/address.py:779-785
- A6 Pearson correlation    /root/reference/address.py:1583-1584
- A8/M12 score buckets      /root/reference/address.py:1368-1376; engine.py:106-115
- O1 top-k                  /root/reference/address.py:1380-1383
- J4/J5 anti-join           /root/reference/address.py:458-462, 1589-1590
- M11 substring filter      /root/reference/address.py:1410-1414
- D1 union / D5 distinct    /root/reference/address.py:1214, 1185-1187
"""

from __future__ import annotations

import math
from typing import Iterable, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum


def quality_metrics(
    ds: ray.data.Dataset,
    raw_cols: Sequence[str] = ("STREET_NAME", "HOUSE", "BUILDING"),
    norm_col: str = "STREET_NORM",
    full_col: str = "FULL_ADDRESS",
    completeness_col: str = "COMPLETENESS_SCORE",
) -> dict:
    """A1: count, per-column notna rates, exact nunique, mean completeness, dup count.

    One pass of partial aggregates per batch + tiny final combine; the two exact
    distinct counts run as ``groupby(col).count().count()`` (shuffles only the
    distinct keys thanks to pre-aggregation inside Ray's groupby)."""

    def _partial(batch: pa.Table) -> pa.Table:
        out = {"n": [batch.num_rows]}
        for c in raw_cols:
            out[f"notna_{c}"] = [pc.sum(pc.cast(pc.is_valid(batch.column(c)), pa.int64())).as_py() or 0]
        out["sum_completeness"] = [pc.sum(batch.column(completeness_col)).as_py() or 0.0]
        return pa.table(out)

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    uniq_streets = ds.groupby(norm_col).count().count()
    uniq_full = ds.groupby(full_col).count().count()
    metrics = {
        "total_records": n,
        "unique_streets": int(uniq_streets),
        "avg_completeness": float(parts["sum_completeness"].sum() / n) if n else 0.0,
        "duplicate_addresses": int(n - uniq_full),
    }
    for c in raw_cols:
        metrics[f"{c.lower()}_completeness"] = float(parts[f"notna_{c}"].sum() / n) if n else 0.0
    return metrics


def score_stats(ds: ray.data.Dataset, col: str = "MATCH_SCORE") -> dict:
    """A2: mean/std/min/max (+ exact median via distributed sort + index pick)."""
    agg = ds.aggregate(
        Mean(col, alias_name="mean"),
        Std(col, alias_name="std", ddof=1),
        Min(col, alias_name="min"),
        Max(col, alias_name="max"),
        Count(alias_name="n"),
    )
    n = agg["n"]
    med = None
    if n:
        s = ds.select_columns([col]).sort(col)
        mid = (n - 1) // 2
        # split at the median index and read ONLY the first row(s) of the right
        # part — O(1) driver transfer (the old limit(mid).take_all() pulled n/2
        # rows to the driver; ADVICE r1)
        tail = s.split_at_indices([mid])[1]
        vals = tail.take(2 if n % 2 == 0 else 1)
        if n % 2:
            med = vals[0][col]
        else:
            med = (vals[0][col] + vals[1][col]) / 2.0
    return {
        "mean": agg["mean"], "std": agg["std"], "min": agg["min"], "max": agg["max"],
        "median": med, "n": n,
    }


def value_counts(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """A3: group-count by a column; output (col, cnt)."""
    out = ds.groupby(col).count()
    return out.map_batches(
        lambda b: b.rename_columns([col, "cnt"]), batch_format="pyarrow"
    )


def histogram(
    ds: ray.data.Dataset, col: str, bins: int, lo: float, hi: float
) -> ray.data.Dataset:
    """A4: fixed-width binned counts; output (bin, cnt), bin in [0, bins-1]."""
    width = (hi - lo) / bins

    def _bin(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch.column(col), pa.float64())
        b = pc.floor(pc.divide(pc.subtract(x, lo), width))
        b = pc.min_element_wise(pc.max_element_wise(b, 0.0), float(bins - 1))
        return pa.table({"bin": pc.cast(b, pa.int64())})

    out = ds.map_batches(_bin, batch_format="pyarrow").groupby("bin").count()
    return out.map_batches(lambda b: b.rename_columns(["bin", "cnt"]), batch_format="pyarrow")


def hourly_counts(ds: ray.data.Dataset, ts_col: str) -> ray.data.Dataset:
    """A5: count per hour-of-day of a timestamp column; output (hour, cnt)."""

    def _hour(batch: pa.Table) -> pa.Table:
        return pa.table({"hour": pc.cast(pc.hour(batch.column(ts_col)), pa.int64())})

    out = ds.map_batches(_hour, batch_format="pyarrow").groupby("hour").count()
    return out.map_batches(lambda b: b.rename_columns(["hour", "cnt"]), batch_format="pyarrow")


def pearson_corr(ds: ray.data.Dataset, x: str, y: str) -> float:
    """A6: Pearson correlation via one pass of partial moments + driver combine."""

    def _partial(batch: pa.Table) -> pa.Table:
        xa = pc.cast(batch.column(x), pa.float64())
        ya = pc.cast(batch.column(y), pa.float64())
        xy = pc.multiply(xa, ya)
        return pa.table(
            {
                "n": [batch.num_rows],
                "sx": [pc.sum(xa).as_py() or 0.0],
                "sy": [pc.sum(ya).as_py() or 0.0],
                "sxx": [pc.sum(pc.multiply(xa, xa)).as_py() or 0.0],
                "syy": [pc.sum(pc.multiply(ya, ya)).as_py() or 0.0],
                "sxy": [pc.sum(xy).as_py() or 0.0],
            }
        )

    p = ds.map_batches(_partial, batch_format="pyarrow").to_pandas().sum()
    n = p["n"]
    cov = p["sxy"] - p["sx"] * p["sy"] / n
    vx = p["sxx"] - p["sx"] ** 2 / n
    vy = p["syy"] - p["sy"] ** 2 / n
    denom = math.sqrt(vx * vy)
    return float(cov / denom) if denom else float("nan")


def bucketize(
    ds: ray.data.Dataset,
    col: str,
    edges: Sequence[float] = (95, 85, 70),
    labels: Sequence[str] = ("Excellent", "Good", "Fair", "Poor"),
    out_col: str = "quality_bucket",
) -> ray.data.Dataset:
    """M12/A8: score -> category label (descending threshold semantics:
    >= edges[0] -> labels[0], >= edges[1] -> labels[1], ..., else labels[-1])."""

    def _cat(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch.column(col), pa.float64())
        lab = pa.array([labels[-1]] * batch.num_rows, pa.string())
        for e, l in zip(reversed(edges), reversed(labels[:-1])):
            lab = pc.if_else(pc.greater_equal(x, float(e)), l, lab)
        return batch.append_column(out_col, lab)

    return ds.map_batches(_cat, batch_format="pyarrow")


def top_k(
    ds: ray.data.Dataset, col: str, k: int, tie_cols: Sequence[str] = ()
) -> ray.data.Dataset:
    """O1: global top-k by ``col`` desc with deterministic tie-break columns asc."""
    keys = [col] + list(tie_cols)
    desc = [True] + [False] * len(tie_cols)
    return ds.sort(keys, descending=desc).limit(k)


def semi_join_ids(
    ds: ray.data.Dataset, id_col: str, ids_ds: ray.data.Dataset, ids_col: str,
    anti: bool = False,
) -> ray.data.Dataset:
    """J4/J5 semi/anti-join by broadcast key set (small side collected once)."""
    keys = set(distinct_values(ids_ds, ids_col))
    value_set_ref = ray.put(pa.array(sorted(str(k) for k in keys), pa.string()))

    def _flt(batch: pa.Table) -> pa.Table:
        vs = ray.get(value_set_ref)
        mask = pc.is_in(pc.cast(batch.column(id_col), pa.string()), value_set=vs)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(_flt, batch_format="pyarrow")


def unmatched_records(
    registry: ray.data.Dataset, matches: ray.data.Dataset,
    id_col: str = "ADDRESS_ID", match_id_col: str = "ADDRESS_ID_SPR",
) -> ray.data.Dataset:
    """J5: registry rows whose id never appears in the match set (anti-join)."""
    return semi_join_ids(registry, id_col, matches, match_id_col, anti=True)


def substring_filter(
    ds: ray.data.Dataset, cols: Sequence[str], query: str
) -> ray.data.Dataset:
    """M11: case-insensitive substring match on any of ``cols`` (OR)."""

    def _flt(batch: pa.Table) -> pa.Table:
        mask = None
        for c in cols:
            m = pc.match_substring(
                pc.fill_null(pc.cast(batch.column(c), pa.string()), ""),
                query, ignore_case=True,
            )
            mask = m if mask is None else pc.or_(mask, m)
        return batch.filter(mask)

    return ds.map_batches(_flt, batch_format="pyarrow")


def distinct_values(ds: ray.data.Dataset, col: str) -> List:
    """D5: distinct values of one column.

    Implemented as per-batch ``pc.unique`` pre-aggregation + ``groupby(col)`` over
    the (small) distinct keys — ``Dataset.unique`` in ray 2.49 breaks merging
    accumulators across blocks (unhashable numpy.ndarray), and the pre-aggregated
    form ships only distinct keys into the shuffle anyway."""

    def _uniq(batch: pa.Table) -> pa.Table:
        col_arr = batch.column(col)
        if isinstance(col_arr, pa.ChunkedArray):
            col_arr = col_arr.combine_chunks()
        return pa.table({col: pc.unique(col_arr)})

    out = ds.map_batches(_uniq, batch_format="pyarrow").groupby(col).count()
    return [r[col] for r in out.select_columns([col]).take_all()]


def sessionize(
    ds: ray.data.Dataset,
    user_col: str,
    ts_col: str,
    id_col: str,
    gap_s: float = 1800.0,
) -> ray.data.Dataset:
    """Session windows (gaps-and-islands): a new session starts whenever the
    per-user gap between consecutive events exceeds ``gap_s`` seconds.

    The windowed-aggregate custom operator expressed as
    ``groupby(user).map_groups`` — the co-partitioning shuffle brings each
    user's events together; session numbering is a vectorized pandas
    diff+cumsum per group (deterministic order: ``(ts, id)``). Output
    ``(id, session_num)`` with 1-based per-user session indices.
    """
    import numpy as np
    import pandas as pd

    def _sess(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        gaps = g[ts_col].diff().dt.total_seconds()
        new_sess = (gaps.isna() | (gaps > gap_s)).astype(np.int64)
        return pd.DataFrame({
            id_col: g[id_col],
            "session_num": new_sess.cumsum().astype(np.int64),
        })

    return (
        ds.select_columns([id_col, user_col, ts_col])
        .groupby(user_col)
        .map_groups(_sess, batch_format="pandas")
    )


def _salt_tagged_hot_keys(
    tagged: ray.data.Dataset, max_group_rows: int, op_name: str
) -> "tuple[ray.data.Dataset, list[str]]":
    """Hot-key guard for the tagged-union co-shuffle joins (as-of / range).

    Pre-pass: per-(key, side) counts via one pre-aggregated ``groupby.count``;
    only keys whose count exceeds ``max_group_rows`` are gathered (tiny set).
    Probe-split / build-replicate salting: a hot key's LEFT rows are split
    across ``ceil(count/max_group_rows)`` salt shards and its RIGHT rows are
    replicated to every shard — each shard holds the key's full right side, so
    per-shard results are identical to the unsalted plan. A hot RIGHT side
    cannot be salted away (every shard needs all of it); that case gets a loud
    warning instead. Returns the (possibly salted) dataset + the group keys.
    """
    import logging

    tagged = tagged.materialize()
    counts = tagged.groupby(["_k", "_side"]).count()

    def _hot_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b.column("count()"), max_group_rows))

    hot = counts.map_batches(_hot_only, batch_format="pyarrow").take_all()
    hot_r = [r for r in hot if r["_side"] == "R"]
    if hot_r:
        logging.getLogger(__name__).warning(
            "%s: right side exceeds %d rows for key(s) %s — salting cannot "
            "shrink a hot BUILD side (every shard needs all of it); expect a "
            "straggler group. Pre-aggregate or trim the right side per key.",
            op_name, max_group_rows, [r["_k"] for r in hot_r[:5]])
    hot_l = {r["_k"]: -(-int(r["count()"]) // max_group_rows)
             for r in hot if r["_side"] == "L"}
    if not hot_l:
        return tagged, ["_k"]

    smap_ref = ray.put(hot_l)

    def _salt(batch: pa.Table) -> pa.Table:
        smap = ray.get(smap_ref)
        n = batch.num_rows
        karr = batch.column("_k").to_numpy(zero_copy_only=False)
        sarr = batch.column("_side").to_numpy(zero_copy_only=False)
        salt = np.zeros(n, dtype=np.int64)
        keep = np.ones(n, dtype=bool)
        rep_tables = []
        for key, nshard in smap.items():
            mk = karr == key
            if not mk.any():
                continue
            ml = mk & (sarr == "L")
            salt[ml] = np.arange(int(ml.sum()), dtype=np.int64) % nshard
            mr = mk & (sarr == "R")
            if mr.any():
                keep &= ~mr  # re-emit this key's right rows once per shard
                rsub = batch.filter(pa.array(mr))
                for s in range(nshard):
                    rep_tables.append(rsub.append_column(
                        "_salt",
                        pa.array(np.full(rsub.num_rows, s, dtype=np.int64))))
        base = batch.append_column("_salt", pa.array(salt, pa.int64()))
        if not keep.all():
            base = base.filter(pa.array(keep))
        if rep_tables:
            return pa.concat_tables([base] + rep_tables)
        return base

    return tagged.map_batches(_salt, batch_format="pyarrow"), ["_k", "_salt"]


def asof_join_latest(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    out_col: str = "asof_ts",
    max_group_rows: int = 1_000_000,
) -> ray.data.Dataset:
    """As-of join (custom operator — Ray Data has no native one): for every
    left row, the LATEST right timestamp at-or-before the left timestamp for
    the same key (null when none exists).

    Construction: both sides are projected to (key, ts[, id]) and co-shuffled
    by key through ONE ``groupby(key).map_groups`` over their tagged union —
    a single all-to-all exchange. Per group the right timestamps are sorted
    once and every left row resolves via a vectorized ``searchsorted``.
    Emitting the matched TIMESTAMP (not an arbitrary right id) keeps the
    semantics deterministic under right-side ties.

    Hot keys are handled, not assumed away: a pre-pass counts rows per
    (key, side) and keys whose LEFT side exceeds ``max_group_rows`` are
    salted (probe split across shards, build replicated per shard) via
    :func:`_salt_tagged_hot_keys`; a hot RIGHT side logs a loud warning.
    """
    import numpy as np
    import pandas as pd

    sch = left.schema()
    id_type = sch.types[sch.names.index(left_id)]

    def _l(batch: pa.Table) -> pa.Table:
        return pa.table({
            "_k": pc.cast(batch.column(left_key), pa.string()),
            "_ts": pc.cast(batch.column(left_ts), pa.timestamp("us")),
            "_id": batch.column(left_id),
            "_side": pa.array(["L"] * batch.num_rows, pa.string()),
        })

    def _r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "_k": pc.cast(batch.column(right_key), pa.string()),
            "_ts": pc.cast(batch.column(right_ts), pa.timestamp("us")),
            "_id": pa.nulls(batch.num_rows, id_type),
            "_side": pa.array(["R"] * batch.num_rows, pa.string()),
        })

    tagged = left.map_batches(_l, batch_format="pyarrow").union(
        right.map_batches(_r, batch_format="pyarrow"))
    tagged, group_keys = _salt_tagged_hot_keys(
        tagged, max_group_rows, "asof_join_latest")

    def _asof(g: "pd.DataFrame") -> "pd.DataFrame":
        lmask = g["_side"] == "L"
        lrows = g[lmask]
        rts = np.sort(g.loc[~lmask, "_ts"].to_numpy())
        if not len(lrows):
            return pd.DataFrame({left_id: pd.Series([], dtype=lrows["_id"].dtype),
                                 out_col: pd.Series([], dtype="datetime64[us]")})
        lts = lrows["_ts"].to_numpy()
        if len(rts):
            pos = np.searchsorted(rts, lts, side="right") - 1
            vals = np.where(pos >= 0, rts[np.maximum(pos, 0)],
                            np.datetime64("NaT", "us"))
        else:
            vals = np.full(len(lrows), np.datetime64("NaT", "us"))
        return pd.DataFrame({left_id: lrows["_id"].to_numpy(),
                             out_col: vals})

    out = tagged.groupby(group_keys).map_groups(_asof, batch_format="pandas")

    def _cast_id(batch: pa.Table) -> pa.Table:
        # the tagged union null-pads _id on the right side, which promotes
        # integer ids to float in pandas groups — restore the original type
        i = batch.column_names.index(left_id)
        return batch.set_column(i, left_id, pc.cast(batch.column(left_id), id_type))

    return out.map_batches(_cast_id, batch_format="pyarrow")


def range_join_count(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    window_s: float,
    out_col: str = "n_in_window",
    max_group_rows: int = 1_000_000,
) -> ray.data.Dataset:
    """Range join (custom operator): per left row, COUNT of right rows with the
    same key whose timestamp falls in the trailing window
    ``[left_ts - window_s, left_ts]``.

    Same single-exchange construction as :func:`asof_join_latest` (tagged
    union co-shuffled by key, hot keys salted by the same pre-pass); per group
    the right timestamps sort once and every left row resolves with two
    vectorized ``searchsorted`` probes — never a per-pair expansion (the naive
    inequality join is O(n*m) per key).
    """
    import numpy as np
    import pandas as pd

    sch = left.schema()
    id_type = sch.types[sch.names.index(left_id)]
    delta = np.timedelta64(int(window_s * 1_000_000), "us")

    def _l(batch: pa.Table) -> pa.Table:
        return pa.table({
            "_k": pc.cast(batch.column(left_key), pa.string()),
            "_ts": pc.cast(batch.column(left_ts), pa.timestamp("us")),
            "_id": batch.column(left_id),
            "_side": pa.array(["L"] * batch.num_rows, pa.string()),
        })

    def _r(batch: pa.Table) -> pa.Table:
        return pa.table({
            "_k": pc.cast(batch.column(right_key), pa.string()),
            "_ts": pc.cast(batch.column(right_ts), pa.timestamp("us")),
            "_id": pa.nulls(batch.num_rows, id_type),
            "_side": pa.array(["R"] * batch.num_rows, pa.string()),
        })

    tagged = left.map_batches(_l, batch_format="pyarrow").union(
        right.map_batches(_r, batch_format="pyarrow"))
    tagged, group_keys = _salt_tagged_hot_keys(
        tagged, max_group_rows, "range_join_count")

    def _count(g: "pd.DataFrame") -> "pd.DataFrame":
        lmask = g["_side"] == "L"
        lrows = g[lmask]
        if not len(lrows):
            return pd.DataFrame({left_id: pd.Series([], dtype=lrows["_id"].dtype),
                                 out_col: pd.Series([], dtype="int64")})
        rts = np.sort(g.loc[~lmask, "_ts"].to_numpy())
        lts = lrows["_ts"].to_numpy()
        hi = np.searchsorted(rts, lts, side="right")
        lo = np.searchsorted(rts, lts - delta, side="left")
        return pd.DataFrame({left_id: lrows["_id"].to_numpy(),
                             out_col: (hi - lo).astype(np.int64)})

    out = tagged.groupby(group_keys).map_groups(_count, batch_format="pandas")

    def _cast_id(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index(left_id)
        return batch.set_column(i, left_id, pc.cast(batch.column(left_id), id_type))

    return out.map_batches(_cast_id, batch_format="pyarrow")


def text_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Document text-analysis stage: language-ID, quality features, token counts,
    fingerprint (functions/textfns.py) appended as columns. Stateless map_batches."""
    from ..functions.textfns import text_stats_columns

    def _stats(batch: pa.Table) -> pa.Table:
        cols = text_stats_columns(batch.column(text_col))
        out = batch
        for name, arr in cols.items():
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        return out

    return ds.map_batches(_stats, batch_format="pyarrow")


def exact_quantiles(
    ds: ray.data.Dataset, col: str, qs: Sequence[float]
) -> dict[float, float]:
    """Exact discrete quantiles: ONE distributed sort + O(len(qs)) row picks.

    Nearest-rank semantics (index ``ceil(q*n) - 1``), matching DuckDB's
    ``quantile_disc``; values are actual data elements (no interpolation), so
    the result is bit-identical to the SQL oracle. Driver transfer is
    O(len(qs)) rows via ``split_at_indices`` + ``take(1)`` per pick — never
    O(n) (generalizes the scale-safe median of :func:`score_stats`).
    """
    n = ds.count()
    if not n:
        return {q: None for q in qs}
    want = {q: max(0, math.ceil(q * n) - 1) for q in qs}
    idxs = sorted(set(want.values()))
    s = ds.select_columns([col]).sort(col)
    parts = s.split_at_indices(idxs)
    # parts[k+1] starts at global sorted index idxs[k]; read only its head row
    at = {i: parts[k + 1].take(1)[0][col] for k, i in enumerate(idxs)}
    return {q: at[i] for q, i in want.items()}


def token_doc_frequency(
    ds: ray.data.Dataset, id_col: str, text_col: str, k: int
) -> ray.data.Dataset:
    """Token document-frequency top-k: number of DOCUMENTS containing each
    token (lowercase, single-space split, empties dropped).

    Rows are whole documents, so per-batch (doc, token) dedup is exact; the
    groupby shuffle moves one row per (batch, distinct token) — never one per
    occurrence. Output (token, doc_freq) sorted df-desc, token-asc.
    """
    import pandas as pd

    def _partial(df: "pd.DataFrame") -> "pd.DataFrame":
        s = df[text_col].str.lower().str.split(" ").explode()
        s = s[s != ""]
        pairs = pd.DataFrame({"i": s.index, "token": s.values}).drop_duplicates()
        counts = pairs["token"].value_counts()
        return pd.DataFrame({"token": counts.index, "cnt": counts.values})

    agg = (
        ds.select_columns([id_col, text_col])
        .map_batches(_partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="doc_freq"))
    )
    return agg.sort(["doc_freq", "token"], descending=[True, False]).limit(k)


def crosstab_counts(
    ds: ray.data.Dataset,
    row_col: str,
    cat_col: str,
    categories: Optional[Sequence[str]] = None,
    row_fn=None,
) -> ray.data.Dataset:
    """Pivot / cross-tab: counts of ``cat_col`` values per ``row_col`` group,
    one output column ``n_<cat>`` per category (wide layout).

    Implemented as per-batch indicator columns + a single ``groupby(row).sum``
    — the shuffle carries one row per (block, distinct row key), not one per
    input row. ``categories`` bounds the width; when None it is discovered via
    a distinct-key aggregate (small gather — assumes a bounded category
    vocabulary, the same premise as any pivot). ``row_fn(batch) -> Array``
    optionally derives the row key from the batch (e.g. hour-of-timestamp).
    """
    if categories is None:
        cats = ds.groupby(cat_col).count().to_pandas()[cat_col].tolist()
        categories = sorted(str(c) for c in cats)

    def _indicators(batch: pa.Table) -> pa.Table:
        key = row_fn(batch) if row_fn is not None else batch.column(row_col)
        cols = {row_col: key}
        cat = batch.column(cat_col)
        for c in categories:
            cols[f"n_{c}"] = pc.cast(pc.equal(cat, c), pa.int64())
        return pa.table(cols)

    agg = (
        ds.map_batches(_indicators, batch_format="pyarrow")
        .groupby(row_col)
        .aggregate(*[Sum(f"n_{c}", alias_name=f"n_{c}") for c in categories])
    )
    return agg


def grouped_quantiles(
    ds: ray.data.Dataset, group_col: str, val_col: str, qs: Sequence[float]
) -> ray.data.Dataset:
    """Per-group exact discrete quantiles (``quantile_disc`` nearest-rank
    semantics, like :func:`exact_quantiles`), one row per group with a
    ``p<q*100>`` column per quantile.

    ``groupby().map_groups`` — each group sorts locally in its own task, so
    this assumes per-group data fits a worker (bounded-cardinality /
    bounded-group premise; for mega-groups use :func:`exact_quantiles` per
    key). Values are actual data elements — bit-identical to the SQL oracle.
    """
    import pandas as pd

    def _q(df: "pd.DataFrame") -> "pd.DataFrame":
        v = np.sort(df[val_col].to_numpy())
        n = len(v)
        out = {group_col: [df[group_col].iloc[0]]}
        for q in qs:
            out[f"p{int(round(q * 100))}"] = [v[max(0, math.ceil(q * n) - 1)]]
        return pd.DataFrame(out)

    return ds.select_columns([group_col, val_col]).groupby(group_col).map_groups(
        _q, batch_format="pandas")


def weighted_mean(
    ds: ray.data.Dataset,
    group_col: str,
    val_col: str,
    weight_col: str,
    alias: str = "wavg",
    ndigits: int = 6,
) -> ray.data.Dataset:
    """Per-group weighted mean sum(w*x)/sum(w): per-batch product columns +
    Ray's partially-aggregated groupby-Sum — the shuffle carries one partial
    row per (block, group), never raw rows. Rounded on both sides (oracle too)
    so the check is insensitive to summation order."""

    def _partial(batch: pa.Table) -> pa.Table:
        w = pc.cast(batch.column(weight_col), pa.float64())
        x = pc.cast(batch.column(val_col), pa.float64())
        return pa.table({
            group_col: batch.column(group_col),
            "_wx": pc.multiply(w, x), "_w": w,
        })

    g = (
        ds.select_columns([group_col, val_col, weight_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("_wx", alias_name="_swx"), Sum("_w", alias_name="_sw"))
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table({
            group_col: batch.column(group_col),
            alias: pc.round(
                pc.divide(batch.column("_swx"), batch.column("_sw")), ndigits=ndigits),
        })

    return g.map_batches(_final, batch_format="pyarrow")


def rollup_agg(
    ds: ray.data.Dataset,
    cols: Sequence[str],
    val_col: str,
    sum_alias: str = "sum_val",
    ndigits: int = 2,
) -> ray.data.Dataset:
    """``GROUP BY ROLLUP(a, b)`` hierarchical aggregate: count + sum at the
    finest level, each prefix level, and the grand total, with SQL ROLLUP's
    NULL-filled rolled-up keys.

    Scale shape: ONE partially-aggregated shuffle over the raw data (the
    finest groupby); every coarser level re-aggregates the already-tiny
    finest result — no second pass over the input. Sums rounded on both
    sides (oracle too) so the check is insensitive to summation order.
    """
    a, b = cols

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            a: pc.cast(batch.column(a), pa.string()),
            b: pc.cast(batch.column(b), pa.string()),
            "cnt": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "_v": pc.cast(batch.column(val_col), pa.float64()),
        })

    finest = (
        ds.select_columns([a, b, val_col])
        .map_batches(_prep, batch_format="pyarrow")
        .groupby([a, b])
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("_v", alias_name="_s"))
    )
    lvl1 = finest.groupby(a).aggregate(
        Sum("cnt", alias_name="cnt"), Sum("_s", alias_name="_s"))
    total = finest.aggregate(Sum("cnt", alias_name="cnt"), Sum("_s", alias_name="_s"))

    def _final(keep_a: bool, keep_b: bool):
        def _f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                a: pc.cast(batch.column(a), pa.string()) if keep_a else pa.nulls(n, pa.string()),
                b: pc.cast(batch.column(b), pa.string()) if keep_b else pa.nulls(n, pa.string()),
                "cnt": pc.cast(batch.column("cnt"), pa.int64()),
                sum_alias: pc.round(pc.cast(batch.column("_s"), pa.float64()), ndigits=ndigits),
            })
        return _f

    total_tbl = pa.table({
        a: pa.nulls(1, pa.string()), b: pa.nulls(1, pa.string()),
        "cnt": pa.array([int(total["cnt"])], pa.int64()),
        sum_alias: pa.array([round(float(total["_s"]), ndigits)], pa.float64()),
    })
    return (
        finest.map_batches(_final(True, True), batch_format="pyarrow")
        .union(lvl1.map_batches(_final(True, False), batch_format="pyarrow"))
        .union(ray.data.from_arrow(total_tbl).materialize())
    )


def top_tokens(ds: ray.data.Dataset, text_col: str, k: int) -> ray.data.Dataset:
    """Corpus-wide top-k tokens: lowercase, split on single spaces, drop
    empties. Per-batch partial counts (pandas explode + value_counts, all
    vectorized) so the groupby shuffle moves one row per (batch, distinct
    token) — not one per token occurrence; final global top-k is a sort over
    the (small) distinct-token aggregate with token-asc tie-break.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def _partial(df: "pd.DataFrame") -> "pd.DataFrame":
        counts = (
            df[text_col].str.lower().str.split(" ").explode()
        )
        counts = counts[counts != ""].value_counts()
        return pd.DataFrame({"token": counts.index, "cnt": counts.values})

    agg = (
        ds.select_columns([text_col])
        .map_batches(_partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="n_occurrences"))
    )
    return agg.sort(["n_occurrences", "token"], descending=[True, False]).limit(k)


# Gopher document-quality thresholds (Rae et al. 2021, appendix A — simplified;
# word-count floor and stop-hit minimum lowered to suit short web snippets)
GOPHER_BOUNDS = dict(
    min_words=15, max_words=10_000,
    min_mean_word_len=3.0, max_mean_word_len=10.0,
    max_symbol_ratio=0.1, min_alpha_word_ratio=0.8, min_stop_hits=1,
)


def gopher_quality(
    ds: ray.data.Dataset, text_col: str, id_col: str
) -> ray.data.Dataset:
    """Gopher-rule quality filter: per-doc signals + a ``passes`` verdict.

    Stateless ``map_batches`` over Arrow batches, module-level compiled
    regexes, one pass per document — no shuffle, no state, embarrassingly
    parallel at any scale. Emits the signals alongside the flag so a pipeline
    can either ``filter(passes)`` or audit rejection reasons per rule.
    """
    from ..functions import textfns

    b = GOPHER_BOUNDS

    def _sig(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sigs = [textfns.gopher_signals(t) for t in col.to_pylist()]
        out = {id_col: batch.column(id_col)}
        out["n_words"] = pa.array([int(s["n_words"]) for s in sigs], pa.int64())
        for k in ("mean_word_len", "symbol_ratio", "alpha_word_ratio"):
            out[k] = pa.array([s[k] for s in sigs], pa.float64())
        out["stop_hits"] = pa.array([int(s["stop_hits"]) for s in sigs], pa.int64())
        out["passes"] = pa.array(
            [
                b["min_words"] <= s["n_words"] <= b["max_words"]
                and b["min_mean_word_len"] <= s["mean_word_len"] <= b["max_mean_word_len"]
                and s["symbol_ratio"] <= b["max_symbol_ratio"]
                and s["alpha_word_ratio"] >= b["min_alpha_word_ratio"]
                and s["stop_hits"] >= b["min_stop_hits"]
                for s in sigs
            ],
            pa.bool_(),
        )
        return pa.table(out)

    return ds.map_batches(_sig, batch_format="pyarrow")


def c4_clean(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    min_words: int = 5,
    min_sentences: int = 3,
    badwords: Sequence[str] = (),
) -> ray.data.Dataset:
    """C4 §2.2 document cleaning (Raffel et al. 2020): per-line heuristics
    (terminal-punctuation keep, ``min_words`` floor, javascript drop) plus
    page-level kill rules (``min_sentences`` floor on the KEPT text,
    lorem-ipsum / curly-brace / badword hits on the ORIGINAL text).

    Emits per doc the cleaned ``text`` (kept lines joined), ``lines_kept`` /
    ``lines_dropped`` / ``sentences`` counts and the ``passes`` verdict, so a
    pipeline can ``filter(passes)`` or audit rejection reasons. Stateless
    ``map_batches`` over Arrow batches, module-level rule constants, one pass
    per document — no shuffle, no state, embarrassingly parallel at any
    scale (rule semantics in ``functions/textfns.c4_clean_doc``)."""
    from ..functions import textfns

    bw = tuple(badwords)

    def _clean(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        res = [textfns.c4_clean_doc(t, min_words, min_sentences, bw)
               for t in col.to_pylist()]
        return pa.table({
            id_col: batch.column(id_col),
            "text": pa.array([r[0] for r in res], pa.string()),
            "lines_kept": pa.array([r[1] for r in res], pa.int64()),
            "lines_dropped": pa.array([r[2] for r in res], pa.int64()),
            "sentences": pa.array([r[3] for r in res], pa.int64()),
            "passes": pa.array([r[4] for r in res], pa.bool_()),
        })

    return ds.map_batches(_clean, batch_format="pyarrow")


def pii_redact(
    ds: ray.data.Dataset, text_col: str, id_col: str
) -> ray.data.Dataset:
    """Mask emails / IPv4s / phone-like digit runs (functions/textfns.py::
    pii_redact, RE2-compatible patterns so the DuckDB oracle runs the same
    expressions). Stateless ``map_batches``; emits the redacted text plus
    per-category counts for audit."""
    from ..functions import textfns

    def _red(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        rows = [textfns.pii_redact(t) for t in col.to_pylist()]
        return pa.table({
            id_col: batch.column(id_col),
            text_col: pa.array([r[0] for r in rows], pa.string()),
            "n_emails": pa.array([r[1] for r in rows], pa.int64()),
            "n_ips": pa.array([r[2] for r in rows], pa.int64()),
            "n_phones": pa.array([r[3] for r in rows], pa.int64()),
        })

    return ds.map_batches(_red, batch_format="pyarrow")


def repetition_stats(
    ds: ray.data.Dataset, text_col: str, id_col: str
) -> ray.data.Dataset:
    """Gopher repetition signals per doc (duplicate-line fraction, top word
    bigram + its occurrence fraction). Stateless ``map_batches``."""
    from ..functions import textfns

    def _rep(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sigs = [textfns.repetition_signals(t) for t in col.to_pylist()]
        return pa.table({
            id_col: batch.column(id_col),
            "dup_line_fraction": pa.array(
                [s["dup_line_fraction"] for s in sigs], pa.float64()),
            "top_bigram": pa.array([s["top_bigram"] for s in sigs], pa.string()),
            "top_bigram_fraction": pa.array(
                [s["top_bigram_fraction"] for s in sigs], pa.float64()),
        })

    return ds.map_batches(_rep, batch_format="pyarrow")


def top_ngram_stats(
    ds: ray.data.Dataset, text_col: str, id_col: str,
    ns: Sequence[int] = (2, 3, 4),
) -> ray.data.Dataset:
    """Gopher top-n-gram repetition signals per doc (Rae et al. 2021 Table
    A1): for each ``n`` the most frequent word n-gram and the fraction of
    characters it accounts for (``functions/textfns.top_ngram_fractions``).
    Completes :func:`repetition_stats` (dup-line + top-bigram-occurrence
    half) and ``dedup.substring_dup_stats`` (duplicate-n-gram half).
    Stateless ``map_batches``, one pass per doc, no shuffle."""
    from ..functions import textfns

    nss = tuple(ns)

    def _top(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sigs = [textfns.top_ngram_fractions(t, nss) for t in col.to_pylist()]
        out = {id_col: batch.column(id_col)}
        for n in nss:
            out[f"top{n}gram"] = pa.array(
                [s[f"top{n}gram"] for s in sigs], pa.string())
            out[f"top{n}frac"] = pa.array(
                [s[f"top{n}frac"] for s in sigs], pa.float64())
        return pa.table(out)

    return ds.map_batches(_top, batch_format="pyarrow")


def group_zscore(
    ds: ray.data.Dataset, group_col: str, val_col: str, id_col: str,
    ndigits: int = 3,
) -> ray.data.Dataset:
    """Per-group z-score normalization: ``(x - mean) / stddev_pop`` per group.

    One tiny ``groupby`` over per-batch moment partials (sum / sum-of-squares /
    count — pandas C kernels) yields the group-stat table; it is broadcast via
    ``ray.put`` into a stateless annotate pass, so the DATA rows are touched
    exactly once and never shuffled. Scales with O(#groups) broadcast state.
    Zero-variance groups get null z (mirrors the SQL CASE).
    """
    import pandas as pd

    def _partial(df: "pd.DataFrame") -> "pd.DataFrame":
        g = (df.assign(_sq=df[val_col].astype(float) ** 2)
             .groupby(group_col, observed=True)
             .agg(_s=(val_col, "sum"), _ss=("_sq", "sum"), _c=(val_col, "count"))
             .reset_index())
        return g

    stats = (
        ds.select_columns([group_col, val_col])
        .map_batches(_partial, batch_format="pandas")
        .groupby(group_col)
        .aggregate(Sum("_s", alias_name="s"), Sum("_ss", alias_name="ss"),
                   Sum("_c", alias_name="c"))
        .to_pandas()
    )
    stats["mean"] = stats["s"] / stats["c"]
    stats["var"] = stats["ss"] / stats["c"] - stats["mean"] ** 2
    lookup = {
        r[group_col]: (r["mean"], math.sqrt(r["var"]) if r["var"] > 0 else 0.0)
        for _, r in stats.iterrows()
    }
    ref = ray.put(lookup)

    def _annot(df: "pd.DataFrame") -> "pd.DataFrame":
        lk = ray.get(ref)
        means = df[group_col].map(lambda g: lk[g][0])
        stds = df[group_col].map(lambda g: lk[g][1])
        z = (df[val_col].astype(float) - means) / stds.replace(0.0, np.nan)
        return pd.DataFrame({
            id_col: df[id_col], group_col: df[group_col],
            val_col: df[val_col], "z": z.round(ndigits),
        })

    return ds.select_columns([id_col, group_col, val_col]).map_batches(
        _annot, batch_format="pandas")


def iqr_outliers(
    ds: ray.data.Dataset, col: str, id_cols: Sequence[str], factor: float = 1.5
) -> ray.data.Dataset:
    """Tukey-fence outlier filter: rows with ``col`` outside
    ``[q1 - factor*iqr, q3 + factor*iqr]`` where q1/q3 are EXACT discrete
    quantiles (:func:`exact_quantiles`, ``quantile_disc`` semantics — actual
    data elements, so the fences are bit-identical to the SQL oracle's).
    One distributed sort for the two quantiles, then a stateless filter pass.
    """
    qs = exact_quantiles(ds, col, (0.25, 0.75))
    q1, q3 = float(qs[0.25]), float(qs[0.75])
    lo, hi = q1 - factor * (q3 - q1), q3 + factor * (q3 - q1)

    def _flt(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(col), pa.float64())
        keep = pc.or_(pc.less(v, lo), pc.greater(v, hi))
        return batch.filter(pc.fill_null(keep, False))

    return ds.select_columns(list(id_cols) + [col]).map_batches(
        _flt, batch_format="pyarrow")


def hourly_moving_avg(
    ds: ray.data.Dataset, ts_col: str, val_col: str, window: int = 3,
    ndigits: int = 3,
) -> "pd.DataFrame":
    """Hour-of-day bucket average + trailing ``window``-bucket moving average.

    The shuffle moves only per-batch (hour, sum, count) partials; the final
    window pass runs on the O(24)-row bucket table driver-side (bounded by the
    bucket count at any data scale, never by the row count).
    """
    import pandas as pd

    def _partial(batch: pa.Table) -> pa.Table:
        hour = pc.cast(pc.hour(batch.column(ts_col)), pa.int64())
        v = pc.cast(batch.column(val_col), pa.float64())
        df = pa.table({"hour": hour, "v": v}).to_pandas()
        g = df.groupby("hour").agg(_s=("v", "sum"), _c=("v", "count")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    agg = (
        ds.select_columns([ts_col, val_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("_s", alias_name="s"), Sum("_c", alias_name="c"))
        .to_pandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    avg = agg["s"] / agg["c"]
    out = pd.DataFrame({
        "hour": agg["hour"].astype("int64"),
        "avg_value": avg.round(ndigits),
        "moving_avg": avg.rolling(window, min_periods=1).mean().round(ndigits),
    })
    return out


def bloom_semi_join(
    ds: ray.data.Dataset, id_col: str, ids_ds: ray.data.Dataset, ids_col: str,
    m_bits: int = 1 << 20, k: int = 4,
) -> ray.data.Dataset:
    """Semi-join with a Bloom-filter prefilter: the build side is folded into an
    ``m_bits`` bitmap (per-batch partial bitmaps OR-reduced, O(m/8) bytes on
    the driver regardless of key count), broadcast once, and probe batches are
    screened vectorized before the EXACT verify (:func:`semi_join_ids`) removes
    false positives — so the result is exact and oracle-equal to a plain
    semi-join, while the expensive verify only sees bloom survivors. At
    cluster scale the verify step swaps to a shuffle join; the bloom screen is
    what keeps that shuffle's probe side small. Integer keys only.
    """
    mask_words = m_bits // 64

    def _positions(ids: np.ndarray) -> np.ndarray:
        x = ids.astype(np.uint64)
        # splitmix64 finalizer, twice, for two independent hashes
        def _mix(v: np.ndarray) -> np.ndarray:
            v = (v + np.uint64(0x9E3779B97F4A7C15))
            v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return v ^ (v >> np.uint64(31))
        h1, h2 = _mix(x), _mix(_mix(x))
        ks = np.arange(k, dtype=np.uint64)[:, None]
        return (h1[None, :] + ks * h2[None, :]) % np.uint64(m_bits)

    def _build(batch: pa.Table) -> pa.Table:
        ids = batch.column(ids_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bits = np.zeros(mask_words, dtype=np.uint64)
        pos = _positions(ids).ravel()
        np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": [bits.tobytes()]})

    bitmap = np.zeros(mask_words, dtype=np.uint64)
    for b in (ids_ds.select_columns([ids_col])
              .map_batches(_build, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for buf in b.column("bits").to_pylist():
            bitmap |= np.frombuffer(buf, dtype=np.uint64)
    bm_ref = ray.put(bitmap)

    def _screen(batch: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = _positions(ids)
        hit = np.ones(len(ids), dtype=bool)
        for row in pos:
            hit &= (bm[(row >> np.uint64(6)).astype(np.int64)]
                    >> (row & np.uint64(63))) & np.uint64(1) != 0
        return batch.filter(pa.array(hit))

    screened = ds.map_batches(_screen, batch_format="pyarrow")
    return semi_join_ids(screened, id_col, ids_ds, ids_col)


def tfidf_top_terms(
    ds: ray.data.Dataset, id_col: str, text_col: str, k: int = 3,
    ndigits: int = 6,
) -> ray.data.Dataset:
    """Per-document top-``k`` terms by tf-idf (``tf * ln(N/df)``).

    Tokenization matches the corpus token ops (lowercase, split on single
    spaces, drop empties). Two streaming passes over the documents: pass A
    reduces per-batch distinct (doc, token) partials to the document-frequency
    table (one small ``groupby`` over O(vocab) rows — the rows shuffled are
    vocabulary-sized, never corpus-sized) which is broadcast via ``ray.put``;
    pass B scores each doc's term counts against the broadcast df map and
    keeps the top ``k`` (score desc, token asc). Output:
    (id, token, tf, df, score).
    """
    import pandas as pd

    n_docs = ds.count()

    def _df_partial(df: "pd.DataFrame") -> "pd.DataFrame":
        s = df[text_col].fillna("").str.lower().str.split(" ").explode()
        s = s[s != ""].dropna()
        pairs = pd.DataFrame({"_id": df.loc[s.index, id_col], "token": s})
        out = (pairs.drop_duplicates().groupby("token", observed=True)
               .size().rename("_d").reset_index())
        return out

    df_tbl = (
        ds.select_columns([id_col, text_col])
        .map_batches(_df_partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("_d", alias_name="df"))
        .to_pandas()
    )
    df_map = dict(zip(df_tbl["token"], df_tbl["df"].astype(int)))
    ref = ray.put(df_map)

    def _score(df: "pd.DataFrame") -> "pd.DataFrame":
        dfm = ray.get(ref)
        s = df[text_col].fillna("").str.lower().str.split(" ").explode()
        s = s[s != ""].dropna()
        tf = (pd.DataFrame({id_col: df.loc[s.index, id_col], "token": s})
              .groupby([id_col, "token"], observed=True)
              .size().rename("tf").reset_index())
        if not len(tf):
            return pd.DataFrame({id_col: pd.Series([], dtype=df[id_col].dtype),
                                 "token": pd.Series([], dtype=str),
                                 "tf": pd.Series([], dtype="int64"),
                                 "df": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        tf["df"] = tf["token"].map(dfm).astype("int64")
        # same operand order as the SQL oracle: c * ln(N / d)
        tf["score"] = tf["tf"].astype(float) * np.log(
            float(n_docs) / tf["df"].to_numpy(dtype=float))
        tf = tf.sort_values([id_col, "score", "token"],
                            ascending=[True, False, True], kind="mergesort")
        top = tf.groupby(id_col, observed=True).head(k).reset_index(drop=True)
        top["score"] = top["score"].round(ndigits)
        top["tf"] = top["tf"].astype("int64")
        return top[[id_col, "token", "tf", "df", "score"]]

    return ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pandas")


VOCAB_BROADCAST_LIMIT = 2_000_000


def _join_partitions(ds: ray.data.Dataset) -> int:
    """~128 MiB per hash-join partition (one aggregator actor each) — the
    same bytes rule as ``dedup._winner_join_partitions``; block-count or
    fixed sizing measured 4-9x slower on small inputs."""
    try:
        est = ds.size_bytes() or 0
        return max(4, min(512, -(-est // (128 << 20))))
    except Exception:
        return 16


def ensure_arrow_schema(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Re-block to metadata-free Arrow with a stable schema.

    Ray's hash aggregate emits pandas-format blocks — including COLUMN-LESS
    empty blocks for hash partitions that received no groups — and both break
    a downstream ``Dataset.join``: the pandas schema metadata is an
    unhashable dict (per-task warning) and the column-less empty block makes
    the join's key FieldRef unresolvable. One pass normalizes every block.
    """
    empty = pa.table({f.name: pa.array([], f.type) for f in schema})

    def _fix(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or b.num_rows == 0:
            return empty
        return b.select(schema.names).cast(schema).replace_schema_metadata(None)

    return ds.map_batches(_fix, batch_format="pyarrow")


def compact_nonempty(
    ds: ray.data.Dataset, schema: pa.Schema,
) -> ray.data.Dataset:
    """Drop zero-row blocks from a MATERIALIZED dataset.

    ``map_batches`` is never invoked on a zero-row block, so the
    column-less empty blocks a hash aggregate emits for partitions with no
    groups survive :func:`ensure_arrow_schema` untouched. They then poison
    the dataset's unified schema (it collapses to zero columns) and any
    join keyed on the dataset fails with an unresolvable FieldRef — a
    skew/sparsity hazard whenever ``num_partitions`` exceeds the number of
    live keys. Metadata-only: block refs are filtered by the recorded
    ``num_rows``; no block data moves or is fetched to the driver.
    """
    refs = [ref
            for bundle in ds.iter_internal_ref_bundles()
            for ref, md in bundle.blocks
            if md.num_rows]
    if not refs:
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in schema}))
    return ray.data.from_arrow_refs(refs)


def unigram_logprob(
    ds: ray.data.Dataset, id_col: str, text_col: str, ndigits: int = 6,
    vocab_broadcast_limit: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the CCNet-style quality signal (unusually low avg logprob =
    atypical/garbled text; unusually high = boilerplate).

    ``P(token) = c_token / N`` over the whole corpus; no smoothing is needed
    when scoring the training corpus against itself (every token is
    in-vocabulary). Tokenization matches the corpus token ops (lowercase,
    split on single spaces, drop empties); zero-token docs are dropped, like
    the SQL form's inner join.

    Pass A reduces per-batch token counts to the vocabulary table (one small
    ``groupby`` over O(vocab) rows). Pass B auto-selects its physical plan
    like ``dedup.exact_dedup``: a vocabulary within ``vocab_broadcast_limit``
    is gathered once and broadcast via ``ray.put`` — each doc's tokens stay
    inside their batch, so per-doc means need NO shuffle; a larger vocabulary
    stays distributed and pass B becomes explode -> equi-join on token ->
    per-doc partial sums -> ``groupby(id)`` — a corpus-sized shuffle, but
    never a driver-sized gather. Output: ``(id_col, n_tokens, avg_logprob)``.
    """
    import pandas as pd

    limit = VOCAB_BROADCAST_LIMIT if vocab_broadcast_limit is None else vocab_broadcast_limit

    def _cnt(df: "pd.DataFrame") -> pa.Table:
        s = df[text_col].fillna("").str.lower().str.split(" ").explode()
        s = s[s != ""].dropna()
        vc = s.value_counts()
        return pa.table({"token": pa.array(vc.index, pa.string()),
                         "_c": pa.array(vc.to_numpy(), pa.int64())})

    counts = (
        ds.select_columns([text_col])
        .map_batches(_cnt, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("_c", alias_name="c"))
        .materialize()
    )
    n_total = float(counts.sum("c"))

    if counts.count() <= limit:
        cm = counts.to_pandas()
        ref = ray.put(dict(zip(cm["token"], cm["c"].astype("int64"))))

        def _score(df: "pd.DataFrame") -> pa.Table:
            m = ray.get(ref)
            s = df[text_col].fillna("").str.lower().str.split(" ").explode()
            s = s[s != ""].dropna()
            lp = pd.Series(
                np.log(s.map(m).to_numpy(dtype=float) / n_total), index=s.index)
            g = lp.groupby(level=0)
            n = g.size().astype("int64")
            out = pd.DataFrame({
                id_col: df.loc[n.index, id_col],
                "n_tokens": n,
                "avg_logprob": g.mean().round(ndigits),
            })
            return pa.Table.from_pandas(
                out, preserve_index=False).replace_schema_metadata(None)

        return ds.select_columns([id_col, text_col]).map_batches(
            _score, batch_format="pandas")

    # distributed plan: token stream joins the vocabulary, partials per doc
    def _pairs(df: "pd.DataFrame") -> pa.Table:
        s = df[text_col].fillna("").str.lower().str.split(" ").explode()
        s = s[s != ""].dropna()
        return pa.Table.from_pandas(
            pd.DataFrame({id_col: df.loc[s.index, id_col], "token": s}),
            preserve_index=False).replace_schema_metadata(None)

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        _pairs, batch_format="pandas")
    counts_arrow = ensure_arrow_schema(
        counts, pa.schema([("token", pa.string()), ("c", pa.int64())]))
    joined = pairs.join(counts_arrow, join_type="inner",
                        num_partitions=_join_partitions(counts), on=("token",))

    def _partial(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        df = batch.to_pandas()
        df["_lp"] = np.log(df["c"].to_numpy(dtype=float) / n_total)
        g = df.groupby(id_col, observed=True)["_lp"].agg(["sum", "size"])
        # explicit types so empty join partitions keep a stable schema
        return pa.table({
            id_col: pa.array(g.index.to_numpy(), id_type),
            "_slp": pa.array(g["sum"].to_numpy(), pa.float64()),
            "_n": pa.array(g["size"].to_numpy(dtype="int64"), pa.int64()),
        })

    agg = (joined.map_batches(_partial, batch_format="pyarrow")
           .groupby(id_col)
           .aggregate(Sum("_slp", alias_name="_slp"), Sum("_n", alias_name="n_tokens")))

    def _fin(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n_tokens"), pa.int64())
        avg = pc.round(pc.divide(batch.column("_slp"), pc.cast(n, pa.float64())),
                       ndigits=ndigits)
        return pa.table({id_col: batch.column(id_col),
                         "n_tokens": n, "avg_logprob": avg})

    return agg.map_batches(_fin, batch_format="pyarrow")


def perplexity_buckets(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    cuts: Sequence[float] = (1.0 / 3.0, 2.0 / 3.0),
    ndigits: int = 6,
) -> ray.data.Dataset:
    """CCNet-style head/middle/tail perplexity bucketing (Wenzek et al. 2020
    §3.3): score every document under the corpus LM, then split the corpus at
    the ``cuts`` quantiles of the score — 'head' is the most-in-distribution
    (highest avg logprob = lowest perplexity) third, 'tail' the least.

    Composition, all stages already scale-proven: :func:`unigram_logprob`
    (vocab-sized shuffle only) -> :func:`exact_quantiles` (one distributed
    sort, O(len(cuts)) rows to the driver — nearest-rank, so thresholds are
    actual data values and match DuckDB ``quantile_disc`` bitwise) -> one
    stateless ``map_batches`` comparing each doc to the two broadcast floats.
    Tie rule: ``avg_logprob <= t`` goes to the lower bucket, deterministic.
    Output: ``(id_col, n_tokens, avg_logprob, bucket)``.
    """
    if len(cuts) != 2:
        raise ValueError(
            f"perplexity_buckets splits into head/middle/tail and needs "
            f"exactly 2 quantile cuts, got {len(cuts)}")
    lp = unigram_logprob(ds, id_col, text_col, ndigits=ndigits).materialize()
    qs = exact_quantiles(lp, "avg_logprob", list(cuts))
    t_lo, t_hi = (qs[cuts[0]], qs[cuts[1]])

    def _bucket(batch: pa.Table) -> pa.Table:
        v = batch.column("avg_logprob")
        bucket = pc.if_else(
            pc.less_equal(v, t_lo), "tail",
            pc.if_else(pc.less_equal(v, t_hi), "middle", "head"),
        )
        return batch.append_column("bucket", pc.cast(bucket, pa.string()))

    return lp.map_batches(_bucket, batch_format="pyarrow")


def temperature_mix(
    ds: ray.data.Dataset, source_col: str, alpha: float = 0.7, ndigits: int = 6
) -> ray.data.Dataset:
    """Temperature-scaled source-mixing weights (the multilingual-sampling
    rule of Conneau & Lample 2019 §3.1, standard for balancing corpus mixes):
    ``w_s = c_s^alpha / sum_s c_s^alpha``. ``alpha < 1`` upweights small
    sources relative to their natural share.

    One vocabulary-of-sources-sized ``groupby`` (per-batch partial counts),
    then the normalization runs on the driver over O(#sources) rows — at any
    corpus scale #sources is tiny. Output ``(source, n_docs, natural_share,
    weight)`` with floats rounded to ``ndigits``.
    """
    import pandas as pd

    def _cnt(df: "pd.DataFrame") -> "pd.DataFrame":
        vc = df[source_col].value_counts()
        return pd.DataFrame({source_col: vc.index, "_c": vc.to_numpy()})

    counts = (
        ds.select_columns([source_col])
        .map_batches(_cnt, batch_format="pandas")
        .groupby(source_col)
        .aggregate(Sum("_c", alias_name="n_docs"))
        .to_pandas()
    )
    n = counts["n_docs"].to_numpy(dtype="int64")
    pw = np.power(n.astype("float64"), alpha)
    out = pd.DataFrame({
        "source": counts[source_col],
        "n_docs": n,
        "natural_share": np.round(n / n.sum(), ndigits),
        "weight": np.round(pw / pw.sum(), ndigits),
    }).sort_values("source").reset_index(drop=True)
    return ray.data.from_pandas(out)


def bigram_logprob(
    ds: ray.data.Dataset, id_col: str, text_col: str, ndigits: int = 6,
    vocab_broadcast_limit: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-document mean bigram conditional log-probability under the
    corpus's own bigram LM: ``mean over i of ln(c(w_i, w_i+1) / c_head(w_i))``
    where ``c_head(w)`` counts ``w`` as the FIRST element of any bigram — the
    maximum-likelihood ``P(w2|w1)``, the next step up from
    :func:`unigram_logprob` in a CCNet-style quality stack (garbled text has
    plausible unigrams but implausible transitions).

    Same tokenizer as the token ops (lowercase, single-space split, drop
    empties); docs with <2 tokens are dropped. Same physical planning as
    :func:`unigram_logprob`: pass A reduces per-batch bigram counts to an
    O(bigram-vocab) table (head counts derive from it by one more tiny
    groupby); within ``vocab_broadcast_limit`` both maps broadcast via
    ``ray.put`` and per-doc means need NO shuffle, above it pass B becomes
    explode -> equi-join on the bigram -> per-doc partials -> groupby(id).
    Output: ``(id_col, n_bigrams, avg_logprob)``.
    """
    import pandas as pd

    limit = VOCAB_BROADCAST_LIMIT if vocab_broadcast_limit is None else vocab_broadcast_limit

    def _doc_bigrams(df: "pd.DataFrame"):
        # vectorized adjacency: explode the filtered token stream, then a
        # C-level per-doc shift(-1) pairs each token with its successor
        s = df[text_col].fillna("").str.lower().str.split(" ").explode()
        s = s[s != ""].dropna()
        nxt = s.groupby(level=0).shift(-1)
        m = nxt.notna()
        return s[m].str.cat(nxt[m], sep=" ")

    def _cnt(df: "pd.DataFrame") -> pa.Table:
        vc = _doc_bigrams(df).value_counts()
        return pa.table({"bigram": pa.array(vc.index, pa.string()),
                         "_c": pa.array(vc.to_numpy(), pa.int64())})

    counts = (
        ds.select_columns([text_col])
        .map_batches(_cnt, batch_format="pandas")
        .groupby("bigram")
        .aggregate(Sum("_c", alias_name="c"))
        .materialize()
    )

    def _heads(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"head": pa.array([], pa.string()),
                             "_hc": pa.array([], pa.int64())})
        bg = batch.column("bigram").to_pandas()
        return pa.Table.from_pandas(pd.DataFrame({
            "head": bg.str.split(" ").str[0],
            "_hc": batch.column("c").to_pandas(),
        }), preserve_index=False).replace_schema_metadata(None)

    head_counts = (counts.map_batches(_heads, batch_format="pyarrow")
                   .groupby("head").aggregate(Sum("_hc", alias_name="hc"))
                   .materialize())

    if counts.count() <= limit:
        cm = counts.to_pandas()
        hm = head_counts.to_pandas()
        ref = ray.put((dict(zip(cm["bigram"], cm["c"].astype("int64"))),
                       dict(zip(hm["head"], hm["hc"].astype("int64")))))

        def _score(df: "pd.DataFrame") -> pa.Table:
            bmap, hmap = ray.get(ref)
            bg = _doc_bigrams(df)
            if not len(bg):
                empty = pd.DataFrame({
                    id_col: df[id_col].iloc[:0],
                    "n_bigrams": pd.Series([], dtype="int64"),
                    "avg_logprob": pd.Series([], dtype="float64")})
                return pa.Table.from_pandas(
                    empty, preserve_index=False).replace_schema_metadata(None)
            heads = bg.str.split(" ").str[0]
            lp = pd.Series(
                np.log(bg.map(bmap).to_numpy(dtype=float)
                       / heads.map(hmap).to_numpy(dtype=float)),
                index=bg.index)
            g = lp.groupby(level=0)
            n = g.size().astype("int64")
            out = pd.DataFrame({
                id_col: df.loc[n.index, id_col],
                "n_bigrams": n,
                "avg_logprob": g.mean().round(ndigits),
            })
            return pa.Table.from_pandas(
                out, preserve_index=False).replace_schema_metadata(None)

        return ds.select_columns([id_col, text_col]).map_batches(
            _score, batch_format="pandas")

    # distributed plan: fold head counts INTO the vocab table first (one
    # vocab-sized join, materialized so the executor never schedules two
    # join pools at once — chained joins deadlock under tight CPU counts),
    # then a SINGLE corpus-sized join pairs the bigram stream with (c, hc)
    def _pairs(df: "pd.DataFrame") -> pa.Table:
        bg = _doc_bigrams(df)
        return pa.Table.from_pandas(
            pd.DataFrame({id_col: df.loc[bg.index, id_col], "bigram": bg}),
            preserve_index=False).replace_schema_metadata(None)

    def _with_head(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "head": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        bgp = batch.column("bigram").to_pandas()
        return pa.Table.from_pandas(pd.DataFrame({
            "bigram": bgp, "head": bgp.str.split(" ").str[0],
            "c": batch.column("c").to_pandas().astype("int64"),
        }), preserve_index=False).replace_schema_metadata(None)

    heads_a = ensure_arrow_schema(
        head_counts, pa.schema([("head", pa.string()), ("hc", pa.int64())]))
    counts_hc = (counts.map_batches(_with_head, batch_format="pyarrow")
                 .join(heads_a, join_type="inner", num_partitions=4,
                       on=("head",))
                 .drop_columns(["head"]).materialize())
    pairs = ds.select_columns([id_col, text_col]).map_batches(
        _pairs, batch_format="pandas")
    joined = pairs.join(counts_hc, join_type="inner",
                        num_partitions=_join_partitions(counts_hc),
                        on=("bigram",))

    def _partial(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        df = batch.to_pandas()
        df["_lp"] = np.log(df["c"].to_numpy(dtype=float)
                           / df["hc"].to_numpy(dtype=float))
        g = df.groupby(id_col, observed=True)["_lp"].agg(["sum", "size"])
        return pa.table({
            id_col: pa.array(g.index.to_numpy(), id_type),
            "_slp": pa.array(g["sum"].to_numpy(), pa.float64()),
            "_n": pa.array(g["size"].to_numpy(dtype="int64"), pa.int64()),
        })

    agg = (joined.map_batches(_partial, batch_format="pyarrow")
           .groupby(id_col)
           .aggregate(Sum("_slp", alias_name="_slp"),
                      Sum("_n", alias_name="n_bigrams")))

    def _fin(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n_bigrams"), pa.int64())
        avg = pc.round(pc.divide(batch.column("_slp"),
                                 pc.cast(n, pa.float64())), ndigits=ndigits)
        return pa.table({id_col: batch.column(id_col),
                         "n_bigrams": n, "avg_logprob": avg})

    return agg.map_batches(_fin, batch_format="pyarrow")


def approx_quantiles_bottomk(
    ds: ray.data.Dataset, val_col: str, id_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75), k: int = 4096,
    ndigits: int = 6,
) -> ray.data.Dataset:
    """Approximate quantiles from a DETERMINISTIC bottom-k hash sketch.

    The k rows with the smallest ``md5(id)`` form a uniform sample of the
    population (the hash is a fixed random permutation of ids), so the
    sample quantile estimates the population quantile with rank error
    ~O(1/sqrt(k)). Unlike a reservoir, the sketch is deterministic and
    MERGEABLE with an exact merge (union -> keep k smallest), so the result
    is partition-invariant bit-for-bit: per-batch partials keep their local
    bottom-k, one distributed ``sort(hash).limit(k)`` merges them, and the
    driver touches only k rows. Exact-quantile ops exist alongside
    (``exact_quantiles``); this is the sketch for 100-TB inputs where a full
    sort per quantile query is not worth it. pytest pins the error bound and
    the partition invariance (``tests/test_analytics_extra.py``).
    """
    import hashlib

    import pandas as pd

    from .sampling import _md5_expr

    def _partial(df: "pd.DataFrame") -> pa.Table:
        try:
            h = _md5_expr(df[id_col].tolist(), "md5(s)").to_pylist()
        except ImportError:  # same duckdb-optional contract as sampling
            h = [hashlib.md5(str(v).encode()).hexdigest()
                 for v in df[id_col].tolist()]
        out = pd.DataFrame({"_h": h, "_v": df[val_col].astype("float64")})
        out = out.sort_values("_h", kind="mergesort").head(k)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    sample = (ds.select_columns([id_col, val_col])
              .map_batches(_partial, batch_format="pandas")
              .sort("_h").limit(k))
    vals = np.sort(np.concatenate(
        [b.column("_v").to_numpy(zero_copy_only=False)
         for b in sample.iter_batches(batch_format="pyarrow") if b.num_rows]
        or [np.array([], dtype="float64")]))
    cols: dict = {}
    for q in qs:
        if len(vals):
            cols[f"q{int(round(q * 100)):02d}"] = [round(
                float(np.quantile(vals, q, method="lower")), ndigits)]
        else:
            cols[f"q{int(round(q * 100)):02d}"] = [None]
    cols["sample_n"] = [int(len(vals))]
    return ray.data.from_arrow(pa.table(cols))


def tumbling_window_agg(
    ds: ray.data.Dataset, ts_col: str, key_col: str, val_col: str,
    width_s: int = 900, ndigits: int = 6,
) -> ray.data.Dataset:
    """Tumbling event-time windows: per (key, ``width_s``-second window) count
    and sum. The shuffle carries only per-batch (key, window, count, sum)
    partials — O(keys x windows), never O(rows). ``win_start`` is the window's
    epoch-seconds origin (timezone-free, engine-portable)."""

    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        # normalize any timestamp unit to microseconds before the epoch math
        us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        win = pc.multiply(
            pc.divide(us, width_s * 1_000_000), pa.scalar(width_s, pa.int64()))
        df = pa.table({
            "k": batch.column(key_col), "win_start": win,
            "v": pc.cast(batch.column(val_col), pa.float64()),
        }).to_pandas()
        g = (df.groupby(["k", "win_start"], observed=True)
             .agg(_c=("v", "count"), _s=("v", "sum")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    agg = (
        ds.select_columns([ts_col, key_col, val_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(["k", "win_start"])
        .aggregate(Sum("_c", alias_name="n"), Sum("_s", alias_name="s"))
    )

    def _fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch.column("k"),
            "win_start": batch.column("win_start"),
            "n": pc.cast(batch.column("n"), pa.int64()),
            "sum_value": pc.round(batch.column("s"), ndigits=ndigits),
        })

    return agg.map_batches(_fin, batch_format="pyarrow")


def regex_field_agg(
    ds: ray.data.Dataset, src_col: str, key_col: str, pattern: str,
    ndigits: int = 6,
) -> ray.data.Dataset:
    """Vectorized regex field extraction + per-key aggregate.

    ``pattern`` must contain ONE named group ``(?P<v>...)`` capturing an
    integer (e.g. a field of a JSON-ish props string). Rows without a match
    are dropped. Output per key: n, sum_v, avg_v. Extraction runs through
    ``pyarrow.compute.extract_regex`` (RE2, no Python loop); the shuffle
    carries per-batch partials only."""

    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        arr = pc.fill_null(pc.cast(batch.column(src_col), pa.string()), "")
        ext = pc.extract_regex(arr, pattern)
        ok = pc.is_valid(ext)
        vals = pc.cast(pc.struct_field(ext, "v"), pa.int64())
        df = pa.table({
            "k": batch.column(key_col), "ok": ok, "v": vals,
        }).to_pandas()
        df = df[df["ok"]]
        g = (df.groupby("k", observed=True)
             .agg(_c=("v", "count"), _s=("v", "sum")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    agg = (
        ds.select_columns([src_col, key_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("_c", alias_name="n"), Sum("_s", alias_name="s"))
    )

    def _fin(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n"), pa.float64())
        return pa.table({
            key_col: batch.column("k"),
            "n": pc.cast(batch.column("n"), pa.int64()),
            "sum_v": pc.cast(batch.column("s"), pa.int64()),
            "avg_v": pc.round(pc.divide(pc.cast(batch.column("s"), pa.float64()), n),
                              ndigits=ndigits),
        })

    return agg.map_batches(_fin, batch_format="pyarrow")


def global_rank(
    ds: ray.data.Dataset, keys: Sequence[str], rank_col: str = "rank",
) -> ray.data.Dataset:
    """Dense 0-based global row rank under ``ORDER BY keys`` (ties impossible:
    the composite key must be UNIQUE — documented partitioning assumption).

    Distributed plan: one range-partitioning sort (Ray Data ``sort`` — blocks
    come back globally ordered and internally sorted), then a metadata-sized
    pass collects one (first-key, block-row-count) row PER BLOCK; the driver
    cumsums those O(#blocks) rows into block-start offsets keyed by the
    block's first composite key, broadcasts the tiny map, and a stateless
    second pass assigns ``offset + arange(n)`` per block. No row-level data
    ever reaches the driver. ``batch_size=None`` keeps task == block so the
    offset lookup is exact."""
    keys = list(keys)
    sorted_ds = ds.sort(keys).materialize()

    def _summ(batch: pa.Table) -> pa.Table:
        # one row per block: the block's first composite key (typed, for the
        # driver-side ordering) + its stringified lookup id + the row count
        sl = batch.slice(0, min(1, batch.num_rows)).select(keys)
        first_id = pa.array(
            ["\x1f".join(str(batch.column(c)[0].as_py()) for c in keys)]
            if batch.num_rows else [], pa.string())
        return sl.append_column("_first", first_id).append_column(
            "_n", pa.array([batch.num_rows] if batch.num_rows else [],
                           pa.int64()))

    summ = (sorted_ds.map_batches(_summ, batch_format="pyarrow", batch_size=None)
            .to_pandas())
    # driver work is O(#blocks): blocks are range-partitioned by the sort, so
    # ordering block summaries by their typed first keys IS the block order
    # (an all-empty input yields a column-less frame — nothing to order)
    offsets: dict = {}
    total = 0
    if len(summ):
        summ = summ.sort_values(keys, kind="mergesort").reset_index(drop=True)
        for first, nrows in zip(summ["_first"], summ["_n"]):
            offsets[first] = total
            total += int(nrows)
    ref = ray.put(offsets)

    def _annot(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(rank_col, pa.array([], pa.int64()))
        off = ray.get(ref)
        first = "\x1f".join(str(batch.column(c)[0].as_py()) for c in keys)
        start = off[first]
        return batch.append_column(
            rank_col, pa.array(np.arange(start, start + batch.num_rows),
                               pa.int64()))

    return sorted_ds.map_batches(_annot, batch_format="pyarrow",
                                 batch_size=None)


def ntile(
    ds: ray.data.Dataset, keys: Sequence[str], n: int,
    rank_col: str = "rank", tile_col: str = "tile",
) -> ray.data.Dataset:
    """SQL ``NTILE(n) OVER (ORDER BY keys)`` (first buckets take the
    remainder rows), riding on :func:`global_rank`."""
    ranked = global_rank(ds, keys, rank_col)
    total = ds.count()
    base, rem = divmod(total, n)

    def _tile(batch: pa.Table) -> pa.Table:
        r = batch.column(rank_col).to_numpy(zero_copy_only=False)
        cut = rem * (base + 1)
        t = np.where(
            r < cut,
            r // max(base + 1, 1) + 1,
            rem + (r - cut) // max(base, 1) + 1,
        ).astype(np.int64)
        return batch.append_column(tile_col, pa.array(t, pa.int64()))

    return ranked.map_batches(_tile, batch_format="pyarrow")


def sliding_window_agg(
    ds: ray.data.Dataset, ts_col: str, key_col: str, val_col: str,
    width_s: int = 3600, slide_s: int = 900, ndigits: int = 6,
) -> ray.data.Dataset:
    """Sliding (overlapping) event-time windows: per (key, window of
    ``width_s`` seconds sliding every ``slide_s``) count and sum.

    ``width_s`` must be a multiple of ``slide_s``. Rows are first reduced to
    (key, slide-bucket) partials per batch; only those partials are expanded
    x ``width/slide`` into the windows they feed — the expansion happens on
    bucket-level aggregates, never on raw rows, so shuffle volume is
    O(keys x buckets x overlap)."""
    if width_s % slide_s:
        raise ValueError("width_s must be a multiple of slide_s")
    overlap = width_s // slide_s

    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        bucket = pc.multiply(
            pc.divide(us, slide_s * 1_000_000), pa.scalar(slide_s, pa.int64()))
        df = pa.table({
            "k": batch.column(key_col), "b": bucket,
            "v": pc.cast(batch.column(val_col), pa.float64()),
        }).to_pandas()
        g = (df.groupby(["k", "b"], observed=True)
             .agg(_c=("v", "count"), _s=("v", "sum")).reset_index())
        # expand each bucket partial into the `overlap` windows containing it
        reps = pd.concat(
            [g.assign(win_start=g["b"] - i * slide_s) for i in range(overlap)],
            ignore_index=True,
        )
        return pa.Table.from_pandas(
            reps[["k", "win_start", "_c", "_s"]], preserve_index=False).replace_schema_metadata(None)

    agg = (
        ds.select_columns([ts_col, key_col, val_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(["k", "win_start"])
        .aggregate(Sum("_c", alias_name="n"), Sum("_s", alias_name="s"))
    )

    def _fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch.column("k"),
            "win_start": batch.column("win_start"),
            "n": pc.cast(batch.column("n"), pa.int64()),
            "sum_value": pc.round(batch.column("s"), ndigits=ndigits),
        })

    return agg.map_batches(_fin, batch_format="pyarrow")


def distinct_count_agg(
    ds: ray.data.Dataset, keys: Sequence[str], distinct_col: str,
    out_col: str = "n_distinct",
) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT distinct_col) per ``keys``.

    Two-level aggregation: per-batch DISTINCT (keys + value) tuples (drops
    in-batch duplicates before anything moves), a first ``groupby`` dedupes
    the tuples globally, and a second — over the already-unique tuples, so its
    input is O(distinct combos) — counts per key. No driver materialization."""
    keys = list(keys)

    def _tuples(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.select(keys + [distinct_col]).to_pandas()
        return pa.Table.from_pandas(df.drop_duplicates(), preserve_index=False).replace_schema_metadata(None)

    uniq = (
        ds.select_columns(keys + [distinct_col])
        .map_batches(_tuples, batch_format="pyarrow")
        .groupby(keys + [distinct_col])
        .aggregate(Count(alias_name="_dup"))
    )

    def _strip(batch: pa.Table) -> pa.Table:
        return batch.select(keys + [distinct_col])

    counted = (
        uniq.map_batches(_strip, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Count(alias_name=out_col))
    )

    def _fin(batch: pa.Table) -> pa.Table:
        if out_col not in batch.column_names:  # column-less empty agg block
            return batch
        i = batch.column_names.index(out_col)
        return batch.set_column(
            i, out_col, pc.cast(batch.column(out_col), pa.int64()))

    return counted.map_batches(_fin, batch_format="pyarrow")


def group_stats(
    ds: ray.data.Dataset, key_col: str, val_col: str, ndigits: int = 6,
) -> ray.data.Dataset:
    """Per-key n / sum / avg / min / max over a numeric column, all from
    per-batch partials (single small shuffle)."""

    def _partial(df):
        g = (df.groupby(key_col, observed=True)[val_col]
             .agg(_c="count", _s="sum", _mn="min", _mx="max").reset_index())
        return g

    agg = (
        ds.select_columns([key_col, val_col])
        .map_batches(_partial, batch_format="pandas")
        .groupby(key_col)
        .aggregate(Sum("_c", alias_name="n"), Sum("_s", alias_name="s"),
                   Min("_mn", alias_name="min_v"), Max("_mx", alias_name="max_v"))
    )

    def _fin(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n"), pa.float64())
        return pa.table({
            key_col: batch.column(key_col),
            "n": pc.cast(batch.column("n"), pa.int64()),
            "sum_v": pc.cast(batch.column("s"), pa.int64())
            if pa.types.is_integer(batch.schema.field("s").type)
            else pc.round(batch.column("s"), ndigits=ndigits),
            "avg_v": pc.round(
                pc.divide(pc.cast(batch.column("s"), pa.float64()), n),
                ndigits=ndigits),
            "min_v": batch.column("min_v"),
            "max_v": batch.column("max_v"),
        })

    return agg.map_batches(_fin, batch_format="pyarrow")


def star_revenue_by_nation(
    lineitem: ray.data.Dataset, orders: ray.data.Dataset,
    customer: ray.data.Dataset, nation: ray.data.Dataset,
    num_partitions: Optional[int] = None, ndigits: int = 4,
) -> ray.data.Dataset:
    """TPC-H-Q5-style star join: revenue per nation.

    Scale shape: the fact side is PRE-AGGREGATED per batch to
    (l_orderkey, partial revenue) BEFORE any exchange (collapsing the ~4:1
    lineitem:orders fan-in), then one shuffle ``groupby`` finishes the
    per-order revenue, one hash ``Dataset.join`` attaches ``o_custkey``
    (orders is fact-sized — broadcast would not hold at scale), and the two
    genuinely small dimensions (customer -> nationkey, nation -> name) are
    broadcast as ``ray.put`` maps probed inside ``map_batches`` — the classic
    map-side dim join. Output: (n_name, revenue).

    ``num_partitions=None`` sizes the join's hash-shuffle from the fact side's
    estimated in-memory bytes (~128 MiB per partition, floor 4): Ray's hash
    join spins one aggregator actor per partition, so an oversized fixed count
    dominates wall time on small inputs (measured at sf0.1: 32 partitions
    12.8 s vs 4 partitions 4.4 s for identical output) while a too-small count
    would bottleneck the exchange at scale — multi-node callers with >64 GiB
    fact sides should pass an explicit count sized to the cluster."""
    import pandas as pd

    if num_partitions is None:
        est = lineitem.size_bytes() or 0
        num_partitions = max(4, min(512, -(-est // (128 << 20))))

    def _fact_partial(batch: pa.Table) -> pa.Table:
        # decimal-exact: 2-dp price/discount -> int64 1e-4-unit revenue, so
        # the sum is order-independent (no float drift vs the SQL oracle);
        # int64 headroom ~1e9 rows per group at ~1e9 units/row
        price_c = pc.cast(pc.round(pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()), 100.0)),
            pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(
            pc.cast(batch.column("l_discount"), pa.float64()), 100.0)),
            pa.int64())
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()),
                                               disc_c))
        df = pa.table({"l_orderkey": batch.column("l_orderkey"),
                       "_r": rev}).to_pandas()
        return pa.Table.from_pandas(
            df.groupby("l_orderkey", observed=True)["_r"].sum().reset_index(),
            preserve_index=False).replace_schema_metadata(None)

    # per-BATCH pre-aggregation only: a global per-order groupby would be a
    # second all-to-all for nothing — revenue is re-summed per nation after
    # the join, and the join is happy with several partial rows per order
    per_order = (
        lineitem.select_columns(["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(_fact_partial, batch_format="pyarrow")
    )

    joined = per_order.join(
        orders.select_columns(["o_orderkey", "o_custkey"]),
        join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    # dims as a DENSE numpy lookup (custkey is a small dense int id): one
    # fancy-index per batch replaces a per-row Python dict probe — this was
    # the hottest loop of the whole bench suite before vectorization
    ck_parts, nk_parts = [], []
    for b in (customer.select_columns(["c_custkey", "c_nationkey"])
              .iter_batches(batch_format="pyarrow")):
        ck_parts.append(b.column("c_custkey").to_numpy(zero_copy_only=False))
        nk_parts.append(b.column("c_nationkey").to_numpy(zero_copy_only=False))
    ck = np.concatenate(ck_parts).astype(np.int64) if ck_parts else np.array([], np.int64)
    nk = np.concatenate(nk_parts).astype(np.int64) if nk_parts else np.array([], np.int64)
    cn_arr = np.full(int(ck.max()) + 1 if ck.size else 1, -1, dtype=np.int32)
    cn_arr[ck] = nk.astype(np.int32)
    nation_name = {
        int(r["n_nationkey"]): r["n_name"]
        for b in nation.select_columns(["n_nationkey", "n_name"])
        .iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    cn_ref = ray.put(cn_arr)

    def _dims(batch: pa.Table) -> pa.Table:
        # int-keyed partial sum (pandas C hash agg; int64 stays decimal-exact);
        # the ~25 nation NAMES only ever touch the final ≤25-row aggregate
        cn = ray.get(cn_ref)
        cust = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "_nk": cn[cust.astype(np.int64)],
            "_r": batch.column("_r").to_numpy(zero_copy_only=False),
        })
        return pa.Table.from_pandas(
            df.groupby("_nk", observed=True)["_r"].sum().reset_index(),
            preserve_index=False).replace_schema_metadata(None)

    agg = (joined.map_batches(_dims, batch_format="pyarrow")
           .groupby("_nk").aggregate(Sum("_r", alias_name="revenue")))

    def _fin(batch: pa.Table) -> pa.Table:
        keys = batch.column("_nk").to_pylist()
        return pa.table({
            "n_name": pa.array([nation_name[int(k)] for k in keys], pa.string()),
            "revenue": pc.round(
                pc.divide(pc.cast(batch.column("revenue"), pa.float64()),
                          10000.0), ndigits=ndigits),
        })

    return agg.map_batches(_fin, batch_format="pyarrow")


def grouped_concat(
    ds: ray.data.Dataset, key_col: str, val_col: str, sep: str = ",",
    out_col: str = "vals",
) -> ray.data.Dataset:
    """Deterministic per-key concatenation of ``val_col`` (values sorted
    ascending, joined with ``sep``) — SQL ``string_agg(v, sep ORDER BY v)``.

    The rows must co-locate per key, so this is one genuine shuffle
    (``groupby().map_groups``); the per-group sort is the determinism
    contract. Bounded-group premise: a single key's values must fit a task
    (same premise as per-group quantiles)."""
    import pandas as pd

    def _concat(df: "pd.DataFrame") -> "pd.DataFrame":
        vals = sorted(str(v) for v in df[val_col])
        return pd.DataFrame({key_col: [df[key_col].iloc[0]],
                             out_col: [sep.join(vals)]})

    return (ds.select_columns([key_col, val_col])
            .groupby(key_col).map_groups(_concat, batch_format="pandas"))


_HLL_P = 12  # 4096 registers; relative error ~1.04/sqrt(4096) ~ 1.6%


def _hll_hash(col_arr, n_expected=None) -> np.ndarray:
    """splitmix64-mixed uint64 hashes of an Arrow column (shared by the
    global and per-key HLL sketches — identical hashing keeps both
    deterministic and partition-invariant)."""
    def _mix(v: np.ndarray) -> np.ndarray:
        v = (v + np.uint64(0x9E3779B97F4A7C15))
        v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return v ^ (v >> np.uint64(31))

    if pa.types.is_integer(col_arr.type):
        return _mix(col_arr.to_numpy(zero_copy_only=False).astype(np.uint64))
    import pandas as pd

    h = pd.util.hash_array(
        col_arr.to_pandas().astype(str).to_numpy(dtype=object)
    ).astype(np.uint64)
    return _mix(h)


def _hll_ranks(h: np.ndarray, p: int) -> tuple:
    """(register index, rank) pairs of pre-mixed hashes for a 2^p sketch."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    rank = np.zeros(len(h), dtype=np.uint8)
    nz = rest != 0
    bl = np.zeros(len(h), dtype=np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = r >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        r[big] >>= np.uint64(shift)
    bl[rest != 0] += 1
    rank[nz] = (64 - bl[nz] + 1)
    rank[~nz] = 64 - p + 1
    return idx, rank


def _hll_estimate(regs: np.ndarray) -> int:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return int(round(est))


def approx_distinct(ds: ray.data.Dataset, col: str, p: int = _HLL_P) -> int:
    """HyperLogLog approximate COUNT(DISTINCT col).

    Per-batch partial: a 2^p-register max-rank sketch built vectorized (numpy)
    from a splitmix64 hash of the values; partials merge by elementwise max —
    a classic mergeable sketch, so the shuffle carries 2^p bytes per batch
    regardless of row count, and the driver folds O(#batches) sketches.
    Standard error ~1.04/sqrt(2^p) (~1.6% at p=12); see
    tests/test_analytics_extra.py for the pinned error-bound check."""
    m = 1 << p

    def _sketch(batch: pa.Table) -> pa.Table:
        idx, rank = _hll_ranks(_hll_hash(batch.column(col)), p)
        regs = np.zeros(m, dtype=np.uint8)
        np.maximum.at(regs, idx, rank)
        return pa.table({"regs": [regs.tobytes()]})

    regs = np.zeros(m, dtype=np.uint8)
    for b in (ds.select_columns([col])
              .map_batches(_sketch, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for buf in b.column("regs").to_pylist():
            regs = np.maximum(regs, np.frombuffer(buf, dtype=np.uint8))

    return _hll_estimate(regs)


def exact_quantiles_cont(
    ds: ray.data.Dataset, col: str, qs: Sequence[float]
) -> dict[float, float]:
    """Exact INTERPOLATED quantiles (DuckDB ``quantile_cont`` / numpy
    'linear' semantics: position ``h = (n-1)*q``, linear between the two
    bracketing sorted elements). Same scale shape as
    :func:`exact_quantiles`: one distributed sort, O(len(qs)) row picks."""
    n = ds.count()
    if not n:
        return {q: None for q in qs}
    pos = {q: (n - 1) * q for q in qs}
    idxs = sorted({i for h in pos.values()
                   for i in (int(math.floor(h)), min(int(math.floor(h)) + 1,
                                                     n - 1))})
    s = ds.select_columns([col]).sort(col)
    parts = s.split_at_indices(idxs)
    at = {i: float(parts[k + 1].take(1)[0][col]) for k, i in enumerate(idxs)}
    out = {}
    for q, h in pos.items():
        lo = int(math.floor(h))
        hi = min(lo + 1, n - 1)
        frac = h - lo
        out[q] = at[lo] + (at[hi] - at[lo]) * frac
    return out


def left_join_counts(
    ds: ray.data.Dataset, key_col: str, right: ray.data.Dataset,
    right_key: str, keep_cols: Sequence[str], out_col: str = "n_matches",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """LEFT OUTER join semantics: every left row with the count of matching
    right rows (0 when none). The right side is PRE-COUNTED per key before the
    join (one small groupby — count rows, not payloads), so the hash join
    moves O(left + distinct right keys), never O(right rows)."""
    counts = right.groupby(right_key).count()

    def _cnt(batch: pa.Table) -> pa.Table:
        return pa.table({"_k": batch.column(right_key),
                         "_c": pc.cast(batch.column("count()"), pa.int64())})

    joined = ds.select_columns(list(keep_cols)).join(
        counts.map_batches(_cnt, batch_format="pyarrow"),
        join_type="left_outer", num_partitions=num_partitions,
        on=(key_col,), right_on=("_k",),
    )

    def _fin(batch: pa.Table) -> pa.Table:
        out = batch.select(list(keep_cols))
        return out.append_column(
            out_col, pc.fill_null(pc.cast(batch.column("_c"), pa.int64()), 0))

    return joined.map_batches(_fin, batch_format="pyarrow")


def rolling_window_per_key(
    ds: ray.data.Dataset, key_col: str, order_cols: Sequence[str],
    val_col: str, window: int, id_cols: Sequence[str], ndigits: int = 4,
) -> ray.data.Dataset:
    """Per-key trailing row-window mean: SQL ``avg(v) OVER (PARTITION BY key
    ORDER BY order_cols ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.

    One shuffle co-locates each key's rows (``groupby().map_groups``); the
    per-group sort over ``order_cols`` is the determinism contract.
    Bounded-group premise: one key's rows fit a task (same as running sums /
    per-group quantiles — salt the key upstream if a key is unbounded)."""
    import pandas as pd

    cols = list(dict.fromkeys(
        [key_col, *order_cols, val_col, *id_cols]))

    def _roll(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(list(order_cols), kind="mergesort")
        out = g[list(id_cols)].copy()
        out[key_col] = g[key_col]
        out["trailing_avg"] = (
            g[val_col].rolling(window, min_periods=1).mean().round(ndigits))
        return out

    return (ds.select_columns(cols)
            .groupby(key_col).map_groups(_roll, batch_format="pandas"))


def global_running_sum(
    ds: ray.data.Dataset, keys: Sequence[str], val_col: str,
    out_col: str = "running", scale: int = 100,
) -> ray.data.Dataset:
    """Distributed prefix scan: SQL ``sum(v) OVER (ORDER BY keys ROWS
    UNBOUNDED PRECEDING)`` with DECIMAL-EXACT arithmetic (values are
    ``round(v*scale)`` int64 units, so partial-sum association cannot drift
    from the sequential SQL result; divided back once on output).

    Same plan as :func:`global_rank`: one range-partitioning sort, a
    metadata-sized pass collecting one (first-key, block-unit-sum) row per
    block, a driver-side exclusive prefix over those O(#blocks) rows, then a
    stateless pass adds each block's broadcast offset to its in-block cumsum.
    Composite key must be unique (documented assumption)."""
    keys = list(keys)
    sorted_ds = ds.sort(keys).materialize()

    def _units(batch: pa.Table) -> pa.Array:
        return pc.cast(pc.round(pc.multiply(
            pc.cast(batch.column(val_col), pa.float64()), float(scale))),
            pa.int64())

    def _summ(batch: pa.Table) -> pa.Table:
        sl = batch.slice(0, min(1, batch.num_rows)).select(keys)
        first_id = pa.array(
            ["\x1f".join(str(batch.column(c)[0].as_py()) for c in keys)]
            if batch.num_rows else [], pa.string())
        tot = pa.array(
            [pc.sum(_units(batch)).as_py() or 0] if batch.num_rows else [],
            pa.int64())
        return sl.append_column("_first", first_id).append_column("_sum", tot)

    summ = (sorted_ds.map_batches(_summ, batch_format="pyarrow",
                                  batch_size=None).to_pandas())
    offsets: dict = {}
    total = 0
    if len(summ):
        summ = summ.sort_values(keys, kind="mergesort").reset_index(drop=True)
        for first, bsum in zip(summ["_first"], summ["_sum"]):
            offsets[first] = total
            total += int(bsum)
    ref = ray.put(offsets)

    def _annot(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.float64()))
        off = ray.get(ref)
        first = "\x1f".join(str(batch.column(c)[0].as_py()) for c in keys)
        units = _units(batch).to_numpy(zero_copy_only=False)
        running = off[first] + np.cumsum(units)
        return batch.append_column(
            out_col, pa.array(np.round(running / scale, 2), pa.float64()))

    return sorted_ds.map_batches(_annot, batch_format="pyarrow",
                                 batch_size=None)


def lag_delta_per_key(
    ds: ray.data.Dataset, key_col: str, order_cols: Sequence[str],
    val_col: str, id_cols: Sequence[str], ndigits: int = 4,
) -> ray.data.Dataset:
    """Per-key LAG delta: ``v - lag(v) OVER (PARTITION BY key ORDER BY
    order_cols)`` (NULL for each key's first row). Same co-locating
    shuffle + deterministic per-group sort as the other per-key window ops."""
    import pandas as pd

    cols = list(dict.fromkeys([key_col, *order_cols, val_col, *id_cols]))

    def _lag(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(list(order_cols), kind="mergesort")
        out = g[list(id_cols)].copy()
        out[key_col] = g[key_col]
        out["delta"] = (g[val_col] - g[val_col].shift(1)).round(ndigits)
        return out

    return (ds.select_columns(cols)
            .groupby(key_col).map_groups(_lag, batch_format="pandas"))


def distinct_except(
    left: ray.data.Dataset, left_col: str,
    right: ray.data.Dataset, right_col: str,
) -> ray.data.Dataset:
    """SQL ``SELECT DISTINCT l EXCEPT SELECT r``: distinct left values absent
    from the right value set. Left side dedupes through one key-only groupby;
    the right distinct set rides the broadcast anti-join (O(distinct right))."""
    uniq = left.select_columns([left_col]).groupby(left_col).count()

    def _strip(batch: pa.Table) -> pa.Table:
        return batch.select([left_col])

    return semi_join_ids(
        uniq.map_batches(_strip, batch_format="pyarrow"), left_col,
        right, right_col, anti=True)


def late_event_flags(
    ds: ray.data.Dataset, key_col: str, order_col: str, ts_col: str,
    id_cols: Sequence[str],
) -> ray.data.Dataset:
    """Late-data detection: a row is LATE if its event time precedes the
    running per-key watermark (max event time over all earlier arrivals,
    arrival order = ``order_col``) — i.e. SQL
    ``ts < max(ts) OVER (PARTITION BY key ORDER BY order_col
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``.

    One co-locating shuffle per key; the per-group pass is a vectorized
    cummax. Bounded-group premise as with the other per-key window ops."""
    import pandas as pd

    cols = list(dict.fromkeys([key_col, order_col, ts_col, *id_cols]))

    def _flags(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(order_col, kind="mergesort")
        wm = g[ts_col].cummax().shift(1)
        out = g[list(id_cols)].copy()
        out[key_col] = g[key_col]
        out["is_late"] = (g[ts_col] < wm).fillna(False).astype(bool)
        return out

    return (ds.select_columns(cols)
            .groupby(key_col).map_groups(_flags, batch_format="pandas"))


def quality_classifier(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    weights: Sequence[float] = (-3.8, 0.4, 0.1, 2.0, 2.0),
    ndigits: int = 6,
) -> ray.data.Dataset:
    """Linear quality-model inference over text features — the CCNet/Gopher
    style learned-filter stage with a deterministic stand-in model (swap
    ``weights`` for trained coefficients; the plumbing is the operator).

    ``z = w0 + w1*ln(1 + n_tokens) + w2*avg_token_len + w3*stopword_ratio +
    w4*alpha_ratio`` over :func:`functions.textfns.quality_features`;
    ``quality_score = sigmoid(z)``; ``quality_label = keep iff z >= 0``
    (exactly score >= 0.5, decided on z so the SQL oracle can't diverge on a
    rounded boundary). Weights ride to every task via ``ray.put`` once —
    the broadcast-small-side pattern a real model's weight matrix needs.
    """
    from ..functions import textfns

    w_ref = ray.put(np.asarray(weights, dtype=np.float64))

    def _score(batch: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        texts = batch.column(text_col).to_pylist()
        feats = np.empty((len(texts), 4), dtype=np.float64)
        for i, t in enumerate(texts):
            q = textfns.quality_features(t)
            feats[i] = (q["n_tokens"], q["avg_token_len"],
                        q["stopword_ratio"], q["alpha_ratio"])
        z = (w[0] + w[1] * np.log1p(feats[:, 0]) + w[2] * feats[:, 1]
             + w[3] * feats[:, 2] + w[4] * feats[:, 3])
        score = np.round(1.0 / (1.0 + np.exp(-z)), ndigits)
        label = np.where(z >= 0.0, "keep", "drop")
        return pa.table({
            id_col: batch.column(id_col),
            "quality_score": pa.array(score, pa.float64()),
            "quality_label": pa.array(label.tolist(), pa.string()),
        })

    return ds.map_batches(_score, batch_format="pyarrow")


def pmi_collocations(
    ds: ray.data.Dataset,
    text_col: str,
    top_k: int = 20,
    min_count: int = 5,
    ndigits: int = 6,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Top-``top_k`` adjacent-bigram collocations by pointwise mutual
    information: ``pmi = log2((cb/nb) / ((c1/nu) * (c2/nu)))`` over
    lowercased whitespace tokens — the standard corpus phrase-mining pass
    (Church & Hanks 1990).

    Scale shape: ONE tokenize pass emits per-batch partial unigram+bigram
    counts under a tagged key (vocab-sized shuffle, never O(tokens)); the
    corpus totals are one tiny aggregate over the counted table. The
    unigram-count attach is JOIN-FREE (the metablocking route —
    ``Dataset.join`` in Ray 2.49 intermittently mis-resolves key columns
    when both inputs derive from one upstream): candidates melt to
    (word key, packed pair, position) rows, unigram counts ride the SAME
    melt as position-0 rows, one ``groupby(word)`` attaches the count, and
    a ``groupby(pair)`` re-assembles (c1, c2). Top-k is a sort+limit over
    candidates. Ties break (pmi desc, w1 asc, w2 asc); pmi is rounded to
    ``ndigits`` BEFORE the sort in both the engine and the SQL oracle.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table):
        uni: Counter = Counter()
        bi: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            ws = [w for w in (t or "").lower().split(" ") if w]
            uni.update(ws)
            bi.update(a + " " + b for a, b in zip(ws, ws[1:]))
        return pa.table({
            "kind": pa.array(["u"] * len(uni) + ["b"] * len(bi), pa.string()),
            "w": pa.array(list(uni.keys()) + list(bi.keys()), pa.string()),
            "cnt": pa.array(list(uni.values()) + list(bi.values()),
                            pa.int64()),
        })

    # ensure_arrow_schema: the hash aggregate emits column-less empty blocks
    # that make a downstream join's key FieldRef unresolvable
    counted = ensure_arrow_schema(
        ds.select_columns([text_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(["kind", "w"]).aggregate(Sum("cnt", alias_name="c")),
        pa.schema([("kind", pa.string()), ("w", pa.string()),
                   ("c", pa.int64())])).materialize()
    totals = {r["kind"]: int(r["sum"]) for r in
              counted.groupby("kind").sum("c").map_batches(
                  lambda b: b.rename_columns(["kind", "sum"]),
                  batch_format="pyarrow").iter_rows()}
    nu, nb = float(totals.get("u", 0)), float(totals.get("b", 0))
    if nb == 0:
        return ray.data.from_arrow(pa.table({
            "w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()), "pmi": pa.array([], pa.float64()),
        }))

    def _melt(b: pa.Table) -> pa.Table:
        # position-0 rows: unigram counts keyed by word; position-1/2 rows:
        # candidate bigrams keyed by their first/second word
        u = b.filter(pc.equal(b.column("kind"), "u"))
        cb_ = b.filter(pc.and_(pc.equal(b.column("kind"), "b"),
                               pc.greater_equal(b.column("c"), min_count)))
        parts = pc.split_pattern(cb_.column("w"), " ")
        n, nuni = cb_.num_rows, u.num_rows
        keys, pairs, cnts = [], [], []
        if nuni:
            keys.append(u.column("w").combine_chunks())
            pairs.append(pa.array([""] * nuni, pa.string()))
            cnts.append(u.column("c").combine_chunks())
        if n:
            keys += [pc.list_element(parts, 0).combine_chunks(),
                     pc.list_element(parts, 1).combine_chunks()]
            pairs += [cb_.column("w").combine_chunks()] * 2
            cnts += [cb_.column("c").combine_chunks()] * 2
        if not keys:
            return pa.table({"key": pa.array([], pa.string()),
                             "pair": pa.array([], pa.string()),
                             "pos": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({
            "key": pa.concat_arrays(keys),
            "pair": pa.concat_arrays(pairs),
            "pos": pa.array([0] * nuni + [1] * n + [2] * n, pa.int64()),
            "cnt": pa.concat_arrays(
                [pc.cast(c, pa.int64()) for c in cnts]),
        })

    melted = counted.map_batches(_melt, batch_format="pyarrow")

    def _attach(g: "pd.DataFrame") -> "pd.DataFrame":
        # one word group: exactly one pos-0 row (the unigram count — every
        # candidate word occurs as a unigram by construction)
        import pandas as pd
        cu = int(g.loc[g["pos"] == 0, "cnt"].iloc[0])
        out = g[g["pos"] > 0]
        if not len(out):
            return pd.DataFrame({"pair": pd.Series([], dtype=object),
                                 "cb": pd.Series([], dtype="int64"),
                                 "c1": pd.Series([], dtype="int64"),
                                 "c2": pd.Series([], dtype="int64")})
        pos1 = (out["pos"] == 1).to_numpy()
        return pd.DataFrame({
            "pair": out["pair"].to_numpy(),
            "cb": out["cnt"].to_numpy(dtype="int64"),
            "c1": np.where(pos1, cu, 0).astype("int64"),
            "c2": np.where(pos1, 0, cu).astype("int64"),
        })

    attached = melted.groupby("key").map_groups(_attach, batch_format="pandas")
    agg = ensure_arrow_schema(
        attached.groupby("pair").aggregate(Max("cb", alias_name="cb"),
                                           Max("c1", alias_name="c1"),
                                           Max("c2", alias_name="c2")),
        pa.schema([("pair", pa.string()), ("cb", pa.int64()),
                   ("c1", pa.int64()), ("c2", pa.int64())]))

    def _pmi(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b.column("pair"), " ")
        cb = b.column("cb").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = b.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = b.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.round(np.log2((cb / nb) / ((c1 / nu) * (c2 / nu))), ndigits)
        return pa.table({
            "w1": pc.list_element(parts, 0),
            "w2": pc.list_element(parts, 1),
            "n": pc.cast(b.column("cb"), pa.int64()),
            "pmi": pa.array(pmi, pa.float64()),
        })

    scored = ensure_arrow_schema(
        agg.map_batches(_pmi, batch_format="pyarrow"),
        pa.schema([("w1", pa.string()), ("w2", pa.string()),
                   ("n", pa.int64()), ("pmi", pa.float64())]))
    return scored.sort(["pmi", "w1", "w2"],
                       descending=[True, False, False]).limit(top_k)


def _quality_feature_matrix(batch: pa.Table, text_col: str) -> np.ndarray:
    """(n, 5) design matrix [1, ln(1+n_tokens), avg_token_len,
    stopword_ratio, alpha_ratio] — the exact basis
    :func:`quality_classifier` scores, so trained weights plug straight in."""
    from ..functions import textfns

    texts = batch.column(text_col).to_pylist()
    X = np.ones((len(texts), 5), dtype=np.float64)
    for i, t in enumerate(texts):
        q = textfns.quality_features(t)
        X[i, 1] = np.log1p(q["n_tokens"])
        X[i, 2] = q["avg_token_len"]
        X[i, 3] = q["stopword_ratio"]
        X[i, 4] = q["alpha_ratio"]
    return X


def quality_classifier_train(
    ds: ray.data.Dataset,
    text_col: str,
    label_col: str,
    iters: int = 60,
    lr: float = 0.5,
    l2: float = 1e-6,
) -> dict:
    """Distributed TRAINING for :func:`quality_classifier` — the CCNet-style
    learned-filter fit the inference op was waiting for.

    Full-batch logistic regression by fixed-iteration gradient descent over
    the same 4 text features (+ intercept) the inference stage scores, so
    ``quality_classifier(ds, ..., weights=fit["weights"])`` wires train ->
    infer directly. Deterministic: zero init, fixed ``iters``/``lr``,
    features STANDARDIZED from a one-pass distributed moment fold (then the
    final weights are mapped back to raw-feature space).

    Scale shape (the engine idiom for iterative fits, same as
    ``probabilistic.fs_em``): the feature matrix is computed ONCE into a
    materialized 6-column float dataset; each iteration is one streaming
    pass emitting a SINGLE (grad[5], loss, n) partial row per batch, folded
    on the driver (O(#batches) rows, never row-level data); the weight
    vector — 5 floats — ships back per iteration via closure capture.
    Partial sums make the result partition-invariant up to float-summation
    association (asserted at 1e-9 in pytest, not bit-exact by nature).

    Returns ``{"weights": [w0..w4] raw-space, "loss": per-iter mean NLL,
    "n": rows}``.
    """
    def _feats(batch: pa.Table) -> pa.Table:
        X = _quality_feature_matrix(batch, text_col)
        y = pc.cast(batch.column(label_col), pa.float64())
        cols = {f"x{j}": pa.array(X[:, j], pa.float64()) for j in range(5)}
        cols["y"] = y
        return pa.table(cols)

    feats = ds.select_columns([text_col, label_col]).map_batches(
        _feats, batch_format="pyarrow").materialize()

    # one-pass moments for standardization (population std; x0 stays 1)
    def _moments(b: pa.Table) -> pa.Table:
        out = {"n": pa.array([float(b.num_rows)], pa.float64())}
        for j in range(1, 5):
            x = b.column(f"x{j}").to_numpy(zero_copy_only=False)
            out[f"s{j}"] = pa.array([x.sum()], pa.float64())
            out[f"q{j}"] = pa.array([(x * x).sum()], pa.float64())
        return pa.table(out)

    mom = feats.map_batches(_moments, batch_format="pyarrow").to_pandas().sum()
    n = float(mom["n"])
    if n == 0:
        raise ValueError("quality_classifier_train: empty input")
    mean = np.zeros(5)
    std = np.ones(5)
    for j in range(1, 5):
        mean[j] = mom[f"s{j}"] / n
        var = max(mom[f"q{j}"] / n - mean[j] ** 2, 0.0)
        std[j] = math.sqrt(var) if var > 1e-24 else 1.0

    w = np.zeros(5, dtype=np.float64)  # standardized space
    losses = []
    for _ in range(iters):
        w_now = w.copy()

        def _grad(b: pa.Table, _w=w_now) -> pa.Table:
            X = np.stack([b.column(f"x{j}").to_numpy(zero_copy_only=False)
                          for j in range(5)], axis=1)
            Xs = (X - mean) / std
            y = b.column("y").to_numpy(zero_copy_only=False)
            z = Xs @ _w
            p = 1.0 / (1.0 + np.exp(-z))
            g = Xs.T @ (p - y)
            # stable NLL: log(1+e^z) - y*z  ==  max(z,0) + log1p(e^-|z|) - y*z
            nll = (np.maximum(z, 0.0) + np.log1p(np.exp(-np.abs(z)))
                   - y * z).sum()
            cols = {f"g{j}": pa.array([g[j]], pa.float64())
                    for j in range(5)}
            cols["nll"] = pa.array([nll], pa.float64())
            return pa.table(cols)

        part = feats.map_batches(_grad, batch_format="pyarrow").to_pandas().sum()
        g = np.array([part[f"g{j}"] for j in range(5)]) / n + l2 * w
        losses.append(float(part["nll"]) / n)
        w = w - lr * g

    # map standardized-space weights back to raw feature space
    raw = np.zeros(5)
    raw[1:] = w[1:] / std[1:]
    raw[0] = w[0] - float((w[1:] * mean[1:] / std[1:]).sum())
    return {"weights": raw.tolist(), "loss": losses, "n": int(n)}


# ---------------------------------------------------------------------------
# Exact heavy hitters: Misra-Gries mergeable summaries + verified recount.
# Not in the reference; standard frequent-items machinery (Misra & Gries 1982;
# merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012).
# ---------------------------------------------------------------------------


def heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    k: int = 10,
    capacity_mult: int = 8,
) -> ray.data.Dataset:
    """EXACT global top-``k`` values of ``col`` by count, cheap at scale.

    Shape: every batch compresses its exact value counts to a Misra-Gries
    summary of capacity ``m = capacity_mult * k`` (subtract the (m+1)-th
    largest count from all, keep positive remainders — at most m rows and
    one error-bound sentinel leave each batch, regardless of cardinality).
    Partials merge with ONE small ``groupby(col).sum()`` over <= m rows per
    batch; the top-m merged estimates are recounted EXACTLY with a second
    streaming pass (broadcast candidate filter + per-batch partial counts —
    no full-cardinality shuffle ever happens).

    The MG guarantee (estimate >= true - E, never overstating, with E the
    summed per-batch/merge subtractions) certifies the result: if the k-th
    recounted candidate count >= (m-th merged estimate) + E, no value outside
    the candidate set can reach the top k. When the certificate fails (flat
    distributions), fall back to the exact full ``groupby`` — the result is
    exact either way; only the cost differs. Ties break (count desc, value
    asc), matching ``ORDER BY cnt DESC, value LIMIT k``.
    """
    m = capacity_mult * k

    # null-drop projection first: pandas-origin blocks holding only None
    # carry Arrow type `null`; after the drop they are 0-row blocks that
    # every later stage skips (groupby/filter tolerate the mixed schema)
    ds = ds.map_batches(
        lambda b: pa.table(
            {col: pc.drop_null(b.column(col)).combine_chunks()}
        ).replace_schema_metadata(None),
        batch_format="pyarrow")

    def _mg_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({col: b.column(col),
                             "w": pa.array([], pa.int64()),
                             "is_err": pa.array([], pa.bool_())})
        vc = b.column(col).value_counts()
        vals = vc.field("values")
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        if len(cnts) > m:
            order = np.argsort(-cnts, kind="stable")
            sub = int(cnts[order[m]])
            keep = order[:m]
            w = cnts[keep] - sub
            pos = w > 0
            vals = vals.take(pa.array(keep[pos]))
            w = w[pos]
        else:
            sub = 0
            w = cnts
        t = pa.table({col: vals, "w": pa.array(w, pa.int64()),
                      "is_err": pa.array(np.zeros(len(w), dtype=bool))})
        err = pa.table({col: pa.array([None], t.schema.field(col).type),
                        "w": pa.array([sub], pa.int64()),
                        "is_err": pa.array([True])})
        return pa.concat_tables([t, err])

    partials = ds.map_batches(_mg_partial,
                              batch_format="pyarrow").materialize()
    err_total = int(partials.filter(expr="is_err == True").sum("w") or 0)

    def _local_topm(b: pa.Table) -> pa.Table:
        # MG compression of one merged block (each distinct value lives in
        # exactly one hash partition, so per-block compression is global for
        # its values); the subtracted amount rides along as an error sentinel
        # so the exactness certificate stays sound
        if b.num_rows <= m:
            return b.append_column("is_err",
                                   pa.array(np.zeros(b.num_rows, dtype=bool)))
        w = b.column("w").to_numpy(zero_copy_only=False)
        order = np.argsort(-w, kind="stable")
        sub = int(w[order[m]])
        keep = order[:m]
        kw = w[keep] - sub
        pos = kw > 0
        t = pa.table({col: b.column(col).take(pa.array(keep[pos])),
                      "w": pa.array(kw[pos], pa.int64()),
                      "is_err": pa.array(np.zeros(int(pos.sum()),
                                                  dtype=bool))})
        err = pa.table({col: pa.array([None], b.schema.field(col).type),
                        "w": pa.array([sub], pa.int64()),
                        "is_err": pa.array([True])})
        return pa.concat_tables([t, err])

    # distributed merge of the per-batch summaries: one small groupby over
    # <= m rows per input batch, then a per-block MG combiner so the driver
    # gathers O(result-blocks x m) rows, never the full merged vocabulary
    merged_ds = (
        partials.filter(expr="is_err == False")
        .map_batches(lambda b: b.select([col, "w"]), batch_format="pyarrow")
        .groupby(col).sum("w")
        .map_batches(lambda b: b.rename_columns([col, "w"]),
                     batch_format="pyarrow")
        .map_batches(_local_topm, batch_format="pyarrow")
    )
    pdf = merged_ds.to_pandas()
    if "is_err" not in pdf.columns:
        # every batch compressed to sentinels only (flat distribution):
        # no candidates, the certificate below fails, the fallback runs
        import pandas as pd
        pdf = pd.DataFrame({col: [], "w": [], "is_err": []}).astype(
            {"w": "int64", "is_err": "bool"})
    err_total += int(pdf.loc[pdf["is_err"], "w"].sum())
    merged = (pdf.loc[~pdf["is_err"]].set_index(col)["w"].astype("int64")
              .sort_values(ascending=False, kind="stable"))
    if len(merged) > m:
        sub = int(merged.iloc[m])
        err_total += sub
        merged = (merged.iloc[:m] - sub)
        merged = merged[merged > 0]
    candidates = list(merged.index)

    def _exact(cand_list: list) -> "pd.Series":
        cand_ref = ray.put(pa.array(cand_list))

        def _recount(b: pa.Table) -> pa.Table:
            cand = ray.get(cand_ref)
            if b.num_rows == 0:
                return pa.table({col: pa.array([], cand.type),
                                 "cnt": pa.array([], pa.int64())})
            vals = b.column(col).combine_chunks().cast(cand.type)
            vc = vals.filter(pc.is_in(vals, value_set=cand)).value_counts()
            return pa.table({col: vc.field("values"),
                             "cnt": pc.cast(vc.field("counts"), pa.int64())})

        rc = ds.map_batches(_recount, batch_format="pyarrow").to_pandas()
        return rc.groupby(col, sort=False)["cnt"].sum()

    if candidates:
        exact = _exact(candidates).sort_index(kind="stable").sort_values(
            ascending=False, kind="stable")
        kth = int(exact.iloc[min(k, len(exact)) - 1]) if len(exact) else 0
        # any value outside the candidate set has true count <= err_total
        # (its MG estimate was compressed to zero); strict > also beats the
        # value-ascending tie-break at the boundary
        certified = len(exact) >= k and kth > err_total
    else:
        certified = False
    if not certified:
        # exact fallback: full distributed groupby (the certificate only
        # fails on near-flat distributions where the groupby is cheap anyway)
        g = (ds.map_batches(lambda b: b.replace_schema_metadata(None),
                            batch_format="pyarrow")
             .groupby(col).count()
             .map_batches(lambda b: b.rename_columns([col, "cnt"]),
                          batch_format="pyarrow"))
        gdf = g.to_pandas()
        gdf = gdf[gdf[col].notna()]
        exact = gdf.set_index(col)["cnt"].astype("int64")
        exact = exact.sort_index(kind="stable").sort_values(
            ascending=False, kind="stable")
    top = exact.iloc[:k]
    out = pa.table({col: pa.array(top.index.tolist()),
                    "cnt": pa.array(top.to_numpy(dtype=np.int64))})
    return ray.data.from_arrow(out)


# ---------------------------------------------------------------------------
# DSIR-style importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): per-document log-likelihood
# ratio between a target and the raw distribution over hashed n-gram
# features. Not in the reference; core LM-corpus data-selection machinery.
# ---------------------------------------------------------------------------


def _dsir_feature_buckets(txt, dim: int, cache: dict) -> np.ndarray:
    """Hashed unigram+bigram buckets of one doc: lowercase, split on single
    spaces, empties removed (the hash_embed convention), bigrams space-joined
    so DuckDB's ``a.w || ' ' || b.w`` sees identical strings; bucket =
    ``md5_number_lower(feature) % dim`` exactly as in similarity._hash_buckets."""
    import hashlib

    toks = [t for t in ("" if txt is None else txt).lower().split(" ") if t]
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out = np.empty(len(feats), dtype=np.int64)
    for i, f in enumerate(feats):
        b = cache.get(f)
        if b is None:
            b = int.from_bytes(hashlib.md5(f.encode()).digest()[8:],
                               "little") % dim
            cache[f] = b
        out[i] = b
    return out


def dsir_weights(
    ds: ray.data.Dataset,
    target: ray.data.Dataset,
    text_col: str,
    id_col: str,
    dim: int = 10_000,
    lam: float = 0.5,
    ndigits: int = 6,
) -> ray.data.Dataset:
    """Per-document DSIR importance weight: the log-likelihood ratio of the
    doc under add-``lam``-smoothed bag-of-hashed-ngram models of ``target``
    vs the raw corpus ``ds``. High weight = looks like the target domain;
    resampling by these weights is the DSIR selection rule.

    Scale shape: feature hashing bounds BOTH distributions to ``dim``
    buckets by construction, so each model is one per-batch ``bincount``
    partial + a ``dim``-row groupby, and the log-ratio vector (``dim``
    doubles, ~80 KB at the default) broadcasts via ``ray.put`` — scoring is
    ONE streaming pass with zero shuffles regardless of corpus size. The
    log-ratio per bucket is computed with a fixed expression order so the
    DuckDB oracle reproduces it bit-for-bit; per-doc sums differ from SQL
    only in addition order (rounded to ``ndigits``).

    Output: ``(id_col, n_feats, logratio_sum, logratio_mean)``; docs with no
    features (empty text) are dropped, like the oracle's inner join.
    """

    def _bucket_counts(dset: ray.data.Dataset) -> tuple:
        def _partial(b: pa.Table) -> pa.Table:
            cache: dict = {}
            acc = np.zeros(dim, dtype=np.int64)
            for txt in b.column(text_col).to_pylist():
                fb = _dsir_feature_buckets(txt, dim, cache)
                if len(fb):
                    acc += np.bincount(fb, minlength=dim)
            nz = np.nonzero(acc)[0]
            return pa.table({"b": pa.array(nz, pa.int64()),
                             "c": pa.array(acc[nz], pa.int64())})

        g = (dset.select_columns([text_col])
             .map_batches(_partial, batch_format="pyarrow")
             .groupby("b").sum("c")
             .map_batches(lambda t: t.rename_columns(["b", "c"])
                          if t.num_columns else t, batch_format="pyarrow"))
        gdf = g.to_pandas()  # <= dim rows by construction
        vec = np.zeros(dim, dtype=np.int64)
        if "b" in gdf.columns and len(gdf):
            vec[gdf["b"].to_numpy(dtype=np.int64)] = gdf["c"].to_numpy(
                dtype=np.int64)
        return vec, int(vec.sum())

    c_t, n_t = _bucket_counts(target)
    c_r, n_r = _bucket_counts(ds)
    # fixed expression order, mirrored verbatim in the SQL oracle
    lr = (np.log(c_t + lam) - np.log(n_t + lam * dim)
          - np.log(c_r + lam) + np.log(n_r + lam * dim))
    lr_ref = ray.put(lr)

    def _score(b: pa.Table) -> pa.Table:
        lrv = ray.get(lr_ref)
        cache: dict = {}
        ids, ns, sums = [], [], []
        for rid, txt in zip(b.column(id_col).to_pylist(),
                            b.column(text_col).to_pylist()):
            fb = _dsir_feature_buckets(txt, dim, cache)
            if not len(fb):
                continue
            ids.append(rid)
            ns.append(len(fb))
            sums.append(float(lrv[fb].sum()))
        s = np.asarray(sums, dtype=np.float64)
        n = np.asarray(ns, dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids, b.schema.field(id_col).type),
            "n_feats": pa.array(n),
            "logratio_sum": pa.array(np.round(s, ndigits)),
            "logratio_mean": pa.array(
                np.round(s / n, ndigits) if len(n) else s),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pyarrow")


def approx_distinct_by_key(
    ds: ray.data.Dataset,
    key_col: str,
    col: str,
    p: int = 10,
    out_col: str = "approx_distinct",
) -> ray.data.Dataset:
    """Per-key HyperLogLog ``COUNT(DISTINCT col)`` — the per-group form of
    :func:`approx_distinct` (e.g. distinct users per host over a 100-TB
    event log). Same splitmix64 hashing, so estimates are deterministic and
    partition-invariant.

    Shape: each batch folds its rows into one 2^p-register sketch PER KEY
    PRESENT (2^p bytes each; default p=10 -> 1 KiB), so the shuffle carries
    O(keys-per-batch) sketch rows, never raw values; ``groupby(key)`` merges
    blobs by elementwise max and estimates. Null values are ignored (SQL
    COUNT DISTINCT semantics); keys whose rows are all-null don't appear.
    Standard error ~1.04/sqrt(2^p) (~3.2% at p=10).
    """
    import pandas as pd

    m = 1 << p

    def _sketch(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(batch.column(col)),
                       pc.is_valid(batch.column(key_col)))
        t = batch.filter(mask)
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], batch.schema.field(key_col).type),
                             "regs": pa.array([], pa.binary())})
        idx, rank = _hll_ranks(_hll_hash(t.column(col)), p)
        keys = t.column(key_col).to_pandas()
        codes, uniq = pd.factorize(keys, sort=False)
        regs = np.zeros((len(uniq), m), dtype=np.uint8)
        np.maximum.at(regs, (codes, idx), rank)
        return pa.table({
            key_col: pa.array(uniq, batch.schema.field(key_col).type),
            "regs": pa.array([r.tobytes() for r in regs], pa.binary()),
        })

    def _merge(df: "pd.DataFrame") -> "pd.DataFrame":
        regs = np.zeros(m, dtype=np.uint8)
        for buf in df["regs"]:
            regs = np.maximum(regs, np.frombuffer(buf, dtype=np.uint8))
        return pd.DataFrame({key_col: [df[key_col].iloc[0]],
                             out_col: pd.array([_hll_estimate(regs)],
                                               dtype="int64")})

    sk = ds.select_columns([key_col, col]).map_batches(
        _sketch, batch_format="pyarrow")
    return sk.groupby(key_col).map_groups(_merge, batch_format="pandas")


def _cms_slot(h: np.ndarray, seed: np.uint64, width: int) -> np.ndarray:
    """Row-j CMS slot: full splitmix64 remix of (h ^ seed), HIGH bits mod
    width. A plain odd-multiply + low-bit modulo is WRONG here: with a
    power-of-two width the low bits of (x*M) mod 2^k depend only on the low
    bits of x, so two keys sharing low bits would collide in EVERY row and
    the min-over-rows guarantee collapses (caught by the overshoot-bound
    test)."""
    v = h ^ seed
    v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    v = v ^ (v >> np.uint64(31))
    return ((v >> np.uint64(17)) % np.uint64(width)).astype(np.int64)


def count_min_sketch(
    ds: ray.data.Dataset, col: str, width: int = 2048, depth: int = 4,
) -> np.ndarray:
    """Mergeable Count-Min sketch (Cormode & Muthukrishnan 2005) of ``col``.

    The approximate companion to :func:`heavy_hitters` (Misra-Gries is
    deletion-style, CMS answers arbitrary point queries): ``depth`` hash rows
    x ``width`` counters; an item's estimate is the min over its row
    counters — always >= the true count, and <= true + 2N/width with
    probability 1 - 2^-depth.

    Per-batch partial: the batch's nonzero (row, idx, n) counter triples —
    at most depth x width rows leave any batch regardless of row count; one
    groupby-sum folds them and the driver receives <= depth x width triples
    total. Hashing reuses the splitmix64 mixer (`_hll_hash`) with per-row
    odd multipliers, so sketches are deterministic and partition-invariant.
    """
    seeds = (np.uint64(0xA24BAED4963EE407) * (2 * np.arange(depth, dtype=np.uint64) + 1))

    def _partial(b: pa.Table) -> pa.Table:
        h = _hll_hash(b.column(col))
        rows, idxs, cnts = [], [], []
        for j in range(depth):
            slot = _cms_slot(h, seeds[j], width)
            cnt = np.bincount(slot, minlength=width)
            nz = np.nonzero(cnt)[0]
            rows.append(np.full(len(nz), j, np.int64))
            idxs.append(nz)
            cnts.append(cnt[nz].astype(np.int64))
        return pa.table({"j": pa.array(np.concatenate(rows)),
                         "idx": pa.array(np.concatenate(idxs)),
                         "n": pa.array(np.concatenate(cnts))})

    folded = (ds.map_batches(_partial, batch_format="pyarrow")
              .groupby(["j", "idx"]).sum("n")
              .map_batches(lambda b: b.rename_columns(["j", "idx", "n"]),
                           batch_format="pyarrow")
              .to_pandas())
    sk = np.zeros((depth, width), np.int64)
    sk[folded["j"].to_numpy(), folded["idx"].to_numpy()] = folded["n"].to_numpy()
    return sk


def count_min_estimate(
    sketch: np.ndarray, values, width: Optional[int] = None,
) -> np.ndarray:
    """Point-query estimates for ``values`` against a CMS from
    :func:`count_min_sketch` (vectorized min over depth rows). ``values``
    must carry the SAME type as the sketched column — `_hll_hash` hashes
    integers and strings differently."""
    depth, w = sketch.shape
    seeds = (np.uint64(0xA24BAED4963EE407) * (2 * np.arange(depth, dtype=np.uint64) + 1))
    h = _hll_hash(pa.array(list(values)))
    ests = np.empty((depth, len(h)), np.int64)
    for j in range(depth):
        ests[j] = sketch[j, _cms_slot(h, seeds[j], w)]
    return ests.min(axis=0)
