"""Entity-resolution evaluation operators.

The reference evaluates its matcher by eyeballing match-rate scalars in the
UI (`/root/reference/address.py:538-569` progress counters; no labeled
evaluation exists). A production linkage engine needs measurable quality:
pairwise precision/recall/F1 against a labeled pair set, and blocking-stage
quality (reduction ratio, pairs completeness) so a blocking-key change can be
judged before the expensive scoring phase.

Everything here is metadata-scale output (one metrics row) computed from
distributed counts and hash joins — no pair list ever reaches the driver:

- :func:`pairwise_eval` — TP/FP/FN + precision/recall/F1 of a match-pair
  Dataset against a labeled truth Dataset. One multi-key hash join for TP,
  two streaming counts for the marginals.
- :func:`blocking_stats` — candidate-pair volume of the fuzzy blocking key
  ``(HOUSE_NORM, BUILDING_NORM)`` (Σ block cross-products via per-key count
  aggregates joined key-to-key — the shuffle moves O(distinct keys) rows),
  reduction ratio vs the full cross product, and pairs completeness (the
  fraction of true pairs the blocking co-locates, via two id→key joins).

Both have exact DuckDB oracles in ``__ray_entry__.py`` (``match_eval_f1``,
``match_blocking_stats``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["pairwise_eval", "blocking_stats"]


def _pair_ids(matches: ray.data.Dataset) -> ray.data.Dataset:
    def _proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "spr_id": b.column("ADDRESS_ID_SPR"),
            "cad_id": b.column("ADDRESS_ID_CAD"),
        })

    return matches.map_batches(_proj, batch_format="pyarrow")


def pairwise_eval(
    matches: ray.data.Dataset,
    labeled: ray.data.Dataset,
    round_to: int = 6,
) -> pd.DataFrame:
    """Pairwise precision/recall/F1 of ``matches`` vs ``labeled``.

    ``matches`` is the engine's match output (one row per matched spr record,
    D2-deduped, so (ADDRESS_ID_SPR, ADDRESS_ID_CAD) is already pair-unique);
    ``labeled`` carries ``(spr_id, cad_id, label)`` with one row per labeled
    pair. TP is a distributed two-key hash join count; FP/FN fall out of the
    marginal counts, so the driver only ever sees three integers.
    """
    pred = _pair_ids(matches)

    def _truth(b: pa.Table) -> pa.Table:
        b = b.filter(pc.fill_null(b.column("label"), False))
        return pa.table({"t_spr": b.column("spr_id"), "t_cad": b.column("cad_id")})

    truth = labeled.map_batches(_truth, batch_format="pyarrow")
    n_pred = pred.count()
    n_true = truth.count()
    if n_pred == 0 or n_true == 0:
        # skip the shuffle; an all-empty side also trips Ray's hash-shuffle
        # finalize (ray-data-gotchas: empty agg blocks)
        tp = 0
    else:
        tp = pred.join(
            truth, join_type="inner", num_partitions=8,
            on=("spr_id", "cad_id"), right_on=("t_spr", "t_cad"),
        ).count()
    fp, fn = n_pred - tp, n_true - tp
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    f1 = 2 * precision * recall / max(1e-9, precision + recall)
    return pd.DataFrame([{
        "tp": pd.Series([tp], dtype="int64")[0],
        "fp": fp, "fn": fn,
        "precision": round(precision, round_to),
        "recall": round(recall, round_to),
        "f1": round(f1, round_to),
    }]).astype({"tp": "int64", "fp": "int64", "fn": "int64"})


def _house_blocks(reg: ray.data.Dataset, id_out: str) -> ray.data.Dataset:
    """Project a preprocessed registry to its fuzzy-block key, skipping the
    rows the matcher's house index skips (empty HOUSE_NORM,
    ``stages/matching.py:370-377``)."""

    def _proj(b: pa.Table) -> pa.Table:
        h = pc.fill_null(b.column("HOUSE_NORM"), "")
        bld = pc.fill_null(b.column("BUILDING_NORM"), "")
        keep = pc.not_equal(h, "")
        return pa.table({
            id_out: b.column("ADDRESS_ID").filter(keep),
            "hn": h.filter(keep),
            "bn": bld.filter(keep),
        })

    return reg.map_batches(_proj, batch_format="pyarrow")


def _block_counts(blocks: ray.data.Dataset, out: str) -> ray.data.Dataset:
    return blocks.groupby(["hn", "bn"]).count().map_batches(
        lambda b: b.rename_columns(["hn", "bn", out]), batch_format="pyarrow")


def blocking_stats(
    spr: ray.data.Dataset,
    cad: ray.data.Dataset,
    labeled: ray.data.Dataset,
    round_to: int = 6,
) -> pd.DataFrame:
    """Quality of the fuzzy candidate blocking ``(HOUSE_NORM, BUILDING_NORM)``.

    - ``candidate_pairs``: Σ over co-present blocks of |spr block| × |cad
      block| — the exact pair volume the scoring phase would see. Computed as
      two per-key count aggregates joined on the key: the shuffle is
      O(distinct block keys), never O(pairs).
    - ``reduction_ratio``: 1 − candidates / (n_spr × n_cad), the classic
      blocking-efficiency measure.
    - ``pairs_completeness``: fraction of labeled TRUE pairs whose two sides
      land in the same block (two id→key equi-joins, then a streaming count).
    """
    spr_b = _house_blocks(spr, "sid")
    cad_b = _house_blocks(cad, "cid")
    n_spr, n_cad = spr.count(), cad.count()

    per_block = _block_counts(spr_b, "ns").join(
        _block_counts(cad_b, "nc"), join_type="inner", num_partitions=8,
        on=("hn", "bn"),
    )

    def _prod(b: pa.Table) -> pa.Table:
        return pa.table({"pairs": pc.multiply(
            pc.cast(b.column("ns"), pa.int64()), pc.cast(b.column("nc"), pa.int64()))})

    candidates = int(per_block.map_batches(_prod, batch_format="pyarrow")
                     .sum("pairs") or 0)

    def _truth(b: pa.Table) -> pa.Table:
        b = b.filter(pc.fill_null(b.column("label"), False))
        return pa.table({"spr_id": b.column("spr_id"), "cad_id": b.column("cad_id")})

    truth = labeled.map_batches(_truth, batch_format="pyarrow")
    n_true = truth.count()
    co = 0 if n_true == 0 else (
        truth
        .join(spr_b, join_type="inner", num_partitions=8,
              on=("spr_id",), right_on=("sid",))
        .join(cad_b.map_batches(
            lambda b: b.rename_columns(["cid", "chn", "cbn"]),
            batch_format="pyarrow"),
              join_type="inner", num_partitions=8,
              on=("cad_id",), right_on=("cid",))
        .map_batches(
            lambda b: b.filter(pc.and_(
                pc.equal(b.column("hn"), b.column("chn")),
                pc.equal(b.column("bn"), b.column("cbn")))),
            batch_format="pyarrow")
        .count()
    )
    total = n_spr * n_cad
    return pd.DataFrame([{
        "n_spr": n_spr, "n_cad": n_cad,
        "n_true_pairs": n_true,
        "candidate_pairs": candidates,
        "co_blocked_true": co,
        "reduction_ratio": round(1.0 - candidates / max(1, total), round_to),
        "pairs_completeness": round(co / max(1, n_true), round_to),
    }]).astype({c: "int64" for c in
                ("n_spr", "n_cad", "n_true_pairs", "candidate_pairs",
                 "co_blocked_true")})


def threshold_sweep(
    matches: ray.data.Dataset,
    labeled: ray.data.Dataset,
    thresholds: tuple = (85.0, 88.0, 91.0, 94.0, 97.0, 100.0),
    round_to: int = 6,
) -> pd.DataFrame:
    """P/R/F1 at every score threshold in ONE pass over the match pairs.

    Tuning the reference means re-running its matcher per threshold
    (`/root/reference/address.py:1164` takes a single threshold knob); here
    one labeled join + one per-batch partial count per threshold produces the
    whole operating curve. The truth join is a hash join (O(pairs) shuffle);
    the per-batch partial is a len(thresholds)-row histogram, so the driver
    only ever sees len(thresholds) count rows.
    """
    import numpy as np

    def _truth(b: pa.Table) -> pa.Table:
        b = b.filter(pc.fill_null(b.column("label"), False))
        return pa.table({"t_spr": b.column("spr_id"),
                         "t_cad": b.column("cad_id"),
                         "_t": pa.array([True] * b.num_rows)})

    truth = labeled.map_batches(_truth, batch_format="pyarrow")
    n_true = truth.count()

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "spr_id": b.column("ADDRESS_ID_SPR"),
            "cad_id": b.column("ADDRESS_ID_CAD"),
            "score": pc.cast(b.column("MATCH_SCORE"), pa.float64()),
        })

    flagged = matches.map_batches(_proj, batch_format="pyarrow").join(
        truth, join_type="left_outer", num_partitions=8,
        on=("spr_id", "cad_id"), right_on=("t_spr", "t_cad"))

    ths = np.asarray(sorted(thresholds), np.float64)

    def _partial(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or b.num_rows == 0:
            z = np.zeros(len(ths), np.int64)
            return pa.table({"threshold": pa.array(ths),
                             "n_pred": pa.array(z), "tp": pa.array(z)})
        s = b.column("score").to_numpy(zero_copy_only=False)
        t = pc.fill_null(b.column("_t"), False).to_numpy(zero_copy_only=False)
        ge = s[None, :] >= ths[:, None]
        return pa.table({
            "threshold": pa.array(ths),
            "n_pred": pa.array(ge.sum(1).astype(np.int64)),
            "tp": pa.array((ge & t[None, :]).sum(1).astype(np.int64)),
        })

    agg = (flagged.map_batches(_partial, batch_format="pyarrow")
           .groupby("threshold").sum(["n_pred", "tp"])
           .map_batches(lambda b: b.rename_columns(
               ["threshold", "n_pred", "tp"]), batch_format="pyarrow")
           .to_pandas().sort_values("threshold").reset_index(drop=True))
    agg["fp"] = agg.n_pred - agg.tp
    agg["fn"] = n_true - agg.tp
    prec = agg.tp / np.maximum(1, agg.n_pred)
    rec = agg.tp / max(1, n_true)
    agg["precision"] = prec.round(round_to)
    agg["recall"] = rec.round(round_to)
    agg["f1"] = (2 * prec * rec / np.maximum(1e-9, prec + rec)).round(round_to)
    return agg.astype({c: "int64" for c in ("n_pred", "tp", "fp", "fn")})


def cluster_pairwise_eval(
    clusters: ray.data.Dataset,
    labeled: ray.data.Dataset,
    round_to: int = 6,
) -> pd.DataFrame:
    """Pairwise P/R/F1 of the ENTITY CLUSTERS on labeled pairs — the
    north-rule metric (BASELINE.json: "matching the reference's entity
    clusters (pairwise F1>=0.99) on labeled pairs"): a labeled pair counts
    as predicted-positive iff both records land in the SAME cluster, so this
    also scores the transitive-closure step, unlike :func:`pairwise_eval`
    which scores the flat match pairs.

    Join-free-of-chains shape (chained join pools can deadlock the streaming
    executor — memory: ray-data-gotchas): each labeled pair melts into two
    ``(pair_id, node)`` rows; ONE hash join attaches cluster ids; one
    ``groupby(pair_id)`` (groups of exactly 2) decides same-cluster; a
    per-batch partial count reduces to four integers on the driver.
    """

    def _melt(b: pa.Table) -> pa.Table:
        import numpy as np

        spr = pc.cast(b.column("spr_id"), pa.string()).to_pylist()
        cad = pc.cast(b.column("cad_id"), pa.string()).to_pylist()
        lab = pc.fill_null(b.column("label"), False).to_pylist()
        pid = [f"{s}|{c}" for s, c in zip(spr, cad)]
        return pa.table({
            "pid": pa.array(pid + pid, pa.string()),
            "node": pa.array([f"S:{s}" for s in spr]
                             + [f"C:{c}" for c in cad], pa.string()),
            "lab": pa.array(np.concatenate([lab, lab]).astype(bool)),
        })

    melted = labeled.map_batches(_melt, batch_format="pyarrow")
    joined = melted.join(
        clusters, join_type="left_outer", num_partitions=8,
        on=("node",))

    def _pair_verdict(g: pd.DataFrame) -> pd.DataFrame:
        cids = g["cluster_id"].tolist()
        same = (len(g) == 2 and cids[0] is not None
                and cids[0] == cids[1])
        return pd.DataFrame([{"lab": bool(g["lab"].iloc[0]),
                              "same": bool(same)}])

    verdicts = joined.groupby("pid").map_groups(
        _pair_verdict, batch_format="pandas")

    def _partial(b: pa.Table) -> pa.Table:
        lab = b.column("lab").to_numpy(zero_copy_only=False)
        same = b.column("same").to_numpy(zero_copy_only=False)
        return pa.table({
            "tp": pa.array([int((lab & same).sum())], pa.int64()),
            "fp": pa.array([int((~lab & same).sum())], pa.int64()),
            "fn": pa.array([int((lab & ~same).sum())], pa.int64()),
            "tn": pa.array([int((~lab & ~same).sum())], pa.int64()),
        })

    c = (verdicts.map_batches(_partial, batch_format="pyarrow")
         .to_pandas().sum())
    tp, fp, fn, tn = int(c.tp), int(c.fp), int(c.fn), int(c.tn)
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    f1 = 2 * precision * recall / max(1e-9, precision + recall)
    return pd.DataFrame([{
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": round(precision, round_to),
        "recall": round(recall, round_to),
        "f1": round(f1, round_to),
    }]).astype({k: "int64" for k in ("tp", "fp", "fn", "tn")})


def _key_blocks(reg: ray.data.Dataset, id_out: str,
                cols: tuple, token_sort: bool) -> ray.data.Dataset:
    """Project a registry to ``(id, key)`` where key joins the coalesced
    columns with '|'; rows whose every part is empty are skipped (they can
    never block). ``token_sort`` replaces the single column with its
    token-sorted form (the TOKEN_SORTKEY scheme)."""

    def _proj(b: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            v = pc.fill_null(pc.cast(b.column(c), pa.string()), "")
            parts.append(v)
        if token_sort:
            from ..functions.scorers import _token_sorted

            arr0 = parts[0]
            if isinstance(arr0, pa.ChunkedArray):
                arr0 = arr0.combine_chunks()
            enc = pc.dictionary_encode(arr0)
            mapped = pa.array([_token_sorted(u)
                               for u in enc.dictionary.to_pylist()],
                              pa.string())
            parts = [pc.take(mapped, enc.indices)]
        key = parts[0] if len(parts) == 1 else \
            pc.binary_join_element_wise(*parts, "|")
        nonempty = pc.not_equal(parts[0], "")
        for q in parts[1:]:
            nonempty = pc.or_(nonempty, pc.not_equal(q, ""))
        return pa.table({
            id_out: pc.cast(b.column("ADDRESS_ID"), pa.string())
            .filter(nonempty),
            "k": key.filter(nonempty),
        })

    return reg.map_batches(_proj, batch_format="pyarrow")


def blocking_compare(
    spr: ray.data.Dataset,
    cad: ray.data.Dataset,
    labeled: ray.data.Dataset,
    round_to: int = 6,
) -> pd.DataFrame:
    """Side-by-side quality of the engine's candidate blocking keys — the
    decision table for the ONE partitioning key a 100-TB run must commit to
    (SURVEY §7.4): per key, candidate-pair volume (O(distinct keys) shuffle,
    never O(pairs)), reduction ratio vs the cross product, and pairs
    completeness on labeled true pairs.

    Keys compared: the reference's SEARCH_KEY equality, the fuzzy matcher's
    (HOUSE_NORM, BUILDING_NORM) block, and the TOKEN_SORTKEY word-reorder
    key. Output: one metadata-scale row per key.
    """
    specs = [
        ("search_key", ("SEARCH_KEY",), False),
        ("house_building", ("HOUSE_NORM", "BUILDING_NORM"), False),
        ("token_sortkey", ("STREET_NORM",), True),
    ]
    n_spr, n_cad = spr.count(), cad.count()

    def _truth(b: pa.Table) -> pa.Table:
        b = b.filter(pc.fill_null(b.column("label"), False))
        return pa.table({
            "spr_id": pc.cast(b.column("spr_id"), pa.string()),
            "cad_id": pc.cast(b.column("cad_id"), pa.string())})

    truth = labeled.map_batches(_truth, batch_format="pyarrow").materialize()
    n_true = truth.count()
    rows = []
    for name, cols, tsort in specs:
        sb = _key_blocks(spr, "sid", cols, tsort)
        cb = _key_blocks(cad, "cid", cols, tsort)
        per_block = (sb.groupby("k").count()
                     .map_batches(lambda b: b.rename_columns(["k", "ns"]),
                                  batch_format="pyarrow")
                     .join(cb.groupby("k").count()
                           .map_batches(lambda b: b.rename_columns(
                               ["k", "nc"]), batch_format="pyarrow"),
                           join_type="inner", num_partitions=8, on=("k",)))
        cands = int(per_block.map_batches(
            lambda b: pa.table({"p": pc.multiply(
                pc.cast(b.column("ns"), pa.int64()),
                pc.cast(b.column("nc"), pa.int64()))}),
            batch_format="pyarrow").sum("p") or 0)
        # completeness: true pair co-blocked iff both sides carry the key
        # and the keys are equal — two joins with a materialize between
        # (chained live join pools can deadlock; memory: ray-data-gotchas)
        half = truth.join(sb, join_type="inner", num_partitions=8,
                          on=("spr_id",), right_on=("sid",)).materialize()
        co = (half.join(
            cb.map_batches(lambda b: b.rename_columns(["cid", "ck"]),
                           batch_format="pyarrow"),
            join_type="inner", num_partitions=8,
            on=("cad_id",), right_on=("cid",))
            .map_batches(lambda b: b.filter(
                pc.equal(b.column("k"), b.column("ck"))),
                batch_format="pyarrow").count()) if n_true else 0
        rows.append({
            "key_name": name,
            "candidate_pairs": cands,
            "co_blocked_true": co,
            "reduction_ratio": round(
                1.0 - cands / max(1, n_spr * n_cad), round_to),
            "pairs_completeness": round(co / max(1, n_true), round_to),
        })
    return pd.DataFrame(rows).astype(
        {"candidate_pairs": "int64", "co_blocked_true": "int64"})
