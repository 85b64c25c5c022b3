"""Iterative match-merge entity consolidation (batch R-Swoosh).

Generic entity resolution in the Swoosh family (Benjelloun et al., VLDB J.
2009): records that MATCH are MERGED into a composite record, and the
composite may match records its members did not — so resolution is a
FIXPOINT, not a single pass. The reference's matcher is single-pass 1:N
(`/root/reference/address.py:420-520`); transitive clustering
(stages/cluster.py) closes over the ORIGINAL pair relation only. This stage
closes over the evolving merged records.

Concrete instance (deterministic, library-free):
- record state: ``(rid, house, tokens)`` — rid is the min member id, tokens
  the UNION of member street-token sets, house the blocking key;
- match rule: same ``house`` block AND token-set Jaccard >= ``threshold``;
- merge rule: union tokens, min rid (commutative + associative + idempotent,
  so a round's merge order cannot matter).

Batch-round semantics (the data-parallel form of R-Swoosh): each round
computes ALL matching pairs among current records, contracts the round's
match graph with one union-find pass, merges each component, and repeats
until no pair matches. Deterministic by construction — every round's output
is a pure function of the record SET. Union-merge only grows token sets, so
record count strictly decreases every active round and termination is
guaranteed (<= #records rounds; ``max_rounds`` bounds pathology).

Distributed shape per round: token-melt the records (vectorized explode) ->
one ``groupby((house, token))`` co-locates candidates (prefiltered by the
shared-token requirement of Jaccard > 0 — no all-pairs) -> within-group
vectorized pair Jaccard -> per-round connected components (the existing
``cluster.connected_components``, ids-only) -> ``groupby(component)``
union-merge. Convergence check is a distributed count of matched pairs; the
driver only ever sees per-round counters. Oversize token blocks are capped
and logged (``max_block``), the standard hot-token guard.

SQL cannot express the fixpoint; correctness is pytest-gated against an
independent sequential implementation of the same batch semantics plus
partition-invariance (tests/test_swoosh.py). The round-0 pair set IS
SQL-checkable and is oracled via `docs_swoosh_round0` (list_jaccard over the
house self-join).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["iterative_merge", "round_pairs"]


def _to_records(ds: ray.data.Dataset, id_col: str, house_col: str,
                street_col: str) -> ray.data.Dataset:
    """Normalize input to ``(rid, house, tokens: ' '-joined sorted set)``."""

    def _f(b: pa.Table) -> pa.Table:
        ids = pc.cast(b.column(id_col), pa.string()).to_pylist()
        houses = pc.fill_null(
            pc.cast(b.column(house_col), pa.string()), "").to_pylist()
        streets = pc.fill_null(
            pc.cast(b.column(street_col), pa.string()), "").to_pylist()
        toks = [" ".join(sorted({t for t in s.split(" ") if t}))
                for s in streets]
        keep = [bool(t) and bool(h) for t, h in zip(toks, houses)]
        return pa.table({
            "rid": pa.array([i for i, k in zip(ids, keep) if k], pa.string()),
            "house": pa.array([h for h, k in zip(houses, keep) if k],
                              pa.string()),
            "tokens": pa.array([t for t, k in zip(toks, keep) if k],
                               pa.string()),
        })

    return ds.map_batches(_f, batch_format="pyarrow")


def round_pairs(records: ray.data.Dataset, threshold: float,
                max_block: int = 1000) -> ray.data.Dataset:
    """All matching pairs (rid_a < rid_b) among current records: same house,
    token Jaccard >= threshold. Shared-token groupby prefilter — a pair with
    Jaccard > 0 shares at least one (house, token) group and is examined
    there; emitted once via the min-shared-token ownership rule."""

    def _melt(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("tokens"), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        return pa.table({
            "house": pc.take(b.column("house"), parent),
            "tok": flat,
            "rid": pc.take(b.column("rid"), parent),
            "tokens": pc.take(b.column("tokens"), parent),
        })

    melted = records.map_batches(_melt, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > max_block or len(g) < 2:
            if len(g) > max_block:
                import logging

                logging.getLogger(__name__).warning(
                    "swoosh: hot block (%s,%s) size %d > %d skipped",
                    g["house"].iloc[0], g["tok"].iloc[0], len(g), max_block)
            return pd.DataFrame({"a": pd.Series([], dtype="str"),
                                 "b": pd.Series([], dtype="str")})
        g = g.sort_values("rid", kind="mergesort")
        rids = g["rid"].to_numpy()
        tsets = [frozenset(t.split(" ")) for t in g["tokens"]]
        tok = g["tok"].iloc[0]
        a_l, b_l = [], []
        for i in range(len(rids)):
            for j in range(i + 1, len(rids)):
                inter = tsets[i] & tsets[j]
                # ownership: only the lexicographically smallest shared
                # token emits the pair (each pair appears in every shared
                # group; exactly one owns it)
                if min(inter) != tok:
                    continue
                jac = len(inter) / len(tsets[i] | tsets[j])
                if jac >= threshold:
                    a_l.append(rids[i])
                    b_l.append(rids[j])
        return pd.DataFrame({"a": a_l, "b": b_l})

    from .analytics import ensure_arrow_schema

    return ensure_arrow_schema(
        melted.groupby(["house", "tok"]).map_groups(
            _pairs, batch_format="pandas"),
        pa.schema([("a", pa.string()), ("b", pa.string())]))


def iterative_merge(
    ds: ray.data.Dataset,
    id_col: str = "ADDRESS_ID",
    house_col: str = "HOUSE_NORM",
    street_col: str = "STREET_NORM",
    threshold: float = 0.5,
    max_rounds: int = 10,
    max_block: int = 1000,
) -> ray.data.Dataset:
    """Run batch R-Swoosh to fixpoint. Returns the merged entity records
    ``(rid, house, tokens, n_members)`` — rid = min member id, tokens = the
    sorted union, n_members = source records consolidated."""
    from .analytics import ensure_arrow_schema
    from .cluster import connected_components

    _rec_schema = pa.schema([
        ("rid", pa.string()), ("house", pa.string()),
        ("tokens", pa.string()), ("n_members", pa.int64())])

    records = _to_records(ds, id_col, house_col, street_col).map_batches(
        lambda b: b.append_column(
            "n_members", pa.array([1] * b.num_rows, pa.int64())),
        batch_format="pyarrow").materialize()

    for _ in range(max_rounds):
        pairs = round_pairs(
            records.select_columns(["rid", "house", "tokens"]),
            threshold, max_block).materialize()
        if pairs.count() == 0:
            break
        comp = connected_components(pairs, "a", "b").materialize()
        # map_batches SKIPS zero-row blocks entirely (Ray 2.49), so
        # ensure_arrow_schema alone cannot normalize the columnless empty
        # pandas blocks a hash groupby emits for group-less partitions —
        # repartition() concatenates them away first, then ensure runs on
        # real blocks (memory: ray-data-gotchas)
        records = records.repartition(8)
        labeled = ensure_arrow_schema(records, _rec_schema).join(
            ensure_arrow_schema(
                comp.map_batches(
                    lambda b: b.rename_columns(["rid", "comp"]),
                    batch_format="pyarrow"),
                pa.schema([("rid", pa.string()), ("comp", pa.string())])),
            join_type="left_outer", num_partitions=8, on=("rid",))

        def _merge(g: pd.DataFrame) -> pd.DataFrame:
            toks = set()
            for t in g["tokens"]:
                toks.update(t.split(" "))
            return pd.DataFrame([{
                "rid": g["rid"].min(),
                "house": g["house"].iloc[0],
                "tokens": " ".join(sorted(toks)),
                "n_members": np.int64(g["n_members"].sum()),
            }])

        def _key(b: pa.Table) -> pa.Table:
            comp_col = b.column("comp")
            key = pc.if_else(pc.is_valid(comp_col), comp_col,
                             b.column("rid"))
            return b.append_column("mkey", key)

        records = (labeled.map_batches(_key, batch_format="pyarrow")
                   .groupby("mkey").map_groups(_merge, batch_format="pandas")
                   ).materialize()
    # normalize the final shape for downstream joins (see comment above)
    return ensure_arrow_schema(records.repartition(8), _rec_schema)
