"""Distributed transitive clustering: connected components over match pairs.

The reference emits matches as flat pairs and never clusters
(SURVEY.md §0); the target spec (BASELINE.json north_star) adds transitive
clustering — matched pairs are edges, entities are connected components, and the
cluster id must be deterministic (min node id per component) regardless of
partitioning or parallelism.

Algorithm: iterative hash-partitioned min-label propagation — the standard
large-scale connected-components construction on a data-parallel engine:

    labels(node) <- node
    repeat:
        candidate(v) <- min over {labels(v)} ∪ {labels(u) : (u,v) or (v,u) ∈ E}
        labels <- groupby(node).min(candidate)
    until no label changed

Each round is two hash joins (labels onto each edge endpoint) plus one groupby —
all-to-all on node id, no driver-side state. Rounds needed = graph diameter
(record-linkage components are stars/short chains, so 2-4 rounds in practice);
``max_iters`` bounds pathological chains. Convergence is detected with a
distributed count of changed labels (no full materialization on the driver).

For edge sets under ``small_threshold`` (default 5M — the vectorized numpy
local path does ~1M edges/s driver-side) a local connected-components fallback
runs — identical output, none of the per-round Ray overhead; the distributed
path takes over for billion-edge graphs. Both paths produce
``(node, cluster_id)``.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _unique_nodes(edges: ray.data.Dataset, src: str, dst: str) -> ray.data.Dataset:
    def _nodes(batch: pa.Table) -> pa.Table:
        arr = pa.concat_arrays(
            [
                pc.cast(batch.column(src), pa.string()).combine_chunks(),
                pc.cast(batch.column(dst), pa.string()).combine_chunks(),
            ]
        )
        return pa.table({"node": pc.unique(arr)})

    return edges.map_batches(_nodes, batch_format="pyarrow").groupby("node").count()


def _union_find_local(edge_table: pa.Table, src: str, dst: str) -> pa.Table:
    """Vectorized local connected components: numpy min-label propagation.

    Nodes are factorized through ``np.unique`` (sorted), so the per-component
    min label index IS the lexicographically smallest node id — identical
    output to a union-find with smaller-id-becomes-root, at C speed
    (a Python-dict union-find on 200k edges costs seconds of driver time;
    this is ~50ms). Star/short-chain linkage graphs converge in 2-3 sweeps;
    pointer jumping keeps pathological chains at O(log diameter).
    """
    import numpy as np

    srcs = edge_table.column(src).to_numpy(zero_copy_only=False)
    dsts = edge_table.column(dst).to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([srcs, dsts]), return_inverse=True)
    a, b = inv[: len(srcs)], inv[len(srcs):]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = label
        m = np.minimum(label[a], label[b])
        label = label.copy()
        np.minimum.at(label, a, m)
        np.minimum.at(label, b, m)
        while True:  # pointer jumping: label <- label[label] to fixpoint
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(label, before):
            break
    return pa.table(
        {
            "node": pa.array(nodes, pa.string()),
            "cluster_id": pa.array(nodes[label], pa.string()),
        }
    )


def connected_components(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
    num_partitions: Optional[int] = None,
    small_threshold: int = 5_000_000,
    n_edges_hint: Optional[int] = None,
) -> ray.data.Dataset:
    """Edges -> ``(node, cluster_id)`` with cluster_id = min node id per component.

    ``n_edges_hint`` skips the counting pass when the caller already knows the
    edge count (e.g. one edge per match row)."""
    n_edges = n_edges_hint if n_edges_hint is not None else edges.count()
    nparts = num_partitions or 16
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "cluster_id": pa.array([], pa.string())})
        )
    if n_edges <= small_threshold:
        tbl = pa.concat_tables(
            list(edges.select_columns([src, dst]).iter_batches(batch_format="pyarrow")),
            promote_options="default",
        )
        # node ids are canonicalized to strings in both paths, so the cluster_id
        # (min node id) is identical regardless of which path ran
        tbl = pa.table(
            {
                src: pc.cast(tbl.column(src), pa.string()),
                dst: pc.cast(tbl.column(dst), pa.string()),
            }
        )
        return ray.data.from_arrow(_union_find_local(tbl, src, dst))

    def _edge_norm(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(batch.column(src), pa.string()),
                "dst": pc.cast(batch.column(dst), pa.string()),
            }
        )

    e = edges.map_batches(_edge_norm, batch_format="pyarrow").materialize()
    labels = (
        _unique_nodes(e, "src", "dst")
        .map_batches(
            lambda b: pa.table({"node": b.column("node"), "cluster_id": b.column("node")}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    for _ in range(max_iters):
        # labels of src endpoints -> proposals for dst, and vice versa
        via_src = e.join(
            labels, join_type="inner", num_partitions=nparts,
            on=("src",), right_on=("node",),
        ).map_batches(
            lambda b: pa.table({"node": b.column("dst"), "cluster_id": b.column("cluster_id")}),
            batch_format="pyarrow",
        )
        via_dst = e.join(
            labels, join_type="inner", num_partitions=nparts,
            on=("dst",), right_on=("node",),
        ).map_batches(
            lambda b: pa.table({"node": b.column("src"), "cluster_id": b.column("cluster_id")}),
            batch_format="pyarrow",
        )

        def _premin(batch: pa.Table) -> pa.Table:
            # per-batch partial min combiner: shrink the shuffle before the groupby
            df = batch.to_pandas()
            out = df.groupby("node", as_index=False)["cluster_id"].min()
            return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

        candidates = labels.union(via_src).union(via_dst).map_batches(
            _premin, batch_format="pyarrow"
        )
        new_labels = (
            candidates.groupby("node")
            .min("cluster_id")
            .map_batches(
                lambda b: pa.table({"node": b.column("node"),
                                    "cluster_id": b.column("min(cluster_id)")}),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # pointer jump (label doubling): node -> label[label[node]]. Every label is
        # itself a node id (labels are mins over node ids), so the self-join is total;
        # this turns linear chain convergence into O(log diameter) rounds.
        lbl = new_labels.map_batches(
            lambda b: pa.table(
                {"lbl_node": b.column("node"), "lbl_cluster": b.column("cluster_id")}
            ),
            batch_format="pyarrow",
        )
        new_labels = (
            new_labels.join(
                lbl, join_type="inner", num_partitions=nparts,
                on=("cluster_id",), right_on=("lbl_node",),
            )
            .map_batches(
                lambda b: pa.table(
                    {"node": b.column("node"), "cluster_id": b.column("lbl_cluster")}
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        changed = (
            new_labels.join(
                labels.map_batches(
                    lambda b: pa.table(
                        {"node": b.column("node"), "old_id": b.column("cluster_id")}
                    ),
                    batch_format="pyarrow",
                ),
                join_type="inner",
                num_partitions=nparts,
                on=("node",),
                right_on=("node",),
            )
            .map_batches(
                lambda b: pa.table(
                    {"diff": pc.cast(
                        pc.not_equal(b.column("cluster_id"), b.column("old_id")), pa.int64()
                    )}
                ),
                batch_format="pyarrow",
            )
            .sum("diff")
        )
        labels = new_labels
        if not changed:
            break
    return labels


def assign_clusters(
    matches: ray.data.Dataset,
    spr_col: str = "ADDRESS_ID_SPR",
    cad_col: str = "ADDRESS_ID_CAD",
    **kwargs,
) -> ray.data.Dataset:
    """Match pairs -> ``(node, cluster_id)`` over the bipartite SPR/CAD graph.

    Node ids are namespaced (``S:``/``C:``) so the two registries cannot collide;
    cluster_id is the min namespaced node id of the component (deterministic).
    """

    def _edges(batch: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pa.array(["S"] * batch.num_rows), pc.cast(batch.column(spr_col), pa.string()), ":"
        )
        c = pc.binary_join_element_wise(
            pa.array(["C"] * batch.num_rows), pc.cast(batch.column(cad_col), pa.string()), ":"
        )
        return pa.table({"src": s, "dst": c})

    edges = matches.map_batches(_edges, batch_format="pyarrow")
    if "n_edges_hint" not in kwargs and isinstance(
            matches, ray.data.dataset.MaterializedDataset):
        # one edge per match row; on a materialized input count() is metadata
        kwargs["n_edges_hint"] = matches.count()
    return connected_components(edges, "src", "dst", **kwargs)


def gap_chain_components(
    ds: ray.data.Dataset,
    key_col: str,
    ord_col: str,
    gap: int,
    **cc_kwargs,
) -> ray.data.Dataset:
    """Cluster rows of ``ds`` into components of the gap-chain graph: two rows
    with the same ``key_col`` are linked when their integer ``ord_col`` values
    are within ``gap`` of each other along the sorted order (the graph form of
    SQL gaps-and-islands — which is exactly what makes this operator
    SQL-oracle-checkable: components equal the lag()/running-sum islands).

    Every row also gets a self-edge, so singletons appear in the output as
    their own cluster. Returns ``(node, cluster_id)`` as int64 with
    ``cluster_id`` = numeric min node per component (node ids are zero-padded
    before entering :func:`connected_components`, whose min is lexicographic).

    Partitioning assumption: one key's rows fit a ``map_groups`` task — the
    edge build is per-key; the clustering itself is the fully distributed
    :func:`connected_components`.
    """
    import numpy as np

    W = 20
    proj = ds.select_columns([key_col, ord_col])

    def _self_edges(batch: pa.Table) -> pa.Table:
        s = pc.utf8_lpad(
            pc.cast(pc.cast(batch.column(ord_col), pa.int64()), pa.string()), W, "0"
        )
        return pa.table({"src": s, "dst": s})

    def _chain(g: pd.DataFrame) -> pa.Table:
        # returns Arrow so the union with the Arrow self-edge blocks stays
        # single-block-type (Ray cannot union pandas blocks with arrow blocks)
        ids = np.sort(g[ord_col].to_numpy().astype(np.int64))
        if len(ids) < 2:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string())})
        m = (ids[1:] - ids[:-1]) <= gap
        pad = lambda a: pa.array(pd.Series(a).astype(str).str.zfill(W))
        return pa.table({"src": pad(ids[:-1][m]), "dst": pad(ids[1:][m])})

    edges = proj.map_batches(_self_edges, batch_format="pyarrow").union(
        proj.groupby(key_col).map_groups(_chain, batch_format="pandas")
    )
    cc = connected_components(edges, "src", "dst", **cc_kwargs)

    def _back(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": pc.cast(batch.column("node"), pa.int64()),
            "cluster_id": pc.cast(batch.column("cluster_id"), pa.int64()),
        })

    return cc.map_batches(_back, batch_format="pyarrow")


def pagerank(
    edges: ray.data.Dataset,
    n_iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    ndigits: int = 6,
    small_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """PageRank over a directed edge list — the canonical iterative web-graph
    computation (fixed ``n_iters`` power iterations, uniform init).

    CONTRACT: every node referenced must have >=1 outlink (no dangling-mass
    redistribution) — ``sources/synth.synth_web_graph`` guarantees it, and it
    keeps the engine bit-comparable (at ``ndigits``) to the unrolled-SQL
    oracle. ``rank_{t+1}(v) = (1-d)/N + d * sum over u->v of rank_t(u)/out(u)``.

    Same two-path shape as :func:`connected_components`: edge sets under
    ``small_threshold`` run a vectorized numpy power iteration driver-side;
    larger graphs run the distributed loop — out-degrees folded into the edge
    list ONCE (one corpus-sized join), then per iteration one join (ranks
    onto edge sources), one ``groupby(dst).sum`` of contributions and one
    left join back onto the node list (nodes without inlinks keep the
    teleport term). Each round materializes, so the executor never schedules
    two join pools at once (chained joins deadlock under tight CPU counts).
    Output: ``(node, rank)``, rank rounded to ``ndigits``.
    """
    import numpy as np

    # node ids may be int64 (synth graphs) or string (crawl page urls); the
    # dtype flows from the edge schema through every sentinel/empty table
    _sch = edges.schema()
    ntype = dict(zip(_sch.names, _sch.types))[src]

    n_edges = edges.count()
    if n_edges <= small_threshold:
        tbl = pa.concat_tables(
            [b.select([src, dst]) for b in
             edges.iter_batches(batch_format="pyarrow") if b.num_rows],
        ) if n_edges else pa.table({src: pa.array([], ntype),
                                    dst: pa.array([], ntype)})
        s = tbl.column(src).to_numpy(zero_copy_only=False)
        d = tbl.column(dst).to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
        si, di = inv[: len(s)], inv[len(s):]
        n = len(nodes)
        if n == 0:
            return ray.data.from_arrow(pa.table(
                {"node": pa.array([], ntype),
                 "rank": pa.array([], pa.float64())}))
        outdeg = np.bincount(si, minlength=n).astype(np.float64)
        rank = np.full(n, 1.0 / n)
        for _ in range(n_iters):
            contrib = rank[si] / outdeg[si]
            sums = np.zeros(n)
            np.add.at(sums, di, contrib)
            rank = (1.0 - damping) / n + damping * sums
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes, ntype),
            "rank": pa.array(np.round(rank, ndigits), pa.float64()),
        }))

    # ---- distributed power iteration ----
    from ray.data.aggregate import Count, Sum

    proj = edges.map_batches(
        lambda b: pa.table({"src": pc.cast(b.column(src), ntype),
                            "dst": pc.cast(b.column(dst), ntype)}),
        batch_format="pyarrow").materialize()
    nodes = (proj.map_batches(
        lambda b: pa.table({"node": pc.unique(pa.concat_arrays(
            [b.column("src").combine_chunks(),
             b.column("dst").combine_chunks()]))}),
        batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="_c"))
        .map_batches(lambda b: (pa.table({"node": pa.array([], ntype)})
                                if b.num_columns == 0 or b.num_rows == 0 else
                                pa.table({"node": pc.cast(b.column("node"),
                                                          ntype)})),
                     batch_format="pyarrow")
        .materialize())
    n = nodes.count()
    outdeg = (proj.groupby("src").aggregate(Count(alias_name="odeg"))
              .map_batches(lambda b: (pa.table(
                  {"src": pa.array([], ntype),
                   "odeg": pa.array([], pa.int64())})
                  if b.num_columns == 0 or b.num_rows == 0 else
                  b.replace_schema_metadata(None)), batch_format="pyarrow"))
    npart = max(4, min(64, -(-(proj.size_bytes() or 0) // (128 << 20))))
    edges_deg = proj.join(outdeg, join_type="inner", num_partitions=npart,
                          on=("src",)).materialize()

    ranks = nodes.map_batches(
        lambda b: b.append_column(
            "rank", pa.array(np.full(b.num_rows, 1.0 / n), pa.float64())),
        batch_format="pyarrow").materialize()

    for _ in range(n_iters):
        joined = edges_deg.join(
            ranks, join_type="inner", num_partitions=npart,
            on=("src",), right_on=("node",)).materialize()

        def _contrib(b: pa.Table) -> pa.Table:
            if b.num_columns == 0 or b.num_rows == 0:
                return pa.table({"dst": pa.array([], ntype),
                                 "_c": pa.array([], pa.float64())})
            c = pc.divide(b.column("rank"),
                          pc.cast(b.column("odeg"), pa.float64()))
            return pa.table({"dst": b.column("dst"), "_c": c})

        sums = (joined.map_batches(_contrib, batch_format="pyarrow")
                .groupby("dst").aggregate(Sum("_c", alias_name="_s"))
                .map_batches(lambda b: (pa.table(
                    {"dst": pa.array([], ntype),
                     "_s": pa.array([], pa.float64())})
                    if b.num_columns == 0 or b.num_rows == 0 else
                    b.replace_schema_metadata(None)), batch_format="pyarrow"))
        stepped = nodes.join(sums, join_type="left_outer",
                             num_partitions=npart,
                             on=("node",), right_on=("dst",))

        def _rank(b: pa.Table) -> pa.Table:
            if b.num_columns == 0 or b.num_rows == 0:
                return pa.table({"node": pa.array([], ntype),
                                 "rank": pa.array([], pa.float64())})
            s_arr = pc.fill_null(b.column("_s"), 0.0)
            r = pc.add(pc.multiply(s_arr, damping), (1.0 - damping) / n)
            return pa.table({"node": b.column("node"), "rank": r})

        ranks = stepped.map_batches(_rank, batch_format="pyarrow").materialize()

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "rank": pc.round(b.column("rank"), ndigits=ndigits)})

    return ranks.map_batches(_round, batch_format="pyarrow")


def golden_records(
    clusters: ray.data.Dataset,
    spr: ray.data.Dataset,
    cad: ray.data.Dataset,
    fields: tuple = ("STREET_NORM", "HOUSE_NORM", "BUILDING_NORM",
                     "FULL_ADDRESS"),
    id_col: str = "ADDRESS_ID",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Survivorship: one canonical ("golden") record per entity cluster.

    The reference stops at flat match pairs (`/root/reference/address.py:726`
    emits the pair table and never consolidates); master-data practice merges
    each cluster's members into a single record. Rule here (deterministic,
    SQL-checkable): per field, the most frequent non-empty value among the
    cluster's member records, ties broken by lexicographic min; fields with no
    non-empty value stay NULL. Output: one row per cluster with
    ``cluster_id, cluster_size, <fields...>``.

    Distributed shape: cluster labels join each registry on the namespaced id
    (two hash joins, O(rows)); members melt to ``(cluster_id, field, val)``
    rows (xk fan-out, vectorized take/concat); one
    ``groupby(cluster_id, field, val).count()`` reduces to distinct values;
    the final ``groupby(cluster_id)`` pivots per-cluster groups of at most
    (distinct values per field x k) rows — group size is bounded by cluster
    content, never corpus size. Sizes ride the same pivot via a ``__size__``
    pseudo-field, so no extra join.
    """
    import numpy as np

    def _label_side(prefix: str):
        def _f(b: pa.Table) -> pa.Table:
            keep = pc.starts_with(b.column("node"), prefix + ":")
            t = b.filter(keep)
            return pa.table({
                "_id": pc.utf8_slice_codeunits(
                    t.column("node"), 2, 2_000_000_000),
                "cluster_id": t.column("cluster_id"),
            })
        return _f

    def _members(reg: ray.data.Dataset, prefix: str) -> ray.data.Dataset:
        lab = clusters.map_batches(_label_side(prefix), batch_format="pyarrow")

        def _proj(b: pa.Table) -> pa.Table:
            out = {"_rid": pc.cast(b.column(id_col), pa.string())}
            for f in fields:
                out[f] = pc.fill_null(pc.cast(b.column(f), pa.string()), "")
            return pa.table(out)

        return lab.join(
            reg.map_batches(_proj, batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions,
            on=("_id",), right_on=("_rid",))

    members = _members(spr, "S").union(_members(cad, "C"))

    def _melt(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cids, fs, vals = [], [], []
        # one __size__ row per member carries the cluster-size count through
        # the same groupby-count pipeline as the field values
        cids.append(b.column("cluster_id"))
        fs.append(pa.array(["__size__"] * n, pa.string()))
        vals.append(pa.array([""] * n, pa.string()))
        for f in fields:
            v = b.column(f)
            keep = pc.not_equal(v, "")
            cids.append(b.column("cluster_id").filter(keep))
            fs.append(pa.array([f] * int(pc.sum(keep).as_py() or 0),
                               pa.string()))
            vals.append(v.filter(keep))
        return pa.table({
            "cluster_id": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                 for c in cids]),
            "field": pa.concat_arrays(
                [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
                 for x in fs]),
            "val": pa.concat_arrays(
                [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
                 for x in vals]),
        })

    counted = (members.map_batches(_melt, batch_format="pyarrow")
               .groupby(["cluster_id", "field", "val"]).count()
               .map_batches(lambda b: b.rename_columns(
                   ["cluster_id", "field", "val", "n"]),
                   batch_format="pyarrow"))

    field_list = list(fields)

    def _pivot(g: pd.DataFrame) -> pd.DataFrame:
        cid = g["cluster_id"].iloc[0]
        row = {"cluster_id": cid}
        size = g.loc[g["field"] == "__size__", "n"]
        row["cluster_size"] = np.int64(size.sum())
        for f in field_list:
            sub = g[g["field"] == f]
            if len(sub):
                # most frequent non-empty value; lexicographic-min tie-break
                best = sub.sort_values(
                    ["n", "val"], ascending=[False, True],
                    kind="mergesort").iloc[0]
                row[f] = best["val"]
            else:
                row[f] = None
        return pd.DataFrame([row])

    return counted.groupby("cluster_id").map_groups(
        _pivot, batch_format="pandas")


def merge_cluster_delta(
    prior: ray.data.Dataset,
    new_matches: ray.data.Dataset,
    spr_col: str = "ADDRESS_ID_SPR",
    cad_col: str = "ADDRESS_ID_CAD",
    **kwargs,
) -> ray.data.Dataset:
    """Incremental cluster maintenance: fold a DELTA of new match pairs into
    a prior ``(node, cluster_id)`` assignment without re-deriving the prior
    edges — provably identical to re-clustering the union of all matches.

    Why it works: a prior cluster_id IS the min namespaced node id of its
    component (:func:`connected_components` invariant), so each prior row
    ``(node, cluster_id)`` is itself an edge to a real member node and the
    prior component stays connected through its label node. Re-running CC
    over ``prior-as-edges ∪ delta-edges`` therefore yields exactly the
    labels of a full recompute over old ∪ new matches — old components merge
    when a delta edge bridges them, untouched components keep their id
    (their min node is unchanged). Cost: O(|prior| + |delta|) edges, vs the
    full match re-derivation; checkpoint the cluster table, resume from it.
    """

    def _prior_edges(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(b.column("node"), pa.string()),
            "dst": pc.cast(b.column("cluster_id"), pa.string()),
        })

    def _delta_edges(b: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pa.array(["S"] * b.num_rows),
            pc.cast(b.column(spr_col), pa.string()), ":")
        c = pc.binary_join_element_wise(
            pa.array(["C"] * b.num_rows),
            pc.cast(b.column(cad_col), pa.string()), ":")
        return pa.table({"src": s, "dst": c})

    edges = prior.map_batches(_prior_edges, batch_format="pyarrow").union(
        new_matches.map_batches(_delta_edges, batch_format="pyarrow"))
    return connected_components(edges, "src", "dst", **kwargs)


def triangle_stats(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    ndigits: int = 6,
    small_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """Global triangle count + clustering coefficient of the UNDIRECTED
    simple graph underlying a directed edge list (self-loops dropped,
    direction and multiplicity collapsed).

    The canonical web-graph cohesion statistic; not in the reference (no
    graph layer). One row out: ``(n_triangles, n_wedges,
    global_clustering)`` with ``global_clustering = 3*T / W`` (0.0 when the
    graph has no wedges), W = sum over nodes of C(deg, 2).

    Distributed shape (Cohen 2009 / Suri-Vassilvitskii degree-ordered
    wedges): each undirected edge is oriented from the lower-(degree, node)
    endpoint to the higher one, so every triangle is counted EXACTLY once —
    as the wedge at its lowest-ranked corner — and per-node wedge fan-out is
    bounded by O(sqrt(m)) instead of the max raw degree (the hub that makes
    naive neighborhood joins explode). Exchanges: one distinct-edge groupby,
    one degree aggregate, two degree-attach joins, one ``groupby(u)`` wedge
    emit (ids-only rows), one wedge-vs-edge inner join. No adjacency is ever
    materialized driver-side; the two scalar aggregates (wedge sum, triangle
    count) are the only driver values.

    Same two-path shape as :func:`connected_components` / :func:`pagerank`:
    edge sets under ``small_threshold`` run the forward algorithm locally in
    numpy (sorted out-neighbor intersections); the join plan takes over for
    billion-edge graphs, where its hash partitions are dense. (Tiny inputs
    MUST take the local path: a Ray hash-join partition that receives no
    left-side shard builds a column-less table and fails key resolution —
    only reachable when distinct keys < partitions.)
    """
    import numpy as np

    from .analytics import ensure_arrow_schema

    _sch = edges.schema()
    ntype = dict(zip(_sch.names, _sch.types))[src]

    def _undirect(b: pa.Table) -> pa.Table:
        a = b.column(src)
        c = b.column(dst)
        keep = pc.invert(pc.equal(a, c))
        a, c = a.filter(keep), c.filter(keep)
        # per-batch local dedup: the global distinct only ever sees one row
        # per (a, b) per block
        t = pa.table({"a": pc.min_element_wise(a, c),
                      "b": pc.max_element_wise(a, c)})
        return t.group_by(["a", "b"]).aggregate([]).select(["a", "b"])

    # plan decision on the RAW edge count (metadata-only): the local path
    # dedups in numpy, so routing through a distributed distinct first would
    # pay the exchange just to decide not to need it
    raw_edges = edges.count()
    local = raw_edges <= small_threshold

    und_batches = edges.map_batches(_undirect, batch_format="pyarrow")
    if local:
        und = ensure_arrow_schema(
            und_batches, pa.schema([("a", ntype), ("b", ntype)]))
    else:
        # distinct via ONE PACKED KEY: Ray's multi-key hash groupby is an
        # order of magnitude slower than single-key at this shape (same
        # finding as dedup._distinct_pairs_with_value)
        def _pack(t: pa.Table) -> pa.Table:
            k = pc.binary_join_element_wise(
                pc.cast(t.column("a"), pa.string()),
                pc.cast(t.column("b"), pa.string()), "\x00")
            return pa.table({"k": k})

        def _unpack(t: pa.Table) -> pa.Table:
            parts = pc.split_pattern(t.column("k"), "\x00")
            return pa.table({
                "a": pc.cast(pc.list_element(parts, 0), ntype),
                "b": pc.cast(pc.list_element(parts, 1), ntype)})

        und = ensure_arrow_schema(
            und_batches.map_batches(_pack, batch_format="pyarrow")
            .groupby("k").count()
            .map_batches(lambda t: t.select(["k"]) if t.num_columns else t,
                         batch_format="pyarrow")
            .map_batches(_unpack, batch_format="pyarrow"),
            pa.schema([("a", ntype), ("b", ntype)])).materialize()
    n_edges = raw_edges if local else und.count()

    def _result(n_tri: int, n_wed: int) -> ray.data.Dataset:
        gc = round(3.0 * n_tri / n_wed, ndigits) if n_wed else 0.0
        return ray.data.from_arrow(pa.table({
            "n_triangles": pa.array([n_tri], pa.int64()),
            "n_wedges": pa.array([n_wed], pa.int64()),
            "global_clustering": pa.array([gc], pa.float64()),
        }))

    if n_edges == 0:
        return _result(0, 0)

    if local:
        parts = [b for b in und.iter_batches(batch_format="pyarrow")
                 if b.num_rows]
        if not parts:
            return _result(0, 0)
        tbl = pa.concat_tables(parts)
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        b = tbl.column("b").to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        ai, bi = inv[: len(a)], inv[len(a):]
        # global pair dedup (batches were deduped per block only)
        pair = np.unique(ai * np.int64(len(nodes)) + bi)
        ai, bi = pair // len(nodes), pair % len(nodes)
        degv = np.bincount(np.concatenate([ai, bi]), minlength=len(nodes))
        n_wed = int((degv.astype(np.int64) * (degv - 1) // 2).sum())
        # forward algorithm: orient low-(deg, id) -> high, count
        # |N+(u) ∩ N+(v)| per oriented edge (u, v)
        # relabel nodes by orientation rank (deg, id) so oriented edges are
        # exactly the numerically-increasing pairs and everything below is
        # pure vectorized numpy (the per-edge intersect1d loop this replaces
        # spent ~100 us of Python per edge)
        n = len(nodes)
        rank = np.empty(n, np.int64)
        rank[np.lexsort((np.arange(n), degv))] = np.arange(n)
        ra, rb = rank[ai], rank[bi]
        u = np.minimum(ra, rb)
        v = np.maximum(ra, rb)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        ekey = np.sort(u * n + v)                # oriented-edge key set
        # grouped combinations: element at local position t in its u-block
        # pairs with the t earlier neighbors -> wedges per element = t
        idx = np.arange(len(u), dtype=np.int64)
        # position within u-block = idx - first index of the block
        local = idx - np.searchsorted(u, u)
        cum = np.cumsum(local)
        total_wedges = int(cum[-1]) if len(cum) else 0
        n_tri = 0
        CHUNK = 20_000_000
        lo = 0
        while lo < len(u):
            # largest hi with wedges in [lo, hi) <= CHUNK
            base = cum[lo - 1] if lo else 0
            hi = max(int(np.searchsorted(cum, base + CHUNK, side="right")),
                     lo + 1)
            sl = slice(lo, hi)
            loc = local[sl]
            tot = int(loc.sum())
            if tot:
                second = np.repeat(idx[sl], loc)
                offs = np.arange(tot, dtype=np.int64) - np.repeat(
                    np.cumsum(loc) - loc, loc)
                first = np.repeat(idx[sl] - loc, loc) + offs
                x = v[first]
                y = v[second]
                wkey = np.minimum(x, y) * n + np.maximum(x, y)
                pos = np.searchsorted(ekey, wkey)
                pos[pos >= len(ekey)] = len(ekey) - 1
                n_tri += int((ekey[pos] == wkey).sum())
            lo = hi
        assert total_wedges == int(local.sum())
        return _result(int(n_tri), n_wed)

    deg = ensure_arrow_schema(
        und.map_batches(
            lambda t: pa.table({"node": pa.concat_arrays(
                [t.column("a").combine_chunks(),
                 t.column("b").combine_chunks()])}),
            batch_format="pyarrow")
        .groupby("node").count()
        .map_batches(lambda t: t.rename_columns(["node", "d"]),
                     batch_format="pyarrow"),
        pa.schema([("node", ntype), ("d", pa.int64())])).materialize()

    # W = sum C(d, 2) — one tiny aggregate over the degree table
    from ray.data.aggregate import Sum

    wed = deg.map_batches(
        lambda t: pa.table({"w": pc.divide(
            pc.multiply(t.column("d"), pc.subtract(t.column("d"), 1)), 2)}),
        batch_format="pyarrow").aggregate(Sum("w", alias_name="w"))
    n_wedges = int(wed["w"] or 0)

    npart = max(4, min(64, -(-n_edges // 2_000_000)))
    dega = ensure_arrow_schema(
        deg.map_batches(lambda t: t.rename_columns(["node", "da"]),
                        batch_format="pyarrow"),
        pa.schema([("node", ntype), ("da", pa.int64())]))
    degb = ensure_arrow_schema(
        deg.map_batches(lambda t: t.rename_columns(["node", "db"]),
                        batch_format="pyarrow"),
        pa.schema([("node", ntype), ("db", pa.int64())]))
    # normalize between the chained joins: empty hash partitions emit
    # column-less blocks that break the next join's key FieldRef
    e_da = ensure_arrow_schema(
        und.join(dega, join_type="inner", num_partitions=npart,
                 on=("a",), right_on=("node",)),
        pa.schema([("a", ntype), ("b", ntype),
                   ("da", pa.int64())])).materialize()
    e_dd = ensure_arrow_schema(
        e_da.join(degb, join_type="inner", num_partitions=npart,
                  on=("b",), right_on=("node",)),
        pa.schema([("a", ntype), ("b", ntype), ("da", pa.int64()),
                   ("db", pa.int64())])).materialize()

    def _orient(t: pa.Table) -> pa.Table:
        da = t.column("da").to_numpy(zero_copy_only=False)
        db = t.column("db").to_numpy(zero_copy_only=False)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        # rank = (degree, node id); a < b always holds here, so ties on
        # degree orient a -> b
        a_first = da <= db
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        dv = np.where(a_first, db, da)
        return pa.table({"u": pa.array(u.tolist(), ntype),
                         "v": pa.array(v.tolist(), ntype),
                         "dv": pa.array(dv, pa.int64())})

    oriented = ensure_arrow_schema(
        e_dd.map_batches(_orient, batch_format="pyarrow"),
        pa.schema([("u", ntype), ("v", ntype),
                   ("dv", pa.int64())])).materialize()

    def _wedges(df: pd.DataFrame) -> pd.DataFrame:
        nb = df.sort_values(["dv", "v"], kind="mergesort")["v"].to_numpy()
        k = len(nb)
        if k < 2:
            return pd.DataFrame({"v": nb[:0], "w": nb[:0]})
        i, j = np.triu_indices(k, 1)
        return pd.DataFrame({"v": nb[i], "w": nb[j]})

    wedges = ensure_arrow_schema(
        oriented.groupby("u").map_groups(_wedges, batch_format="pandas"),
        pa.schema([("v", ntype), ("w", ntype)]))

    closing = oriented.map_batches(
        lambda t: pa.table({"v": t.column("u"), "w": t.column("v")}),
        batch_format="pyarrow")
    n_tri = wedges.join(closing, join_type="inner", num_partitions=npart,
                        on=("v", "w")).count()
    return _result(n_tri, n_wedges)


def hits(
    edges: ray.data.Dataset,
    n_iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    ndigits: int = 6,
    small_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """HITS hubs-and-authorities (Kleinberg 1999) over a directed edge list —
    the classic companion to :func:`pagerank` for crawl graphs.

    SUM-normalized variant (L1, not the L2 of the original paper): each
    round ``a(v) = sum over u->v of h(u)`` then ``a /= sum(a)``, then
    ``h(u) = sum over u->v of a(v)`` then ``h /= sum(h)``. The ranking is
    identical under any positive rescaling; L1 keeps every arithmetic step a
    plain sum/divide, so the unrolled-SQL oracle reproduces the engine at
    ``round(ndigits)`` without sqrt summation-order hazards. Init
    ``h = 1/N`` over all endpoint nodes; nodes without in-links (out-links)
    have authority (hub) exactly 0. Output: ``(node, hub, authority)``.

    Same two-path shape as :func:`pagerank`: small edge sets run a local
    numpy loop; the distributed path alternates (edges join ranks) ->
    ``groupby.sum`` -> one scalar-total normalize per phase, materializing
    each round (chained join pools deadlock under tight CPU counts).
    """
    import numpy as np

    _sch = edges.schema()
    ntype = dict(zip(_sch.names, _sch.types))[src]
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], ntype),
            "hub": pa.array([], pa.float64()),
            "authority": pa.array([], pa.float64())}))

    if n_edges <= small_threshold:
        tbl = pa.concat_tables(
            [b.select([src, dst]) for b in
             edges.iter_batches(batch_format="pyarrow") if b.num_rows])
        s = tbl.column(src).to_numpy(zero_copy_only=False)
        d = tbl.column(dst).to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
        si, di = inv[: len(s)], inv[len(s):]
        n = len(nodes)
        h = np.full(n, 1.0 / n)
        a = np.zeros(n)
        for _ in range(n_iters):
            a = np.zeros(n)
            np.add.at(a, di, h[si])
            t = a.sum()
            if t > 0:
                a /= t
            h = np.zeros(n)
            np.add.at(h, si, a[di])
            t = h.sum()
            if t > 0:
                h /= t
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes, ntype),
            "hub": pa.array(np.round(h, ndigits), pa.float64()),
            "authority": pa.array(np.round(a, ndigits), pa.float64()),
        }))

    # ---- distributed alternating power iteration ----
    from ray.data.aggregate import Count, Sum

    from .analytics import compact_nonempty, ensure_arrow_schema

    edge_schema = pa.schema([("src", ntype), ("dst", ntype)])
    proj = compact_nonempty(ensure_arrow_schema(
        edges.map_batches(
            lambda b: pa.table({"src": b.column(src), "dst": b.column(dst)}),
            batch_format="pyarrow"),
        edge_schema).materialize(), edge_schema)
    node_schema = pa.schema([("node", ntype)])
    nodes = compact_nonempty(ensure_arrow_schema(
        proj.map_batches(
            lambda b: pa.table({"node": pc.unique(pa.concat_arrays(
                [b.column("src").combine_chunks(),
                 b.column("dst").combine_chunks()]))}),
            batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="_c"))
        .map_batches(lambda b: b.select(["node"]) if b.num_columns else b,
                     batch_format="pyarrow"),
        node_schema).materialize(), node_schema)
    n = nodes.count()
    npart = max(4, min(64, -(-n_edges // 2_000_000)))

    val_schema = pa.schema([("node", ntype), ("val", pa.float64())])
    h = compact_nonempty(nodes.map_batches(
        lambda b: b.append_column(
            "val", pa.array(np.full(b.num_rows, 1.0 / n), pa.float64())),
        batch_format="pyarrow").materialize(), val_schema)

    def _phase(ranks, key_in, key_out):
        """raw(key_out) = sum over edges of ranks(key_in); L1-normalized."""
        raw = compact_nonempty(ensure_arrow_schema(
            proj.join(ranks, join_type="inner", num_partitions=npart,
                      on=(key_in,), right_on=("node",))
            .map_batches(lambda b: pa.table({"node": b.column(key_out),
                                             "val": b.column("val")}),
                         batch_format="pyarrow")
            .groupby("node").aggregate(Sum("val", alias_name="val")),
            val_schema).materialize(), val_schema)
        tot = raw.aggregate(Sum("val", alias_name="t"))["t"] or 0.0
        if tot > 0:
            raw = compact_nonempty(ensure_arrow_schema(raw.map_batches(
                lambda b: pa.table({"node": b.column("node"),
                                    "val": pc.divide(b.column("val"), tot)}),
                batch_format="pyarrow"), val_schema).materialize(),
                val_schema)
        return raw

    a = h
    for _ in range(n_iters):
        a = _phase(h, "src", "dst")
        h = _phase(a, "dst", "src")

    # distinct right-side key names: Ray's hash join can't disambiguate a
    # same-named non-merged key column on a second chained join
    nh_schema = pa.schema([("node", ntype), ("hub", pa.float64())])
    out = (compact_nonempty(
               nodes.join(ensure_arrow_schema(
                   h.map_batches(lambda b: b.rename_columns(["_nh", "hub"]),
                                 batch_format="pyarrow"),
                   pa.schema([("_nh", ntype), ("hub", pa.float64())])),
                   join_type="left_outer", num_partitions=npart,
                   on=("node",), right_on=("_nh",)).materialize(), nh_schema)
           .join(ensure_arrow_schema(
               a.map_batches(
                   lambda b: b.rename_columns(["_na", "authority"]),
                   batch_format="pyarrow"),
               pa.schema([("_na", ntype), ("authority", pa.float64())])),
               join_type="left_outer", num_partitions=npart,
               on=("node",), right_on=("_na",)))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("node"),
            "hub": pc.round(pc.fill_null(b.column("hub"), 0.0),
                            ndigits=ndigits),
            "authority": pc.round(pc.fill_null(b.column("authority"), 0.0),
                                  ndigits=ndigits)})

    return out.map_batches(_final, batch_format="pyarrow")
