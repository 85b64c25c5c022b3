"""Crawl-native web-graph construction: pages -> link edges -> graph ops.

Composes the link-extraction kernel (``functions/links.py``) with the graph
family (``stages/cluster.py``): a crawl's pages table IS the source of its
web graph, so at 100-TB scale the edge list must be derived inside the same
streaming pass that reads the pages — never materialized driver-side.

Not present in the reference (flat registry matcher, no crawl layer); graft
operators per BASELINE.json's crawl input hint. Each stage here has a DuckDB
oracle generated from the same rule chain (``links.sql_resolved_links``).

Scale notes:
- extraction is embarrassingly parallel ``map_batches`` over ``(url, html)``
  (columns pruned before the melt — html never travels past the first stage);
- edge/domain aggregation pre-aggregates per batch (combiner) so the one
  ``groupby`` exchange carries rows per distinct key per block, not per
  anchor occurrence;
- the crawled-set restriction in :func:`crawl_pagerank` auto-switches
  between a broadcast ``is_in`` filter and Ray's hash-partitioned
  ``left_semi`` join at ``dedup.WINNER_BROADCAST_LIMIT`` — same cutover as
  the linkage exclusion and dedup winner paths.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from registry_address_matcher_ray.functions import links as _links
from registry_address_matcher_ray.functions import urls as _urls

__all__ = ["link_edges", "link_graph", "domain_graph", "crawl_pagerank",
           "anchor_texts", "noindex_filter", "robots_filter"]


def link_edges(
    pages: ray.data.Dataset, url_col: str = "url", html_col: str = "html",
) -> ray.data.Dataset:
    """Pages -> ``(src, dst)`` edges, one row per resolved anchor occurrence.

    Columns are pruned to ``(url, html)`` before extraction so downstream
    exchanges never carry page payloads.
    """
    return pages.select_columns([url_col, html_col]).map_batches(
        lambda b: _links.extract_links_batch(b, url_col, html_col),
        batch_format="pyarrow")


def _count_pairs(edges: ray.data.Dataset, a: str, b: str,
                 out: str) -> ray.data.Dataset:
    """(a, b) occurrence counts with per-batch partial aggregation.

    The global exchange runs on ONE PACKED KEY (``a\\x00b``): Ray's
    multi-key hash groupby is an order of magnitude slower than single-key
    at this shape (same finding as ``dedup._distinct_pairs_with_value`` and
    ``cluster.triangle_stats``). URL/host strings cannot contain NUL, so
    the packing is lossless."""

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by([a, b]).aggregate([([], "count_all")])
        g = g.rename_columns([a, b, out])
        k = pc.binary_join_element_wise(
            pc.cast(g.column(a), pa.string()),
            pc.cast(g.column(b), pa.string()), "\x00")
        return pa.table({"k": k, out: g.column(out)})

    def _unpack(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("k"), "\x00")
        return pa.table({
            a: pc.list_element(parts, 0),
            b: pc.list_element(parts, 1),
            out: t.column(out)})

    return (edges.map_batches(_partial, batch_format="pyarrow")
            .groupby("k").aggregate(Sum(out, alias_name=out))
            .map_batches(lambda t: t if t.num_columns else pa.table(
                {"k": pa.array([], pa.string()),
                 out: pa.array([], pa.int64())}), batch_format="pyarrow")
            .map_batches(_unpack, batch_format="pyarrow"))


def link_graph(
    pages: ray.data.Dataset, url_col: str = "url", html_col: str = "html",
) -> ray.data.Dataset:
    """Weighted link graph ``(src, dst, n)`` — n = anchor occurrences."""
    return _count_pairs(link_edges(pages, url_col, html_col),
                        "src", "dst", "n")


def domain_graph(
    pages: ray.data.Dataset, url_col: str = "url", html_col: str = "html",
) -> ray.data.Dataset:
    """Host-level graph ``(src_host, dst_host, n)`` — the standard crawl
    aggregate (domain-to-domain citation counts)."""

    def _hosts(batch: pa.Table) -> pa.Table:
        src_c = _urls.canonicalize_arrow(batch.column("src"))
        return pa.table({
            "src_host": _urls.host_of_arrow(src_c),
            "dst_host": _urls.host_of_arrow(batch.column("dst")),
        })

    hosted = link_edges(pages, url_col, html_col).map_batches(
        _hosts, batch_format="pyarrow")
    return _count_pairs(hosted, "src_host", "dst_host", "n")


def anchor_texts(
    pages: ray.data.Dataset,
    url_col: str = "url",
    html_col: str = "html",
    top_k: int = 5,
) -> ray.data.Dataset:
    """Inbound anchor-text aggregation per target URL — the classic crawl
    signal (anchor text of in-links describes the target page; used as a
    relevance/quality feature and as retrieval text for pages whose own
    content is thin).

    Per canonical ``dst``: ``n_anchors`` (total inbound anchor occurrences
    with non-empty text), ``n_texts`` (distinct texts), ``texts`` (the
    lexicographically first ``top_k`` distinct texts, '|'-joined —
    deterministic and bounded, so a hub with millions of in-links still
    emits one small row).

    Scale shape: per-batch partial count over ``(dst, txt)`` collapses
    occurrence rows before the one groupby exchange; the final
    ``map_groups`` sees (distinct-text, count) rows per dst — bounded by
    text diversity, never by in-degree.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["dst", "txt"]).aggregate([([], "count_all")])
        return g.rename_columns(["dst", "txt", "c"])

    anchors = pages.select_columns([url_col, html_col]).map_batches(
        lambda b: _links.extract_anchors_batch(b, url_col, html_col),
        batch_format="pyarrow").map_batches(_partial, batch_format="pyarrow")

    def _finish(g: pa.Table) -> pa.Table:
        txts = sorted(set(g.column("txt").to_pylist()))
        total = pc.sum(g.column("c")).as_py() or 0
        return pa.table({
            "dst": [g.column("dst")[0].as_py()],
            "n_anchors": pa.array([int(total)], pa.int64()),
            "n_texts": pa.array([len(txts)], pa.int64()),
            "texts": pa.array(["|".join(txts[:top_k])], pa.string()),
        })

    return anchors.groupby("dst").map_groups(_finish, batch_format="pyarrow")


def noindex_filter(
    pages: ray.data.Dataset,
    html_col: str = "html",
    keep_noindex: bool = False,
) -> ray.data.Dataset:
    """Drop pages that opt out of indexing via ``<meta name="robots"
    content="...noindex...">`` — the crawl-politeness page kill every
    compliant corpus pipeline applies before training-prep.

    ``keep_noindex=True`` inverts the filter (audit view). Stateless
    ``map_batches``, zero shuffle; per-document regex probe is inherent to
    HTML (same shape as extraction)."""

    def _filter(batch: pa.Table) -> pa.Table:
        flags = [_links.is_noindex(h)
                 for h in batch.column(html_col).to_pylist()]
        mask = pa.array([f == keep_noindex for f in flags])
        return batch.filter(mask)

    return pages.map_batches(_filter, batch_format="pyarrow")


def robots_filter(
    urls: ray.data.Dataset,
    robots: pa.Table,
    url_col: str = "url",
    keep_disallowed: bool = False,
) -> ray.data.Dataset:
    """Drop URLs a host's ``robots.txt`` disallows for ``User-agent: *`` —
    the third crawl-politeness gate (with the URL/domain blocklist and the
    meta-robots noindex kill).

    ``robots`` is the small host-level ``(host, robots_txt)`` table (one row
    per host — metadata-scale next to the URL corpus), parsed ONCE on the
    driver via :func:`functions.robots.parse_robots` and broadcast as a
    host -> rules map; the per-batch probe is vectorized per distinct host
    (rules per host are few; ``str.startswith`` runs longest-prefix-first
    over undecided rows). URLs are canonicalized through the shared
    :mod:`functions.urls` chain before host/path extraction, so surface
    forms obey the same rules their canonical target does.
    """
    import pandas as pd

    from registry_address_matcher_ray.functions import robots as _robots

    rule_map = {}
    for h, t in zip(robots.column("host").to_pylist(),
                    robots.column("robots_txt").to_pylist()):
        parsed = _robots.parse_robots(t)
        if parsed:
            # longest-first, allow before disallow on equal length: the
            # FIRST matching rule in this order is the decision
            rule_map[h] = sorted(
                parsed, key=lambda r: (-len(r[1]), r[0]))
    rules_ref = ray.put(rule_map)
    path_re = _robots.PATH_SQL_RE

    def _filter(batch: pa.Table) -> pa.Table:
        rmap = ray.get(rules_ref)
        canon_arr = _urls.canonicalize_arrow(batch.column(url_col))
        canon = pd.Series(canon_arr.to_pylist())
        hosts = pd.Series(_urls.host_of_arrow(canon_arr).to_pylist())
        paths = canon.str.extract(path_re, expand=False).fillna("")
        allowed = pd.Series(True, index=canon.index)
        for h in hosts.unique():
            rules = rmap.get(h)
            if not rules:
                continue
            sel = hosts == h
            undecided = sel.copy()
            p = paths.where(paths != "", "/")
            for rule, prefix in rules:
                m = undecided & p.str.startswith(prefix)
                if m.any():
                    allowed[m] = rule == "allow"
                    undecided &= ~m
        mask = (~allowed if keep_disallowed else allowed).to_numpy()
        return batch.filter(pa.array(mask))

    return urls.map_batches(_filter, batch_format="pyarrow")


def crawl_pagerank(
    pages: ray.data.Dataset,
    url_col: str = "url",
    html_col: str = "html",
    n_iters: int = 5,
    broadcast_limit: Optional[int] = None,
) -> ray.data.Dataset:
    """PageRank of the crawled pages over their OWN extracted link graph.

    Frontier restriction: only edges whose target is itself a crawled page
    enter the graph (the standard crawl-core restriction — external targets
    carry no rank source). Every crawled page then gets a self-loop, the
    self-loop variant of dangling-node treatment, which structurally
    satisfies :func:`stages.cluster.pagerank`'s every-node-has-an-outlink
    contract on both the engine and the unrolled-SQL oracle side.

    Output: ``(node, rank)`` — node is the page url, rank rounded per the
    pagerank stage. The edge set is made DISTINCT once, after the self-loop
    union (a page linking itself must not double an edge).
    """
    from registry_address_matcher_ray.stages import cluster, dedup

    limit = (dedup.WINNER_BROADCAST_LIMIT if broadcast_limit is None
             else broadcast_limit)
    urls_only = pages.select_columns([url_col])
    edges = link_edges(pages, url_col, html_col)

    n_pages = urls_only.count()
    if n_pages <= limit:
        crawled_ref = ray.put(pa.array(
            sorted(set(r[url_col] for r in urls_only.take_all())),
            pa.string()))

        def _restrict(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch.column("dst"), value_set=ray.get(crawled_ref)))

        kept = edges.map_batches(_restrict, batch_format="pyarrow")
    else:
        crawled = (urls_only.map_batches(
            lambda b: b.rename_columns(["dst"]).group_by("dst").aggregate([]),
            batch_format="pyarrow")
            .groupby("dst").count().select_columns(["dst"]))
        npart = max(4, min(64, -(-(edges.size_bytes() or 0) // (128 << 20))))
        # materialize: the semi-join must not share an executor round with
        # the downstream union/groupby/pagerank joins (chained join pools
        # deadlock under tight CPU counts — see stages/cluster.pagerank)
        kept = edges.join(crawled, join_type="left_semi",
                          num_partitions=npart, on=("dst",)).materialize()

    self_loops = urls_only.map_batches(
        lambda b: pa.table({"src": b.column(url_col),
                            "dst": b.column(url_col)}),
        batch_format="pyarrow")

    # distinct over ONE PACKED KEY (URLs cannot contain NUL) — Ray's
    # multi-key groupby is an order of magnitude slower at this shape
    def _pack(b: pa.Table) -> pa.Table:
        return pa.table({"k": pc.binary_join_element_wise(
            b.column("src"), b.column("dst"), "\x00")})

    def _unpack(t: pa.Table) -> pa.Table:
        if not t.num_columns or not t.num_rows:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string())})
        parts = pc.split_pattern(t.column("k"), "\x00")
        return pa.table({"src": pc.list_element(parts, 0),
                         "dst": pc.list_element(parts, 1)})

    # materialize: pagerank consumes its input twice (count + collect/joins)
    # and must not re-run the extraction lineage
    distinct = (kept.union(self_loops)
                .map_batches(_pack, batch_format="pyarrow")
                .groupby("k").count()
                .map_batches(lambda t: t.select(["k"]) if t.num_columns
                             else t, batch_format="pyarrow")
                .map_batches(_unpack, batch_format="pyarrow")).materialize()
    return cluster.pagerank(distinct, n_iters=n_iters)
