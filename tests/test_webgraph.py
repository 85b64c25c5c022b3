"""Link extraction (functions/links.py) + web-graph stages (stages/webgraph.py).

The driver oracle (`pages_links` / `pages_domain_graph` / `pages_crawl_pagerank`)
proves SQL parity; these tests pin the extraction contract's individual rules
and the plan-equivalence of the crawled-set restriction paths.
"""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from registry_address_matcher_ray.functions import links as L
from registry_address_matcher_ray.sources import synth
from registry_address_matcher_ray.stages import cluster, webgraph

BASE = "https://www.Example.org/dir/page?utm_source=x"


def _resolve_one(href, base=BASE):
    out = L.resolve_hrefs(pd.Series([base]), pd.Series([href]))
    v = out.iloc[0]
    return None if pd.isna(v) else v


def test_extract_hrefs_quote_forms_and_order():
    html = (b'<p>x</p><a href="https://a.example/1">t</a>'
            b"<a class='c' href='https://b.example/2'>u</a>"
            b'<a href="/rel">v</a><a name="no-href">w</a>')
    # double-quoted scan first, then single-quoted (module contract rule 1)
    assert L.extract_hrefs(html) == [
        "https://a.example/1", "/rel", "https://b.example/2"]
    assert L.extract_hrefs(None) == []
    assert L.extract_hrefs(b"<p>no links</p>") == []


def test_resolution_rules():
    # rule 3: absolute kept (then canonicalized: www./tracking stripped)
    assert _resolve_one("https://www.t.example/p?utm_source=a") == \
        "https://t.example/p"
    # protocol-relative: page scheme (base is https)
    assert _resolve_one("//cdn.example/x") == "https://cdn.example/x"
    # root-relative: page origin; note origin comes from the RAW page url
    # (lowercase-scheme pages), so a canonical-cased base resolves too
    assert _resolve_one("/a/b", base="https://host.example/dir/p") == \
        "https://host.example/a/b"
    # rule 2: &amp; decoded before canonicalization
    assert _resolve_one("https://t.example/p?a=1&amp;utm_source=x") == \
        "https://t.example/p?a=1"
    # out of scope -> dropped
    for junk in ("mailto:x@y.example", "javascript:void(0)", "#top",
                 "rel/path.html", "", "HTTP://upper.example/"):
        assert _resolve_one(junk) is None


def test_link_graph_counts():
    pages = rd.from_arrow(pa.table({
        "url": ["https://h.example/a", "https://h.example/b"],
        "html": [
            b'<a href="https://h.example/b">x</a>'
            b'<a href="https://h.example/b">y</a>'
            b'<a href="/a">self-host</a>',
            b'<a href="//h.example/a">z</a>',
        ],
    }))
    g = webgraph.link_graph(pages).to_pandas()
    got = {(r.src, r.dst): r.n for r in g.itertuples()}
    assert got == {
        ("https://h.example/a", "https://h.example/b"): 2,
        ("https://h.example/a", "https://h.example/a"): 1,
        ("https://h.example/b", "https://h.example/a"): 1,
    }


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return (df.sort_values(list(df.columns), kind="mergesort")
            .reset_index(drop=True).astype(str))


@pytest.fixture(scope="module")
def linked_pages():
    return rd.from_arrow(synth.synth_linked_pages(150, seed=7)).materialize()


def test_crawl_pagerank_plans_identical(linked_pages):
    base = _canon(webgraph.crawl_pagerank(linked_pages).to_pandas())
    joined = _canon(
        webgraph.crawl_pagerank(linked_pages, broadcast_limit=0).to_pandas())
    pd.testing.assert_frame_equal(base, joined)
    # every crawled page is a node (self-loop guarantees it), ranks sum to ~1
    assert len(base) == 150
    assert abs(base["rank"].astype(float).sum() - 1.0) < 1e-3


def test_pagerank_string_nodes_small_vs_distributed(linked_pages):
    edges = (webgraph.link_edges(linked_pages)
             .groupby(["src", "dst"]).count()
             .select_columns(["src", "dst"]).materialize())
    # restrict to crawled set exactly as crawl_pagerank's broadcast plan does,
    # then compare the two pagerank execution paths on string node ids
    urls = set(r["url"] for r in
               linked_pages.select_columns(["url"]).take_all())
    import pyarrow.compute as pc

    vs = pa.array(sorted(urls), pa.string())
    kept = edges.map_batches(
        lambda b: b.filter(pc.is_in(b.column("dst"), value_set=vs)),
        batch_format="pyarrow")
    loops = linked_pages.select_columns(["url"]).map_batches(
        lambda b: pa.table({"src": b.column("url"), "dst": b.column("url")}),
        batch_format="pyarrow")
    distinct = (kept.union(loops).groupby(["src", "dst"]).count()
                .select_columns(["src", "dst"]).materialize())
    a = _canon(cluster.pagerank(distinct).to_pandas())
    b = _canon(cluster.pagerank(distinct, small_threshold=0).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    assert a["node"].str.startswith("https://").all()


# ---------------------------------------------------------------------------
# triangle counting / clustering coefficient
# ---------------------------------------------------------------------------


def _brute_triangles(pairs):
    und, adj = set(), {}
    for a, b in pairs:
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        und.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(1 for a, b in und for c in (adj[a] & adj[b]) if c > b)
    wed = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    return tri, wed


def test_triangle_stats_clique_and_noise():
    # K5 (10 triangles) + a pendant chain + duplicate/reversed/self edges
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    noisy = pairs + [(b, a) for a, b in pairs] + [(0, 0), (5, 6), (6, 7)]
    edges = rd.from_arrow(pa.table({
        "src": [p[0] for p in noisy], "dst": [p[1] for p in noisy]}))
    got = cluster.triangle_stats(edges).to_pandas().iloc[0]
    tri, wed = _brute_triangles(noisy)
    assert int(got.n_triangles) == tri == 10
    assert int(got.n_wedges) == wed
    assert got.global_clustering == round(3.0 * tri / wed, 6)


def test_triangle_stats_synth_graph_brute_parity():
    t = synth.synth_web_graph(250, seed=9)
    got = cluster.triangle_stats(rd.from_arrow(t)).to_pandas().iloc[0]
    tri, wed = _brute_triangles(
        list(zip(t.column("src").to_pylist(), t.column("dst").to_pylist())))
    assert (int(got.n_triangles), int(got.n_wedges)) == (tri, wed)


def test_triangle_stats_degenerate():
    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    got = cluster.triangle_stats(empty).to_pandas().iloc[0]
    assert (int(got.n_triangles), int(got.n_wedges),
            got.global_clustering) == (0, 0, 0.0)
    # triangle-free: one wedge, zero triangles
    path2 = rd.from_arrow(pa.table({"src": [1, 2], "dst": [2, 3]}))
    got = cluster.triangle_stats(path2).to_pandas().iloc[0]
    assert (int(got.n_triangles), int(got.n_wedges)) == (0, 1)
    assert got.global_clustering == 0.0


def test_triangle_stats_string_nodes():
    edges = rd.from_arrow(pa.table({
        "src": ["u", "u", "v", "x"], "dst": ["v", "w", "w", "u"]}))
    got = cluster.triangle_stats(edges).to_pandas().iloc[0]
    assert int(got.n_triangles) == 1
    # deg: u=3, v=2, w=2, x=1 -> C(3,2)+C(2,2)... = 3 + 1 + 1 + 0 = 5
    assert int(got.n_wedges) == 5


def test_triangle_stats_join_plan_parity():
    # dense-enough graph: force the distributed join plan and compare with
    # the local forward-algorithm path
    t = synth.synth_web_graph(250, seed=9)
    a = cluster.triangle_stats(rd.from_arrow(t)).to_pandas().iloc[0]
    b = cluster.triangle_stats(
        rd.from_arrow(t), small_threshold=0).to_pandas().iloc[0]
    assert (int(a.n_triangles), int(a.n_wedges), a.global_clustering) == \
        (int(b.n_triangles), int(b.n_wedges), b.global_clustering)


def test_extract_anchors_text_capture_and_trim():
    html = (b'<a href="https://a.example/1"> Click Here </a>'
            b'<a href="https://b.example/2" rel="nofollow">read<b>m</b></a>'
            b"<a href='https://c.example/3'>\n\tws\r </a>"
            b'<a href="https://d.example/4"></a>')
    got = L.extract_anchors(html)
    # raw pairs, double-quoted scan first; text = run up to the next '<'
    assert got == [("https://a.example/1", " Click Here "),
                   ("https://b.example/2", "read"),
                   ("https://d.example/4", ""),
                   ("https://c.example/3", "\n\tws\r ")]
    batch = pa.table({"url": ["https://p.example/x"], "html": [html]})
    out = L.extract_anchors_batch(batch)
    # empty-after-trim anchors dropped; whitespace trimmed (ASCII set)
    assert out.column("txt").to_pylist() == ["Click Here", "read", "ws"]
    assert out.column("src").to_pylist() == ["https://p.example/x"] * 3


def test_anchor_texts_aggregation_and_topk():
    pages = []
    # 7 pages all linking the same target with 6 distinct texts + 1 repeat
    texts = ["zeta", "alpha", "mid", "beta", "gamma", "delta", "alpha"]
    for i, t in enumerate(texts):
        pages.append((f"https://h{i}.example/p",
                      f'<a href="https://hub.example/t">{t}</a>'.encode()))
    ds = rd.from_arrow(pa.table({
        "url": [p[0] for p in pages],
        "html": pa.array([p[1] for p in pages], pa.binary()),
    })).repartition(3)
    got = webgraph.anchor_texts(ds, top_k=5).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["dst"] == "https://hub.example/t"
    assert row["n_anchors"] == 7          # occurrences (repeat counts)
    assert row["n_texts"] == 6            # distinct
    # lexicographically first 5 of the 6 distinct texts
    assert row["texts"] == "alpha|beta|delta|gamma|mid"


def test_noindex_filter_variants():
    cases = [
        # (html, is_noindex)
        (b'<meta name="robots" content="noindex,nofollow">', True),
        (b"<meta name='robots' content='NOINDEX'>", True),
        (b'<META NAME="ROBOTS" CONTENT="NoIndex">', True),
        # content-before-name attribute order
        (b'<meta content="noindex" name="robots">', True),
        # robots without noindex / noindex under another name: kept
        (b'<meta name="robots" content="nofollow">', False),
        (b'<meta name="googlebot" content="noindex">', False),
        (b"<p>plain page</p>", False),
    ]
    for html, flag in cases:
        assert L.is_noindex(b"<html><head>" + html + b"</head></html>") \
            is flag, html
    assert L.is_noindex(None) is False
    ds = rd.from_arrow(pa.table({
        "url": [f"u{i}" for i in range(len(cases))],
        "html": pa.array([c[0] for c in cases], pa.binary()),
    }))
    kept = webgraph.noindex_filter(ds).to_pandas()["url"].tolist()
    exp = [f"u{i}" for i, c in enumerate(cases) if not c[1]]
    assert kept == exp
    audit = webgraph.noindex_filter(ds, keep_noindex=True).count()
    assert audit == sum(c[1] for c in cases)


def test_anchor_texts_partition_invariance(linked_pages):
    a = (webgraph.anchor_texts(linked_pages)
         .to_pandas().sort_values("dst").reset_index(drop=True))
    b = (webgraph.anchor_texts(linked_pages.repartition(7))
         .to_pandas().sort_values("dst").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # fixture contract: multi-word, single-token and empty anchor texts all
    # occur; empties never surface
    assert (a["n_anchors"] >= a["n_texts"]).all()
    assert not a["texts"].str.contains(r"\|\|", regex=True).any()
