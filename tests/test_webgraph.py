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
