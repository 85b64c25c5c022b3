"""URL canonicalization: scalar/vectorized/DuckDB three-way parity and
canonical-URL dedup ground truth (graft §2.13 crawl pre-pass; the reference
has no URL layer — rules specified in ``functions/urls.py``)."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from registry_address_matcher_ray.functions import urls as U
from registry_address_matcher_ray.sources.synth import synth_crawl_urls
from registry_address_matcher_ray.stages import dedup as D

TRICKY = [
    "HTTP://WWW.Example.com:80/a/?utm_source=x#frag",
    "http://example.com/a",
    "https://Example.COM:443/",
    "https://example.com:8080/a/",
    "http://www.example.com/path/?utm_a=1&b=2&utm_c=3",
    "http://h/p?utm_a=1&b=2",
    "http://h/p?b=2&utm_a=1",
    "http://h/p?utm_a=1",
    "http://h/p?utm_a=1&utm_b=2",
    "http://h/p?",
    "http://h/p/?fbclid=abc",
    "ftp://USER@Host.com/Dir/",
    "https://user@www.site.org:443/x//",
    "http://host//",
    "http://www.com/",
    "not a url at all",
    "",
    None,
    "http://h/a/b/c/?gclid=1&x=2&msclkid=3#z",
    "HTTPS://WWW.A.B.C:443",
    "http://h?utm_x=9",
    "http://h/%7Euser/?UTM_SOURCE=up",  # uppercase name kept (case-sensitive)
]


def test_scalar_matches_vectorized():
    vec = U.canonicalize_series(pd.Series(TRICKY, dtype=object))
    for raw, v in zip(TRICKY, vec):
        assert U.canonicalize_url(raw) == v, raw


def test_arrow_kernels_match_scalar():
    arr = pa.array(TRICKY, pa.string())
    got = U.canonicalize_arrow(arr).to_pylist()
    want = [U.canonicalize_url(u) for u in TRICKY]
    assert got == want
    hosts = U.host_of_arrow(pa.array(want, pa.string())).to_pylist()
    assert hosts == U.host_of(pd.Series(want)).tolist()


def test_duckdb_chain_is_byte_identical():
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"u": TRICKY}))
    expr = U.sql_canonical("coalesce(u, '')")
    got = con.execute(f"SELECT {expr} AS c FROM t").fetchdf()["c"].tolist()
    want = U.canonicalize_series(pd.Series(TRICKY, dtype=object)).tolist()
    assert got == want
    hosts = con.execute(
        f"SELECT {U.sql_host(expr)} AS h FROM t").fetchdf()["h"].tolist()
    assert hosts == U.host_of(pd.Series(want)).tolist()


def test_fixture_decorations_invert_and_are_deterministic():
    t = synth_crawl_urls(1500, seed=9)
    assert t.equals(synth_crawl_urls(1500, seed=9))
    df = t.to_pandas()
    canon = U.canonicalize_series(df["url"])
    # duplicates exist (the dedup family has work to do) and every group's
    # members share one canonical form by construction (asserted in synth)
    assert canon.nunique() < len(df)
    # fixture canonical forms are fixed points of the chain
    assert (U.canonicalize_series(canon) == canon).all()


def test_keep_latest_dedup_ground_truth(ray_session):
    t = synth_crawl_urls(2500, seed=13)
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: U.canonical_column(b, "url", "canonical_url"),
        batch_format="pyarrow")
    df = t.to_pandas()
    df["c"] = U.canonicalize_series(df["url"])
    want = (df.sort_values(["c", "warc_ts", "page_id"],
                           ascending=[True, False, True], kind="mergesort")
            .drop_duplicates("c").sort_values("c"))
    # (local fast path), (distributed + broadcast winners), (distributed +
    # forced join winners)
    for loc, win in ((None, None), (0, None), (0, 0)):
        kept = D.keep_latest_dedup(
            ds, "canonical_url", "warc_ts", "page_id",
            winner_broadcast_limit=win, local_limit_bytes=loc,
        ).to_pandas().sort_values("canonical_url")
        assert len(kept) == len(want), (loc, win)
        assert (kept["page_id"].to_numpy() == want["page_id"].to_numpy()).all()
        assert (kept["warc_ts"].to_numpy() == want["warc_ts"].to_numpy()).all()


def test_snapshot_diff_ground_truth(ray_session):
    t = synth_crawl_urls(2000, seed=21)
    df = t.to_pandas()
    df["c"] = U.canonicalize_series(df["url"])
    cut = pd.Timestamp("2024-04-15")
    old_keys = set(df.loc[df["warc_ts"] < cut, "c"])
    new_keys = set(df.loc[df["warc_ts"] >= cut, "c"])
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: U.canonical_column(b, "url", "canonical_url"),
        batch_format="pyarrow").repartition(6)
    old = ds.filter(lambda r: r["warc_ts"] < cut)
    new = ds.filter(lambda r: r["warc_ts"] >= cut)
    got = D.snapshot_diff(old, new, "canonical_url").to_pandas()
    assert len(got) == len(old_keys | new_keys)
    by = dict(zip(got["canonical_url"], got["status"]))
    for k in old_keys | new_keys:
        want = ("common" if k in old_keys and k in new_keys
                else "removed" if k in old_keys else "added")
        assert by[k] == want, k


def test_canonical_dedup_ground_truth(ray_session):
    t = synth_crawl_urls(3000, seed=42)
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: U.canonical_column(b, "url", "canonical_url", with_host=True),
        batch_format="pyarrow")
    kept = D.exact_dedup(ds, "canonical_url", "page_id").to_pandas()
    df = t.to_pandas()
    df["canonical_url"] = U.canonicalize_series(df["url"])
    want = df.groupby("canonical_url")["page_id"].min().sort_values()
    got = kept.set_index("canonical_url")["page_id"].sort_values()
    assert len(got) == len(want)
    assert (got.sort_index() == want.sort_index()).all()
    # host extraction is total over the fixture (every url parses)
    hosts = U.host_of(df["canonical_url"])
    assert (hosts != "").all()


def test_fuzzed_three_way_parity():
    # adversarial generator: random fragments of URL-ish syntax, empty
    # segments, repeated separators, mixed case, tracking-name prefixes
    import random

    rng = random.Random(99)
    pool = ["http://", "HTTPS://", "ftp://", "www.", "WWW.", "EXAMPLE",
            "site", ".com", ".ORG", ":80", ":443", ":8080", "/", "//",
            "/a", "/B", "?", "&", "=", "#frag", "#", "utm_source=1",
            "utm_=x", "utm=y", "fbclid=z", "gclid=", "msclkid=9&",
            "q=2", "user@", "%7E", " ", "", "?&", "a?b", "."]
    urls = ["".join(rng.choice(pool) for _ in range(rng.randrange(0, 9)))
            for _ in range(2000)]
    scalar = [U.canonicalize_url(u) for u in urls]
    arrow = U.canonicalize_arrow(pa.array(urls, pa.string())).to_pylist()
    assert arrow == scalar
    vec = U.canonicalize_series(pd.Series(urls, dtype=object)).tolist()
    assert vec == scalar
    import duckdb
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"u": urls}))
    sql = con.execute(
        "SELECT " + U.sql_canonical("coalesce(u, '')") + " AS c FROM t"
    ).fetchdf()["c"].tolist()
    assert sql == scalar


def test_keep_latest_null_ts_never_wins(ray_session):
    df = pd.DataFrame({
        "key": ["a", "a", "b", "b", "c"],
        "ts": pd.to_datetime(["2024-01-01", None, None, "2024-02-01", None]),
        "row_id": [0, 1, 2, 3, 4],
    })
    out = D.keep_latest_dedup(
        ray.data.from_pandas(df), "key", "ts", "row_id").to_pandas()
    # 'c' has only NULL timestamps -> no row (SQL NULL-ignoring semantics)
    assert sorted(out["key"]) == ["a", "b"]
    assert set(out["row_id"]) == {0, 3}


def test_domain_blocklist_suffix_semantics(ray_session):
    """UT1/RefinedWeb blocklist semantics: exact host OR any parent domain;
    python mask, stage filter and generated SQL all agree."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from registry_address_matcher_ray.functions import urls as U

    hosts = ["example.com", "a.example.com", "a.b.example.com",
             "badexample.com", "example.com.evil.net", "other.org",
             "sub.other.org", ""]
    blocked = frozenset({"example.com", "other.org"})
    mask = U.blocklist_mask(pa.array(hosts, pa.string()), blocked)
    assert mask.to_pylist() == [True, True, True, False, False,
                                True, True, False]

    # SQL predicate parity over the same hosts
    df = pd.DataFrame({"h": hosts})
    got = duckdb.sql(
        f"SELECT {U.sql_blocklist('h', blocked)} AS b FROM df"
    ).df()["b"].tolist()
    assert got == mask.to_pylist()

    # stage filter end-to-end on raw (uncanonicalized) urls
    ds = ray.data.from_items(
        [{"url": f"HTTPS://WWW.{h}/x?utm_source=z" if h else "not-a-url",
          "i": i} for i, h in enumerate(hosts)])
    kept = sorted(r["i"] for r in U.domain_blocklist_filter(
        ds, "url", blocked).take_all())
    assert kept == [3, 4, 7]
    only = sorted(r["i"] for r in U.domain_blocklist_filter(
        ds, "url", blocked, keep=True).take_all())
    assert only == [0, 1, 2, 5, 6]
