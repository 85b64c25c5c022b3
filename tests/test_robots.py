"""robots.txt parsing + decision semantics (functions/robots.py) and the
broadcast filter stage (stages/webgraph.robots_filter). The driver oracle
(`crawl_robots_allowed`) proves the join + longest-match + tie-break
decision in SQL; these tests pin the PARSE itself (which feeds the oracle's
rules table) against hand-written expectations."""

import pyarrow as pa
import ray.data as rd

from registry_address_matcher_ray.functions import robots as R
from registry_address_matcher_ray.stages import webgraph


ROBOTS = """\
# comment-only line
User-agent: GoogleBot
Disallow: /google-only

User-agent: *
Disallow: /private   # trailing comment
Allow: /private/pub
Disallow:
Disallow: /tmp*
Allow: /a$
disallow: /case
ALLOW: /private

User-agent: OtherBot
User-agent: *
Disallow: /second-group
"""


def test_parse_robots_groups_and_edge_cases():
    got = R.parse_robots(ROBOTS)
    # star groups only; empty Disallow and wildcard rules skipped;
    # field names case-insensitive; both star groups merged
    assert got == [
        ("disallow", "/private"),
        ("allow", "/private/pub"),
        ("disallow", "/case"),
        ("allow", "/private"),
        ("disallow", "/second-group"),
    ]
    assert R.parse_robots(None) == []
    assert R.parse_robots("") == []
    assert R.parse_robots("Disallow: /orphan-before-any-group\n") == []
    # agent-specific consultation
    assert ("disallow", "/google-only") in R.parse_robots(
        ROBOTS, agent="GoogleBot")


def test_is_allowed_longest_match_and_ties():
    rules = R.parse_robots(ROBOTS)
    assert R.is_allowed(rules, "/open/page")          # no match -> allow
    # /private matched by BOTH a disallow and a same-length allow: allow wins
    assert R.is_allowed(rules, "/private")
    assert R.is_allowed(rules, "/private/other")
    # the longer allow override also wins where it applies
    assert R.is_allowed(rules, "/private/pub/x")
    assert not R.is_allowed(rules, "/case/y")
    assert not R.is_allowed(rules, "/second-group")
    # empty path treated as '/'
    assert R.is_allowed([("disallow", "/x")], "")
    assert not R.is_allowed([("disallow", "/")], "")


def test_rules_table_melt():
    tbl = pa.table({"host": ["h1", "h2"],
                    "robots_txt": [ROBOTS, ""]})
    rules = R.rules_table(tbl)
    assert rules.column("host").to_pylist().count("h1") == 5
    assert "h2" not in rules.column("host").to_pylist()


def test_robots_filter_vs_reference(ray_session):
    hosts = [f"site{h:03d}.example.com" for h in range(12)]
    robots = R.synth_robots(hosts, seed=7)
    # urls across the fixture path vocabulary, incl. surface forms the
    # canonicalizer must fold before the host/path probe
    from registry_address_matcher_ray.sources.synth import synth_crawl_urls

    urls = synth_crawl_urls(400, seed=7)
    ds = rd.from_arrow(urls).repartition(5)
    got = sorted(webgraph.robots_filter(ds, robots)
                 .to_pandas()["page_id"].tolist())

    # independent per-row reference through the module's own primitives
    from registry_address_matcher_ray.functions import urls as U

    rule_map = {h: R.parse_robots(t)
                for h, t in zip(robots.column("host").to_pylist(),
                                robots.column("robots_txt").to_pylist())}
    import re

    import pandas as pd

    exp = []
    for pid, url in zip(urls.column("page_id").to_pylist(),
                        urls.column("url").to_pylist()):
        c = U.canonicalize_url(url)
        host = U.host_of(pd.Series([c])).iloc[0]
        m = re.match(R.PATH_SQL_RE, c)
        path = m.group(1) if m else ""
        if R.is_allowed(rule_map.get(host, []), path):
            exp.append(pid)
    assert got == sorted(exp)
    assert 0 < len(got) < 400                 # filter is non-trivial

    # inversion: disallowed rows are exactly the complement
    inv = webgraph.robots_filter(ds, robots, keep_disallowed=True)
    assert sorted(got + inv.to_pandas()["page_id"].tolist()) == \
        sorted(urls.column("page_id").to_pylist())

    # partition invariance
    got2 = sorted(webgraph.robots_filter(rd.from_arrow(urls), robots)
                  .to_pandas()["page_id"].tolist())
    assert got2 == got
