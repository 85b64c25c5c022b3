"""Crawl-corpus composition (pipelines/web_corpus.py). The driver oracle
(`pages_corpus_prep`) proves the full chain in SQL; these tests pin the
planted per-stage behaviors and the optional robots gate the oracle does
not exercise."""

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from registry_address_matcher_ray.functions import robots as R
from registry_address_matcher_ray.pipelines.web_corpus import pages_to_corpus
from registry_address_matcher_ray.sources import synth


def _corpus(ray_session, tmp_path, **kw):
    t = synth.synth_linked_pages(500, seed=3)
    p = str(tmp_path / "lp.parquet")
    pq.write_table(t, p)
    return t, pages_to_corpus(rd.read_parquet(p), **kw).to_pandas()


def test_planted_stage_behaviors(ray_session, tmp_path):
    t, df = _corpus(ray_session, tmp_path,
                    blocked=frozenset({"w3.example.org"}))
    # exact dedup: cleaned texts are unique, winners are min urls
    assert df["text"].nunique() == len(df)
    assert df["url"].is_unique
    # blocklist: no w3 host survives
    assert not df["url"].str.contains("//w3.example.org/").any()
    # noindex pages (i % 13 == 7) never survive
    noidx = {f"https://w{i % 10}.example.org/p{i:06d}"
             for i in range(500) if i % 13 == 7}
    assert not set(df["url"]) & noidx
    # lorem-ipsum pages (i % 23 == 11) are C4-killed
    lorem = {f"https://w{i % 10}.example.org/p{i:06d}"
             for i in range(500) if i % 23 == 11}
    assert not set(df["url"]) & lorem
    # boilerplate: the shared per-host footer and 'Menu' never surface
    assert not df["text"].str.contains("All rights reserved").any()
    assert not df["text"].str.contains("Menu").any()
    # C4: anchor texts and the short 'page i' line never surface; kept
    # lines are the sentence paragraphs
    assert not df["text"].str.contains("link to page").any()
    assert df["text"].str.match(r"Sentence 0 of page \d+").all()
    # duplicate bodies (i % 19 == 3 copies page i-1) collapsed to one row
    assert 0 < len(df) < 500


def test_robots_gate_composes(ray_session, tmp_path):
    hosts = [f"w{h}.example.org" for h in range(10)]
    robots = pa.table({
        "host": hosts,
        "robots_txt": ["User-agent: *\nDisallow: /p00001\n"] * len(hosts),
    })
    t, base = _corpus(ray_session, tmp_path)
    _, gated = _corpus(ray_session, tmp_path, robots=robots)
    # robots kill exactly the /p00001x pages that were otherwise kept
    lost = set(base["url"]) - set(gated["url"])
    assert lost and all("/p00001" in u for u in lost)
    # and nothing else changed (dedup winners may shift only within the
    # killed url range)
    assert set(gated["url"]) <= set(base["url"]) | set(gated["url"])


def test_partition_invariance(ray_session, tmp_path):
    t = synth.synth_linked_pages(400, seed=5)
    p = str(tmp_path / "lp2.parquet")
    pq.write_table(t, p)
    a = (pages_to_corpus(rd.read_parquet(p))
         .to_pandas().sort_values("url").reset_index(drop=True))
    b = (pages_to_corpus(rd.read_parquet(p).repartition(7))
         .to_pandas().sort_values("url").reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
