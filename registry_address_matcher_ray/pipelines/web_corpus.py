"""Crawl-native corpus preparation: pages -> clean deduplicated documents.

The composition a webtext training-data user actually runs, chaining the
engine's crawl-politeness gates and text-cleaning stages in the standard
order (CCNet / C4 / RefinedWeb lineage):

1. meta-robots noindex kill            (``stages/webgraph.noindex_filter``)
2. URL/domain blocklist                (``functions/urls.domain_blocklist_filter``)
3. HTML -> text extraction             (``stages/blocking.extract_pages``)
4. cross-page boilerplate line removal (``stages/dedup.boilerplate_removed``)
5. C4 §2.2 document cleaning + kill    (``stages/analytics.c4_clean``)
6. exact text dedup, min-url winner    (``stages/dedup.exact_dedup``)

Politeness filters run BEFORE extraction (at 100 TB, html payloads of
disallowed pages must never reach the extractor); only ``(url, text)`` rows
leave stage 3. Every stage keeps its own physical plan (broadcast winner
maps, packed-key exchanges); this module only composes.

The output feeds ``pipelines/training_prep.py`` (quality filter -> global
shuffle -> tokenize/pack -> resumable shards) for the model-ready half of
the journey. Exact full-chain DuckDB oracle: ``pages_corpus_prep`` in
``__ray_entry__.py``.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import ray.data

__all__ = ["pages_to_corpus"]


def pages_to_corpus(
    pages: ray.data.Dataset,
    blocked=frozenset(),
    robots: pa.Table | None = None,
    max_df: int = 2,
    min_words: int = 5,
    min_sentences: int = 1,
    badwords: Sequence[str] = (),
) -> ray.data.Dataset:
    """Pages ``(url, html, ...)`` -> clean deduplicated ``(url, text)``.

    ``blocked``: host/domain blocklist (UT1 semantics — exact host or any
    parent domain). ``robots``: optional host-level ``(host, robots_txt)``
    table for the robots.txt gate (``stages/webgraph.robots_filter``).
    ``max_df``: boilerplate document-frequency threshold. ``min_words`` /
    ``min_sentences`` / ``badwords``: the C4 rule knobs.
    """
    from ..functions import urls as _urls
    from ..stages import analytics, blocking, dedup, webgraph

    kept = webgraph.noindex_filter(pages)
    if robots is not None:
        kept = webgraph.robots_filter(kept, robots)
    if blocked:
        kept = _urls.domain_blocklist_filter(kept, "url", blocked)

    ext = blocking.extract_pages(
        kept.select_columns(["url", "html"])).map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "text": b.column("extracted_text")}),
        batch_format="pyarrow")

    nob = dedup.boilerplate_removed(ext, "text", "url", max_df=max_df)
    cleaned = analytics.c4_clean(nob, "text", "url",
                                 min_words=min_words,
                                 min_sentences=min_sentences,
                                 badwords=badwords)

    def _passed(b: pa.Table) -> pa.Table:
        return b.filter(b.column("passes")).select(["url", "text"])

    passed = cleaned.map_batches(_passed, batch_format="pyarrow")
    return dedup.exact_dedup(passed, key_col="text", id_col="url")
