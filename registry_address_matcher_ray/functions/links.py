"""Anchor-link extraction: HTML pages -> outbound link edges (graft §2.13).

A crawl pipeline's web graph is built from the pages themselves: parse
``<a href=...>`` targets out of each page's HTML, resolve them against the
page URL, canonicalize, and emit ``(src, dst)`` edges. The reference engine
has no crawl layer (it matches flat address registries), so — like
``functions/urls.py`` — this kernel is specified here and checked against a
DuckDB transcription of the SAME rule chain (driver oracles ``pages_links``,
``pages_domain_graph``, ``pages_crawl_pagerank``). Every rule is written
RE2-compatible (no lookaround, no backreferences) so Python ``re`` and
DuckDB's regexp functions reproduce it byte-for-byte.

Contract (each step has an exact SQL twin in :func:`sql_resolved_links`):

1. hrefs are collected with two non-overlapping leftmost scans per document:
   double-quoted ``<a ... href="...">`` first, then single-quoted. Unquoted
   hrefs and non-``<a>`` link carriers (``<link>``, ``<area>``) are out of
   scope. Tag and attribute names match case-insensitively via explicit
   character classes (``[Aa]``, ``[Hh][Rr][Ee][Ff]``) — identical semantics
   in both engines without relying on flag syntax.
2. the single HTML entity that is legal and common inside URLs, ``&amp;``,
   is decoded (one literal replace). Full entity decoding is a non-goal.
3. resolution against the page URL, first matching rule wins:
   - ``http://`` / ``https://`` prefix (lowercase, per the canonical page
     URLs this engine stores) -> kept as-is;
   - ``//host/...`` protocol-relative -> page scheme + ``:`` + href;
   - ``/path`` root-relative -> page origin (``scheme://authority``) + href;
   - anything else (``mailto:``, ``javascript:``, fragments, dot-relative
     paths — dot-segment normalization is a documented non-goal) -> dropped.
4. the resolved URL runs the exact :mod:`functions.urls` canonicalization
   chain (fragment/``www.``/default-port/tracking-param/trailing-``/``).

Vectorized: per-document ``findall`` is inherent to HTML parsing (same shape
as :func:`functions.extract.extract_text`), but resolution + canonicalization
run ONCE per batch through pandas' C regex kernels over the melted href list.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import pandas as pd
import pyarrow as pa

from registry_address_matcher_ray.functions import urls as _urls

__all__ = [
    "extract_hrefs", "resolve_hrefs", "extract_links_batch",
    "sql_resolved_links",
]

# rule 1 — two scans, one per quote style (RE2 has no backreferences, so a
# single \1-quoted pattern is not available to the SQL twin)
_HREF_DQ_RE = re.compile(r'<[Aa]\s[^>]*[Hh][Rr][Ee][Ff]\s*=\s*"([^"]*)"')
_HREF_SQ_RE = re.compile(r"<[Aa]\s[^>]*[Hh][Rr][Ee][Ff]\s*=\s*'([^']*)'")

# rule 3 — anchors for scheme / origin of the page URL
_SCHEME_RE = re.compile(r"^[a-z][a-z0-9+.-]*:")
_ORIGIN_RE = re.compile(r"^[a-z][a-z0-9+.-]*://[^/?#]*")


def extract_hrefs(html_bytes: bytes | None) -> List[str]:
    """Raw href strings of a document, double-quoted scan then single-quoted
    (rule 1). Pure and deterministic per input."""
    if html_bytes is None:
        return []
    if isinstance(html_bytes, memoryview):
        html_bytes = html_bytes.tobytes()
    s = html_bytes.decode("utf-8", errors="replace")
    return _HREF_DQ_RE.findall(s) + _HREF_SQ_RE.findall(s)


def resolve_hrefs(srcs: pd.Series, hrefs: pd.Series) -> pd.Series:
    """Rules 2–4 over melted (page url, raw href) pairs -> canonical absolute
    URL, or NaN where the href is out of scope. Vectorized (pandas C kernels,
    no Python loop)."""
    h = hrefs.astype(str).str.replace("&amp;", "&", regex=False)  # rule 2
    absolute = h.str.startswith("http://") | h.str.startswith("https://")
    proto_rel = ~absolute & h.str.startswith("//")
    root_rel = ~absolute & ~proto_rel & h.str.startswith("/")

    scheme = srcs.astype(str).str.extract(
        f"^({_SCHEME_RE.pattern[1:]})", expand=False)
    origin = srcs.astype(str).str.extract(
        f"^({_ORIGIN_RE.pattern[1:]})", expand=False)
    resolved = pd.Series(pd.NA, index=h.index, dtype=object)
    resolved[absolute] = h[absolute]
    resolved[proto_rel] = scheme[proto_rel].fillna("") + h[proto_rel]
    resolved[root_rel] = origin[root_rel].fillna("") + h[root_rel]
    out = pd.Series(pd.NA, index=h.index, dtype=object)
    keep = resolved.notna()
    out[keep] = _urls.canonicalize_series(resolved[keep])  # rule 4
    return out


def extract_links_batch(
    batch: pa.Table, url_col: str = "url", html_col: str = "html",
) -> pa.Table:
    """Batch kernel: pages ``(url, html, ...)`` -> edges ``(src, dst)``, one
    row per resolved anchor occurrence (queries aggregate counts downstream).
    Out-of-scope hrefs are dropped per the module contract."""
    srcs: List[str] = []
    raw: List[str] = []
    urls_py = batch.column(url_col).to_pylist()
    for u, html in zip(urls_py, batch.column(html_col).to_pylist()):
        for href in extract_hrefs(html):
            srcs.append(u)
            raw.append(href)
    if not srcs:
        return pa.table({"src": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string())})
    s = pd.Series(srcs)
    dst = resolve_hrefs(s, pd.Series(raw))
    keep = dst.notna().to_numpy()
    return pa.table({
        "src": pa.array(s[keep].tolist(), pa.string()),
        "dst": pa.array(dst[keep].tolist(), pa.string()),
    })


def sql_resolved_links(parquet_path: str) -> str:
    """DuckDB CTE body computing the IDENTICAL edges ``(src, dst)`` over a
    pages parquet — one source of truth for the driver oracles (same pattern
    as :func:`functions.urls.sql_canonical`, which it reuses for rule 4)."""
    dq = r'<[Aa]\s[^>]*[Hh][Rr][Ee][Ff]\s*=\s*"([^"]*)"'
    sq = r"<[Aa]\s[^>]*[Hh][Rr][Ee][Ff]\s*=\s*''([^'']*)''"
    scheme = "regexp_extract(src, '^[a-z][a-z0-9+.-]*:')"
    origin = "regexp_extract(src, '^[a-z][a-z0-9+.-]*://[^/?#]*')"
    return f"""
        pages_h AS (SELECT url, decode(html) AS h
                    FROM read_parquet('{parquet_path}')),
        hrefs AS (
            SELECT url AS src,
                   unnest(regexp_extract_all(h, '{dq}', 1)) AS href
            FROM pages_h
            UNION ALL
            SELECT url AS src,
                   unnest(regexp_extract_all(h, '{sq}', 1)) AS href
            FROM pages_h),
        resolved AS (
            SELECT src, CASE
                WHEN h2 LIKE 'http://%' OR h2 LIKE 'https://%' THEN h2
                WHEN h2 LIKE '//%' THEN {scheme} || h2
                WHEN h2 LIKE '/%' THEN {origin} || h2
                END AS r
            FROM (SELECT src, replace(href, '&amp;', '&') AS h2 FROM hrefs)),
        links AS (
            SELECT src, {_urls.sql_canonical('r')} AS dst
            FROM resolved WHERE r IS NOT NULL)
    """
