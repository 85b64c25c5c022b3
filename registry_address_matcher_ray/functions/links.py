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
    "sql_resolved_links", "extract_anchors", "extract_anchors_batch",
    "sql_resolved_anchors", "is_noindex", "sql_noindex",
]

# rule 1 — two scans, one per quote style (RE2 has no backreferences, so a
# single \1-quoted pattern is not available to the SQL twin)
_HREF_DQ_RE = re.compile(r'<[Aa]\s[^>]*[Hh][Rr][Ee][Ff]\s*=\s*"([^"]*)"')
_HREF_SQ_RE = re.compile(r"<[Aa]\s[^>]*[Hh][Rr][Ee][Ff]\s*=\s*'([^']*)'")

# anchor-text variant of rule 1: capture (href, text). Text is the character
# run after the opening tag's '>' up to the next '<' — nested markup inside
# an anchor is a documented non-goal (same simplification CC anchor-text
# extractors make for the common case). Two groups per match: Python
# ``findall`` returns tuples; the SQL twin runs the same pattern twice
# (group 1 then group 2) and ``list_zip``s — regexp_extract_all order is
# leftmost-sequential in both engines.
_ANCHOR_DQ_RE = re.compile(
    r'<[Aa]\s[^>]*[Hh][Rr][Ee][Ff]\s*=\s*"([^"]*)"[^>]*>([^<]*)')
_ANCHOR_SQ_RE = re.compile(
    r"<[Aa]\s[^>]*[Hh][Rr][Ee][Ff]\s*=\s*'([^']*)'[^>]*>([^<]*)")

# meta-robots noindex (crawl-politeness page kill): <meta> tag carrying BOTH
# name="robots" and a content= value containing "noindex", either attribute
# order, double- or single-quoted values. Case-insensitive via explicit
# classes (RE2-compatible, identical in DuckDB's regexp_matches).
_NOINDEX_RES = [re.compile(p) for p in (
    r'<[Mm][Ee][Tt][Aa]\s[^>]*[Nn][Aa][Mm][Ee]\s*=\s*["\'][Rr][Oo][Bb][Oo]'
    r'[Tt][Ss]["\'][^>]*[Cc][Oo][Nn][Tt][Ee][Nn][Tt]\s*=\s*["\'][^"\']*'
    r'[Nn][Oo][Ii][Nn][Dd][Ee][Xx]',
    r'<[Mm][Ee][Tt][Aa]\s[^>]*[Cc][Oo][Nn][Tt][Ee][Nn][Tt]\s*=\s*["\']'
    r'[^"\']*[Nn][Oo][Ii][Nn][Dd][Ee][Xx][^>]*[Nn][Aa][Mm][Ee]\s*=\s*'
    r'["\'][Rr][Oo][Bb][Oo][Tt][Ss]',
)]
# Python \s and DuckDB \s agree on ASCII whitespace for these patterns; the
# SQL twins below carry the literal same regexes.
_WS_CHARS = " \t\n\r"  # explicit trim set shared with the SQL twin

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


def extract_anchors(html_bytes: bytes | None) -> List[Tuple[str, str]]:
    """``(raw href, raw anchor text)`` pairs of a document — the anchor-text
    variant of :func:`extract_hrefs` (double-quoted scan then single-quoted,
    same order contract)."""
    if html_bytes is None:
        return []
    if isinstance(html_bytes, memoryview):
        html_bytes = html_bytes.tobytes()
    s = html_bytes.decode("utf-8", errors="replace")
    return _ANCHOR_DQ_RE.findall(s) + _ANCHOR_SQ_RE.findall(s)


def extract_anchors_batch(
    batch: pa.Table, url_col: str = "url", html_col: str = "html",
) -> pa.Table:
    """Batch kernel: pages -> ``(src, dst, txt)`` anchor rows. hrefs resolve
    through rules 2-4 exactly like :func:`extract_links_batch`; ``txt`` is
    the anchor text trimmed of ASCII whitespace, and anchors whose trimmed
    text is empty are dropped (no signal to aggregate)."""
    srcs: List[str] = []
    raw_h: List[str] = []
    raw_t: List[str] = []
    for u, html in zip(batch.column(url_col).to_pylist(),
                       batch.column(html_col).to_pylist()):
        for href, txt in extract_anchors(html):
            srcs.append(u)
            raw_h.append(href)
            raw_t.append(txt)
    empty = pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string()),
                      "txt": pa.array([], pa.string())})
    if not srcs:
        return empty
    s = pd.Series(srcs)
    dst = resolve_hrefs(s, pd.Series(raw_h))
    txt = pd.Series(raw_t).str.strip(_WS_CHARS)
    keep = (dst.notna() & (txt != "")).to_numpy()
    if not keep.any():
        return empty
    return pa.table({
        "src": pa.array(s[keep].tolist(), pa.string()),
        "dst": pa.array(dst[keep].tolist(), pa.string()),
        "txt": pa.array(txt[keep].tolist(), pa.string()),
    })


def is_noindex(html_bytes: bytes | None) -> bool:
    """True when the page carries a ``<meta name="robots">`` tag whose
    content contains ``noindex`` (either attribute order, either quote
    style) — the standard crawl-pipeline page kill."""
    if html_bytes is None:
        return False
    if isinstance(html_bytes, memoryview):
        html_bytes = html_bytes.tobytes()
    s = html_bytes.decode("utf-8", errors="replace")
    return any(r.search(s) for r in _NOINDEX_RES)


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


def sql_resolved_anchors(parquet_path: str) -> str:
    """DuckDB CTE body computing the IDENTICAL ``anchors(src, dst, txt)``
    rows as :func:`extract_anchors_batch` — same pattern run twice per quote
    style (group 1 = href, group 2 = text; ``regexp_extract_all`` is
    leftmost-sequential in both engines) and zipped positionally."""
    dq = r'<[Aa]\s[^>]*[Hh][Rr][Ee][Ff]\s*=\s*"([^"]*)"[^>]*>([^<]*)'
    sq = (r"<[Aa]\s[^>]*[Hh][Rr][Ee][Ff]\s*=\s*''([^'']*)''"
          r"[^>]*>([^<]*)")
    scheme = "regexp_extract(src, '^[a-z][a-z0-9+.-]*:')"
    origin = "regexp_extract(src, '^[a-z][a-z0-9+.-]*://[^/?#]*')"
    trim = "' ' || chr(9) || chr(10) || chr(13)"
    return f"""
        apages_h AS (SELECT url, decode(html) AS h
                     FROM read_parquet('{parquet_path}')),
        apairs AS (
            SELECT url AS src,
                   unnest(list_zip(regexp_extract_all(h, '{dq}', 1),
                                   regexp_extract_all(h, '{dq}', 2))) AS z
            FROM apages_h
            UNION ALL
            SELECT url AS src,
                   unnest(list_zip(regexp_extract_all(h, '{sq}', 1),
                                   regexp_extract_all(h, '{sq}', 2))) AS z
            FROM apages_h),
        aresolved AS (
            SELECT src, CASE
                WHEN h2 LIKE 'http://%' OR h2 LIKE 'https://%' THEN h2
                WHEN h2 LIKE '//%' THEN {scheme} || h2
                WHEN h2 LIKE '/%' THEN {origin} || h2
                END AS r,
                trim(z[2], {trim}) AS txt
            FROM (SELECT src, replace(z[1], '&amp;', '&') AS h2, z
                  FROM apairs)),
        anchors AS (
            SELECT src, {_urls.sql_canonical('r')} AS dst, txt
            FROM aresolved WHERE r IS NOT NULL AND txt <> '')
    """


def sql_noindex(html_expr: str) -> str:
    """Boolean SQL predicate matching :func:`is_noindex` over a decoded-HTML
    expression (the same two RE2 patterns, attribute order x quote style)."""
    p1 = (r"<[Mm][Ee][Tt][Aa]\s[^>]*[Nn][Aa][Mm][Ee]\s*=\s*[\"'']"
          r"[Rr][Oo][Bb][Oo][Tt][Ss][\"''][^>]*[Cc][Oo][Nn][Tt][Ee][Nn]"
          r"[Tt]\s*=\s*[\"''][^\"'']*[Nn][Oo][Ii][Nn][Dd][Ee][Xx]")
    p2 = (r"<[Mm][Ee][Tt][Aa]\s[^>]*[Cc][Oo][Nn][Tt][Ee][Nn][Tt]\s*=\s*"
          r"[\"''][^\"'']*[Nn][Oo][Ii][Nn][Dd][Ee][Xx][^>]*[Nn][Aa][Mm][Ee]"
          r"\s*=\s*[\"''][Rr][Oo][Bb][Oo][Tt][Ss]")
    return (f"(regexp_matches({html_expr}, '{p1}')"
            f" OR regexp_matches({html_expr}, '{p2}'))")
