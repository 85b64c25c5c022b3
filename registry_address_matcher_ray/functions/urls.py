"""URL canonicalization for crawl-scale dedup (graft §2.13 addition).

Common-Crawl pipelines dedup by canonical URL before any content pass: the
same page is crawled as ``HTTP://WWW.Example.com:80/a/?utm_source=x#frag`` and
``http://example.com/a``. The reference has no URL layer (it matches address
registries), so this kernel is specified here and checked against a DuckDB
transcription of the SAME regex chain (driver oracle ``pages_url_canonical``).
Every rule is ONE regex substitution, written RE2-compatible (no lookaround,
no replacement callbacks) so Python ``re``, pandas' C kernels and DuckDB's
``regexp_replace`` reproduce it byte-for-byte.

Rules, applied in order to ``scheme://[user@]host[:port][/path][?q][#f]``:

1. fragment dropped (``#.*$``)
2. authority lowercased: the ``scheme://…up-to-first-/?#`` prefix is extracted,
   lowercased, and re-concatenated with the untouched remainder
3. ``www.`` prefix stripped from the host (only directly after ``://``)
4. explicit default port ``:80`` / ``:443`` stripped
5. tracking params removed (lowercase names ``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``) in three passes that each stay a single substitution:
   a. every ``&name=value`` unit, globally
   b. a leading ``?name=value&`` collapses to ``?`` (at most one such unit
      can remain after (a))
   c. a lone ``?name=value`` at end of string is dropped
6. bare trailing ``?`` dropped
7. trailing ``/`` stripped from the path when followed by end or ``?``
   (``/a/?q`` -> ``/a?q``; bare ``host/`` -> ``host``)

The chain is deterministic but not idempotent in pathological cases
(``www.www.x`` loses one ``www.`` per application) — callers canonicalize raw
URLs exactly once.

Vectorized: the batch path runs the same compiled-regex chain through pandas'
C string kernels — no Python loop per row.
"""

from __future__ import annotations

import re
from typing import Optional, Union

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_TRACK_NAMES = r"(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)"

# one compiled pattern per documented rule — applied in order; every pattern
# is RE2-valid so the DuckDB oracle runs the identical chain (see SQL_CHAIN)
_FRAGMENT_RE = re.compile(r"#.*$")
_AUTHORITY_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)")
_WWW_RE = re.compile(r"^([a-z][a-z0-9+.-]*://)www\.")
_DEFAULT_PORT_RE = re.compile(r"^([a-z][a-z0-9+.-]*://[^/?#:]*):(?:80|443)([/?#]|$)")
_TRACK_AMP_RE = re.compile(r"&" + _TRACK_NAMES + r"=[^&#]*")
_TRACK_FIRST_RE = re.compile(r"\?" + _TRACK_NAMES + r"=[^&#]*&")
_TRACK_ONLY_RE = re.compile(r"\?" + _TRACK_NAMES + r"=[^&#]*$")
_TRAILING_Q_RE = re.compile(r"\?$")
_TRAILING_SLASH_RE = re.compile(
    r"^([a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*[^/?#])?)/(\?|$)")

_HOST_RE = re.compile(r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)")


def canonicalize_url(url: str) -> str:
    """Scalar reference implementation (the batch path is vectorized)."""
    if not url:
        return ""
    u = _FRAGMENT_RE.sub("", url)
    m = _AUTHORITY_RE.match(u)
    if m:
        u = m.group(1).lower() + u[m.end():]
    u = _WWW_RE.sub(r"\1", u, count=1)
    u = _DEFAULT_PORT_RE.sub(r"\1\2", u, count=1)
    u = _TRACK_AMP_RE.sub("", u)
    u = _TRACK_FIRST_RE.sub("?", u, count=1)
    u = _TRACK_ONLY_RE.sub("", u, count=1)
    u = _TRAILING_Q_RE.sub("", u, count=1)
    u = _TRAILING_SLASH_RE.sub(r"\1\3", u, count=1)
    return u


def canonicalize_series(urls: pd.Series) -> pd.Series:
    """Same rule chain through pandas' C regex kernels (hot path)."""
    s = urls.fillna("").astype(str)
    s = s.str.replace(_FRAGMENT_RE, "", regex=True)
    auth = s.str.extract(_AUTHORITY_RE, expand=False)
    s = auth.str.lower().fillna("") + s.str.replace(_AUTHORITY_RE, "", regex=True)
    s = s.str.replace(_WWW_RE, r"\1", regex=True)
    s = s.str.replace(_DEFAULT_PORT_RE, r"\1\2", regex=True)
    s = s.str.replace(_TRACK_AMP_RE, "", regex=True)
    s = s.str.replace(_TRACK_FIRST_RE, "?", regex=True)
    s = s.str.replace(_TRACK_ONLY_RE, "", regex=True)
    s = s.str.replace(_TRAILING_Q_RE, "", regex=True)
    s = s.str.replace(_TRAILING_SLASH_RE, r"\1\3", regex=True)
    return s


def host_of(urls: pd.Series) -> pd.Series:
    """Registrable host of an already-CANONICAL url ('' when unparseable)."""
    return urls.str.extract(_HOST_RE, expand=False).fillna("")


def canonicalize_arrow(arr: pa.Array) -> pa.Array:
    """The identical chain through pyarrow's C++ RE2 kernels (hot path).

    Every pattern is RE2-valid by construction (that is what makes the DuckDB
    oracle exact), so the same strings drive ``pc.replace_substring_regex``;
    rule 2's callback-free lowercase becomes extract + utf8_lower + concat.
    Parity with the scalar/pandas/SQL forms is pinned in tests/test_urls.py.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = pc.fill_null(pc.cast(arr, pa.string()), "")
    s = pc.replace_substring_regex(s, pattern=_FRAGMENT_RE.pattern, replacement="")
    # rule 2: lowercase the authority prefix, keep the remainder untouched
    auth = pc.extract_regex(s, pattern=r"^(?P<a>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)")
    auth_s = pc.fill_null(pc.struct_field(auth, "a"), "")
    rest = pc.replace_substring_regex(
        s, pattern=_AUTHORITY_RE.pattern, replacement="", max_replacements=1)
    s = pc.binary_join_element_wise(pc.utf8_lower(auth_s), rest, "")
    for pat, repl, n in (
        (_WWW_RE, r"\1", 1),
        (_DEFAULT_PORT_RE, r"\1\2", 1),
        (_TRACK_AMP_RE, "", None),
        (_TRACK_FIRST_RE, "?", 1),
        (_TRACK_ONLY_RE, "", 1),
        (_TRAILING_Q_RE, "", 1),
        (_TRAILING_SLASH_RE, r"\1\3", 1),
    ):
        s = pc.replace_substring_regex(
            s, pattern=pat.pattern, replacement=repl, max_replacements=n)
    return s


def host_of_arrow(canon: pa.Array) -> pa.Array:
    """Arrow-kernel :func:`host_of` over already-canonical urls."""
    if isinstance(canon, pa.ChunkedArray):
        canon = canon.combine_chunks()
    m = pc.extract_regex(
        canon, pattern=r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?(?P<h>[^/?#:]*)")
    return pc.fill_null(pc.struct_field(m, "h"), "")


def canonical_column(
    batch: Union[pa.Table, pd.DataFrame], url_col: str = "url",
    out_col: str = "canonical_url", with_host: bool = False,
) -> pa.Table:
    """Batch kernel: append ``out_col`` = canonical form of ``url_col``."""
    tbl = batch if isinstance(batch, pa.Table) else pa.Table.from_pandas(
        batch, preserve_index=False)
    canon = canonicalize_arrow(tbl.column(url_col))
    tbl = tbl.append_column(out_col, canon)
    if with_host:
        tbl = tbl.append_column("host", host_of_arrow(canon))
    return tbl


def sql_canonical(expr: str) -> str:
    """DuckDB expression computing the IDENTICAL chain over ``expr``.

    RE2 regexes are the same strings as the compiled patterns above; rule 2's
    callback-free lowercase becomes extract+lower+concat. Used by the driver
    oracle so the SQL is generated from one source of truth.
    """
    auth = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    u = f"regexp_replace({expr}, '#.*$', '')"
    u = (f"(lower(regexp_extract({u}, '{auth}'))"
         f" || regexp_replace({u}, '{auth}', ''))")
    u = f"regexp_replace({u}, '^([a-z][a-z0-9+.-]*://)www\\.', '\\1')"
    u = (f"regexp_replace({u}, "
         f"'^([a-z][a-z0-9+.-]*://[^/?#:]*):(?:80|443)([/?#]|$)', '\\1\\2')")
    u = f"regexp_replace({u}, '&{_TRACK_NAMES}=[^&#]*', '', 'g')"
    u = f"regexp_replace({u}, '\\?{_TRACK_NAMES}=[^&#]*&', '?')"
    u = f"regexp_replace({u}, '\\?{_TRACK_NAMES}=[^&#]*$', '')"
    u = f"regexp_replace({u}, '\\?$', '')"
    u = (f"regexp_replace({u}, "
         f"'^([a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*[^/?#])?)/(\\?|$)', '\\1\\3')")
    return u


def sql_host(expr: str) -> str:
    """DuckDB expression for :func:`host_of` over an already-canonical col."""
    return (f"coalesce(regexp_extract({expr}, "
            f"'^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)', 1), '')")


def blocklist_mask(hosts: Union[pa.Array, pa.ChunkedArray],
                   blocked: frozenset) -> pa.Array:
    """True where the host or ANY parent domain is blocked — UT1/RefinedWeb
    URL-blocklist semantics (a listed ``example.com`` blocks
    ``a.b.example.com`` too). Per-distinct-host memo: crawl hosts repeat
    thousands of times per domain, so the Python suffix walk runs once per
    distinct host, not per row. SQL twin: :func:`sql_blocklist`."""
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    memo: dict = {}
    out = []
    for h in hosts.to_pylist():
        h = h or ""
        v = memo.get(h)
        if v is None:
            parts = h.split(".")
            v = any(".".join(parts[i:]) in blocked
                    for i in range(len(parts)))
            memo[h] = v
        out.append(v)
    return pa.array(out, pa.bool_())


def sql_blocklist(host_expr: str, blocked: frozenset) -> str:
    """DuckDB predicate computing the IDENTICAL suffix-match semantics as
    :func:`blocklist_mask` over ``host_expr`` (exact host or dotted-suffix
    match against the literal blocklist) — generated from the same source
    of truth so engine and oracle cannot drift."""
    vals = ", ".join(f"('{d}')" for d in sorted(blocked))
    return (f"EXISTS (SELECT 1 FROM (VALUES {vals}) bl(d) "
            f"WHERE {host_expr} = bl.d "
            f"OR {host_expr} LIKE '%.' || bl.d)")


def domain_blocklist_filter(
    ds: "ray.data.Dataset", url_col: str, blocked, keep: bool = False,
    host_col: Optional[str] = None,
) -> "ray.data.Dataset":
    """Drop (or, with ``keep=True``, retain only) rows whose canonical-URL
    host matches the blocklist — the RefinedWeb/CCNet URL-filtering stage.
    The blocklist is captured in the batch closure (a real UT1 list is a
    few MB — broadcast once per worker by Ray's closure serialization);
    the per-row work is a memoized suffix probe, no shuffle, no join."""
    blocked = frozenset(blocked)

    def _flt(batch: pa.Table) -> pa.Table:
        if host_col is not None and host_col in batch.column_names:
            hosts = batch.column(host_col)
        else:
            hosts = host_of_arrow(canonicalize_arrow(batch.column(url_col)))
        mask = blocklist_mask(hosts, blocked)
        if not keep:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(_flt, batch_format="pyarrow")
