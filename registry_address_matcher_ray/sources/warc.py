"""WARC (Web ARChive, ISO 28500) crawl-transport source.

The north-star input is a pages table ``(url, warc_ts, html)``, but at crawl
scale that data lands as ``.warc.gz`` files (Common-Crawl layout: one gzip
stream per crawl chunk, records of type ``response`` carrying the raw HTTP
exchange). This module closes the transport gap the way ``sources/sqldb.py``
closed the DB one: a stdlib-only WARC/1.0-1.1 record parser behind
:func:`read_warc`, which maps one Ray read task per archive file and emits
the exact pages schema the rest of the engine consumes
(``pages_to_match_clusters`` runs unchanged on its output).

The reference engine has no WARC counterpart (it ingests MySQL/CSV only —
``/root/reference/address.py``); this is north-star periphery, not a §2 row.

Scale notes (100-TB crawl):
- one read task per ``.warc.gz`` — archives are the natural parallelism unit
  (Common Crawl ships ~1 GB chunks); tasks stream independently, no shuffle.
- both gzip layouts are handled transparently: whole-file gzip AND the
  member-per-record form the WARC spec recommends (Python's gzip reader
  walks concatenated members natively).
- parsing is per-file sequential by necessity (records are length-prefixed,
  no random access), but the decompress+scan is one pass over the payload
  with ``bytes.find`` — no per-byte Python loop.
"""
from __future__ import annotations

import gzip
import io as _io
from datetime import datetime, timezone
from typing import Dict, Iterable, List, Optional, Sequence, Union

import pyarrow as pa
import ray.data

__all__ = ["parse_warc", "read_warc", "encode_warc"]

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

#: pages-table slice emitted by :func:`read_warc`
WARC_PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
    ]
)


def _parse_warc_date(s: str) -> Optional[datetime]:
    """WARC-Date: ISO-8601 UTC; WARC/1.0 is second-granular, 1.1 allows
    fractional seconds. Returns a tz-naive UTC datetime (matches the
    ``timestamp("us")`` pages column)."""
    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1]
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    try:  # offset form, e.g. +00:00
        dt = datetime.fromisoformat(s)
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        return dt
    except ValueError:
        return None


def _dechunk(body: bytes) -> bytes:
    """HTTP/1.1 Transfer-Encoding: chunked -> raw bytes. Tolerant: on a
    malformed chunk header the already-decoded prefix plus nothing further
    is returned (crawls contain garbage; one bad record must not kill the
    archive task)."""
    out = bytearray()
    i = 0
    while True:
        j = body.find(_CRLF, i)
        if j < 0:
            break
        size_field = body[i:j].split(b";", 1)[0].strip()
        try:
            size = int(size_field, 16)
        except ValueError:
            break
        if size == 0:
            break
        out += body[j + 2:j + 2 + size]
        i = j + 2 + size + 2  # chunk data + its trailing CRLF
    return bytes(out)


def _http_body(block: bytes) -> bytes:
    """For a ``response`` record the block is the raw HTTP exchange; the
    document is the body after the header split, de-chunked and
    content-decoded the way real crawler output requires
    (``Transfer-Encoding: chunked``, ``Content-Encoding: gzip/deflate`` —
    Common Crawl stores the exchange verbatim). Non-HTTP blocks (e.g.
    ``resource`` records) are returned whole; decode failures fall back to
    the raw body rather than failing the archive task."""
    import zlib

    if not block.startswith(b"HTTP/"):
        return block
    cut = block.find(_HDR_END)
    if cut < 0:
        return b""
    body = block[cut + 4:]
    headers: Dict[str, str] = {}
    for ln in block[:cut].decode("latin-1").split("\r\n")[1:]:
        k, sep, v = ln.partition(":")
        if sep:
            headers[k.strip().lower()] = v.strip().lower()
    if "chunked" in headers.get("transfer-encoding", ""):
        body = _dechunk(body)
    enc = headers.get("content-encoding", "")
    try:
        if "gzip" in enc:
            body = gzip.GzipFile(fileobj=_io.BytesIO(body)).read()
        elif "deflate" in enc:
            try:
                body = zlib.decompress(body)
            except zlib.error:  # raw-deflate variant some servers emit
                body = zlib.decompress(body, -zlib.MAX_WBITS)
    except Exception:
        pass  # keep the raw body; downstream extract gates on content
    return body


def _iter_warc_records(fobj, want) -> "object":
    """Stream WARC/1.0-1.1 records from a binary file-like (plain or a
    ``gzip.GzipFile``, which walks concatenated members natively — both
    archive layouts). One record is held in memory at a time; this is what
    keeps a 1 GB ``.warc.gz`` read task's heap at O(record), not
    O(archive)."""
    while True:
        # tolerate inter-record padding / the record-terminating CRLFs
        line = fobj.readline()
        while line in (b"\r\n", b"\n"):
            line = fobj.readline()
        if not line:
            return
        first = line.rstrip(b"\r\n")
        if not first.startswith(b"WARC/"):
            raise ValueError(
                f"not a WARC record: {first[:40].decode('latin-1')!r}")
        fields: Dict[str, str] = {}
        while True:
            line = fobj.readline()
            if not line:
                raise ValueError(
                    "truncated WARC: record header without blank line")
            if line in (b"\r\n", b"\n"):
                break
            k, sep, v = line.decode("utf-8", errors="replace").partition(":")
            if sep:
                # ASCII-only strip: WARC grammar makes only SP/TAB around the
                # value insignificant; unicode-aware str.strip() would also eat
                # e.g. U+00A0 from the tail of a WARC-Target-URI and break the
                # encode->parse roundtrip on such URLs.
                fields[k.strip().lower()] = v.strip(" \t\r\n")
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record lacks Content-Length")
        block = fobj.read(length)
        if len(block) != length:
            raise ValueError("truncated WARC: block shorter than Content-Length")
        if fields.get("warc-type", "").lower() not in want:
            continue
        url = fields.get("warc-target-uri", "")
        if url.startswith("<") and url.endswith(">"):  # WARC/1.1 angle form
            url = url[1:-1]
        yield {
            "url": url,
            "warc_ts": _parse_warc_date(fields.get("warc-date", "")),
            "html": _http_body(block),
        }


def _open_warc(payload: bytes):
    raw = _io.BytesIO(payload)
    return gzip.GzipFile(fileobj=raw) if payload[:2] == b"\x1f\x8b" else raw


def parse_warc(
    payload: bytes,
    record_types: Sequence[str] = ("response",),
) -> List[Dict[str, object]]:
    """Parse one WARC file's bytes into pages rows (gzip in either layout
    detected by magic bytes); see :func:`_iter_warc_records` for the
    record walk and :func:`_http_body` for HTTP decoding."""
    want = {t.lower() for t in record_types}
    return list(_iter_warc_records(_open_warc(payload), want))


def _rows_to_table(rows: List[Dict[str, object]]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
        }
    )


def read_warc(
    paths: Union[str, Iterable[str]],
    record_types: Sequence[str] = ("response",),
) -> ray.data.Dataset:
    """Read ``.warc`` / ``.warc.gz`` archives into the pages schema
    ``(url, warc_ts, html)`` — one Ray read task per file (the crawl's
    natural parallelism unit), streaming blocks downstream with no shuffle.

    ``pages_to_match_clusters`` and every pages-table operator run on the
    result unchanged; add ``text``/``lang`` via the extract stage.

    Memory shape: the compressed archive is one object-store block; the
    parse streams records off a ``GzipFile`` cursor and YIELDS output
    tables every ~64 MB / 1024 rows, so task heap is
    O(compressed + one output chunk), never O(decompressed archive).
    """
    files = ray.data.read_binary_files(paths)
    want = {t.lower() for t in record_types}

    def _parse(batch: pa.Table):
        yielded = False
        for payload in batch.column("bytes"):
            rows: List[Dict[str, object]] = []
            pending = 0
            for rec in _iter_warc_records(_open_warc(payload.as_py()), want):
                rows.append(rec)
                pending += len(rec["html"]) + len(rec["url"]) + 16
                if len(rows) >= 1024 or pending >= (64 << 20):
                    yield _rows_to_table(rows)
                    yielded = True
                    rows, pending = [], 0
            if rows:
                yield _rows_to_table(rows)
                yielded = True
        if not yielded:
            yield WARC_PAGES_SCHEMA.empty_table()

    return files.map_batches(_parse, batch_format="pyarrow")


def encode_warc(
    rows: Iterable[Dict[str, object]],
    gzip_mode: Optional[str] = "file",
    with_http: bool = True,
) -> bytes:
    """Serialize pages rows ``{url, warc_ts, html}`` as a WARC/1.0 byte
    stream — the fixture/export side of :func:`read_warc` (tests pin the
    roundtrip). ``gzip_mode``: ``"file"`` (one member), ``"record"``
    (member per record, the spec-recommended layout), or ``None`` (plain).
    ``with_http`` wraps each document in a minimal HTTP/1.1 200 exchange,
    as real crawler output does.
    """
    if gzip_mode not in (None, "file", "record"):
        raise ValueError(f"gzip_mode must be None|'file'|'record', got {gzip_mode!r}")
    records: List[bytes] = []
    for i, r in enumerate(rows):
        html = r["html"]
        if isinstance(html, str):
            html = html.encode("utf-8")
        ts = r.get("warc_ts")
        if isinstance(ts, datetime):
            fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if ts.microsecond else "%Y-%m-%dT%H:%M:%SZ"
            date = ts.strftime(fmt)
        else:
            date = str(ts)
        if with_http:
            block = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Length: {len(html)}\r\n\r\n".encode()
                + html
            )
            ctype = "application/http; msgtype=response"
        else:
            block, ctype = html, "text/html"
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-{i:012d}>\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(block)}\r\n\r\n"
        ).encode("utf-8")
        records.append(head + block + _HDR_END)
    if gzip_mode == "record":
        return b"".join(gzip.compress(rec, mtime=0) for rec in records)
    raw = b"".join(records)
    return gzip.compress(raw, mtime=0) if gzip_mode == "file" else raw
