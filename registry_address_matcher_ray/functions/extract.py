"""Deterministic HTML -> text extraction (graft operator M14, SURVEY.md §2.2).

Not present in the reference (it ingests flat registry tables); required by the target
spec: the engine's input is a Parquet table of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)`` and extraction must be a pure deterministic
function of the ``html`` bytes so the per-url output is byte-stable across runs,
parallelism levels and partitionings (BASELINE.json ``input_hint`` per-row invariant).

The extractor is stdlib-only (``re`` + ``html.unescape``): strip scripts/styles/
comments, turn block-level tag boundaries into newlines, drop remaining tags,
unescape entities, collapse horizontal whitespace per line, drop blank lines.
Runs vectorized-per-batch inside a stateless ``map_batches`` stage
(``stages/blocking.py:extract_pages``); regexes are compiled once at module import.
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa

__all__ = ["extract_text", "extract_text_column"]

_HEAD_RE = re.compile(r"<head\b.*?</head\s*>", re.IGNORECASE | re.DOTALL)
_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
# Tags whose open/close boundaries imply a line break in rendered text.
_BLOCK_RE = re.compile(
    r"</?(?:p|div|h[1-6]|li|ul|ol|tr|table|thead|tbody|br|hr|title|head|header|"
    r"footer|section|article|blockquote|pre)\b[^>]*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_HSPACE_RE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html_bytes: bytes | None) -> str:
    """Extract visible text from HTML bytes. Pure and deterministic per input."""
    if html_bytes is None:
        return ""
    if isinstance(html_bytes, memoryview):
        html_bytes = html_bytes.tobytes()
    s = html_bytes.decode("utf-8", errors="replace")
    s = _HEAD_RE.sub(" ", s)
    s = _SCRIPT_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    lines = []
    for line in s.split("\n"):
        line = _HSPACE_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def extract_text_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Apply :func:`extract_text` to an Arrow binary column -> string column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array([extract_text(v) for v in arr.to_pylist()], type=pa.string())
