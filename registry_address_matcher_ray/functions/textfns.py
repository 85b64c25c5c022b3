"""Text-analysis kernels for the large-scale training-data operators.

Not in the reference (its payload is short address strings); these are the
document-level operators a 100 TB web-text pipeline needs (language-ID, quality
scoring, token counting, fingerprinting). All pure and vectorizable: each has a
batch entry point over Arrow arrays used by stateless ``map_batches`` stages, with
regexes/tables compiled once at module import. Deterministic across processes
(md5/crc, no salted hashes).
"""

from __future__ import annotations

import hashlib
import math
import re
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"\S+")
# BPE-ish subword pieces: letter-runs, digit-runs, single punctuation marks
_BPE_RE = re.compile(r"[A-Za-zԱ-և]+|[0-9]+|[^\sA-Za-zԱ-և0-9]")
_WS_RE = re.compile(r"\s+")
_ALPHA_RE = re.compile(r"[A-Za-zԱ-և]")
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

_EN_STOP = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by from".split()
)
_HY_RANGE = (0x0531, 0x058F)


def token_count(text: str) -> int:
    """Whitespace tokens."""
    return len(_TOKEN_RE.findall(text or ""))


def bpe_token_count(text: str) -> int:
    """BPE-ish subword count: letter runs, digit runs, single punctuation marks."""
    return len(_BPE_RE.findall(text or ""))


def quality_features(text: str) -> Dict[str, float]:
    """Length/punctuation/stopword heuristics (one pass per doc)."""
    text = text or ""
    n = len(text)
    toks = _TOKEN_RE.findall(text)
    n_tok = len(toks)
    alpha = len(_ALPHA_RE.findall(text))
    punct = len(_PUNCT_RE.findall(text))
    stop = sum(1 for t in toks if t.lower() in _EN_STOP)
    return {
        "n_chars": float(n),
        "n_tokens": float(n_tok),
        "avg_token_len": (sum(len(t) for t in toks) / n_tok) if n_tok else 0.0,
        "alpha_ratio": alpha / n if n else 0.0,
        "punct_ratio": punct / n if n else 0.0,
        "stopword_ratio": stop / n_tok if n_tok else 0.0,
    }


_GOPHER_REQUIRED = frozenset("the be to of and that have with".split())

# PII patterns restricted to RE2-compatible syntax (no lookaround, ASCII
# classes) so the DuckDB oracle can run the *same* expressions verbatim
_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_IPV4_RE = re.compile(r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b")
_PHONE_RE = re.compile(r"\+?[0-9][0-9()\- ]{6,}[0-9]")
PII_PATTERNS = (
    ("<EMAIL>", _EMAIL_RE),
    ("<IP>", _IPV4_RE),
    ("<PHONE>", _PHONE_RE),
)


def pii_redact(text: str) -> Tuple[str, int, int, int]:
    """Mask emails, IPv4 addresses and phone-like digit runs (applied in that
    order — emails first so their digits can't be re-matched as phones).
    Returns ``(redacted, n_emails, n_ips, n_phones)``."""
    text = text or ""
    counts = []
    for token, pat in PII_PATTERNS:
        text, n = pat.subn(token, text)
        counts.append(n)
    return (text, *counts)


def gopher_signals(text: str) -> Dict[str, float]:
    """Gopher-style per-document quality signals (Rae et al. 2021, appendix A
    repetition/quality rules — simplified): word count, mean word length,
    symbol-to-word ratio ('#' and '…'), fraction of words with a letter, and
    how many of the 8 required stopwords appear. Thresholds applied downstream
    (stages/analytics.py::gopher_quality) so callers can audit reasons.

    Every signal is a ratio of integers, so the DuckDB oracle reproduces the
    exact IEEE doubles with plain SQL division."""
    toks = _TOKEN_RE.findall(text or "")
    n = len(toks)
    if n == 0:
        return {"n_words": 0.0, "mean_word_len": 0.0, "symbol_ratio": 0.0,
                "alpha_word_ratio": 0.0, "stop_hits": 0.0}
    total_len = sum(len(t) for t in toks)
    symbols = text.count("#") + text.count("…")
    alpha_words = sum(1 for t in toks if _ALPHA_RE.search(t))
    lower = {t.lower() for t in toks}
    return {
        "n_words": float(n),
        "mean_word_len": total_len / n,
        "symbol_ratio": symbols / n,
        "alpha_word_ratio": alpha_words / n,
        "stop_hits": float(len(_GOPHER_REQUIRED & lower)),
    }


def repetition_signals(text: str) -> Dict[str, object]:
    """Gopher repetition rules (simplified): fraction of lines that are
    duplicates of another line in the same doc, plus the most frequent word
    bigram (ties: lexicographically smallest) and the fraction of bigram
    occurrences it takes. Integer-ratio doubles, SQL-reproducible."""
    text = text or ""
    lines = text.split("\n")
    n_lines = len(lines)
    dup = (n_lines - len(set(lines))) / n_lines if n_lines else 0.0
    toks = _TOKEN_RE.findall(text)
    if len(toks) < 2:
        return {"dup_line_fraction": dup, "top_bigram": "",
                "top_bigram_fraction": 0.0}
    counts: Dict[str, int] = {}
    prev = toks[0]
    for tok in toks[1:]:
        big = prev + " " + tok
        counts[big] = counts.get(big, 0) + 1
        prev = tok
    best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return {"dup_line_fraction": dup, "top_bigram": best[0],
            "top_bigram_fraction": best[1] / (len(toks) - 1)}


def top_ngram_fractions(
    text: str, ns: Tuple[int, ...] = (2, 3, 4)
) -> Dict[str, object]:
    """Gopher repetition rules, the top-n-gram half (Rae et al. 2021 Table
    A1: "fraction of characters contained within the most frequently-
    occurring n-gram"; the duplicate-n-gram half is
    ``stages/dedup.substring_dup_stats``): for each ``n`` the most frequent
    word n-gram (ties -> lexicographically smallest; UTF-8 byte order ==
    code-point order, so Python and DuckDB tie-break identically) and
    ``count * len(ngram) / len(' '.join(tokens))``. Tokens are the non-empty
    single-space splits of the text with newlines replaced by spaces — the
    exact contract the SQL twin reproduces with ``string_split``."""
    toks = [w for w in (text or "").replace("\n", " ").split(" ") if w]
    joined = " ".join(toks)
    total = len(joined)
    out: Dict[str, object] = {}
    for n in ns:
        if len(toks) < n or total == 0:
            out[f"top{n}gram"] = ""
            out[f"top{n}frac"] = 0.0
            continue
        counts: Dict[str, int] = {}
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i:i + n])
            counts[g] = counts.get(g, 0) + 1
        gram, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out[f"top{n}gram"] = gram
        # round-half-away like DuckDB's ROUND (builtin round() is half-even)
        out[f"top{n}frac"] = (
            math.floor(cnt * len(gram) / total * 1_000_000 + 0.5) / 1_000_000)
    return out


def detect_lang(text: str) -> str:
    """Tiny deterministic language-ID heuristic: script ranges + EN stopwords.

    Returns 'hy' (Armenian script dominant), 'en' (latin + stopword evidence),
    'la' (latin, no stopword evidence) or 'und'."""
    text = text or ""
    hy = lat = 0
    for ch in text:
        o = ord(ch)
        if _HY_RANGE[0] <= o <= _HY_RANGE[1]:
            hy += 1
        elif ("a" <= ch <= "z") or ("A" <= ch <= "Z"):
            lat += 1
    letters = hy + lat
    if letters == 0:
        return "und"
    if hy / letters >= 0.5:
        return "hy"
    toks = [t.lower() for t in _TOKEN_RE.findall(text)]
    stop = sum(1 for t in toks if t in _EN_STOP)
    return "en" if toks and stop / len(toks) >= 0.05 else "la"


def fingerprint(text: str) -> str:
    """Document fingerprint: md5 hex of the casefolded, whitespace-collapsed text.

    Definition chosen to be SQL-expressible (md5(lower(regexp_replace(...)))) so the
    DuckDB oracle can cross-check it exactly."""
    canon = _WS_RE.sub(" ", (text or "").lower()).strip()
    return hashlib.md5(canon.encode("utf-8")).hexdigest()


def ngram_set(text: str, n: int = 3) -> frozenset:
    """Character n-gram set (casefolded, whitespace collapsed)."""
    canon = _WS_RE.sub(" ", (text or "").lower()).strip()
    if len(canon) < n:
        return frozenset([canon] if canon else [])
    return frozenset(canon[i : i + n] for i in range(len(canon) - n + 1))


def jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


_TOK_HASH_CACHE: dict = {}


def _tok_hash64(tok: str) -> int:
    """md5-derived stable 64-bit token hash, memoized per worker process
    (natural-language token vocabularies are small relative to token
    counts; the cap bounds worst-case memory on adversarial corpora)."""
    h = _TOK_HASH_CACHE.get(tok)
    if h is None:
        h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
        if len(_TOK_HASH_CACHE) < 1_000_000:
            _TOK_HASH_CACHE[tok] = h
    return h


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (md5-derived stable token
    hashes). Bit-identical to the per-bit reference loop (pytest-pinned);
    the bit tally is one vectorized numpy pass instead of 64 Python ops per
    token."""
    toks = _TOKEN_RE.findall((text or "").lower())
    if not toks:
        return 0
    hs = np.fromiter((_tok_hash64(t) for t in toks),
                     dtype=np.uint64, count=len(toks))
    # chunk the token axis: the bit matrix is 512 B/token transient, so a
    # pathological 10M-token doc would otherwise spike ~5 GB in the worker
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for j in range(0, len(hs), 65536):
        bits = ((hs[j:j + 65536, None] >> shifts) & np.uint64(1)).astype(
            np.int64)
        acc += (2 * bits - 1).sum(axis=0, dtype=np.int64)
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# -------- batch entry points (Arrow in / Arrow columns out) --------


def text_stats_columns(arr: pa.Array | pa.ChunkedArray) -> Dict[str, pa.Array]:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    texts = arr.to_pylist()
    feats = [quality_features(t) for t in texts]
    keys = ("n_chars", "n_tokens", "avg_token_len", "alpha_ratio", "punct_ratio",
            "stopword_ratio")
    out = {k: pa.array([f[k] for f in feats], pa.float64()) for k in keys}
    out["bpe_tokens"] = pa.array([bpe_token_count(t) for t in texts], pa.int64())
    out["lang_detected"] = pa.array([detect_lang(t) for t in texts], pa.string())
    out["fingerprint"] = pa.array([fingerprint(t) for t in texts], pa.string())
    return out


def dedup_lines_within(text: str) -> Tuple[str, int]:
    """WITHIN-document duplicate-line removal (the in-doc half of C4 §2.2's
    line rules; the cross-corpus half is ``stages/dedup.line_dedup``): each
    non-blank line is kept at its first occurrence inside the document,
    blank lines are structural and always kept. Returns
    ``(cleaned_text, n_removed)``. Embarrassingly parallel — no corpus
    state, exact SQL twin via a per-doc window (min line_no per line)."""
    lines = (text or "").split("\n")
    seen: set = set()
    out: List[str] = []
    removed = 0
    for ln in lines:
        if ln == "" or ln not in seen:
            out.append(ln)
            if ln:
                seen.add(ln)
        else:
            removed += 1
    return "\n".join(out), removed


#: C4 terminal punctuation (Raffel et al. 2020 §2.2: period, exclamation
#: mark, question mark, end-quotation mark)
C4_TERMINALS = frozenset('.!?"')


def c4_clean_doc(
    text: str,
    min_words: int = 5,
    min_sentences: int = 3,
    badwords: Tuple[str, ...] = (),
) -> Tuple[str, int, int, int, bool]:
    """C4 §2.2 cleaning heuristics (Raffel et al. 2020), deterministic with
    an exact SQL twin: a line is KEPT iff, after stripping trailing spaces,
    it ends in ``.``, ``!``, ``?`` or ``"``, has at least ``min_words``
    space-separated words, and does not contain ``javascript``
    (case-insensitive). The PAGE passes iff the kept text contains at least
    ``min_sentences`` terminal marks (``[.!?]``) and the ORIGINAL text
    contains neither ``lorem ipsum`` (case-insensitive) nor ``{`` nor any
    of ``badwords`` (case-insensitive substrings). Returns
    ``(kept_text, lines_kept, lines_dropped, sentences, passes)``.
    Space-only strips/splits (not all whitespace) keep the Python and
    DuckDB (``rtrim`` / ``string_split(x, ' ')``) semantics identical."""
    text = text or ""
    kept: List[str] = []
    dropped = 0
    for ln in text.split("\n"):
        r = ln.rstrip(" ")
        n_words = sum(1 for w in ln.split(" ") if w)
        if (r and r[-1] in C4_TERMINALS and n_words >= min_words
                and "javascript" not in ln.lower()):
            kept.append(ln)
        else:
            dropped += 1
    kept_text = "\n".join(kept)
    sentences = sum(1 for ch in kept_text if ch in ".!?")
    low = text.lower()
    passes = (sentences >= min_sentences
              and "lorem ipsum" not in low
              and "{" not in text
              and not any(b.lower() in low for b in badwords))
    return kept_text, len(kept), dropped, sentences, passes


def compression_ratio(text: str, level: int = 6) -> float:
    """zlib-compressed-size / raw-size quality signal (the compressibility
    heuristic of Gopher/RedPajama-class pipelines: highly repetitive
    machine-generated text compresses far below natural prose). zlib is
    deterministic for a fixed level, so the signal is reproducible across
    workers; no SQL twin exists (rows-only check), semantics pinned in
    pytest."""
    import zlib

    raw = (text or "").encode("utf-8")
    if not raw:
        return 0.0
    return len(zlib.compress(raw, level)) / len(raw)


# --------------------------------------------------------------- mojibake

#: Mojibake signature: a UTF-8 LEAD byte rendered as Latin-1/cp1252
#: (U+00C2-U+00F4) immediately followed by a CONTINUATION byte rendered the
#: same way (U+0080-U+00BF, or the cp1252 punctuation the 0x80-0x9F bytes
#: map to), plus any bare C1 control. Real accented text never produces the
#: lead+continuation pair, so clean French/Armenian/CJK is score-zero. The
#: class is built from codepoints so the compiled pattern carries literal
#: characters (pyarrow's RE2 kernels have no \uXXXX escapes).
_MOJI_CONT = ("".join(chr(c) for c in range(0x80, 0xC0))
              + "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6"
              + "\u2030\u0160\u2039\u0152\u017d\u2018\u2019\u201c"
              + "\u201d\u2022\u2013\u2014\u02dc\u2122\u0161\u203a"
              + "\u0153\u017e\u0178")
_MOJI_BAD_RE = re.compile(
    "[\u00c2-\u00f4][" + _MOJI_CONT + "]|["
    + "".join(chr(c) for c in range(0x80, 0xA0)) + "]")


def _mojibake_badness(s: str) -> int:
    return len(_MOJI_BAD_RE.findall(s))


def fix_mojibake(text: str, max_passes: int = 3) -> str:
    """Repair UTF-8-decoded-as-Latin-1/cp1252 mojibake (ftfy-style, score
    guarded): ``'cafÃ©' -> 'café'``.

    Each pass re-encodes via latin-1 (then cp1252 for the euro/quote
    forms) and re-decodes as UTF-8; a repair is ACCEPTED only when it
    strictly reduces the mojibake-signature character count, so clean text
    — including real accented Latin and non-Latin scripts — is a fixpoint
    (property-tested). Up to ``max_passes`` handles doubly-encoded text.
    """
    s = text or ""
    for _ in range(max_passes):
        bad = _mojibake_badness(s)
        if bad == 0:
            break
        repaired = None
        for enc in ("latin-1", "cp1252"):
            try:
                repaired = s.encode(enc).decode("utf-8")
                break
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
        if repaired is None or _mojibake_badness(repaired) >= bad:
            break
        s = repaired
    return s


def fix_mojibake_column(batch: pa.Table, text_col: str,
                        out_col: str = "text_fixed") -> pa.Table:
    """Batch kernel: append ``out_col`` (repaired text) and ``changed``.
    Stateless map_batches stage; O(1) fast path for clean batches (one
    vectorized signature scan decides whether any row needs the Python
    repair loop at all)."""
    import pyarrow.compute as pc

    col = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
    hits = pc.match_substring_regex(col, _MOJI_BAD_RE.pattern)
    if not pc.any(hits).as_py():
        return (batch.append_column(out_col, col)
                .append_column("changed",
                               pa.array([False] * batch.num_rows)))
    texts = col.to_pylist()
    fixed = [fix_mojibake(t) if h else t
             for t, h in zip(texts, hits.to_pylist())]
    return (batch.append_column(out_col, pa.array(fixed, pa.string()))
            .append_column("changed",
                           pa.array([f != t for f, t in zip(fixed, texts)])))
