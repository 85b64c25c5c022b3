"""Soundex phonetic keys for typo-tolerant blocking (graft §2.13 addition).

Classic record-linkage blocking (Fellegi-Sunter era) groups candidate records
by a phonetic code so spelling variants ("SMITH"/"SMYTH" -> S530) land in the
same block. The reference blocks only on exact normalized equality
(`/root/reference/address.py:305-330`); this kernel adds the phonetic key as
another blocking column for the same candidate-pair machinery.

Variant implemented (documented precisely — parity between the engine and the
DuckDB oracle is what the gate checks):

1. keep only ASCII letters (``[A-Za-z]``), THEN uppercase — the filter runs
   first so full-Unicode case mapping can never smuggle letters in (Python's
   ``'ŉ'.upper()`` is ``'ʼN'``; DuckDB's is not — filtering first makes the
   kernel locale-free, pinned by the hypothesis parity property);
2. map each letter to its Soundex class
   (``BFPV->1 CGJKQSXZ->2 DT->3 L->4 MN->5 R->6 AEIOUYHW->0``);
3. collapse runs of the SAME class (including the first letter's class, so a
   second letter sharing the first's class is dropped);
4. key = first letter + (remaining classes with ``0`` removed), truncated /
   right-padded with ``0`` to 3 digits. Empty input -> ``""``.

This is the common "simple" variant: ``H``/``W`` are class-0 separators like
vowels (full archival Soundex instead ignores them for run-splitting). Every
step is a plain substitution with NO regex backreference, so pandas' C string
kernels and DuckDB's RE2 ``regexp_replace`` reproduce it byte-for-byte —
:func:`sql_soundex` generates the oracle expression from this same module
(same pattern as ``functions/urls.py``).
"""

from __future__ import annotations

import re

import pandas as pd

__all__ = ["soundex", "soundex_series", "sql_soundex"]

_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_CODES = "01230120022455012623010202"
_TRANS = str.maketrans(_ALPHA, _CODES)
_NON_ALPHA = re.compile(r"[^A-Za-z]")


def soundex(word: str) -> str:
    """Scalar reference form (the batch/SQL forms are parity-tested vs it)."""
    u = _NON_ALPHA.sub("", word or "").upper()
    if not u:
        return ""
    code = u.translate(_TRANS)
    collapsed = re.sub(r"(.)\1+", r"\1", code)
    tail = collapsed[1:].replace("0", "")
    return u[0] + (tail + "000")[:3]


def soundex_series(s: "pd.Series") -> "pd.Series":
    """Vectorized Soundex over a string Series (pandas C kernels only)."""
    u = s.fillna("").str.replace("[^A-Za-z]", "", regex=True).str.upper()
    code = u.str.translate(_TRANS)
    for d in "0123456":
        code = code.str.replace(f"{d}+", d, regex=True)
    tail = code.str.slice(1).str.replace("0", "", regex=False)
    key = u.str.slice(0, 1) + (tail + "000").str.slice(0, 3)
    return key.where(u != "", "")


def sql_soundex(expr: str) -> str:
    """DuckDB expression computing the IDENTICAL key over ``expr``.

    Run collapse is one RE2 ``regexp_replace(s, 'd+', 'd', 'g')`` per class
    digit (no backreferences), generated from the same class table as the
    Python forms.
    """
    up = f"upper(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    code = f"translate({up}, '{_ALPHA}', '{_CODES}')"
    for d in "0123456":
        code = f"regexp_replace({code}, '{d}+', '{d}', 'g')"
    tail = f"replace(substr({code}, 2), '0', '')"
    return (f"(CASE WHEN {up} = '' THEN '' "
            f"ELSE substr({up}, 1, 1) || substr({tail} || '000', 1, 3) END)")
