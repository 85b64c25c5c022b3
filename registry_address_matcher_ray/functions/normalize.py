"""Armenian address normalization — byte-identical to the reference semantics.

Replicates ``AddressNormalizer`` of ``/root/reference/address.py:134-236`` exactly
(the canonical variant per SURVEY.md §2.12.1):

1.  NaN/None -> "" (``address.py:214-215``)
2.  ``str(x).strip().upper()``
3.  direct alias replacement on the full string (``address.py:136-139``)
4.  strip Armenian street-type suffixes, IGNORECASE regexes (``address.py:141-143``)
5.  drop ``[^\\w\\s]``, collapse whitespace (``address.py:228-229``)
6.  strip one trailing ``Ի`` (Armenian genitive) from each word (``address.py:232``)
7.  re-canonicalize via ``_norm`` and map Soviet-era -> modern street names
    (``address.py:146-206``); the rename map is built with ``_norm`` applied to both
    sides and REPLICATES the duplicate-key last-wins defect: ``Մարքսի`` appears twice
    (``address.py:158`` and ``:174``) and must resolve to ``Ջիվանու`` (SURVEY §2.12.5).

The per-string function is pure Python/``re`` (exact reference behavior incl. Unicode
``\\w`` and ``str.upper`` on Armenian script). The batch entry points vectorize by
dictionary-encoding the Arrow array and normalizing each distinct value once — address
columns are highly repetitive, so the hot path is an O(#distinct) Python loop plus
zero-copy Arrow take, not an O(#rows) loop.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["norm_basic", "normalize", "normalize_array", "OLD_TO_NEW_MAP", "ALIASES"]

# Direct full-string aliases, applied after upper-casing (/root/reference/address.py:136-139).
ALIASES = {
    "Խ. ՀԱՅՐԻԿ": "ԽՐԻՄՅԱՆ ՀԱՅՐԻԿԻ",
    "ԽՐԻՄՅԱՆ ՀԱՅՐԻԿ": "ԽՐԻՄՅԱՆ ՀԱՅՐԻԿԻ",
}

# Armenian street-type suffix patterns (/root/reference/address.py:141-143), applied
# with re.IGNORECASE to the upper-cased string.
ARMENIAN_SUFFIXES = [
    r"\bԽՃՂ\.?",
    r"\bՃՂ\.?",
    r"\bՓ\.?",
    r"\bՊՈՂ\.?",
    r"\bԱՎ\.?",
    r"\bՃԱՄԲ\.?",
    r"\bԹԵԼԱ\.?",
]
_SUFFIX_RES = [re.compile(p, re.IGNORECASE) for p in ARMENIAN_SUFFIXES]
_NON_WORD_RE = re.compile(r"[^\w\s]")
_WS_RE = re.compile(r"\s+")


def norm_basic(text: object) -> str:
    """The reference's ``_norm`` (/root/reference/address.py:208-211)."""
    s = str(text).strip().upper()
    s = _NON_WORD_RE.sub("", s)
    return _WS_RE.sub(" ", s)


# Soviet-era -> modern street renames (/root/reference/address.py:146-206). Kept as an
# ordered (old, new) pair list with ``_norm`` applied at import, so the duplicate
# "Մարքսի" key resolves last-wins exactly like the reference dict literal.
_OLD_NEW_PAIRS = [
    ("Ֆրունզեի", "Լ. Մադոյան"),
    ("Լենինգրադյան", "Վ. Սարգսյան"),
    ("Կիրովականյան", "Վանաձորի"),
    ("Կալինինի", "Գ. Նժդեհի"),
    ("Կինգիսեպի", "Վ. Չերազի"),
    ("Պլեխանովի", "Սահմանապահների"),
    ("Շինարարների", "Մ. Թետչերի"),
    ("Կիրովի", "Ն. Ռիժկովի"),
    ("Լենինի", "Տիգրան Մեծի"),
    ("Խ. Հայրիկ", "Խրիմյան Հայրիկի"),
    ("Անի թաղամաս Մ. Ավետիսյան", "Մ. Ավետիսյան"),
    ("Մարքսի", "Պ. Ջափարիձեի"),
    ("Անի թաղամաս Ա. Շահինյան", "Ա. Շահինյան"),
    ("Օղակային", "Արևելյան շրջանցող"),
    ("Ռեպինի", "Բ. Շչերբինայի"),
    ("Հեղափոխության", "Գ. Նժդեհի"),
    ("Անի թաղամաս Ե. Չարենցի", "Ե. Չարենցի"),
    ("Ղուկասյան փողոց 10-րդ", "Յ. Վարդանյան"),
    ("Ղուկասյան փողոց 15-րդ", "Յ. Վարդանյան"),
    ("Ղուկասյան փողոց 11-րդ", "Յ. Վարդանյան"),
    ("Ղուկասյան փողոց 12-րդ", "Յ. Վարդանյան"),
    ("Ղուկասյան փողոց 13-րդ", "Յ. Վարդանյան"),
    ("Ղուկասյան փողոց 14-րդ", "Յ. Վարդանյան"),
    ("Սևյան", "Հ. Ղանդիլյան"),
    ("Մուշ-2  թաղամասի փողոցներից մեկը", "Կ. Հալաբյան"),
    ("Ղուկասյան", "Յ. Վարդանյան"),
    ("Խաղաղության", "Բագրատունյաց"),
    ("Մարքսի", "Ջիվանու"),  # duplicate key: last-wins, replicated on purpose
    ("Ազիզբեկովի", "Ն. Շնորհալու"),
    ("Էլեկտրո պրիբորնի 6-րդ շարք", "Ա. Արմենյան փողոց"),
    ("Էլեկտրո պրիբորնի 10-րդ շարք", "Ա. Գևորգյան փողոց"),
    ("Կիրովաբադյան փողոց", "Ա. Թամանյան փողոց"),
    ("50 ամյակի անվան փողոց", "Ա. Մանուկյան փողոց"),
    ("<<Անի>> թաղամաս 3-րդ փողոց", "Ա. Շահինյան փողոց"),
    ("Հնոցավան 2-րդ շարք", "Ա. Պետրոսյան փողոց"),
    ("Կոմսոմոլի փողոց", "Ա. Վասիլյան փողոց"),
    ("Կեցխովելի փողոց", "Արտակ եպիսկոպոս Սմբատյան փողոց"),
    ("Արվելաձե փողոց", "Գարեգին Ա-ի փողոց"),
    ("Էլեկտրո պրիբորնի 8-րդ շարք", "Թ. Մանդալյան փողոց"),
    ("Պողպատավան 3-րդ շարք", "Ժ. Բ. Բարոնյան փողոց"),
    ("Կրուպսկայա փողոց", "Խ. Դաշտենցի փողոց"),
    ("Քութաիսյան փողոց", "Կ. Դեմիրճյան փողոց"),
    ("Պողպատավան 2-րդ շարք", "Կ. Խաչատրյան փողոց"),
    ("Կույբիշևի փողոց", "Հ. Մազմանյան փողոց"),
    ("Պիոներական փողոց", "Հ. Մելքոնյան փողոց"),
    ("Պողպատավան 1-ին շարք", "Հ. Պողոսյան փողոց"),
    ("Պողպատավան 4-րդ շարք", "Հ. Ռասկատլյան փողոց"),
    ("Կատելնայա", "Հնոցավանի 1-ին շարք"),
    ("Պետ բարակներ", "Ղ. Ղուկասյան փողոց"),
    ("Մայիսյան փողոց", "Մ. Մկրտչյան փողոց"),
    ("Էլեկտրո պրիբորնի 7-րդ շարք", "Մ. Սարգսյան փողոց"),
    ("Սվերդլովի փողոց", "Ն. Ղորղանյան փողոց"),
    ("Աստղի հրապարակ", "Շ. Ազնավուրի հրապարակ"),
    ("Ս. Մուսայելյան փողոց", "Շ. Ազնավուրի հրապարակ"),
    ("Էլեկտրո պրիբորնի 11-րդ շարք", "Ռ. Դանիելյան փողոց"),
    ("Օրջոնիկիձեի փողոց", "Ս. Մատնիշյան փողոց"),
    ("Էնգելսի փողոց", "Վ. Աճեմյան փողոց"),
    ("Կենտրոնական հրապարակ", "Վարդանանց հրապարակ"),
    ("<<Անի>> թաղամաս 15-րդ փողոց", "Ֆորալբերգի փողոց"),
]

OLD_TO_NEW_MAP = {norm_basic(old): norm_basic(new) for old, new in _OLD_NEW_PAIRS}


@lru_cache(maxsize=262144)
def _normalize_str(text: str) -> str:
    """Normalize one (non-null) string; cached — address vocab is tiny vs. row count."""
    s = text.strip().upper()
    if s in ALIASES:
        s = ALIASES[s]
    for rx in _SUFFIX_RES:
        s = rx.sub("", s)
    s = _NON_WORD_RE.sub("", s)
    s = _WS_RE.sub(" ", s)
    s = " ".join(w[:-1] if w.endswith("Ի") else w for w in s.split())
    s = norm_basic(s)
    return OLD_TO_NEW_MAP.get(s, s)


def normalize(text: object) -> str:
    """Scalar entry point matching ``AddressNormalizer.normalize`` incl. NaN -> ""."""
    if text is None:
        return ""
    if isinstance(text, float) and text != text:  # NaN without importing pandas
        return ""
    return _normalize_str(str(text))


def normalize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized normalize over an Arrow string array.

    Dictionary-encodes the column, normalizes each distinct value once through the
    exact scalar function, and decodes back — output[i] == normalize(input[i]) for
    every row, at O(#distinct) Python cost.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return pa.array([], type=pa.string())
    dict_arr = pc.dictionary_encode(arr)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    uniques = dict_arr.dictionary.to_pylist()
    mapped = pa.array([_normalize_str(u) if u is not None else "" for u in uniques],
                      type=pa.string())
    out = mapped.take(dict_arr.indices)
    # Null inputs -> "" (reference: pd.isna -> "")
    if arr.null_count:
        out = pc.fill_null(out, "")
    return out
