"""Test-only pandas oracle: a faithful transcription of the reference's matching flow.

This module re-states, in plain single-threaded pandas, exactly WHAT the reference
computes (``/root/reference/address.py:240-726``) so the Ray Data engine's output can
be compared against it order-insensitively (SURVEY.md §5.2). It is deliberately naive
(row loops, dict indexes) — it exists only as a correctness oracle for tests and is
never imported by the engine.

Semantics transcribed (with reference citations):
- preprocessing/derived columns    address.py:240-284
- phase 1 EXACT_FULL (last-wins build dict, 1:1)   address.py:356-376
- phase 2 EXACT_KEY (building equality, pair-dedup vs earlier matches, 1:N)
                                   address.py:400-426
- fuzzy street matching (exact house+building block, 4-scorer max with strict ``>``
  strategy ordering, extractOne first-index tie-break, threshold gate)
                                   address.py:456-705
- exclusion gating of fuzzy by exact-matched SPR ids   address.py:1185-1203

String scoring uses the engine's own scorers module (rapidfuzz is unavailable; those
scorers are themselves golden-tested against published rapidfuzz semantics), so oracle
and engine share one scorer definition — the comparison checks the *pipeline* logic.
"""

from __future__ import annotations

import pandas as pd

from registry_address_matcher_ray.functions.normalize import normalize
from registry_address_matcher_ray.functions.scorers import best_match_multi_strategy

MATCH_COLUMNS = [
    "ADDRESS_ID_SPR", "STREET_NAME_SPR", "HOUSE_SPR", "BUILDING_SPR", "FULL_ADDRESS_SPR",
    "ADDRESS_ID_CAD", "STREET_NAME_CAD", "HOUSE_CAD", "BUILDING_CAD", "FULL_ADDRESS_CAD",
    "MATCH_SCORE", "MATCH_TYPE", "CANDIDATES_COUNT", "COMPLETENESS_SPR", "COMPLETENESS_CAD",
]


def preprocess(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for col in ("STREET_NAME", "HOUSE", "BUILDING"):
        out[col] = out[col].fillna("")
    out["STREET_NORM"] = out["STREET_NAME"].apply(normalize)
    out["HOUSE_NORM"] = out["HOUSE"].apply(normalize)
    out["BUILDING_NORM"] = out["BUILDING"].apply(normalize)
    out["FULL_ADDRESS"] = (
        out["STREET_NORM"] + " " + out["HOUSE_NORM"] + " " + out["BUILDING_NORM"]
    ).str.strip()
    out["SEARCH_KEY"] = out["STREET_NORM"] + "_" + out["HOUSE_NORM"]
    # computed AFTER fillna exactly like the reference -> constant 1.0 (SURVEY §2.12.4)
    out["COMPLETENESS_SCORE"] = (
        out["STREET_NAME"].notna().astype(int)
        + out["HOUSE"].notna().astype(int)
        + out["BUILDING"].notna().astype(int)
    ) / 3
    return out


def _record(spr_row, cad_row, score, match_type, candidates_count=1) -> dict:
    return {
        "ADDRESS_ID_SPR": spr_row.get("ADDRESS_ID", ""),
        "STREET_NAME_SPR": spr_row.get("STREET_NAME", ""),
        "HOUSE_SPR": spr_row.get("HOUSE", ""),
        "BUILDING_SPR": spr_row.get("BUILDING", ""),
        "FULL_ADDRESS_SPR": spr_row.get("FULL_ADDRESS", ""),
        "ADDRESS_ID_CAD": cad_row.get("ADDRESS_ID", ""),
        "STREET_NAME_CAD": cad_row.get("STREET_NAME", ""),
        "HOUSE_CAD": cad_row.get("HOUSE", ""),
        "BUILDING_CAD": cad_row.get("BUILDING", ""),
        "FULL_ADDRESS_CAD": cad_row.get("FULL_ADDRESS", ""),
        "MATCH_SCORE": float(score),
        "MATCH_TYPE": match_type,
        "CANDIDATES_COUNT": int(candidates_count),
        "COMPLETENESS_SPR": spr_row.get("COMPLETENESS_SCORE", 0),
        "COMPLETENESS_CAD": cad_row.get("COMPLETENESS_SCORE", 0),
    }


def find_exact_matches(spr: pd.DataFrame, cad: pd.DataFrame) -> pd.DataFrame:
    matches = []
    # phase 1: FULL_ADDRESS equality; build dict keeps the LAST cad row per address
    full_lookup = {row["FULL_ADDRESS"]: idx for idx, row in cad.iterrows()}
    for _, spr_row in spr.iterrows():
        if spr_row["FULL_ADDRESS"] in full_lookup:
            cad_row = cad.loc[full_lookup[spr_row["FULL_ADDRESS"]]]
            matches.append(_record(spr_row, cad_row, 100, "EXACT_FULL"))
    # phase 2: SEARCH_KEY + building equality, dedup against prior pairs
    key_index: dict = {}
    for idx, row in cad.iterrows():
        if row["SEARCH_KEY"]:
            key_index.setdefault(row["SEARCH_KEY"], []).append(idx)
    for _, spr_row in spr.iterrows():
        for cad_idx in key_index.get(spr_row["SEARCH_KEY"], []):
            cad_row = cad.loc[cad_idx]
            if spr_row["BUILDING_NORM"] == cad_row["BUILDING_NORM"]:
                dup = any(
                    m["ADDRESS_ID_SPR"] == spr_row.get("ADDRESS_ID", "")
                    and m["ADDRESS_ID_CAD"] == cad_row.get("ADDRESS_ID", "")
                    for m in matches
                )
                if not dup:
                    matches.append(_record(spr_row, cad_row, 100, "EXACT_KEY"))
    return pd.DataFrame(matches, columns=MATCH_COLUMNS)


def find_fuzzy_matches(
    spr: pd.DataFrame, cad: pd.DataFrame, threshold: float = 85, exclude_spr_ids=None
) -> pd.DataFrame:
    exclude_spr_ids = exclude_spr_ids or set()
    remaining = spr[~spr["ADDRESS_ID"].isin(exclude_spr_ids)]
    house_index: dict = {}
    for idx, row in cad.iterrows():
        if row["HOUSE_NORM"]:
            house_index.setdefault(row["HOUSE_NORM"], []).append(idx)
    matches = []
    for _, spr_row in remaining.iterrows():
        cand_idx = [
            i
            for i in house_index.get(spr_row["HOUSE_NORM"], [])
            if cad.loc[i]["BUILDING_NORM"] == spr_row["BUILDING_NORM"]
        ]
        if not cand_idx:
            continue
        streets, street_idx = [], []
        for i in cand_idx:
            s = cad.loc[i]["STREET_NORM"]
            if s:
                streets.append(s)
                street_idx.append(i)
        if not streets or not spr_row["STREET_NORM"]:
            continue
        best = best_match_multi_strategy(spr_row["STREET_NORM"], streets)
        if best is None:
            continue
        score, pos, strategy = best
        if score >= threshold:
            cad_row = cad.loc[street_idx[pos]]
            matches.append(
                _record(spr_row, cad_row, score, f"FUZZY_STREET_{strategy.upper()}",
                        len(cand_idx))
            )
    return pd.DataFrame(matches, columns=MATCH_COLUMNS)


def run_pipeline(
    spr_raw: pd.DataFrame,
    cad_raw: pd.DataFrame,
    threshold: float = 85,
    method: str = "Comprehensive",
) -> pd.DataFrame:
    """Full reference flow incl. method gating (address.py:1164-1214)."""
    spr, cad = preprocess(spr_raw), preprocess(cad_raw)
    frames = []
    exclude: set = set()
    if method in ("Comprehensive", "Exact Only", "Hybrid (Exact + Fuzzy)"):
        exact = find_exact_matches(spr, cad)
        frames.append(exact)
        if len(exact):
            exclude = set(exact["ADDRESS_ID_SPR"].unique())
    if method in ("Comprehensive", "Fuzzy Only", "Hybrid (Exact + Fuzzy)"):
        frames.append(find_fuzzy_matches(spr, cad, threshold, exclude))
    frames = [f for f in frames if len(f)]
    if not frames:
        return pd.DataFrame(columns=MATCH_COLUMNS)
    return pd.concat(frames, ignore_index=True)
