"""Engine-variant matcher (the reference's alternate modular engine).

Reimplements ``/root/reference/src/matching/engine.py:15-262`` semantics as a
Ray-Data broadcast actor-pool stage (SURVEY.md §3.3, operators J6/T4/T5/O2):

- exact phase: ``SEARCH_KEY`` equality alone — deliberately looser than the
  canonical matcher, which also requires building equality (engine.py:117-145 vs
  address.py:416; SURVEY §2.12.6). 1:N output, score 100.
- fuzzy phase (only when exact found nothing for the row, engine.py:227-231):
  candidates = union of four index lookups (exact street, exact house,
  ``HOUSE_NORM[:2]`` prefix, ``STREET_NORM[:3]`` prefix — engine.py:154-173);
  score = weighted sum ``0.4*ratio + 0.3*partial + 0.2*token_sort +
  0.1*token_set`` on the two SEARCH_KEYs (engine.py:85-104, weights
  config/settings.py:23-26); keep score >= threshold_poor (50), sort desc, top
  ``max_results`` (100) per SPR row (engine.py:183,205-206).

Determinism note: the reference iterates a Python ``set`` of candidate indices —
unspecified order under score ties. We canonicalize: candidates are evaluated in
cadastre ``_ord`` order and the sort is stable, so equal-score candidates keep
ascending ``_ord``. Quality labels per engine.py:106-115.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import ray
import ray.data

from ..functions.scorers import partial_ratio, ratio, token_set_ratio, token_sort_ratio

#: engine.py weights and thresholds (config/settings.py:17-26)
WEIGHTS = (0.4, 0.3, 0.2, 0.1)
THRESHOLD_EXCELLENT = 90.0
THRESHOLD_GOOD = 75.0
THRESHOLD_POOR = 50.0
MAX_RESULTS = 100

ENGINE_MATCH_SCHEMA = pa.schema([
    ("spr_index", pa.string()),   # the engine's spr_row.name == our stable _ord id
    ("cad_index", pa.string()),
    ("match_score", pa.float64()),
    ("match_quality", pa.string()),
    ("match_type", pa.string()),
    ("spr_search_key", pa.string()),
    ("cad_search_key", pa.string()),
    ("spr_address", pa.string()),
    ("cad_address", pa.string()),
    ("spr_street_name", pa.string()),
    ("cad_street_name", pa.string()),
    ("spr_house", pa.string()),
    ("cad_house", pa.string()),
    ("spr_building", pa.string()),
    ("cad_building", pa.string()),
    ("completeness_spr", pa.float64()),
    ("completeness_cad", pa.float64()),
])


def weighted_fuzzy_score(a: str, b: str) -> float:
    """engine.py:85-104 — weighted sum of the four scorers; 0 on empty input."""
    if not a or not b:
        return 0.0
    w1, w2, w3, w4 = WEIGHTS
    return (ratio(a, b) * w1 + partial_ratio(a, b) * w2
            + token_sort_ratio(a, b) * w3 + token_set_ratio(a, b) * w4)


def match_quality_label(score: float) -> str:
    """engine.py:106-115 score -> Excellent/Good/Poor/No Match."""
    if score >= THRESHOLD_EXCELLENT:
        return "Excellent"
    if score >= THRESHOLD_GOOD:
        return "Good"
    if score >= THRESHOLD_POOR:
        return "Poor"
    return "No Match"


class EngineVariantActor:
    """Broadcast-index scoring actor: 5 indexes built once per actor from the
    collected cadastre table (engine.py:33-83), batches of SPR rows scored per call.
    """

    _CAD_FIELDS = ("SEARCH_KEY", "FULL_ADDRESS", "STREET_NAME", "HOUSE", "BUILDING")

    def __init__(self, cad_table, threshold_poor: float = THRESHOLD_POOR,
                 max_results: int = MAX_RESULTS):
        from .matching import resolve_broadcast

        cad_table = resolve_broadcast(cad_table).sort_by("_ord")
        self.threshold_poor = float(threshold_poor)
        self.max_results = int(max_results)
        cols = {c: cad_table.column(c).to_pylist() for c in cad_table.column_names}
        n = cad_table.num_rows
        self.cad_ord: List[str] = [str(o) for o in cols["_ord"]]
        self.cad = [
            {
                "SEARCH_KEY": cols["SEARCH_KEY"][i] or "",
                "FULL_ADDRESS": cols["FULL_ADDRESS"][i] or "",
                "STREET_NAME": cols["STREET_NAME"][i] or "",
                "HOUSE": cols["HOUSE"][i] or "",
                "BUILDING": cols["BUILDING"][i] or "",
                "COMPLETENESS_SCORE": float(cols["COMPLETENESS_SCORE"][i] or 0.0),
            }
            for i in range(n)
        ]
        self.street_index: Dict[str, List[int]] = {}
        self.house_index: Dict[str, List[int]] = {}
        self.search_key_index: Dict[str, List[int]] = {}
        self.house_flexible_index: Dict[str, List[int]] = {}
        self.component_index: Dict[str, List[int]] = {}
        for i in range(n):
            street = cols["STREET_NORM"][i] or ""
            house = cols["HOUSE_NORM"][i] or ""
            skey = cols["SEARCH_KEY"][i] or ""
            if street:
                self.street_index.setdefault(street, []).append(i)
                self.component_index.setdefault(street[:3], []).append(i)
            if house:
                self.house_index.setdefault(house, []).append(i)
            if len(house) >= 2:
                self.house_flexible_index.setdefault(house[:2], []).append(i)
            if skey:
                self.search_key_index.setdefault(skey, []).append(i)

    def _emit(self, out: Dict[str, list], spr: dict, cad_i: int, score: float,
              quality: str, mtype: str) -> None:
        cad = self.cad[cad_i]
        out["spr_index"].append(spr["_ord"])
        out["cad_index"].append(self.cad_ord[cad_i])
        out["match_score"].append(score)
        out["match_quality"].append(quality)
        out["match_type"].append(mtype)
        out["spr_search_key"].append(spr["SEARCH_KEY"])
        out["cad_search_key"].append(cad["SEARCH_KEY"])
        out["spr_address"].append(spr["FULL_ADDRESS"])
        out["cad_address"].append(cad["FULL_ADDRESS"])
        out["spr_street_name"].append(spr["STREET_NAME"])
        out["cad_street_name"].append(cad["STREET_NAME"])
        out["spr_house"].append(spr["HOUSE"])
        out["cad_house"].append(cad["HOUSE"])
        out["spr_building"].append(spr["BUILDING"])
        out["cad_building"].append(cad["BUILDING"])
        out["completeness_spr"].append(spr["COMPLETENESS_SCORE"])
        out["completeness_cad"].append(cad["COMPLETENESS_SCORE"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = lambda c: batch.column(c).to_pylist()
        spr_rows = [
            {
                "_ord": str(o),
                "SEARCH_KEY": sk or "", "STREET_NORM": sn or "", "HOUSE_NORM": hn or "",
                "FULL_ADDRESS": fa or "", "STREET_NAME": st or "", "HOUSE": h or "",
                "BUILDING": b or "", "COMPLETENESS_SCORE": float(cs or 0.0),
            }
            for o, sk, sn, hn, fa, st, h, b, cs in zip(
                g("_ord"), g("SEARCH_KEY"), g("STREET_NORM"), g("HOUSE_NORM"),
                g("FULL_ADDRESS"), g("STREET_NAME"), g("HOUSE"), g("BUILDING"),
                g("COMPLETENESS_SCORE"))
        ]
        out: Dict[str, list] = {f.name: [] for f in ENGINE_MATCH_SCHEMA}
        for spr in spr_rows:
            exact = self.search_key_index.get(spr["SEARCH_KEY"], []) \
                if spr["SEARCH_KEY"] else []
            if exact:
                for cad_i in exact:
                    self._emit(out, spr, cad_i, 100.0, "Excellent", "Exact")
                continue
            candidates: set = set()
            if spr["STREET_NORM"] in self.street_index:
                candidates.update(self.street_index[spr["STREET_NORM"]])
            if spr["HOUSE_NORM"] in self.house_index:
                candidates.update(self.house_index[spr["HOUSE_NORM"]])
            if len(spr["HOUSE_NORM"]) >= 2:
                candidates.update(
                    self.house_flexible_index.get(spr["HOUSE_NORM"][:2], []))
            if len(spr["STREET_NORM"]) >= 3:
                candidates.update(self.component_index.get(spr["STREET_NORM"][:3], []))
            scored: List[Tuple[float, int]] = []
            for cad_i in sorted(candidates):  # canonical _ord order (see module doc)
                score = weighted_fuzzy_score(
                    spr["SEARCH_KEY"], self.cad[cad_i]["SEARCH_KEY"])
                if score >= self.threshold_poor:
                    scored.append((score, cad_i))
            scored.sort(key=lambda t: -t[0])  # stable: ties keep ascending _ord
            for score, cad_i in scored[: self.max_results]:
                self._emit(out, spr, cad_i, score, match_quality_label(score), "Fuzzy")
        return pa.Table.from_pydict(
            {f.name: pa.array(out[f.name], f.type) for f in ENGINE_MATCH_SCHEMA})


def engine_variant_matches(
    spr: ray.data.Dataset,
    cad_table_ref,
    threshold_poor: float = THRESHOLD_POOR,
    max_results: int = MAX_RESULTS,
    concurrency=(1, 8),
    batch_size: int = 2048,
) -> ray.data.Dataset:
    """Engine-variant matching over preprocessed SPR rows vs a broadcast cadastre.

    ``cad_table_ref``: ``ray.put`` of the table from
    :func:`..stages.matching.build_cad_block_table` extended with ``SEARCH_KEY``
    (use :func:`build_engine_cad_table`).
    """
    return spr.map_batches(
        EngineVariantActor,
        fn_constructor_args=(cad_table_ref, threshold_poor, max_results),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def build_engine_cad_table(cad: ray.data.Dataset) -> pa.Table:
    """Collect the (small) cadastre side with the columns the engine indexes need."""
    cols = ["ADDRESS_ID", "STREET_NAME", "HOUSE", "BUILDING", "FULL_ADDRESS",
            "SEARCH_KEY", "COMPLETENESS_SCORE", "STREET_NORM", "HOUSE_NORM",
            "BUILDING_NORM", "_ord"]
    batches = list(cad.select_columns(cols).iter_batches(batch_format="pyarrow"))
    if not batches:
        fields = [(c, pa.float64() if c == "COMPLETENESS_SCORE" else pa.string())
                  for c in cols]
        return pa.table({c: pa.array([], t) for c, t in fields})
    return pa.concat_tables(batches, promote_options="default").sort_by("_ord")
