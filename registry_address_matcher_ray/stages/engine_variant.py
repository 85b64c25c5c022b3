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

import numpy as _np
import pandas as pd
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

    Columnar layout (round-2 rework): the cadastre lives as a dict of numpy
    arrays (no per-row dicts — ~10x less memory than the round-1 list-of-dicts),
    index postings are numpy int arrays, candidate unions run through
    ``np.unique(np.concatenate(...))``, and output rows are emitted as
    (spr_row, cad_idx, score) index arrays turned into Arrow columns with one
    vectorized take per column. A per-actor ``(spr_key, cad_key)`` score cache
    memoizes the weighted 4-scorer kernel across repeated key pairs.
    """

    _CAD_FIELDS = ("SEARCH_KEY", "FULL_ADDRESS", "STREET_NAME", "HOUSE", "BUILDING")

    def __init__(self, cad_table, threshold_poor: float = THRESHOLD_POOR,
                 max_results: int = MAX_RESULTS):
        import numpy as np

        from .matching import _tune_worker_gc, resolve_broadcast

        cad_table = resolve_broadcast(cad_table).sort_by("_ord")
        self.threshold_poor = float(threshold_poor)
        self.max_results = int(max_results)
        n = cad_table.num_rows

        def _col(name: str, fill="") -> "np.ndarray":
            col = cad_table.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            import pyarrow.compute as pc

            return pc.fill_null(col, fill).to_numpy(zero_copy_only=False)

        self.cad = {c: _col(c) for c in self._CAD_FIELDS}
        self.cad["_ord"] = _col("_ord").astype(str)
        self.cad_compl = _col("COMPLETENESS_SCORE", 0.0).astype(float)
        streets = _col("STREET_NORM")
        houses = _col("HOUSE_NORM")
        skeys = self.cad["SEARCH_KEY"]

        def _postings(keys) -> Dict[str, "np.ndarray"]:
            s = pd.Series(keys)
            return {k: v.to_numpy() if hasattr(v, "to_numpy") else np.asarray(v)
                    for k, v in s.groupby(s).indices.items()}

        self.street_index = {k: v for k, v in _postings(streets).items() if k}
        self.house_index = {k: v for k, v in _postings(houses).items() if k}
        self.search_key_index = {k: v for k, v in _postings(skeys).items() if k}
        h2 = pd.Series(houses).str[:2]
        self.house_flexible_index = {
            k: v for k, v in _postings(h2.to_numpy()).items() if len(k) >= 2}
        s3 = pd.Series(streets).str[:3]
        self.component_index = {
            k: v for k, v in _postings(np.where(streets != "", s3.to_numpy(), "")
                                       ).items() if k}
        self._score_cache: Dict[Tuple[str, str], float] = {}
        _tune_worker_gc()

    _EMPTY = _np.array([], dtype="int64")

    def _weighted(self, a: str, b: str) -> float:
        key = (a, b)
        sc = self._score_cache.get(key)
        if sc is None:
            sc = weighted_fuzzy_score(a, b)
            if len(self._score_cache) < 2_000_000:
                self._score_cache[key] = sc
        return sc

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        g = lambda c: batch.column(c).to_pylist()
        ords, sks = g("_ord"), g("SEARCH_KEY")
        sns, hns = g("STREET_NORM"), g("HOUSE_NORM")
        spr_rows_idx: List[int] = []
        cad_idx: List[int] = []
        scores: List[float] = []
        types: List[str] = []
        for i in range(batch.num_rows):
            sk = sks[i] or ""
            exact = self.search_key_index.get(sk) if sk else None
            if exact is not None and len(exact):
                for ci in exact:
                    spr_rows_idx.append(i)
                    cad_idx.append(int(ci))
                    scores.append(100.0)
                    types.append("Exact")
                continue
            sn, hn = sns[i] or "", hns[i] or ""
            parts = [
                self.street_index.get(sn, self._EMPTY) if sn else self._EMPTY,
                self.house_index.get(hn, self._EMPTY) if hn else self._EMPTY,
                self.house_flexible_index.get(hn[:2], self._EMPTY)
                if len(hn) >= 2 else self._EMPTY,
                self.component_index.get(sn[:3], self._EMPTY)
                if len(sn) >= 3 else self._EMPTY,
            ]
            cands = np.unique(np.concatenate(parts))  # canonical _ord order
            if not len(cands):
                continue
            ckeys = self.cad["SEARCH_KEY"][cands]
            cs = np.fromiter((self._weighted(sk, ck) for ck in ckeys),
                             dtype=np.float64, count=len(cands))
            keep = cs >= self.threshold_poor
            if not keep.any():
                continue
            kept, ks = cands[keep], cs[keep]
            order = np.argsort(-ks, kind="stable")[: self.max_results]
            for o in order:
                spr_rows_idx.append(i)
                cad_idx.append(int(kept[o]))
                scores.append(float(ks[o]))
                types.append("Fuzzy")

        rows = np.asarray(spr_rows_idx, dtype=np.int64)
        cidx = np.asarray(cad_idx, dtype=np.int64)
        sarr = np.asarray(scores, dtype=np.float64)
        rows_pa = pa.array(rows, pa.int64())
        take = lambda name: pa.compute.take(
            pa.compute.cast(batch.column(name), pa.string()), rows_pa)
        qual = np.where(sarr >= THRESHOLD_EXCELLENT, "Excellent",
                        np.where(sarr >= THRESHOLD_GOOD, "Good",
                                 np.where(sarr >= THRESHOLD_POOR, "Poor", "No Match")))
        compl = pa.compute.take(
            pa.compute.fill_null(
                pa.compute.cast(batch.column("COMPLETENESS_SCORE"), pa.float64()), 0.0),
            rows_pa)
        fill = lambda name: pa.compute.fill_null(take(name), "")
        out = {
            "spr_index": fill("_ord"),
            "cad_index": pa.array(self.cad["_ord"][cidx], pa.string()),
            "match_score": pa.array(sarr, pa.float64()),
            "match_quality": pa.array(qual, pa.string()),
            "match_type": pa.array(types, pa.string()),
            "spr_search_key": fill("SEARCH_KEY"),
            "cad_search_key": pa.array(self.cad["SEARCH_KEY"][cidx], pa.string()),
            "spr_address": fill("FULL_ADDRESS"),
            "cad_address": pa.array(self.cad["FULL_ADDRESS"][cidx], pa.string()),
            "spr_street_name": fill("STREET_NAME"),
            "cad_street_name": pa.array(self.cad["STREET_NAME"][cidx], pa.string()),
            "spr_house": fill("HOUSE"),
            "cad_house": pa.array(self.cad["HOUSE"][cidx], pa.string()),
            "spr_building": fill("BUILDING"),
            "cad_building": pa.array(self.cad["BUILDING"][cidx], pa.string()),
            "completeness_spr": compl,
            "completeness_cad": pa.array(self.cad_compl[cidx], pa.float64()),
        }
        return pa.table(out).cast(pa.schema(ENGINE_MATCH_SCHEMA))


def engine_variant_matches(
    spr: ray.data.Dataset,
    cad_table_ref,
    threshold_poor: float = THRESHOLD_POOR,
    max_results: int = MAX_RESULTS,
    batch_size: int = 2048,
) -> ray.data.Dataset:
    """Engine-variant matching over preprocessed SPR rows vs a broadcast cadastre.

    ``cad_table_ref``: ``ray.put`` / ``put_broadcast`` of the table from
    :func:`build_engine_cad_table`. Runs as stateless TASKS with the index
    built once per worker process (``matching._worker_state``), not an actor
    pool: task specs carry only the wrapped ref (no object-store constructor
    args — ray issue 53727), task retries survive worker loss, and warm
    workers from earlier stages are reused instead of paying a pool spawn.
    """
    from .matching import BroadcastRef, _worker_state

    if isinstance(cad_table_ref, BroadcastRef):
        ref = cad_table_ref
    elif isinstance(cad_table_ref, ray.ObjectRef):
        ref = BroadcastRef(cad_table_ref)
    else:
        ref = BroadcastRef(ray.put(cad_table_ref))
    key = ("engine_variant", ref.ref.hex(), float(threshold_poor), int(max_results))

    def _match(batch: pa.Table) -> pa.Table:
        st = _worker_state(
            key, lambda: EngineVariantActor(ref, threshold_poor, max_results))
        return st(batch)

    return spr.map_batches(_match, batch_format="pyarrow", batch_size=batch_size)


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
