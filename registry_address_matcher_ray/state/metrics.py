"""Per-stage run metrics (rows in/out, wall time, throughput) -> STAGE_METRICS.json.

Reference parity: the reference surfaces per-chunk processed/matched/rate/ETA
counters in its Streamlit UI (``/root/reference/address.py:538-569,1259-1269``,
SURVEY.md A9). Those are UI state, not data semantics; the engine equivalent is a
driver-side metrics collector that timestamps each stage and persists one JSON
document per run so operators of a long multi-node job can see where wall-time
went (the same numbers BENCH reports).
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Optional


class RunMetrics:
    """Collects stage timings/counters for one pipeline run."""

    def __init__(self, run_id: str = "run"):
        self.run_id = run_id
        self._t0 = time.monotonic()
        self.stages: list[dict] = []
        self.counters: dict[str, float] = {}

    @contextmanager
    def stage(self, name: str, rows_in: Optional[int] = None):
        rec = {"stage": name, "rows_in": rows_in}
        t0 = time.monotonic()
        try:
            yield rec
        finally:
            rec["wall_s"] = round(time.monotonic() - t0, 4)
            if rec.get("rows_out") and rec["wall_s"] > 0:
                rec["rows_per_sec"] = round(rec["rows_out"] / rec["wall_s"], 1)
            self.stages.append(rec)

    def record_stage(self, name: str, wall_s: float, rows_out: Optional[int] = None,
                     resumed: bool = False) -> None:
        rec = {"stage": name, "wall_s": round(wall_s, 4), "rows_out": rows_out,
               "resumed": resumed}
        if rows_out and wall_s > 0:
            rec["rows_per_sec"] = round(rows_out / wall_s, 1)
        self.stages.append(rec)

    def add(self, key: str, value: float) -> None:
        self.counters[key] = self.counters.get(key, 0) + value

    def to_dict(self) -> dict:
        return {
            "run_id": self.run_id,
            "total_wall_s": round(time.monotonic() - self._t0, 4),
            "stages": self.stages,
            "counters": self.counters,
        }

    def write(self, path: str) -> str:
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.to_dict(), f, indent=1, default=str)
        os.replace(tmp, path)
        return path
