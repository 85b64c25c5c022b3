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


# ---------------------------------------------------------------------------
# Aggregate truncation counters (hot-bucket caps in the LSH candidate paths).
#
# The candidate generators cap pathological hot buckets at ``max_group``
# (documented recall trade); round-3 logged one WARNING per truncated bucket,
# which floods the output at scale. Instead, worker tasks fire-and-forget
# increments to ONE zero-CPU counter actor (same pattern as
# state/progress.ProgressActor) and the stage logs a single end-of-stage
# summary: buckets truncated, member rows dropped, candidate pairs dropped.
# ---------------------------------------------------------------------------

_TRUNC_ACTOR_NAME = "rm_ray_truncation_metrics"
_trunc_handle = None  # driver-side reference keeps the named actor alive


def truncation_actor():
    """Get/create the session-wide truncation counter actor (zero CPU).

    The handle is cached per driver process: repeated
    ``.options(name=..., get_if_exists=True).remote()`` calls with a freshly
    pickled class object proved flaky (worker-side fire-and-forget adds on
    the second handle were occasionally dropped), so exactly ONE creation
    call ever runs here and every stage shares the returned handle.
    """
    global _trunc_handle
    if _trunc_handle is not None:
        return _trunc_handle
    import ray

    @ray.remote(num_cpus=0)
    class _TruncationActor:
        def __init__(self):
            self._stages: dict = {}

        def add(self, stage: str, buckets: int, rows_dropped: int,
                pairs_dropped: int) -> None:
            s = self._stages.setdefault(stage, {
                "buckets_truncated": 0, "rows_dropped": 0,
                "pairs_dropped": 0})
            s["buckets_truncated"] += int(buckets)
            s["rows_dropped"] += int(rows_dropped)
            s["pairs_dropped"] += int(pairs_dropped)

        def snapshot(self) -> dict:
            return {k: dict(v) for k, v in self._stages.items()}

        def reset(self, stage: "str | None" = None) -> None:
            if stage is None:
                self._stages = {}
            else:
                self._stages.pop(stage, None)

    _trunc_handle = _TruncationActor.options(
        name=_TRUNC_ACTOR_NAME, get_if_exists=True).remote()
    return _trunc_handle


def _lookup():
    if _trunc_handle is not None:
        return _trunc_handle
    import ray
    try:
        return ray.get_actor(_TRUNC_ACTOR_NAME)
    except ValueError:
        return None


def truncation_snapshot() -> dict:
    """Cumulative per-stage truncation counters ({} if none recorded)."""
    import ray
    a = _lookup()
    return ray.get(a.snapshot.remote()) if a is not None else {}


def reset_truncation(stage: "str | None" = None) -> None:
    import ray
    a = _lookup()
    if a is not None:
        ray.get(a.reset.remote(stage))


def log_truncation_summary(stage: str) -> "dict | None":
    """ONE end-of-stage summary line (replaces per-bucket log spam)."""
    import logging
    snap = truncation_snapshot().get(stage)
    if snap and snap["buckets_truncated"]:
        logging.getLogger(__name__).warning(
            "%s: %d hot buckets truncated to the max_group cap "
            "(%d member rows, %d candidate pairs dropped; recall cap "
            "documented at the call site)",
            stage, snap["buckets_truncated"], snap["rows_dropped"],
            snap["pairs_dropped"])
    return snap
