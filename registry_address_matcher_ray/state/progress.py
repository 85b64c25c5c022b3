"""Live in-flight progress counters (SURVEY.md A9, the reference's per-chunk UI).

The reference shows processed / matched / records-per-sec / ETA counters that
update per 500-row chunk while the match loop runs
(``/root/reference/address.py:538-569,1259-1269``). In a streaming Ray Data
pipeline there is no driver-side loop to hang those on — blocks flow through
distributed stages — so the engine equivalent is:

- ``ProgressActor``: one zero-CPU Ray actor holding per-stage counters. Worker
  tasks report batches to it fire-and-forget (no backpressure on the hot path:
  the ``inc.remote`` future is dropped, calls coalesce in the actor mailbox).
- ``track(ds, stage, actor)``: a zero-copy pass-through ``map_batches`` stage
  that counts rows flowing past a pipeline point while execution streams.
- ``wrap(fn, stage, actor)``: decorates an existing batch callable so its
  input/output row counts are reported without an extra stage.

The driver (or any observer holding the actor handle) polls
``ray.get(actor.snapshot.remote())`` at any time DURING execution for live
rows / rows-per-sec / ETA — the same numbers the reference renders, minus the
Streamlit. Counters are monotonic and cheap: one small message per batch, not
per row, so at 100 TB (~millions of batches) the actor sees a few thousand
messages per second at most — far below a single actor's throughput ceiling;
if ever hot, shard by ``stage`` hash across a handful of actors.

Not wired by default: ``PipelineConfig(progress=True)`` turns it on for the
linkage pipelines; library users attach ``track``/``wrap`` wherever they need
a counter.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import pyarrow as pa
import ray


@ray.remote(num_cpus=0)
class ProgressActor:
    """Per-stage monotonic counters with rate/ETA snapshots."""

    def __init__(self):
        self._t0 = time.monotonic()
        self._stages: dict = {}
        self._totals: dict = {}

    def set_total(self, stage: str, total_rows: int) -> None:
        """Optional denominator for ETA (e.g. dataset count known up front)."""
        self._totals[stage] = int(total_rows)

    def inc(self, stage: str, rows_in: int, rows_out: int) -> None:
        now = time.monotonic()
        s = self._stages.get(stage)
        if s is None:
            s = self._stages[stage] = {
                "rows_in": 0, "rows_out": 0, "batches": 0,
                "first_s": round(now - self._t0, 4),
            }
        s["rows_in"] += int(rows_in)
        s["rows_out"] += int(rows_out)
        s["batches"] += 1
        s["last_s"] = round(now - self._t0, 4)

    def snapshot(self) -> dict:
        """Live per-stage rows / rate / ETA — safe to poll mid-execution."""
        now = time.monotonic()
        out = {"elapsed_s": round(now - self._t0, 4), "stages": {}}
        for stage, s in self._stages.items():
            span = max(s.get("last_s", 0) - s["first_s"], 1e-9)
            rate = s["rows_in"] / span if s["batches"] > 1 else None
            rec = dict(s)
            rec["rows_per_sec"] = round(rate, 1) if rate else None
            total = self._totals.get(stage)
            if total:
                rec["total_rows"] = total
                rec["pct"] = round(100.0 * s["rows_in"] / total, 2)
                if rate and s["rows_in"] < total:
                    rec["eta_s"] = round((total - s["rows_in"]) / rate, 1)
            out["stages"][stage] = rec
        return out


def start() -> "ray.actor.ActorHandle":
    """Spawn the counter actor (zero CPU reservation — never steals a slot)."""
    return ProgressActor.remote()


class _Tracker:
    """Pass-through batch callable: count rows, return the batch unchanged."""

    def __init__(self, stage: str, actor):
        self._stage = stage
        self._actor = actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        self._actor.inc.remote(self._stage, n, n)  # fire-and-forget
        return batch


def track(ds: "ray.data.Dataset", stage: str, actor) -> "ray.data.Dataset":
    """Insert a zero-copy counting stage at this point of the pipeline."""
    return ds.map_batches(
        _Tracker(stage, actor), batch_format="pyarrow", batch_size=None)


def wrap(fn: Callable, stage: str, actor,
         rows_of: Optional[Callable] = None) -> Callable:
    """Report in/out row counts of an existing batch callable.

    ``rows_of`` overrides output-row counting for callables that return
    something other than a sized table/frame.
    """

    def _counted(batch, *a, **kw):
        n_in = batch.num_rows if hasattr(batch, "num_rows") else len(batch)
        out = fn(batch, *a, **kw)
        if rows_of is not None:
            n_out = rows_of(out)
        elif hasattr(out, "num_rows"):
            n_out = out.num_rows
        else:
            try:
                n_out = len(out)
            except TypeError:
                n_out = 0
        actor.inc.remote(stage, n_in, n_out)
        return out

    return _counted
