"""Live progress counters (SURVEY A9: the reference's per-chunk
processed/matched/rate counters, ``/root/reference/address.py:538-569``)."""

import time

import pyarrow as pa
import ray
import ray.data

from registry_address_matcher_ray.pipelines import linkage
from registry_address_matcher_ray.pipelines.config import PipelineConfig
from registry_address_matcher_ray.sources import synth
from registry_address_matcher_ray.state import progress as prog


def _settled(actor, cond, timeout=10.0):
    """Poll snapshot until cond(snap) — inc.remote is fire-and-forget, so the
    last few worker messages may land after the pipeline returns."""
    deadline = time.monotonic() + timeout
    while True:
        snap = ray.get(actor.snapshot.remote())
        try:
            if cond(snap):
                return snap
        except KeyError:
            pass
        if time.monotonic() > deadline:
            return snap
        time.sleep(0.1)


def test_track_counts_rows_and_passes_batches_through(ray_session):
    actor = prog.start()
    ds = ray.data.range(1000, override_num_blocks=4)
    tracked = prog.track(ds, "scan", actor)
    assert tracked.count() == 1000
    snap = _settled(actor, lambda s: s["stages"]["scan"]["rows_in"] == 1000)
    s = snap["stages"]["scan"]
    assert s["rows_in"] == 1000 and s["rows_out"] == 1000
    assert s["batches"] >= 1
    assert snap["elapsed_s"] >= 0


def test_wrap_reports_in_and_out_rows(ray_session):
    actor = prog.start()

    def halve(batch: pa.Table) -> pa.Table:
        return batch.slice(0, batch.num_rows // 2)

    counted = prog.wrap(halve, "halve", actor)
    out = ray.data.range(400, override_num_blocks=2).map_batches(
        counted, batch_format="pyarrow").count()
    assert out == 200
    s = _settled(actor, lambda s: s["stages"]["halve"]["rows_in"] == 400)[
        "stages"]["halve"]
    assert s["rows_in"] == 400 and s["rows_out"] == 200


def test_eta_with_known_total(ray_session):
    actor = prog.start()
    ray.get(actor.set_total.remote("scan", 2000))
    ds = prog.track(ray.data.range(1000, override_num_blocks=8), "scan", actor)
    ds.count()
    s = _settled(actor, lambda s: s["stages"]["scan"]["rows_in"] == 1000)[
        "stages"]["scan"]
    assert s["total_rows"] == 2000
    assert s["pct"] == 50.0


def test_linkage_progress_flag_counts_probe_and_match_rows(ray_session):
    t = synth.synth_registries(300, seed=7)
    spr = ray.data.from_arrow(t["registry_spr"])
    cad = ray.data.from_arrow(t["registry_cad"])
    cfg = PipelineConfig(progress=True, fuzzy_strategy="broadcast_dedup")
    matches = linkage.match_registries(spr, cad, cfg).materialize()
    n = matches.count()
    assert linkage.LAST_PROGRESS is not None
    snap = _settled(
        linkage.LAST_PROGRESS,
        lambda s: (s["stages"]["probe_rows"]["rows_in"] == 300
                   and s["stages"]["match_rows"]["rows_out"] == n))
    assert snap["stages"]["probe_rows"]["rows_in"] == 300
    assert snap["stages"]["match_rows"]["rows_out"] == n

    # identical output with the counter off (pass-through is zero-effect)
    base = linkage.match_registries(spr, cad, PipelineConfig(
        fuzzy_strategy="broadcast_dedup")).materialize()
    assert base.count() == n
