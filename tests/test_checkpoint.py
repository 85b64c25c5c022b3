"""Resume semantics for the checkpointed pipeline (SURVEY.md §5.6, §4 checkpoint row)."""

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from registry_address_matcher_ray.pipelines.config import PipelineConfig
from registry_address_matcher_ray.pipelines.linkage import run_linkage_checkpointed
from registry_address_matcher_ray.sources import synth
from registry_address_matcher_ray.state.checkpoint import CheckpointManager, MANIFEST_NAME


@pytest.fixture(scope="module")
def registry_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt_inputs")
    t = synth.synth_registries(300, seed=7)
    spr, cad = str(d / "spr.parquet"), str(d / "cad.parquet")
    pq.write_table(t["registry_spr"], spr)
    pq.write_table(t["registry_cad"], cad)
    return spr, cad


def _sorted_matches(ds) -> pd.DataFrame:
    return (
        ds.to_pandas()
        .sort_values(["ADDRESS_ID_SPR", "ADDRESS_ID_CAD"])
        .reset_index(drop=True)
    )


def test_checkpoint_run_resume_identical(registry_paths, tmp_path, ray_session):
    spr, cad = registry_paths
    ckpt = str(tmp_path / "ckpt")
    r1 = run_linkage_checkpointed(spr, cad, ckpt)
    m1 = _sorted_matches(r1["matches"])
    assert not any(s.resumed for s in r1["stages"].values())
    assert os.path.exists(os.path.join(ckpt, "STAGE_METRICS.json"))
    # manifest carries per-partition lineage
    with open(os.path.join(ckpt, "matches", MANIFEST_NAME)) as f:
        man = json.load(f)
    assert man["total_rows"] == len(m1)
    assert all({"file", "rows", "bytes"} <= set(p) for p in man["partitions"])
    assert sum(p["rows"] for p in man["partitions"]) == len(m1)

    # full resume: every stage skips, identical output
    r2 = run_linkage_checkpointed(spr, cad, ckpt)
    assert all(s.resumed for s in r2["stages"].values())
    pd.testing.assert_frame_equal(_sorted_matches(r2["matches"]), m1)


def test_checkpoint_partial_invalidation(registry_paths, tmp_path, ray_session):
    """Killing a run after stage-2 = deleting later stage dirs; rerun recomputes
    only the missing suffix and produces identical output."""
    spr, cad = registry_paths
    ckpt = str(tmp_path / "ckpt")
    r1 = run_linkage_checkpointed(spr, cad, ckpt)
    m1 = _sorted_matches(r1["matches"])
    shutil.rmtree(os.path.join(ckpt, "matches"))
    shutil.rmtree(os.path.join(ckpt, "clusters"))
    r2 = run_linkage_checkpointed(spr, cad, ckpt)
    assert r2["stages"]["preprocess_spr"].resumed
    assert r2["stages"]["preprocess_cad"].resumed
    assert not r2["stages"]["matches"].resumed
    pd.testing.assert_frame_equal(_sorted_matches(r2["matches"]), m1)


def test_checkpoint_config_change_invalidates(registry_paths, tmp_path, ray_session):
    spr, cad = registry_paths
    ckpt = str(tmp_path / "ckpt")
    run_linkage_checkpointed(spr, cad, ckpt)
    r2 = run_linkage_checkpointed(
        spr, cad, ckpt, PipelineConfig(threshold=90.0)
    )
    # config is chained into every fingerprint -> nothing resumes
    assert not any(s.resumed for s in r2["stages"].values())


def test_checkpoint_input_change_invalidates(tmp_path, ray_session):
    t = synth.synth_registries(120, seed=3)
    spr, cad = str(tmp_path / "spr.parquet"), str(tmp_path / "cad.parquet")
    pq.write_table(t["registry_spr"], spr)
    pq.write_table(t["registry_cad"], cad)
    ckpt = str(tmp_path / "ckpt")
    run_linkage_checkpointed(spr, cad, ckpt)
    # rewrite one input (new mtime/size) -> its preprocess + downstream recompute
    t2 = synth.synth_registries(130, seed=4)
    pq.write_table(t2["registry_spr"], spr)
    r2 = run_linkage_checkpointed(spr, cad, ckpt)
    assert not r2["stages"]["preprocess_spr"].resumed
    assert r2["stages"]["preprocess_cad"].resumed
    assert not r2["stages"]["matches"].resumed


def test_corrupt_partition_triggers_recompute(registry_paths, tmp_path, ray_session):
    spr, cad = registry_paths
    ckpt = str(tmp_path / "ckpt")
    r1 = run_linkage_checkpointed(spr, cad, ckpt)
    m1 = _sorted_matches(r1["matches"])
    # truncate one partition file: manifest size check must reject the checkpoint
    mdir = os.path.join(ckpt, "matches")
    part = next(f for f in os.listdir(mdir) if f.endswith(".parquet"))
    with open(os.path.join(mdir, part), "wb") as f:
        f.write(b"corrupt")
    r2 = run_linkage_checkpointed(spr, cad, ckpt)
    assert not r2["stages"]["matches"].resumed
    pd.testing.assert_frame_equal(_sorted_matches(r2["matches"]), m1)


def test_pages_checkpoint_run_resume_identical(tmp_path, ray_session):
    from registry_address_matcher_ray.pipelines.linkage import (
        pages_to_match_clusters, run_pages_checkpointed)
    import ray.data as rd

    t = synth.synth_registries(250, seed=19)
    pages = synth.synth_pages(t["registry_spr"], seed=19)
    pages_p, cad_p = str(tmp_path / "pages.parquet"), str(tmp_path / "cad.parquet")
    pq.write_table(pages, pages_p)
    pq.write_table(t["registry_cad"], cad_p)
    ckpt = str(tmp_path / "ckpt_pages")

    r1 = run_pages_checkpointed(pages_p, cad_p, ckpt)
    m1 = _sorted_matches(r1["matches"])
    assert not any(s.resumed for s in r1["stages"].values())
    # the checkpointed flagship matches the direct flagship exactly
    direct = pages_to_match_clusters(
        rd.read_parquet(pages_p), rd.read_parquet(cad_p))
    pd.testing.assert_frame_equal(_sorted_matches(direct["matches"]), m1)

    # full resume: the expensive extract stage (and all others) skip
    r2 = run_pages_checkpointed(pages_p, cad_p, ckpt)
    assert all(s.resumed for s in r2["stages"].values())
    pd.testing.assert_frame_equal(_sorted_matches(r2["matches"]), m1)
