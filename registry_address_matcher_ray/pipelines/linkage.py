"""Flagship linkage pipelines: registries -> match pairs -> entity clusters.

Composition of the stage operators, mirroring the reference lifecycle
(SURVEY.md §3.1: ingest -> preprocess -> exact phases -> fuzzy phase -> concat)
with the target spec's additions (pages ingestion + deterministic extraction up
front, transitive clustering at the end). Method gating replicates
``/root/reference/address.py:1164-1214``: exact-matched SPR ids are excluded from
the fuzzy phase (``address.py:1185-1203``), and "Fuzzy Only" runs with an empty
exclusion set (SURVEY §2.12.8).

Everything streams: the only driver-side materializations are (a) the exact-match
pair set (small; reused for the exclusion filter and the final union) and (b) the
broadcast cadastre block table in the ``broadcast`` fuzzy plan (the premise of that
plan). The ``shuffle`` plan materializes neither side.
"""

from __future__ import annotations

import os
from typing import Optional, Set

import pyarrow as pa
import ray
import ray.data

from ..sources import io as rio
from ..stages import blocking, cluster, matching
from .config import PipelineConfig


def preprocess(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Normalize + derive + deterministic order column."""
    return blocking.add_order_column(blocking.preprocess_registry(ds))


#: last physical-plan decision (strategy, cad_bytes) — observability for tests
#: and operators, same pattern as ``matching.LAST_PHASE_TIMES``
LAST_PLAN: dict = {}

#: live ProgressActor handle for the most recent run with
#: ``PipelineConfig(progress=True)`` — poll ``snapshot.remote()`` mid-run for
#: rows / rows-per-sec / ETA (the reference's per-chunk counters, A9)
LAST_PROGRESS = None


def _fresh_progress(cfg: PipelineConfig) -> None:
    """Spawn a fresh ProgressActor for this run (one per match_registries
    call — counters never bleed across runs, even with a reused config)."""
    global LAST_PROGRESS
    if cfg.progress:
        from ..state import progress as prog

        LAST_PROGRESS = prog.start()


def _maybe_track(ds: ray.data.Dataset, stage: str, cfg: PipelineConfig,
                 total_rows: Optional[int] = None) -> ray.data.Dataset:
    """Insert a live row counter at this pipeline point when cfg.progress."""
    if not cfg.progress:
        return ds
    from ..state import progress as prog

    if total_rows is not None:
        LAST_PROGRESS.set_total.remote(stage, total_rows)
    return prog.track(ds, stage, LAST_PROGRESS)


def resolve_fuzzy_strategy(
    cad: ray.data.Dataset, cfg: PipelineConfig
) -> "tuple[str, ray.data.Dataset]":
    """Pick the physical fuzzy plan (SURVEY §7.3(4)).

    ``auto`` measures the preprocessed cadastre's in-memory byte size and
    chooses the broadcast plan only when it fits ``broadcast_threshold_bytes``
    (the build side is collected into one Arrow table held per worker — a
    mis-sized default would silently broadcast a too-big cadastre at 100x).
    Both regimes need the full preprocessed cadastre anyway (broadcast collects
    it, shuffle materializes it as its stage boundary), so the materialize here
    is never wasted work. Returns the decision plus the (possibly materialized)
    cadastre so the chosen plan reuses the blocks.
    """
    if cfg.fuzzy_strategy != "auto":
        LAST_PLAN.clear()
        LAST_PLAN.update({"strategy": cfg.fuzzy_strategy, "cad_bytes": None,
                          "forced": True})
        return cfg.fuzzy_strategy, cad
    cad = cad.materialize()
    nbytes = cad.size_bytes() or 0
    strategy = (
        "broadcast_dedup" if nbytes <= cfg.broadcast_threshold_bytes else "shuffle"
    )
    LAST_PLAN.clear()
    LAST_PLAN.update({"strategy": strategy, "cad_bytes": nbytes, "forced": False})
    return strategy, cad


def match_registries(
    spr: ray.data.Dataset,
    cad: ray.data.Dataset,
    config: Optional[PipelineConfig] = None,
    preprocessed: bool = False,
) -> ray.data.Dataset:
    """Registries in, 15-column match-pair Dataset out (MATCH_SCHEMA)."""
    cfg = config or PipelineConfig()
    if not preprocessed:
        spr = preprocess(spr)
        cad = preprocess(cad)
    if cfg.max_records is not None:
        spr = spr.limit(cfg.max_records)
    _fresh_progress(cfg)
    spr = _maybe_track(spr, "probe_rows", cfg)

    strategy, cad = resolve_fuzzy_strategy(cad, cfg)

    if strategy in ("broadcast", "broadcast_dedup"):
        # Broadcast plans: exact phase 1+2 and the fuzzy phase all run inside
        # actor-pool map_batches probing broadcast in-actor indexes of the
        # (small) cadastre side — the big probe side never shuffles.
        cad_tbl = matching.build_cad_block_table(cad)
        if cad_tbl.num_rows == 0 and cfg.do_exact:
            # nothing to match against; keep the stable empty schema
            return ray.data.from_arrow(matching.MATCH_SCHEMA.empty_table())
        # restart-safe broadcast: the holder keeps the actor constructor arg
        # inline in the task spec (ray#53727); the ref stays driver-pinned
        cad_ref = matching.put_broadcast(cad_tbl)
        # Probe-side task granularity: actor-pool parallelism is bounded by the
        # number of input blocks, and the largest block bounds the straggler
        # tail — split to several tasks per actor.
        nblocks = cfg.score_blocks or cfg.max_fuzzy_actors * 6
        if strategy == "broadcast_dedup":
            # scale path: score each distinct probe triple once job-wide
            return _maybe_track(matching.broadcast_matches_dedup(
                spr, cad_ref, cfg.threshold, cfg.do_exact, cfg.do_fuzzy,
                concurrency=cfg.fuzzy_concurrency,
                batch_size=cfg.fuzzy_batch_size, num_blocks=nblocks,
            ), "match_rows", cfg)
        spr = spr.repartition(nblocks)
        return _maybe_track(spr.map_batches(
            matching.BroadcastMatcherActor,
            fn_constructor_args=(cad_ref, cfg.threshold, cfg.do_exact, cfg.do_fuzzy),
            batch_format="pyarrow",
            batch_size=cfg.fuzzy_batch_size,
            concurrency=cfg.fuzzy_concurrency,
        ), "match_rows", cfg)

    # ---- shuffle plan: both sides large; equi-join / groupby exchanges ----
    # Preprocessed registries feed several consumers (two exact joins, the fuzzy
    # residue). Materialize ONCE so the normalize stage is not re-executed per
    # consumer — this is the pipeline's stage boundary (the object store spills if
    # a registry exceeds memory; at larger scale checkpoint.py persists the same
    # boundary to parquet instead).
    spr = spr.materialize()
    cad = cad.materialize()

    # Empty side -> no pairs. Also guards Dataset.join, which loses the key schema
    # on all-empty partitions (observed on ray 2.49: ArrowInvalid "No match ... key
    # field reference" when the left side has zero rows).
    if spr.count() == 0 or cad.count() == 0:
        return ray.data.from_arrow(matching.MATCH_SCHEMA.empty_table())

    parts = []
    exact = None
    if cfg.do_exact:
        exact = matching.exact_matches(spr, cad, cfg.num_partitions).materialize()
        parts.append(exact)

    if cfg.do_fuzzy:
        # exclusion-plan auto-switch: broadcast is_in below the limit (no
        # exchange), distributed left_anti join above it (the matched-id set
        # never reaches the driver) — row-identical either way
        if exact is None or exact.count() == 0:
            residue = spr
            LAST_PLAN["exclude_plan"] = "none"
        elif exact.count() > cfg.exclude_broadcast_limit:
            residue = matching.filter_out_ids_join(
                spr, "ADDRESS_ID", exact, "ADDRESS_ID_SPR",
                num_partitions=cfg.num_partitions)
            LAST_PLAN["exclude_plan"] = "join"
        else:
            from ..stages.analytics import distinct_values

            exclude_ids: Set[str] = set(
                distinct_values(exact, "ADDRESS_ID_SPR"))
            residue = matching.filter_out_ids(spr, "ADDRESS_ID", exclude_ids)
            LAST_PLAN["exclude_plan"] = "broadcast"
        fuzzy = matching.fuzzy_matches_shuffle(
            residue, cad, threshold=cfg.threshold, num_partitions=cfg.num_partitions
        )
        parts.append(fuzzy)

    if not parts:
        return ray.data.from_arrow(matching.MATCH_SCHEMA.empty_table())
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return _maybe_track(out, "match_rows", cfg)


def match_incremental(
    spr: ray.data.Dataset,
    cad: ray.data.Dataset,
    prior_matches: ray.data.Dataset,
    config: Optional[PipelineConfig] = None,
) -> ray.data.Dataset:
    """Incremental linkage: match only probe records absent from a prior
    match set, then union with it — the "new crawl snapshot arrived" path,
    so a 100-TB re-run prices in only the delta.

    Every phase of the matcher decides each probe row independently against
    the full cadastre (exact joins are per-row, extractOne is per-probe, the
    D2 pair-dedup is per-spr), so prior ∪ match(residue) is row-identical to
    a full-batch re-match as long as the cadastre side is unchanged — the
    property the oracle checks. The residue is one id anti-join
    (O(prior) semi-join filter), never a re-score of matched rows.
    """
    from ..stages.analytics import unmatched_records

    residue = unmatched_records(spr, prior_matches)
    fresh = match_registries(residue, cad, config)
    return prior_matches.union(fresh)


def cluster_matches(
    matches: ray.data.Dataset, config: Optional[PipelineConfig] = None
) -> ray.data.Dataset:
    cfg = config or PipelineConfig()
    return cluster.assign_clusters(
        matches,
        max_iters=cfg.cluster_max_iters,
        num_partitions=cfg.num_partitions,
        small_threshold=cfg.cluster_small_threshold,
    )


def _as_registry(src, name: str) -> ray.data.Dataset:
    """Accept a parquet path or an already-read Dataset (CSV/JSONL/any source);
    either way the required-column schema check runs at ingest."""
    if isinstance(src, ray.data.Dataset):
        rio.validate_registry_schema(src.schema(), name)
        return src
    return rio.read_registry(src, name)


def run_linkage(
    spr_path,
    cad_path,
    out_dir: Optional[str] = None,
    config: Optional[PipelineConfig] = None,
) -> dict:
    """Registry parquet paths (or pre-read Datasets) in; match pairs + clusters
    out (written if out_dir)."""
    cfg = config or PipelineConfig()
    spr = _as_registry(spr_path, "SPR")
    cad = _as_registry(cad_path, "Cadastre")
    matches = match_registries(spr, cad, cfg).materialize()
    clusters = cluster_matches(matches, cfg).materialize()
    result = {"matches": matches, "clusters": clusters}
    if out_dir:
        rio.write_dataset(matches, f"{out_dir}/matches")
        rio.write_dataset(clusters, f"{out_dir}/clusters")
    return result


def run_linkage_checkpointed(
    spr_path: str,
    cad_path: str,
    ckpt_dir: str,
    config: Optional[PipelineConfig] = None,
) -> dict:
    """Checkpoint-resumable linkage: every stage boundary persists to parquet with a
    per-partition lineage manifest; a rerun skips stages whose manifest validates
    (input fingerprints + config chain). Stage metrics land in
    ``<ckpt_dir>/STAGE_METRICS.json``.

    The reference has no resume story (SURVEY.md §4 checkpoint row); this is the
    100 TB-scale replacement for its ``st.cache_data`` memoization.
    """
    from dataclasses import asdict

    from ..state.checkpoint import CheckpointManager
    from ..state.metrics import RunMetrics

    cfg = config or PipelineConfig()
    mgr = CheckpointManager(ckpt_dir, run_config=asdict(cfg))
    metrics = RunMetrics(run_id=os.path.basename(os.path.normpath(ckpt_dir)))

    pre_spr = mgr.run_stage(
        "preprocess_spr",
        lambda: preprocess(rio.read_registry(spr_path, "SPR")),
        inputs=[spr_path],
    )
    pre_cad = mgr.run_stage(
        "preprocess_cad",
        lambda: preprocess(rio.read_registry(cad_path, "Cadastre")),
        inputs=[cad_path],
    )
    matches = mgr.run_stage(
        "matches",
        lambda: match_registries(pre_spr.dataset, pre_cad.dataset, cfg, preprocessed=True),
        upstream=["preprocess_spr", "preprocess_cad"],
    )
    clusters = mgr.run_stage(
        "clusters",
        lambda: cluster_matches(matches.dataset, cfg),
        upstream=["matches"],
    )
    for st in (pre_spr, pre_cad, matches, clusters):
        metrics.record_stage(st.name, st.wall_s, st.rows, st.resumed)
    metrics.write(os.path.join(ckpt_dir, "STAGE_METRICS.json"))
    return {
        "matches": matches.dataset,
        "clusters": clusters.dataset,
        "stages": {s.name: s for s in (pre_spr, pre_cad, matches, clusters)},
        "metrics": metrics.to_dict(),
    }


def run_pages_checkpointed(
    pages_path: str,
    cad_path: str,
    ckpt_dir: str,
    config: Optional[PipelineConfig] = None,
) -> dict:
    """Checkpoint-resumable pages flagship (the north-star pipeline):
    extract -> parse -> normalize persists once, matching and clustering
    resume independently — a failed 100 TB run re-reads finished stage
    boundaries from parquet instead of re-extracting the crawl. Same
    per-partition lineage manifests and stage metrics as
    :func:`run_linkage_checkpointed`.
    """
    from dataclasses import asdict

    from ..state.checkpoint import CheckpointManager
    from ..state.metrics import RunMetrics

    cfg = config or PipelineConfig()
    mgr = CheckpointManager(ckpt_dir, run_config=asdict(cfg))
    metrics = RunMetrics(run_id=os.path.basename(os.path.normpath(ckpt_dir)))

    records = mgr.run_stage(
        "extract_records",
        lambda: preprocess(blocking.pages_to_registry_records(
            blocking.extract_pages(rio.read_pages(pages_path)))),
        inputs=[pages_path],
    )
    pre_cad = mgr.run_stage(
        "preprocess_cad",
        lambda: preprocess(rio.read_registry(cad_path, "Cadastre")),
        inputs=[cad_path],
    )
    matches = mgr.run_stage(
        "matches",
        lambda: match_registries(
            records.dataset, pre_cad.dataset, cfg, preprocessed=True),
        upstream=["extract_records", "preprocess_cad"],
    )
    clusters = mgr.run_stage(
        "clusters",
        lambda: cluster_matches(matches.dataset, cfg),
        upstream=["matches"],
    )
    for st in (records, pre_cad, matches, clusters):
        metrics.record_stage(st.name, st.wall_s, st.rows, st.resumed)
    metrics.write(os.path.join(ckpt_dir, "STAGE_METRICS.json"))
    return {
        "records": records.dataset,
        "matches": matches.dataset,
        "clusters": clusters.dataset,
        "stages": {s.name: s for s in (records, pre_cad, matches, clusters)},
        "metrics": metrics.to_dict(),
    }


def pages_to_match_clusters(
    pages: ray.data.Dataset,
    cad: ray.data.Dataset,
    config: Optional[PipelineConfig] = None,
) -> dict:
    """The target-spec flagship: Common-Crawl-style pages vs. a reference registry.

    pages (url, warc_ts, html, text, lang)
      -> deterministic html->text extraction (byte-identical per url)
      -> parse embedded address records
      -> normalize/derive/blocking keys
      -> exact + fuzzy matching against the cadastre registry
      -> transitive clustering
    """
    import os
    import sys
    import time

    _dbg = os.environ.get("RAY_GRAFT_TIMING")
    _t0 = time.time()

    def _mark(label):
        if _dbg:
            print(f"[pages-pipeline] {label}: {time.time() - _t0:.2f}s",
                  file=sys.stderr, flush=True)

    cfg = config or PipelineConfig()
    records = blocking.pages_to_registry_records(blocking.extract_pages(pages))
    spr = preprocess(records)
    cad_pre = preprocess(cad)
    matches = match_registries(spr, cad_pre, cfg, preprocessed=True)
    _mark("match plan built")
    matches = matches.materialize()
    _mark("matches materialized")
    clusters = cluster_matches(matches, cfg)
    _mark("clusters computed")
    return {"records": spr, "matches": matches, "clusters": clusters}
