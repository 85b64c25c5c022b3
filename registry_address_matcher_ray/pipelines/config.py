"""Pipeline configuration (reference tunables, SURVEY.md §2.11).

Mirrors the reference's user-extension surface: matching-method selector
(``/root/reference/address.py:918-921``), fuzzy ``threshold`` (default 85,
``address.py:973-977``), ``max_records`` cap (``address.py:940-947``), plus the
engine-specific physical knobs (fuzzy plan selection, partition counts, actor pool
sizing) that the single-threaded reference has no equivalent for.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

METHODS = ("Comprehensive", "Exact Only", "Fuzzy Only", "Hybrid (Exact + Fuzzy)")


@dataclass
class PipelineConfig:
    # reference tunables
    threshold: float = 85.0
    method: str = "Comprehensive"
    max_records: Optional[int] = None

    # physical plan
    # "auto" (default: measure the preprocessed cadastre's byte size and pick
    # broadcast_dedup when it fits under ``broadcast_threshold_bytes``, else
    # the salted shuffle — SURVEY §7.3(4)) | "broadcast_dedup" (distinct
    # probes scored once job-wide, task-based stages) | "broadcast" (fused
    # single actor-pool stage) | "shuffle" (both sides large; salted
    # equi-join) — all row-identical
    fuzzy_strategy: str = "auto"
    #: auto-plan cutover: max cadastre in-memory bytes for the broadcast plans
    #: (the build side is collected to one Arrow table held per worker — size
    #: this to a fraction of worker heap, NOT of the cluster)
    broadcast_threshold_bytes: int = 2 << 30
    num_partitions: Optional[int] = None
    #: int = fixed actor count (provisioned eagerly); (min, max) = autoscaling
    fuzzy_concurrency: "int | Tuple[int, int]" = (2, 8)
    fuzzy_batch_size: int = 4096
    #: probe-side block count for the broadcast plan (tasks per actor stage);
    #: None -> 6x the max actor count. Task granularity bounds both actor-pool
    #: utilization and straggler size.
    score_blocks: Optional[int] = None
    #: shuffle-plan exact-match exclusion cutover: up to this many exact
    #: matches the matched-id set is driver-gathered and broadcast as an
    #: ``is_in`` filter (no extra exchange); above it the ids stay
    #: distributed and the residue is a hash-partitioned ``left_anti`` join
    #: (on an exact-heavy 100-TB corpus the set is corpus-sized) — same
    #: pattern as ``stages.dedup.WINNER_BROADCAST_LIMIT``
    exclude_broadcast_limit: int = 2_000_000

    @property
    def max_fuzzy_actors(self) -> int:
        c = self.fuzzy_concurrency
        return c if isinstance(c, int) else c[1]

    #: live in-flight progress counters (SURVEY A9): spawn a zero-CPU
    #: ProgressActor and count probe rows / match rows as blocks stream; poll
    #: ``linkage.LAST_PROGRESS`` (or your own handle) with ``snapshot.remote()``
    #: during the run. Off by default — one actor message per batch.
    progress: bool = False

    # clustering
    cluster_max_iters: int = 25
    # vectorized numpy local CC handles millions of edges in seconds on the
    # driver; beyond this the iterative distributed label-propagation path runs
    cluster_small_threshold: int = 5_000_000

    def __post_init__(self):
        if self.method not in METHODS:
            raise ValueError(f"unknown method {self.method!r}; one of {METHODS}")
        if self.fuzzy_strategy not in (
                "auto", "broadcast", "broadcast_dedup", "shuffle"):
            raise ValueError(
                "fuzzy_strategy must be 'auto', 'broadcast', "
                "'broadcast_dedup' or 'shuffle'")

    @property
    def do_exact(self) -> bool:
        return self.method in ("Comprehensive", "Exact Only", "Hybrid (Exact + Fuzzy)")

    @property
    def do_fuzzy(self) -> bool:
        return self.method in ("Comprehensive", "Fuzzy Only", "Hybrid (Exact + Fuzzy)")
