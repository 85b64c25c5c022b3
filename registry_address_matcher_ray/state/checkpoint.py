"""Stage-boundary checkpointing with per-partition lineage and resume.

The reference has no checkpointing at all — its closest analogue is Streamlit
``st.cache_data`` memoization and session-state result caching
(``/root/reference/address.py:96,240,1226-1237``). At 100 TB a failed run must not
redo finished work, so the new engine persists each stage boundary as a parquet
directory plus a ``_manifest.json`` recording:

- the stage's **fingerprint** (hash of input-file identity, config, code-version tag
  and upstream-stage fingerprints — a lineage chain), and
- **per-partition lineage**: one manifest row per written parquet fragment with its
  path, row count and byte size.

Resume semantics: ``CheckpointManager.run_stage`` re-reads a stage from disk iff its
manifest exists, its fingerprint matches, and every listed partition file is present
with the recorded size; otherwise the stage recomputes. Partial stage output is never
visible: data is written to a hidden staging dir and atomically renamed, and the
manifest is written last (write temp + ``os.replace``).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import tempfile
import time
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import ray.data

MANIFEST_NAME = "_manifest.json"
#: bump when stage semantics change so stale checkpoints invalidate themselves
CODE_VERSION = "1"


def file_fingerprint(path: str) -> dict:
    """Identity of an input file/dir: paths + sizes + mtimes (no content read)."""
    entries = []
    paths = sorted(glob.glob(os.path.join(path, "**", "*"), recursive=True)) if os.path.isdir(path) else [path]
    for p in paths:
        if os.path.isfile(p):
            st = os.stat(p)
            entries.append({"path": p, "size": st.st_size, "mtime_ns": st.st_mtime_ns})
    return {"root": path, "files": entries}


def fingerprint(*parts) -> str:
    """Stable hash over JSON-serializable parts (inputs, config, upstream chain)."""
    payload = json.dumps(parts, sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:24]


@dataclass
class StageResult:
    name: str
    dataset: ray.data.Dataset
    fingerprint: str
    resumed: bool
    rows: int
    wall_s: float
    partitions: list = field(default_factory=list)


class CheckpointManager:
    """Directory of stage checkpoints for one logical pipeline run.

    ``root/<stage>/`` holds the stage's parquet partitions and manifest. Stage
    fingerprints chain through upstream stages, so editing an input or config
    invalidates exactly the downstream suffix of the DAG.
    """

    #: config fields that do not change data semantics (pure observability)
    #: and therefore must not invalidate finished stages
    NON_SEMANTIC_CONFIG = ("progress",)

    def __init__(self, root: str, run_config: Optional[dict] = None):
        self.root = root
        self.run_config = {k: v for k, v in (run_config or {}).items()
                           if k not in self.NON_SEMANTIC_CONFIG}
        os.makedirs(root, exist_ok=True)
        self.stages: dict[str, StageResult] = {}

    # ---------------------------------------------------------------- internals
    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), MANIFEST_NAME)

    def _load_valid_manifest(self, name: str, fp: str) -> Optional[dict]:
        mpath = self._manifest_path(name)
        if not os.path.exists(mpath):
            return None
        try:
            with open(mpath) as f:
                manifest = json.load(f)
        except (json.JSONDecodeError, OSError):
            return None
        if manifest.get("fingerprint") != fp:
            return None
        sdir = self._stage_dir(name)
        for part in manifest.get("partitions", []):
            p = os.path.join(sdir, part["file"])
            if not os.path.exists(p) or os.path.getsize(p) != part["bytes"]:
                return None
        return manifest

    # ------------------------------------------------------------------ public
    def stage_fingerprint(
        self,
        name: str,
        inputs: Sequence[str] = (),
        upstream: Sequence[str] = (),
        extra: Optional[dict] = None,
    ) -> str:
        """Lineage-chained fingerprint for a stage.

        ``inputs``: external file/dir paths; ``upstream``: names of prior stages this
        one consumes (their fingerprints are folded in, forming the chain).
        """
        up = []
        for u in upstream:
            if u not in self.stages:
                raise KeyError(f"upstream stage {u!r} has not run/resumed yet")
            up.append({"stage": u, "fingerprint": self.stages[u].fingerprint})
        return fingerprint(
            CODE_VERSION, name, [file_fingerprint(p) for p in inputs],
            self.run_config, up, extra or {},
        )

    def run_stage(
        self,
        name: str,
        fn: Callable[[], ray.data.Dataset],
        inputs: Sequence[str] = (),
        upstream: Sequence[str] = (),
        extra: Optional[dict] = None,
        min_rows_per_file: int = 200_000,
    ) -> StageResult:
        """Return the stage's Dataset, resuming from a valid checkpoint if present.

        On recompute: ``fn()`` runs, output streams to a staging dir, the dir is
        atomically renamed into place, and the manifest (fingerprint + per-partition
        lineage) commits last.
        """
        fp = self.stage_fingerprint(name, inputs, upstream, extra)
        t0 = time.monotonic()
        manifest = self._load_valid_manifest(name, fp)
        sdir = self._stage_dir(name)
        if manifest is not None:
            files = [os.path.join(sdir, p["file"]) for p in manifest["partitions"]]
            ds = ray.data.read_parquet(files) if files else ray.data.from_arrow(
                __import__("pyarrow").table({})
            )
            res = StageResult(name, ds, fp, True, manifest["total_rows"],
                              time.monotonic() - t0, manifest["partitions"])
            self.stages[name] = res
            return res

        ds = fn()
        parent = os.path.dirname(sdir) or "."
        staging = tempfile.mkdtemp(prefix=f".staging-{name}-", dir=parent)
        try:
            ds.write_parquet(staging, min_rows_per_file=min_rows_per_file)
            partitions = []
            total_rows = 0
            for f in sorted(os.listdir(staging)):
                p = os.path.join(staging, f)
                import pyarrow.parquet as pq

                meta = pq.read_metadata(p)
                partitions.append({"file": f, "rows": meta.num_rows,
                                   "bytes": os.path.getsize(p)})
                total_rows += meta.num_rows
            if os.path.exists(sdir):
                shutil.rmtree(sdir)
            os.rename(staging, sdir)
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        manifest = {
            "stage": name,
            "fingerprint": fp,
            "code_version": CODE_VERSION,
            "total_rows": total_rows,
            "partitions": partitions,
            "wall_s": round(time.monotonic() - t0, 3),
        }
        mtmp = self._manifest_path(name) + ".tmp"
        with open(mtmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(mtmp, self._manifest_path(name))

        files = [os.path.join(sdir, p["file"]) for p in partitions]
        out = ray.data.read_parquet(files) if files else ds
        res = StageResult(name, out, fp, False, total_rows,
                          time.monotonic() - t0, partitions)
        self.stages[name] = res
        return res
