"""Parquet ingest with schema validation, sinks, export packaging.

Reference parity (SURVEY.md §2.1):
- S1/S2/S3 readers -> :func:`read_registry` (``ray.data.read_parquet`` + the same
  required-column validation as ``/root/reference/address.py:104-109``; CSV via
  :func:`read_registry_csv`). The DB/REST connectors are transport details the graft
  replaces with parquet.
- S5/S6 sinks -> :func:`write_dataset` (partitioned parquet directory, atomic rename
  so failed runs never expose partial output; resumable — SURVEY §4 checkpoint row).
- S7 ZIP export package -> :func:`create_export_package`
  (``/root/reference/address.py:833-872``): zip of matched/unmatched CSV + quality and
  stats JSON, built from already-written engine outputs on the driver.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import zipfile
from typing import Iterable, Optional

import numpy as np
import pyarrow as pa
import ray.data

REQUIRED_COLUMNS = ("STREET_NAME", "HOUSE", "BUILDING")


class SchemaValidationError(ValueError):
    pass


def validate_registry_schema(schema: pa.Schema, registry_name: str = "registry") -> None:
    """Reject ingestion when required columns are missing (address.py:104-109)."""
    missing = [c for c in REQUIRED_COLUMNS if c not in schema.names]
    if missing:
        raise SchemaValidationError(
            f"Missing required columns in {registry_name}: {missing}"
        )


def read_parquet_clean(
    path: str, columns: Optional[Iterable[str]] = None, **read_kwargs
) -> ray.data.Dataset:
    """``read_parquet`` with the file schema's key/value metadata stripped.

    pandas-written parquet carries a ``b'pandas'`` schema-metadata blob that
    makes every downstream ``pa.Schema`` unhashable on this pyarrow build, so
    Ray's ``unify_schemas`` logs "Failed to hash the schemas" on every shuffle
    that touches the lineage. Passing an explicit metadata-free schema to the
    read means every block is born clean — no per-stage strip projections.
    """
    import glob as _glob

    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        inside = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if inside:
            probe = inside[0]
    try:
        schema = pq.read_schema(probe).remove_metadata()
        if columns:  # pruned reads yield pruned batches — schema must match
            cols = list(columns)
            schema = pa.schema([schema.field(c) for c in cols])
    except Exception:
        schema = None  # non-local / exotic layout: fall back to inference
    return ray.data.read_parquet(
        path, schema=schema, columns=list(columns) if columns else None,
        **read_kwargs,
    )


def read_registry(
    path: str,
    registry_name: str = "registry",
    columns: Optional[Iterable[str]] = None,
) -> ray.data.Dataset:
    """Read a registry parquet table and validate its schema at ingest time.

    ``columns`` prunes at the read (only needed columns leave storage).
    """
    ds = read_parquet_clean(path, columns=columns)
    validate_registry_schema(ds.schema(), registry_name)
    return ds


def read_registry_csv(path: str, registry_name: str = "registry") -> ray.data.Dataset:
    ds = ray.data.read_csv(path)
    validate_registry_schema(ds.schema(), registry_name)
    return ds


def read_registry_jsonl(path: str, registry_name: str = "registry") -> ray.data.Dataset:
    """Read a registry from JSON-lines (one object per line — the webtext
    interchange format; same required-column validation as :func:`read_registry`)."""
    ds = ray.data.read_json(path)
    validate_registry_schema(ds.schema(), registry_name)
    return ds


def read_jsonl(path: str, columns: Optional[Iterable[str]] = None) -> ray.data.Dataset:
    """Generic JSON-lines reader (documents/pages dumps). Column pruning happens
    after parse — JSONL has no columnar projection, prefer parquet at scale."""
    ds = ray.data.read_json(path)
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


def write_jsonl_dataset(ds: ray.data.Dataset, out_dir: str) -> str:
    """JSON-lines sink with the same atomic tmp-dir + rename protocol as
    :func:`write_dataset` (export/interchange format; parquet is primary)."""
    parent = os.path.dirname(os.path.abspath(out_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".staging-", dir=parent)
    try:
        ds.write_json(tmp)
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.rename(tmp, out_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return out_dir


def read_pages(path: str, columns: Optional[Iterable[str]] = None) -> ray.data.Dataset:
    """Read a Common-Crawl-style pages table (url, warc_ts, html, text, lang)."""
    return read_parquet_clean(path, columns=columns)


def write_dataset(ds: ray.data.Dataset, out_dir: str, min_rows_per_file: int = 200_000) -> str:
    """Write a Dataset to a parquet directory atomically (tmp dir + rename)."""
    parent = os.path.dirname(os.path.abspath(out_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".staging-", dir=parent)
    try:
        ds.write_parquet(tmp, min_rows_per_file=min_rows_per_file)
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.rename(tmp, out_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return out_dir


def write_csv_dataset(ds: ray.data.Dataset, out_dir: str) -> str:
    """CSV sink (reference S5/S6, ``/root/reference/address.py:1622-1639``):
    partitioned CSV directory with the same atomic tmp-dir + rename protocol as
    :func:`write_dataset` (parquet remains the engine's primary sink; CSV is
    the reference-parity export format)."""
    parent = os.path.dirname(os.path.abspath(out_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".staging-", dir=parent)
    try:
        ds.write_csv(tmp)
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.rename(tmp, out_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return out_dir


def create_export_package(
    matches_path: str,
    unmatched_path: str,
    quality_metrics: dict,
    stats: dict,
    out_zip: str,
) -> str:
    """ZIP package mirroring /root/reference/address.py:833-872: matched + unmatched
    CSVs plus quality/stats JSON. Consumes engine parquet outputs written earlier."""
    import pyarrow.parquet as pq
    import pyarrow.csv as pacsv

    os.makedirs(os.path.dirname(os.path.abspath(out_zip)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, src in (("matched_addresses.csv", matches_path),
                          ("unmatched_addresses.csv", unmatched_path)):
            table = pq.read_table(src)
            buf = pa.BufferOutputStream()
            pacsv.write_csv(table, buf)
            zf.writestr(name, buf.getvalue().to_pybytes())
        zf.writestr("quality_metrics.json", json.dumps(quality_metrics, indent=2, default=str))
        zf.writestr("match_statistics.json", json.dumps(stats, indent=2, default=str))
    return out_zip


def write_partitioned_resumable(
    ds: ray.data.Dataset,
    out_dir: str,
    key_col: str,
    num_buckets: int = 64,
    bucket_col: str = "bucket",
) -> dict:
    """Hash-bucketed parquet sink with per-bucket commit and resume.

    Every row lands in ``out_dir/bucket=NNN/`` chosen by
    ``crc32(str(key)) % num_buckets`` — deterministic, so a re-run assigns
    identical buckets. Committed buckets (directory present with a
    ``_SUCCESS`` marker) are SKIPPED at the read side with a streaming
    filter, the remaining rows are written in ONE pass via Ray's native
    ``partition_cols`` writer into a staging dir, and each completed bucket
    directory is atomically renamed into place + marked. Commit granularity
    is the bucket: a run that dies mid-write loses only its uncommitted
    buckets; a run that dies mid-commit loses nothing. This is the
    "one directory per key range, failed run skips finished partitions"
    output layout a 100-TB job needs.

    Returns ``{"written": [...], "skipped": [...], "out_dir": out_dir}``.
    """
    import zlib

    os.makedirs(out_dir, exist_ok=True)
    done = {
        d for d in os.listdir(out_dir)
        if d.startswith(f"{bucket_col}=")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
    }
    done_ids = {int(d.split("=", 1)[1]) for d in done}

    def _assign(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_pylist()
        buckets = np.array(
            [zlib.crc32(str(k).encode()) % num_buckets for k in keys],
            dtype=np.int64)
        t = b.append_column(bucket_col, pa.array(buckets))
        if done_ids:
            t = t.filter(pa.array(~np.isin(buckets, list(done_ids))))
        return t.replace_schema_metadata(None)

    pending = ds.map_batches(_assign, batch_format="pyarrow")
    staging = tempfile.mkdtemp(prefix=".staging-", dir=out_dir)
    written: list = []
    try:
        pending.write_parquet(staging, partition_cols=[bucket_col])
        for d in sorted(os.listdir(staging)):
            if not d.startswith(f"{bucket_col}="):
                continue
            target = os.path.join(out_dir, d)
            if os.path.exists(target):  # stale uncommitted remnant
                shutil.rmtree(target)
            os.rename(os.path.join(staging, d), target)
            with open(os.path.join(target, "_SUCCESS"), "w"):
                pass
            written.append(d)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return {"written": written, "skipped": sorted(done),
            "out_dir": out_dir}


def read_partitioned(out_dir: str, bucket_col: str = "bucket") -> ray.data.Dataset:
    """Read back a :func:`write_partitioned_resumable` directory (committed
    buckets only), restoring the bucket id from the hive path."""
    files = [
        os.path.join(out_dir, d, f)
        for d in sorted(os.listdir(out_dir))
        if d.startswith(f"{bucket_col}=")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
        for f in sorted(os.listdir(os.path.join(out_dir, d)))
        if f.endswith(".parquet")
    ]
    return ray.data.read_parquet(files)


def write_ipc_dataset(ds: ray.data.Dataset, out_dir: str) -> str:
    """Arrow IPC (Feather V2) sink: one ``.arrow`` file per block, written
    inside map_batches tasks (Ray has no native IPC sink), atomic tmp-dir +
    rename like :func:`write_dataset`. Zero-copy interchange format for
    downstream Arrow/Polars/DuckDB consumers."""
    import pyarrow.feather as paf

    parent = os.path.dirname(os.path.abspath(out_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".staging-", dir=parent)

    def _write(b: pa.Table) -> pa.Table:
        import uuid
        paf.write_feather(b, os.path.join(tmp, f"{uuid.uuid4().hex}.arrow"),
                          compression="uncompressed")
        return b.slice(0, 0)

    try:
        ds.map_batches(_write, batch_format="pyarrow").materialize()
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.rename(tmp, out_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return out_dir


def read_ipc(path: str, columns: Optional[Iterable[str]] = None) -> ray.data.Dataset:
    """Arrow IPC (Feather V2) reader: each ``.arrow`` file becomes one read
    task (parallel, zero-copy mmap per task); column pruning at the read."""
    import pyarrow.feather as paf

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".arrow") or f.endswith(".feather"))
    else:
        files = [path]
    cols = list(columns) if columns is not None else None

    def _load(b: pa.Table) -> pa.Table:
        out = [paf.read_table(p, columns=cols, memory_map=True)
               for p in b.column("path").to_pylist()]
        return pa.concat_tables(out) if out else pa.table({})

    idx = ray.data.from_arrow(pa.table({"path": pa.array(files)}))
    return idx.repartition(max(1, len(files))).map_batches(
        _load, batch_format="pyarrow")


def write_sharded_resumable(
    ds: ray.data.Dataset,
    out_dir: str,
    shard_col: str = "shard",
) -> dict:
    """Parquet sink over a PRECOMPUTED integer shard column with per-shard
    atomic commit + resume — the output half of the training-corpus shuffle
    (``stages.sampling.shuffled_shards`` assigns the column; this writes
    ``out_dir/shard=N/``).

    Same commit protocol as :func:`write_partitioned_resumable`: committed
    shards (``_SUCCESS`` marker present) are filtered out streaming at the
    read side, the remainder is written once via Ray's native
    ``partition_cols`` writer into a staging dir, and each shard directory
    is renamed into place atomically. A crashed run re-invokes with the
    same inputs and skips finished shards. Within-shard row order across
    file fragments is restored by sorting on the ``pos_in_shard`` column
    the sharder emits (documented contract; parquet files are fragments).

    Returns ``{"written": [...], "skipped": [...], "out_dir": out_dir}``.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = {
        d for d in os.listdir(out_dir)
        if d.startswith(f"{shard_col}=")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
    }
    done_ids = {int(d.split("=", 1)[1]) for d in done}

    def _skip_done(b: pa.Table) -> pa.Table:
        if not done_ids:
            return b
        vals = b.column(shard_col).to_numpy(zero_copy_only=False)
        return b.filter(pa.array(~np.isin(vals, list(done_ids))))

    pending = ds.map_batches(_skip_done, batch_format="pyarrow")
    staging = tempfile.mkdtemp(prefix=".staging-", dir=out_dir)
    written: list = []
    try:
        pending.write_parquet(staging, partition_cols=[shard_col])
        for d in sorted(os.listdir(staging)):
            if not d.startswith(f"{shard_col}="):
                continue
            target = os.path.join(out_dir, d)
            if os.path.exists(target):  # stale uncommitted remnant
                shutil.rmtree(target)
            os.rename(os.path.join(staging, d), target)
            with open(os.path.join(target, "_SUCCESS"), "w"):
                pass
            written.append(d)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return {"written": written, "skipped": sorted(done),
            "out_dir": out_dir}
