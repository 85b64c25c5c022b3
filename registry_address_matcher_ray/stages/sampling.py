"""Training-data sampling & splitting operators.

The reference pipeline has no dataset-split stage (it is a one-shot matcher,
SURVEY.md §0); a training-data engine at 100 TB needs deterministic,
shuffle-free splits and samples. Everything here is a stateless
``map_batches`` filter keyed on a cryptographic hash of a stable id — no
randomness, no global pass, identical output at any parallelism, and each
operator has an exact DuckDB oracle (``md5()`` hex-prefix thresholds compare
identically as strings on both sides).

- :func:`hash_split` — train/val/test assignment by md5(id) hex prefix.
- :func:`stratified_hash_sample` — keep ~frac of rows; because the hash is
  uniform and independent of any column, the rate holds within every stratum
  without a per-stratum pass.
- :func:`per_key_topn` — bounded per-key retention (e.g. "at most N docs per
  domain"): per-batch partial top-n combiner, then a final per-key top-n —
  the shuffle moves O(keys × n) rows, not the full table.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence, Tuple

import pandas as pd
import pyarrow as pa
import ray.data

__all__ = ["hash_split", "stratified_hash_sample", "per_key_topn"]


def _md5_prefix4(values) -> List[str]:
    # one md5 per row is irreducible in pure python; at cluster scale this maps
    # over Arrow string batches inside the task, never on the driver
    return [hashlib.md5(str(v).encode()).hexdigest()[:4] for v in values]


def hash_split(
    ds: ray.data.Dataset,
    id_col: str,
    boundaries: Sequence[Tuple[str, str]] = (("train", "cccc"), ("val", "e666")),
    rest_label: str = "test",
    out_col: str = "split",
) -> ray.data.Dataset:
    """Assign every row a deterministic split label from ``md5(id)``.

    ``boundaries`` are (label, hex-upper-bound) pairs over the first 4 hex
    chars of the digest, checked in order; rows above all bounds get
    ``rest_label``. Defaults give ~80/10/10. Oracle:
    ``CASE WHEN substr(md5(CAST(id AS VARCHAR)),1,4) < 'cccc' ...``.
    """

    def _assign(batch: pa.Table) -> pa.Table:
        h = _md5_prefix4(batch.column(id_col).to_pylist())
        labels = []
        for hx in h:
            for lab, bound in boundaries:
                if hx < bound:
                    labels.append(lab)
                    break
            else:
                labels.append(rest_label)
        return pa.table({id_col: batch.column(id_col),
                         out_col: pa.array(labels, pa.string())})

    return ds.select_columns([id_col]).map_batches(_assign, batch_format="pyarrow")


def stratified_hash_sample(
    ds: ray.data.Dataset,
    id_col: str,
    max_hex: str = "1999",
) -> ray.data.Dataset:
    """Keep rows with ``md5(id)[:4] < max_hex`` (default ~10%) — a
    deterministic uniform sample whose rate holds inside every stratum
    (the hash is independent of all payload columns). Pure per-batch filter:
    no shuffle, no state, reproducible across runs and parallelism levels.
    """

    def _filter(batch: pa.Table) -> pa.Table:
        h = _md5_prefix4(batch.column(id_col).to_pylist())
        mask = pa.array([x < max_hex for x in h], pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")


def per_key_topn(
    ds: ray.data.Dataset,
    key_col: str,
    order_by: Sequence[Tuple[str, bool]],
    n: int,
    columns: Sequence[str] | None = None,
) -> ray.data.Dataset:
    """At most ``n`` rows per key, picked by ``order_by`` ((col, descending)
    pairs; later columns break ties — make the last one a unique id so the
    result is deterministic).

    Two-phase: each batch first reduces locally to its own per-key top-n
    (vectorized pandas sort + groupby.head), so the groupby shuffle then moves
    at most ``n`` rows per (key, batch) instead of the whole table; the final
    per-key task re-applies the same top-n. Skew-safe: a hot key contributes
    ``n`` rows per upstream batch, bounding the largest group at
    ``n × num_batches`` rather than the key's full row count.
    """
    cols = list(columns) if columns else None
    if cols and key_col not in cols:
        cols = [key_col] + cols
    sort_cols = [c for c, _ in order_by]
    ascending = [not d for _, d in order_by]

    def _local_topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        return g.groupby(key_col, sort=False).head(n)

    proj = ds.select_columns(cols) if cols else ds
    partial = proj.map_batches(_local_topn, batch_format="pandas")
    return partial.groupby(key_col).map_groups(_local_topn, batch_format="pandas")
