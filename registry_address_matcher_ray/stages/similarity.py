"""Similarity search over embedding columns (list<float>).

Training-data-pipeline operators (target-spec additions; the reference has no
vector data). Two physical plans:

- :func:`knn_brute`: exact cosine top-k. The query matrix is broadcast once
  (``ray.put``); each batch computes a vectorized numpy matmul and emits only its
  LOCAL top-k per query (partial top-k combiner), so the final global merge sees
  ``k * num_batches`` rows, not the full corpus — the standard scale shape.
- :func:`knn_lsh`: random-hyperplane LSH bucketing — corpus and queries are
  signed into ``n_bits`` buckets; only same-bucket candidates are scored.
  Approximate; recall grows with fewer bits / multi-probe.
- :func:`embedding_neardup`: corpus self-join near-dup via the same LSH buckets +
  cosine verification + connected components.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from . import cluster


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # zero-copy-ish: flat values + reshape (fixed-length lists)
    flat = np.asarray(col.flatten(), dtype=np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_brute(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k: (query_idx, vec_id, score) rows, k per query.

    Deterministic tie-break: higher score first, then lower id."""
    q = _normalize_rows(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def _partial(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col).to_pylist())
        if m.shape[0] == 0:
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        scores = m @ qm.T  # (n, nq)
        topk = min(k, m.shape[0])
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            s = scores[:, qi]
            idx = np.argpartition(-s, topk - 1)[:topk]
            # deterministic order: score desc, id asc
            order = np.lexsort((ids[idx], -s[idx]))
            for j in idx[order]:
                out_q.append(qi)
                out_id.append(int(ids[j]))
                out_s.append(float(s[j]))
        return pa.table({"query_idx": pa.array(out_q, pa.int64()),
                         id_col: pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    out = (
        partials.sort_values(["query_idx", "score", id_col],
                             ascending=[True, False, True], kind="mergesort")
        .groupby("query_idx", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def _lsh_codes(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (m @ planes.T) >= 0
    codes = np.zeros(m.shape[0], dtype=np.int64)
    for b in range(planes.shape[0]):
        codes |= signs[:, b].astype(np.int64) << b
    return codes


def knn_lsh(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    seed: int = 7,
) -> pd.DataFrame:
    """Approximate cosine top-k: score only candidates sharing the query's
    random-hyperplane bucket. Same output shape as :func:`knn_brute`."""
    q = _normalize_rows(np.asarray(queries, dtype=np.float64))
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_bits, q.shape[1])
    q_codes = _lsh_codes(q, planes)
    q_ref = ray.put((q, q_codes, planes))

    def _partial(batch: pa.Table) -> pa.Table:
        qm, qc, pl = ray.get(q_ref)
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col).to_pylist())
        out_q, out_id, out_s = [], [], []
        if m.shape[0]:
            codes = _lsh_codes(m, pl)
            for qi in range(qm.shape[0]):
                mask = codes == qc[qi]
                if not mask.any():
                    continue
                sub, sub_ids = m[mask], ids[mask]
                s = sub @ qm[qi]
                topk = min(k, sub.shape[0])
                idx = np.argpartition(-s, topk - 1)[:topk]
                order = np.lexsort((sub_ids[idx], -s[idx]))
                for j in idx[order]:
                    out_q.append(qi)
                    out_id.append(int(sub_ids[j]))
                    out_s.append(float(s[j]))
        return pa.table({"query_idx": pa.array(out_q, pa.int64()),
                         id_col: pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    return (
        partials.sort_values(["query_idx", "score", id_col],
                             ascending=[True, False, True], kind="mergesort")
        .groupby("query_idx", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )


def embedding_neardup(
    ds: ray.data.Dataset,
    cosine_threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 10,
    seed: int = 7,
    max_group: int = 1000,
) -> Dict[str, ray.data.Dataset]:
    """Embedding-cosine near-dup: LSH-bucket self-join + cosine verify + components."""
    # discover dim from first row
    first = ds.take(1)
    dim = len(first[0][vec_col]) if first else 0
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_bits, dim) if dim else np.zeros((n_bits, 1))

    def _code(batch: pa.Table) -> pa.Table:
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        codes = _lsh_codes(m, planes) if m.shape[0] else np.array([], dtype=np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bucket": pa.array(codes, pa.int64()),
                vec_col: batch.column(vec_col),
            }
        )

    coded = ds.select_columns([id_col, vec_col]).map_batches(_code, batch_format="pyarrow")
    thr = float(cosine_threshold)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").head(max_group)
        ids = g[id_col].to_numpy()
        m = _normalize_rows(np.stack(g[vec_col].to_numpy())) if len(g) else np.zeros((0, 1))
        rows_a, rows_b, rows_s = [], [], []
        if len(g) > 1:
            sim = m @ m.T
            iu = np.triu_indices(len(g), 1)
            keep = sim[iu] >= thr
            rows_a = ids[iu[0][keep]].tolist()
            rows_b = ids[iu[1][keep]].tolist()
            rows_s = sim[iu][keep].tolist()
        return pd.DataFrame(
            {"id_a": pd.Series(rows_a, dtype="int64"),
             "id_b": pd.Series(rows_b, dtype="int64"),
             "cosine": pd.Series(rows_s, dtype="float64")}
        )

    pairs = coded.groupby("bucket").map_groups(_pairs, batch_format="pandas").materialize()
    if pairs.count() == 0:
        pairs = ray.data.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
        )
    clusters = cluster.connected_components(pairs, "id_a", "id_b")
    return {"pairs": pairs, "clusters": clusters}
