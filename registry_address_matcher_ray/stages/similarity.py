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

from ..state import metrics as _metrics
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


def _kmeans_fit(sample: np.ndarray, nlist: int, iters: int = 10,
                seed: int = 7) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample (numpy only).

    The coarse quantizer of the IVF index: centroids are unit-normalized, ties
    broken by lowest centroid index (argmin on the negated similarity)."""
    rng = np.random.RandomState(seed)
    sample = _normalize_rows(sample)
    n = sample.shape[0]
    nlist = min(nlist, n)
    centers = sample[rng.choice(n, size=nlist, replace=False)]
    for _ in range(iters):
        sim = sample @ centers.T
        assign = np.argmax(sim, axis=1)
        for c in range(nlist):
            members = sample[assign == c]
            if len(members):
                centers[c] = members.mean(axis=0)
        centers = _normalize_rows(centers)
    return centers


def knn_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    train_sample: int = 10_000,
    seed: int = 7,
) -> pd.DataFrame:
    """IVF approximate cosine top-k — the scale path for similarity search.

    1. coarse quantizer: spherical k-means centroids trained once on a bounded
       driver-side sample (``ds.limit(train_sample)``), broadcast via ray.put;
    2. each batch assigns its vectors to their nearest centroid (one matmul)
       and scores ONLY vectors whose list is among the query's ``nprobe``
       closest centroids — per-batch work drops by ~``nprobe/nlist``;
    3. local top-k per batch, tiny global merge (k x num_batches rows).

    Same output shape/tie-breaks as :func:`knn_brute`; recall grows with
    ``nprobe`` (= exact when ``nprobe == nlist``).
    """
    q = _normalize_rows(np.asarray(queries, dtype=np.float64))
    sample_rows = ds.select_columns([vec_col]).limit(train_sample).take_all()
    sample = np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64)
    centers = _kmeans_fit(sample, nlist, seed=seed)
    # the query's probed lists
    q_lists = np.argsort(-(q @ centers.T), axis=1)[:, : min(nprobe, len(centers))]
    state_ref = ray.put((q, centers, q_lists))

    def _partial(batch: pa.Table) -> pa.Table:
        qm, cen, ql = ray.get(state_ref)
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col).to_pylist())
        out_q, out_id, out_s = [], [], []
        if m.shape[0]:
            assign = np.argmax(m @ cen.T, axis=1)
            for qi in range(qm.shape[0]):
                mask = np.isin(assign, ql[qi])
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
    bands: int = 8,
    band_bits: int = 4,
    seed: int = 7,
    max_group: int = 5000,
) -> Dict[str, ray.data.Dataset]:
    """Embedding-cosine near-dup: BANDED random-hyperplane LSH + verify + components.

    Scale shape (mirrors the MinHash construction in stages/dedup.py — the
    round-1 single-table variant shipped full vectors through the groupby and
    silently truncated hot buckets):

    1. ``bands`` independent hyperplane tables of ``band_bits`` bits each; a
       pair is a candidate if ANY band code matches (recall ~
       ``1-(1-p^r)^B`` for sign-agreement probability p) — tune ``bands`` up /
       ``band_bits`` down to widen the net;
    2. melt is IDS-ONLY: (id, band-folded bucket) rows — vectors never enter
       the all-to-all exchange;
    3. candidate pairs via the shared hot-bucket-prefiltered pairing
       (oversized buckets are truncated deterministically AND LOGGED);
    4. verify joins the vectors back onto the candidate-id set (broadcast is
       O(candidate ids), never O(corpus)) and computes exact cosine;
    5. transitive clusters over verified pairs.
    """
    from .dedup import (
        _bucket_candidate_pairs,
        _candidate_id_set,
        _distinct_pairs_with_value,
        _semi_join_ids_arrow,
    )

    first = ds.take(1)
    dim = len(first[0][vec_col]) if first else 0
    rng = np.random.RandomState(seed)
    planes = rng.randn(bands * band_bits, dim) if dim else np.zeros((bands * band_bits, 1))
    planes_ref = ray.put(planes)
    thr = float(cosine_threshold)
    empty_pairs = pa.table({"id_a": pa.array([], pa.int64()),
                            "id_b": pa.array([], pa.int64()),
                            "cosine": pa.array([], pa.float64())})

    def _melt(batch: pa.Table) -> pa.Table:
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        n = m.shape[0]
        if not n:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], batch.schema.field(id_col).type)})
        pl = ray.get(planes_ref)
        signs = (m @ pl.T) >= 0
        ids = batch.column(id_col)
        id_chunks, buckets = [], []
        for b in range(bands):
            seg = signs[:, b * band_bits:(b + 1) * band_bits]
            code = np.zeros(n, dtype=np.int64)
            for j in range(band_bits):
                code |= seg[:, j].astype(np.int64) << j
            buckets.append(code | (np.int64(b) << np.int64(band_bits)))
            id_chunks.append(ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
                             else ids)
        return pa.table({
            "bucket": pa.array(np.concatenate(buckets), pa.int64()),
            id_col: pa.concat_arrays(id_chunks),
        })

    melted = ds.select_columns([id_col, vec_col]).map_batches(
        _melt, batch_format="pyarrow")
    cand = _bucket_candidate_pairs(melted, "bucket", id_col, max_group,
                                   stage="lsh_cosine").materialize()
    _metrics.log_truncation_summary("lsh_cosine")
    if cand.count() == 0:
        pairs = ray.data.from_arrow(empty_pairs)
        return {"pairs": pairs,
                "clusters": cluster.connected_components(pairs, "id_a", "id_b")}

    # join vectors back onto the candidate ids (O(candidate ids) broadcast)
    cand_ids = _candidate_id_set(cand)
    vec_rows: Dict = {}
    for b in _semi_join_ids_arrow(
            ds.select_columns([id_col, vec_col]), id_col, cand_ids
    ).iter_batches(batch_format="pyarrow"):
        m = _normalize_rows(_batch_matrix(b, vec_col))
        for i, v in zip(b.column(id_col).to_pylist(), m):
            vec_rows[i] = v
    vec_ref = ray.put(vec_rows)

    def _verify(batch: pa.Table) -> pa.Table:
        vecs = ray.get(vec_ref)
        a = batch.column("id_a").to_pylist()
        b = batch.column("id_b").to_pylist()
        if not a:
            return empty_pairs
        ma = np.stack([vecs[x] for x in a])
        mb = np.stack([vecs[y] for y in b])
        cos = np.einsum("ij,ij->i", ma, mb)
        out = pa.table({"id_a": batch.column("id_a"),
                        "id_b": batch.column("id_b"),
                        "cosine": pa.array(cos, pa.float64())})
        return out.filter(pc.greater_equal(out.column("cosine"), thr))

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    pairs = _distinct_pairs_with_value(
        cand.map_batches(_verify, batch_format="pyarrow"), "cosine", id_type,
    ).materialize()
    if pairs.count() == 0:
        pairs = ray.data.from_arrow(empty_pairs)
    clusters = cluster.connected_components(pairs, "id_a", "id_b")
    return {"pairs": pairs, "clusters": clusters}


def _pq_fit(sample: np.ndarray, m_sub: int, nbits: int, iters: int = 12,
            seed: int = 7) -> np.ndarray:
    """Per-subspace L2 k-means codebooks: (m_sub, 2**nbits, d_sub)."""
    rng = np.random.RandomState(seed)
    n, d = sample.shape
    d_sub = d // m_sub
    ncent = min(1 << nbits, n)
    books = np.zeros((m_sub, ncent, d_sub))
    for s in range(m_sub):
        sub = sample[:, s * d_sub:(s + 1) * d_sub]
        cen = sub[rng.choice(n, size=ncent, replace=False)].copy()
        for _ in range(iters):
            # assign by L2: argmax(x.c - |c|^2/2), one matmul per iter
            sim = sub @ cen.T - 0.5 * (cen * cen).sum(axis=1)
            assign = np.argmax(sim, axis=1)
            for c in range(ncent):
                members = sub[assign == c]
                if len(members):
                    cen[c] = members.mean(axis=0)
        books[s] = cen
    return books


def knn_pq(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 8,
    nbits: int = 6,
    train_sample: int = 10_000,
    seed: int = 7,
) -> pd.DataFrame:
    """Product-quantization approximate cosine top-k — the MEMORY scale path.

    Each corpus vector compresses to ``m_sub`` sub-codes (``m_sub`` bytes at
    ``nbits<=8`` vs ``8*d`` float bytes — 64x at d=64/m_sub=8): codebooks are
    per-subspace L2 k-means trained once on a bounded driver-side sample and
    broadcast; each batch encodes itself (one matmul per subspace) and scores
    queries by ADC — asymmetric distance computation: the query precomputes a
    ``(m_sub, 2**nbits)`` inner-product table against the sub-centroids, so a
    vector's approximate cosine is ``m_sub`` TABLE LOOKUPS (fancy indexing
    over the whole batch at once), never a full-dimension dot product. Local
    top-k per batch, tiny global merge — same shape/tie-breaks as
    :func:`knn_brute`, ``score`` is the ADC approximation. At 100 TB the
    encoded corpus (codes + ids) is what a re-ranking pass would keep in RAM.
    """
    q = _normalize_rows(np.asarray(queries, dtype=np.float64))
    d = q.shape[1]
    assert d % m_sub == 0, "dim must divide m_sub (pad embeddings upstream)"
    sample_rows = ds.select_columns([vec_col]).limit(train_sample).take_all()
    sample = _normalize_rows(
        np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64))
    books = _pq_fit(sample, m_sub, nbits, seed=seed)
    ncent = books.shape[1]
    d_sub = d // m_sub
    # per-query ADC tables: T[qi, s, j] = q_sub . centroid_j
    tables = np.einsum("qsd,scd->qsc",
                       q.reshape(q.shape[0], m_sub, d_sub), books)
    state_ref = ray.put((books, tables))

    def _partial(batch: pa.Table) -> pa.Table:
        bks, tbl = ray.get(state_ref)
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col).to_pylist())
        out_q, out_id, out_s = [], [], []
        if m.shape[0]:
            # encode: per subspace argmax(x.c - |c|^2/2)
            codes = np.empty((m.shape[0], m_sub), dtype=np.int64)
            for s in range(m_sub):
                sub = m[:, s * d_sub:(s + 1) * d_sub]
                cen = bks[s]
                codes[:, s] = np.argmax(
                    sub @ cen.T - 0.5 * (cen * cen).sum(axis=1), axis=1)
            for qi in range(tbl.shape[0]):
                # ADC: sum of table lookups, vectorized over the batch
                s_scores = tbl[qi][np.arange(m_sub)[None, :], codes].sum(axis=1)
                topk = min(k, m.shape[0])
                idx = np.argpartition(-s_scores, topk - 1)[:topk]
                order = np.lexsort((ids[idx], -s_scores[idx]))
                for j in idx[order]:
                    out_q.append(qi)
                    out_id.append(int(ids[j]))
                    out_s.append(float(s_scores[j]))
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


def knn_ivfpq(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    m_sub: int = 16,
    nbits: int = 8,
    train_sample: int = 10_000,
    seed: int = 7,
) -> pd.DataFrame:
    """IVF-PQ: coarse-quantizer pruning x PQ-compressed scoring — the
    composition production vector indexes ship (FAISS ``IVFxx,PQyy`` style).

    One bounded driver-side sample trains BOTH structures: the spherical
    k-means coarse centroids (:func:`knn_ivf`) and the per-subspace PQ
    codebooks on RESIDUAL-free subvectors (:func:`knn_pq`); both broadcast
    once. Each batch assigns vectors to their nearest coarse list (one
    matmul), keeps only vectors in the query's ``nprobe`` lists, and scores
    the survivors by ADC table lookups — compute falls by ~``nprobe/nlist``
    AND per-vector memory by ~``8*d/m_sub``. Same output shape/tie-breaks as
    :func:`knn_brute`; ``score`` is the ADC approximation.
    """
    q = _normalize_rows(np.asarray(queries, dtype=np.float64))
    d = q.shape[1]
    assert d % m_sub == 0, "dim must divide m_sub"
    sample_rows = ds.select_columns([vec_col]).limit(train_sample).take_all()
    sample = _normalize_rows(
        np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64))
    centers = _kmeans_fit(sample, nlist, seed=seed)
    books = _pq_fit(sample, m_sub, nbits, seed=seed)
    d_sub = d // m_sub
    q_lists = np.argsort(-(q @ centers.T), axis=1)[:, : min(nprobe, len(centers))]
    tables = np.einsum("qsd,scd->qsc",
                       q.reshape(q.shape[0], m_sub, d_sub), books)
    state_ref = ray.put((centers, books, q_lists, tables))

    def _partial(batch: pa.Table) -> pa.Table:
        cen, bks, ql, tbl = ray.get(state_ref)
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col).to_pylist())
        out_q, out_id, out_s = [], [], []
        if m.shape[0]:
            assign = np.argmax(m @ cen.T, axis=1)
            codes = np.empty((m.shape[0], m_sub), dtype=np.int64)
            for s in range(m_sub):
                sub = m[:, s * d_sub:(s + 1) * d_sub]
                cb = bks[s]
                codes[:, s] = np.argmax(
                    sub @ cb.T - 0.5 * (cb * cb).sum(axis=1), axis=1)
            for qi in range(tbl.shape[0]):
                mask = np.isin(assign, ql[qi])
                if not mask.any():
                    continue
                sub_codes, sub_ids = codes[mask], ids[mask]
                s_scores = tbl[qi][np.arange(m_sub)[None, :],
                                   sub_codes].sum(axis=1)
                topk = min(k, sub_codes.shape[0])
                idx = np.argpartition(-s_scores, topk - 1)[:topk]
                order = np.lexsort((sub_ids[idx], -s_scores[idx]))
                for j in idx[order]:
                    out_q.append(qi)
                    out_id.append(int(sub_ids[j]))
                    out_s.append(float(s_scores[j]))
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


def semantic_dedup(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: Optional[str] = None,
    threshold: float = 0.95,
    nlist: int = 16,
    train_sample: int = 10_000,
    seed: int = 7,
    chunk: int = 1024,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023): within-cluster semantic pruning.

    A vector is DROPPED iff some other vector in the same cluster has cosine
    similarity >= ``threshold`` and a smaller id — a deterministic, order-free
    restatement of the paper's keep-one-per-near-dup-group rule (the paper
    keeps the member farthest from the centroid; min-id is the engine's
    canonical tie-break everywhere else, and it makes the operator exactly
    SQL-checkable). Returns the KEPT rows as ``(id_col, cluster)``.

    Clustering: pass ``cluster_col`` to prune inside existing groups (exact,
    oracle-checkable), or leave ``None`` to cluster by the same bounded-sample
    spherical k-means coarse quantizer the IVF index uses (the scale path for
    unlabeled corpora). Per-cluster work is O(|cluster|^2) multiply-adds but
    O(chunk x |cluster|) memory — the SemDeDup premise is that k-means keeps
    clusters small relative to the corpus (n/nlist on average).
    """
    if cluster_col is None:
        sample_rows = ds.select_columns([vec_col]).limit(train_sample).take_all()
        sample = np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64)
        centers_ref = ray.put(_kmeans_fit(sample, nlist, seed=seed))

        def _assign(batch: pa.Table) -> pa.Table:
            cen = ray.get(centers_ref)
            m = _normalize_rows(_batch_matrix(batch, vec_col))
            assign = (np.argmax(m @ cen.T, axis=1) if m.shape[0]
                      else np.array([], dtype=np.int64))
            return pa.table({
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
                "cluster": pa.array(assign.astype(np.int64), pa.int64()),
            })

        clustered = ds.map_batches(_assign, batch_format="pyarrow")
    else:
        def _project(batch: pa.Table) -> pa.Table:
            return pa.table({
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
                "cluster": batch.column(cluster_col),
            })

        clustered = ds.map_batches(_project, batch_format="pyarrow")

    def _prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        m = _normalize_rows(np.asarray(
            [np.asarray(v, dtype=np.float64) for v in df[vec_col]]))
        n = m.shape[0]
        keep = np.ones(n, dtype=bool)
        for s in range(1, n, chunk):
            e = min(n, s + chunk)
            sims = m[s:e] @ m[:e].T
            earlier = np.arange(e)[None, :] < np.arange(s, e)[:, None]
            keep[s:e] = ~np.logical_and(sims >= threshold, earlier).any(axis=1)
        return pd.DataFrame({id_col: df[id_col][keep],
                             "cluster": df["cluster"][keep]})

    return clustered.groupby("cluster").map_groups(_prune, batch_format="pandas")


def _hash_buckets(tokens, dim: int, cache: dict):
    """token -> (bucket, sign) via md5, matching DuckDB's md5_number_lower
    (LAST 8 digest bytes, little-endian) and md5_number_upper (first 8, LE)
    so the SQL oracle reproduces the trick bit-for-bit."""
    import hashlib

    for t in tokens:
        if t not in cache:
            d = hashlib.md5(t.encode()).digest()
            bucket = int.from_bytes(d[8:], "little") % dim
            sign = 1.0 if int.from_bytes(d[:8], "little") % 2 == 0 else -1.0
            cache[t] = (bucket, sign)
    return cache


def hash_embed(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    dim: int = 64,
    out_col: str = "embedding",
) -> ray.data.Dataset:
    """Feature-hashing document embedder (the hashing trick, Weinberger et
    al. 2009): signed token counts folded into ``dim`` buckets, L2-normalized
    — a deterministic, vocabulary-free stand-in for a learned encoder with
    the production plumbing (stateless ``map_batches``, fixed-width
    ``list<double>`` output ready for :func:`knn_brute` /
    :func:`semantic_dedup`). Docs whose counts fully cancel (or with no
    tokens) embed as the zero vector and are dropped.

    Tokenization is ``lower().split(" ")`` with empties removed, matching
    the sparse form's SQL oracle (``hash_embed_sparse``).
    """

    def _embed(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        ids_out, vecs = [], []
        for rid, txt in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
            toks = [t for t in ("" if txt is None else txt).lower().split(" ") if t]
            _hash_buckets(toks, dim, cache)
            v = np.zeros(dim, dtype=np.float64)
            for t in toks:
                b, s = cache[t]
                v[b] += s
            nrm = float(np.linalg.norm(v))
            if nrm > 0.0:
                ids_out.append(rid)
                vecs.append((v / nrm).tolist())
        return pa.table({
            id_col: pa.array(ids_out, batch.schema.field(id_col).type),
            out_col: pa.array(vecs, pa.list_(pa.float64())),
        })

    return ds.map_batches(_embed, batch_format="pyarrow")


def hash_embed_sparse(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    dim: int = 64,
    ndigits: int = 6,
) -> ray.data.Dataset:
    """Sparse (doc, bucket, weight) rows of :func:`hash_embed` — the
    SQL-checkable form (DuckDB ``md5_number_lower/upper`` reproduce the
    bucket and sign exactly). Zero-weight buckets are omitted."""

    def _embed(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        ids_out, buckets_out, w_out = [], [], []
        for rid, txt in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
            toks = [t for t in ("" if txt is None else txt).lower().split(" ") if t]
            _hash_buckets(toks, dim, cache)
            v = np.zeros(dim, dtype=np.float64)
            for t in toks:
                b, s = cache[t]
                v[b] += s
            nrm = float(np.linalg.norm(v))
            if nrm <= 0.0:
                continue
            nz = np.nonzero(v)[0]
            ids_out.extend([rid] * len(nz))
            buckets_out.extend(nz.tolist())
            w_out.extend(np.round(v[nz] / nrm, ndigits).tolist())
        return pa.table({
            id_col: pa.array(ids_out, batch.schema.field(id_col).type),
            "bucket": pa.array(buckets_out, pa.int64()),
            "weight": pa.array(w_out, pa.float64()),
        })

    return ds.map_batches(_embed, batch_format="pyarrow")


def cosine_join_exact(
    ds: ray.data.Dataset,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 4,
) -> ray.data.Dataset:
    """EXACT cosine-similarity self-join: every pair with
    ``round(cos, ndigits) >= threshold`` — the exact counterpart to the
    banded-LSH :func:`embedding_near_dup` (recall 1.0 by construction).

    Shape: the normalized matrix + ids broadcast once via ``ray.put``
    (``knn_brute``'s bounded-table premise: n x d doubles); each corpus batch
    matmuls its rows against the broadcast side and keeps ``id_a < id_b``
    pairs over the rounded threshold — O(n^2) compute spread evenly across
    batches, zero shuffles, output bounded by the true pair count. At
    corpus scale, prune first with the IVF/banded ops and use this as the
    within-bucket verifier (the :func:`semantic_dedup` composition).
    """
    thr = float(threshold)

    def _collect(d: ray.data.Dataset):
        ids, vecs = [], []
        for b in d.select_columns([id_col, vec_col]).iter_batches(
                batch_format="pyarrow"):
            if b.num_rows:
                ids.append(np.asarray(b.column(id_col).to_pylist()))
                vecs.append(_batch_matrix(b, vec_col))
        if not ids:
            return np.array([], dtype=np.int64), np.zeros((0, 1))
        return np.concatenate(ids), np.vstack(vecs)

    _EMPTY = pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64())})

    all_ids, all_m = _collect(ds)
    if all_ids.size == 0:
        # empty corpus: map_batches would never run, leaving the input schema
        return ray.data.from_arrow(_EMPTY)
    ref = ray.put((all_ids, _normalize_rows(all_m)))

    def _pairs(batch: pa.Table) -> pa.Table:
        bids_np, bm = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_pylist())
        empty = _EMPTY
        if batch.num_rows == 0 or bm.shape[0] == 0:
            return empty
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        scores = np.round(m @ bm.T, ndigits)  # (batch, n)
        # keep id_a < id_b: each unordered pair is emitted by exactly one
        # batch row (the smaller id), so no global dedup pass is needed
        ii, jj = np.nonzero((scores >= thr) & (ids[:, None] < bids_np[None, :]))
        if not len(ii):
            return empty
        return pa.table({
            "id_a": pa.array(ids[ii], pa.int64()),
            "id_b": pa.array(bids_np[jj], pa.int64()),
            "score": pa.array(scores[ii, jj], pa.float64()),
        })

    return ds.map_batches(_pairs, batch_format="pyarrow")
