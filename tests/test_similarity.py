"""Similarity-search operators: brute kNN vs numpy oracle, LSH kNN sanity,
banded embedding near-dup recall vs brute force (VERDICT r1 item 6)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from registry_address_matcher_ray.stages import similarity as S


def _emb_table(m: np.ndarray) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(np.arange(len(m)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in m],
                              pa.list_(pa.float64())),
    })


@pytest.fixture(scope="module")
def clustered_embeddings():
    """50 clusters x 6 points of tight noise + 100 loners: known near-dup pairs."""
    rng = np.random.RandomState(123)
    dim = 32
    centers = rng.randn(50, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in centers:
        for _ in range(6):
            rows.append(c + 0.05 * rng.randn(dim))
    for _ in range(100):
        rows.append(rng.randn(dim))
    return np.asarray(rows)


def _brute_pairs(m: np.ndarray, thr: float) -> set:
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sim = mn @ mn.T
    iu = np.triu_indices(len(m), 1)
    keep = sim[iu] >= thr
    return set(zip(iu[0][keep].tolist(), iu[1][keep].tolist()))


def test_knn_brute_matches_numpy(clustered_embeddings):
    m = clustered_embeddings
    ds = ray.data.from_arrow(_emb_table(m)).repartition(5)
    q = m[:3]
    out = S.knn_brute(ds, q, k=10)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sim = mn @ qn.T
    for qi in range(3):
        s = sim[:, qi]
        order = np.lexsort((np.arange(len(s)), -s))[:10]
        got = out[out.query_idx == qi]
        assert got["vec_id"].tolist() == order.tolist()
        assert np.allclose(got["score"].to_numpy(), s[order])


def test_knn_lsh_returns_true_scores_subset(clustered_embeddings):
    m = clustered_embeddings
    ds = ray.data.from_arrow(_emb_table(m)).repartition(5)
    out = S.knn_lsh(ds, m[:2], k=5, n_bits=4)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for _, r in out.iterrows():
        true = float(mn[int(r.vec_id)] @ mn[int(r.query_idx)])
        assert abs(true - r.score) < 1e-9
    # the query itself shares its own bucket -> self hit present
    assert 0 in out[out.query_idx == 0]["vec_id"].tolist()


def test_embedding_neardup_recall_vs_brute(clustered_embeddings):
    m = clustered_embeddings
    thr = 0.9
    truth = _brute_pairs(m, thr)
    assert len(truth) >= 500  # fixture sanity: in-cluster pairs exist
    ds = ray.data.from_arrow(_emb_table(m)).repartition(5)
    res = S.embedding_neardup(ds, cosine_threshold=thr, bands=8, band_bits=4)
    got = res["pairs"].to_pandas()
    found = set(zip(got.id_a.tolist(), got.id_b.tolist()))
    # precision is exact by construction (verify computes true cosine)
    assert found <= truth
    recall = len(found) / len(truth)
    assert recall >= 0.95, recall
    # clusters cover every paired node
    nodes = set(got.id_a) | set(got.id_b)
    cl = res["clusters"].to_pandas()
    assert set(cl.node.astype(int)) == nodes


def test_embedding_neardup_empty():
    m = np.eye(5)  # orthogonal: no near-dups at 0.9
    ds = ray.data.from_arrow(_emb_table(m))
    res = S.embedding_neardup(ds, cosine_threshold=0.9, bands=4, band_bits=3)
    assert res["pairs"].count() == 0
    assert res["clusters"].count() == 0


def test_knn_ivf_recall_and_exactness(clustered_embeddings):
    m = clustered_embeddings
    ds = ray.data.from_arrow(_emb_table(m)).repartition(5)
    q = m[:3]
    exact = S.knn_brute(ds, q, k=10)
    # nprobe == nlist -> every list probed -> identical to brute force
    full = S.knn_ivf(ds, q, k=10, nlist=8, nprobe=8)
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), full.reset_index(drop=True))
    # narrow probe: scores are true cosines and recall stays high on the
    # clustered fixture (the query's own cluster shares its centroid list)
    approx = S.knn_ivf(ds, q, k=10, nlist=8, nprobe=3)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for _, r in approx.iterrows():
        true = float(mn[int(r.vec_id)] @ mn[int(r.query_idx)])
        assert abs(true - r.score) < 1e-9
    hits = 0
    for qi in range(3):
        top_exact = set(exact[exact.query_idx == qi]["vec_id"].head(10))
        top_approx = set(approx[approx.query_idx == qi]["vec_id"].head(10))
        hits += len(top_exact & top_approx)
    assert hits / 30 >= 0.8, hits


def test_knn_lsh_recall_vs_brute(clustered_embeddings, ray_session):
    """LSH-bucketed ANN: candidates come only from the query's hyperplane
    bucket, so recall is partial but must be substantial for clustered
    queries, and every returned score must be an exact cosine present in the
    brute-force result set."""
    m = clustered_embeddings
    ds = ray.data.from_arrow(_emb_table(m)).repartition(4)
    queries = m[:8]  # cluster members -> neighbors share buckets often
    brute = S.knn_brute(ds, queries, k=10)
    lsh = S.knn_lsh(ds, queries, k=10, n_bits=4)
    total_hits, total = 0, 0
    for qi in range(len(queries)):
        b = brute[brute["query_idx"] == qi]
        l = lsh[lsh["query_idx"] == qi]
        bmap = dict(zip(b["vec_id"], b["score"]))
        for _, r in l.iterrows():
            # approximate = may MISS neighbors, never invent them: any returned
            # (id, score) must match the exact cosine from the brute pass
            if r["vec_id"] in bmap:
                assert r["score"] == pytest.approx(bmap[r["vec_id"]], abs=1e-9)
                total_hits += 1
        total += len(b)
    recall = total_hits / total
    assert recall >= 0.3, recall  # 4-bit buckets: partial recall by design
    # top-1 self-match always survives (a vector shares its own bucket)
    for qi in range(len(queries)):
        l = lsh[lsh["query_idx"] == qi].sort_values("score", ascending=False)
        assert len(l) and l.iloc[0]["vec_id"] == qi


def test_pq_knn_recall_and_partition_invariance(ray_session):
    import numpy as np
    import ray.data as rd

    from registry_address_matcher_ray.sources.io import read_parquet_clean
    from registry_address_matcher_ray.stages import similarity as S

    ds = read_parquet_clean("/root/testdata/sf0.001/embeddings.parquet")
    rows = ds.take(5)
    q = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    brute = S.knn_brute(ds, q, k=10)
    pq = S.knn_pq(ds, q, k=10, m_sub=16, nbits=8)
    # ADC never invents ids outside the corpus, exactly k rows per query
    assert (pq.groupby("query_idx").size() == 10).all()
    rec = np.mean([
        len(set(brute[brute.query_idx == i].vec_id)
            & set(pq[pq.query_idx == i].vec_id)) / 10
        for i in range(5)])
    assert rec >= 0.5, rec
    # deterministic across partitionings (codebooks from the same sample)
    pq2 = S.knn_pq(ds.repartition(9), q, k=10, m_sub=16, nbits=8)
    assert pq.reset_index(drop=True).equals(pq2.reset_index(drop=True))


def test_ivfpq_recall_and_subset_of_probed_lists(ray_session):
    import numpy as np

    from registry_address_matcher_ray.sources.io import read_parquet_clean
    from registry_address_matcher_ray.stages import similarity as S

    ds = read_parquet_clean("/root/testdata/sf0.001/embeddings.parquet")
    rows = ds.take(5)
    q = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    brute = S.knn_brute(ds, q, k=10)
    # full probe: IVF pruning off -> pure PQ behavior, recall bound holds
    full = S.knn_ivfpq(ds, q, k=10, nlist=8, nprobe=8, m_sub=16, nbits=8)
    rec = np.mean([
        len(set(brute[brute.query_idx == i].vec_id)
            & set(full[full.query_idx == i].vec_id)) / 10 for i in range(5)])
    assert rec >= 0.5, rec
    # pruned probe returns a SUBSET of the full-probe candidates per query
    pruned = S.knn_ivfpq(ds, q, k=10, nlist=8, nprobe=2, m_sub=16, nbits=8)
    for i in range(5):
        assert set(pruned[pruned.query_idx == i].vec_id) <= set(
            ds.to_pandas()["vec_id"])
        assert len(pruned[pruned.query_idx == i]) <= 10


# ---------------------------------------------------------------------------
# SemDeDup (within-cluster semantic pruning)
# ---------------------------------------------------------------------------

def _brute_semdedup(m: np.ndarray, clusters: np.ndarray, thr: float) -> set:
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    kept = set()
    for i in range(len(m)):
        earlier = [j for j in range(i)
                   if clusters[j] == clusters[i] and float(mn[i] @ mn[j]) >= thr]
        if not earlier:
            kept.add(i)
    return kept


def test_semantic_dedup_label_matches_brute(clustered_embeddings):
    m = clustered_embeddings
    # cluster label = true generator cluster for the planted points, unique
    # ids for the loners (no pruning possible among them)
    clusters = np.concatenate([np.repeat(np.arange(50), 6),
                               np.arange(1000, 1100)])
    t = _emb_table(m).append_column("label", pa.array(clusters, pa.int64()))
    ds = ray.data.from_arrow(t).repartition(7)
    kept = S.semantic_dedup(ds, cluster_col="label", threshold=0.9).to_pandas()
    want = _brute_semdedup(m, clusters, 0.9)
    assert set(kept.vec_id) == want
    # tight planted clusters must actually prune to ~1 survivor each
    planted_kept = [i for i in want if i < 300]
    assert len(planted_kept) < 150


def test_semantic_dedup_kmeans_path_deterministic(clustered_embeddings):
    m = clustered_embeddings
    ds = ray.data.from_arrow(_emb_table(m))
    a = S.semantic_dedup(ds, cluster_col=None, threshold=0.9, nlist=32)
    b = S.semantic_dedup(ds.repartition(9), cluster_col=None,
                         threshold=0.9, nlist=32)
    ka = sorted(a.to_pandas().vec_id)
    kb = sorted(b.to_pandas().vec_id)
    assert ka == kb  # sample-trained but seeded + order-stable
    assert 0 < len(ka) < len(m)  # prunes the planted near-dups, keeps loners


def test_semantic_dedup_kmeans_drops_have_near_neighbor(clustered_embeddings):
    """Every dropped vector must have an earlier >=thr neighbor SOMEWHERE
    (cluster assignment can only make pruning more conservative)."""
    m = clustered_embeddings
    thr = 0.9
    ds = ray.data.from_arrow(_emb_table(m))
    kept = set(S.semantic_dedup(ds, cluster_col=None, threshold=thr,
                                nlist=32).to_pandas().vec_id)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sim = mn @ mn.T
    for i in range(len(m)):
        if i not in kept:
            assert (sim[i, :i] >= thr).any(), i


# ---------------------------------------------------------------------------
# feature-hashing embedder
# ---------------------------------------------------------------------------

def test_hash_embed_unit_norm_and_dup_identity(ray_session):
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["the cat sat on the mat",
                 "the cat sat on the mat",          # exact dup of 1
                 "a completely different document about rockets",
                 ""],                                # no tokens -> dropped
    })
    out = (S.hash_embed(ray.data.from_arrow(t), "text", "doc_id", dim=32)
           .to_pandas().set_index("doc_id"))
    assert set(out.index) == {1, 2, 3}  # empty doc dropped
    v1 = np.asarray(out.loc[1, "embedding"])
    v2 = np.asarray(out.loc[2, "embedding"])
    v3 = np.asarray(out.loc[3, "embedding"])
    assert np.allclose(np.linalg.norm(v1), 1.0)
    assert np.array_equal(v1, v2)            # identical text, identical vector
    assert abs(float(v1 @ v3)) < 0.9         # unrelated text, far apart


def test_hash_embed_sparse_matches_dense(ray_session):
    t = pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": ["alpha beta beta gamma gamma gamma",
                 "delta epsilon zeta eta theta iota kappa"],
    })
    ds = ray.data.from_arrow(t)
    dense = (S.hash_embed(ds, "text", "doc_id", dim=16)
             .to_pandas().set_index("doc_id"))
    sparse = S.hash_embed_sparse(ds, "text", "doc_id", dim=16).to_pandas()
    for did in (7, 8):
        v = np.asarray(dense.loc[did, "embedding"])
        rows = sparse[sparse.doc_id == did]
        assert set(rows.bucket) == set(np.nonzero(v)[0])
        for r in rows.itertuples():
            assert r.weight == round(float(v[r.bucket]), 6)


def test_cosine_join_exact_matches_brute(clustered_embeddings):
    m = clustered_embeddings
    ds = ray.data.from_arrow(_emb_table(m)).repartition(5)
    thr = 0.9
    out = S.cosine_join_exact(ds, threshold=thr, ndigits=12).to_pandas()
    got = set(zip(out.id_a.tolist(), out.id_b.tolist()))
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sim = np.round(mn @ mn.T, 12)
    iu = np.triu_indices(len(m), 1)
    keep = sim[iu] >= thr
    expect = set(zip(iu[0][keep].tolist(), iu[1][keep].tolist()))
    assert got == expect                      # recall 1.0, precision 1.0
    # scores are the exact rounded cosines
    lut = {(int(a), int(b)): float(s)
           for a, b, s in zip(out.id_a, out.id_b, out.score)}
    for a, b in expect:
        assert abs(lut[(a, b)] - sim[a, b]) < 1e-12
    # id_a < id_b invariant: each unordered pair emitted exactly once
    assert (out.id_a < out.id_b).all()
    assert len(out) == len(expect)


def test_cosine_join_exact_empty(ray_session):
    ds = ray.data.from_arrow(_emb_table(np.zeros((0, 4))))
    out = S.cosine_join_exact(ds, threshold=0.5)
    # schema must be the stable pair schema, not the input's
    # (ray.data.Dataset.to_pandas drops columns on 0-row data, so check
    # the Dataset schema itself)
    assert out.schema().names == ["id_a", "id_b", "score"]
    assert out.count() == 0
