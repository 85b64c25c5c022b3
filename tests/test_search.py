"""BM25 ranked retrieval (stages/search.py)."""

import math

import pyarrow as pa
import pytest
import ray.data

from registry_address_matcher_ray.stages.search import bm25_topk

DOCS = [
    (1, "spark shuffle hash join"),
    (2, "hash hash hash table"),
    (3, "window sort merge sort"),
    (4, "completely unrelated words here"),
    (5, "spark spark spark spark spark spark"),
    (6, ""),
]


def _expected(query, k1=1.2, b=0.75):
    terms = query.split()
    toks = {i: t.lower().split() for i, t in DOCS}
    toks = {i: [w for w in ws if w] for i, ws in toks.items()}
    n = len(DOCS)
    avgdl = sum(len(ws) for ws in toks.values()) / n
    out = {}
    for i, ws in toks.items():
        score = 0.0
        for t in set(terms):
            tf = ws.count(t)
            if not tf:
                continue
            d = sum(1 for ws2 in toks.values() if t in ws2)
            idf = math.log(1.0 + (n - d + 0.5) / (d + 0.5))
            score += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(ws) / avgdl))
        if score > 0:
            out[i] = score
    return out


def _ds(parallelism=2):
    t = pa.table({"doc_id": [i for i, _ in DOCS],
                  "text": [s for _, s in DOCS]})
    return ray.data.from_arrow(t).repartition(parallelism)


def test_bm25_matches_hand_computation():
    got = bm25_topk(_ds(), "doc_id", "text", "spark hash").to_pandas()
    exp = _expected("spark hash")
    assert list(got["doc_id"]) == sorted(exp, key=lambda i: (-exp[i], i))
    for _, row in got.iterrows():
        assert row["score"] == pytest.approx(exp[row["doc_id"]], abs=1e-6)


def test_bm25_k_cut_and_tiebreak():
    got = bm25_topk(_ds(), "doc_id", "text", "spark hash", k=2).to_pandas()
    exp = _expected("spark hash")
    want = sorted(exp, key=lambda i: (-exp[i], i))[:2]
    assert list(got["doc_id"]) == want


def test_bm25_partition_invariant():
    a = bm25_topk(_ds(1), "doc_id", "text", "sort window").to_pandas()
    b = bm25_topk(_ds(5), "doc_id", "text", "sort window").to_pandas()
    assert a.equals(b)


def test_bm25_no_hits_and_empty_query():
    got = bm25_topk(_ds(), "doc_id", "text", "zzz qqq").to_pandas()
    assert len(got) == 0
    with pytest.raises(ValueError):
        bm25_topk(_ds(), "doc_id", "text", "  ")
