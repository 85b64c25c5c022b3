"""Recall/precision tests for the APPROXIMATE near-dup operators.

These ops (MinHash-LSH, banded embedding LSH) have no DuckDB oracle because
LSH candidate generation can miss pairs; this quantifies that miss rate on
planted near-duplicates against brute-force ground truth and pins precision
at 1.0 (the verify stage computes the exact measure, so no false positives
can survive).
"""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from registry_address_matcher_ray.functions import textfns
from registry_address_matcher_ray.stages import dedup as D
from registry_address_matcher_ray.stages import similarity as S


def _pair_set(df: pd.DataFrame) -> set:
    return {tuple(sorted((int(a), int(b)))) for a, b in zip(df["id_a"], df["id_b"])}


def test_minhash_lsh_recall_on_planted_neardups():
    rng = np.random.default_rng(7)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
             "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]
    docs = {}
    did = 0
    for base in range(40):
        toks = list(rng.choice(words, size=30))
        docs[did] = " ".join(toks)
        did += 1
        # one near-duplicate: swap a single word (high shingle Jaccard)
        dup = list(toks)
        dup[int(rng.integers(0, 30))] = str(rng.choice(words))
        docs[did] = " ".join(dup)
        did += 1
    for _ in range(40):  # unrelated noise docs
        docs[did] = " ".join(rng.choice(words, size=8))
        did += 1

    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    thr = 0.8
    # brute-force ground truth with the SAME exact measure the verifier uses
    ngrams = {i: textfns.ngram_set(t) for i, t in docs.items()}
    truth = {
        (a, b)
        for a, b in itertools.combinations(sorted(docs), 2)
        if textfns.jaccard(ngrams[a], ngrams[b]) >= thr
    }
    assert len(truth) >= 20, "planted corpus must contain real near-dups"

    got = D.minhash_lsh_dedup(
        ray.data.from_pandas(df).repartition(4), "text", "doc_id",
        jaccard_threshold=thr,
    )["pairs"].to_pandas()
    got_pairs = _pair_set(got)

    assert got_pairs <= truth, "verify stage must kill all false positives"
    recall = len(got_pairs & truth) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.2f} below bound"
    # reported jaccard values are the exact measure
    for _, r in got.iterrows():
        key = tuple(sorted((int(r["id_a"]), int(r["id_b"]))))
        want = textfns.jaccard(ngrams[key[0]], ngrams[key[1]])
        assert r["jaccard"] == pytest.approx(want, abs=0.0)


def test_embedding_banded_lsh_recall_on_planted_neardups():
    rng = np.random.default_rng(13)
    dim, thr = 16, 0.95
    vecs = {}
    vid = 0
    for base in range(30):
        v = rng.normal(size=dim)
        v /= np.linalg.norm(v)
        vecs[vid] = v
        vid += 1
        # planted near-dup at cosine ~0.97-0.99
        w = v + rng.normal(scale=0.06, size=dim)
        vecs[vid] = w / np.linalg.norm(w)
        vid += 1
    for _ in range(60):  # noise
        v = rng.normal(size=dim)
        vecs[vid] = v / np.linalg.norm(v)
        vid += 1

    ids = sorted(vecs)
    m = np.stack([vecs[i] for i in ids])
    sims = m @ m.T
    truth = {
        (ids[i], ids[j])
        for i in range(len(ids)) for j in range(i + 1, len(ids))
        if sims[i, j] >= thr
    }
    assert len(truth) >= 20

    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([vecs[i].astype(np.float32) for i in ids],
                              pa.list_(pa.float32())),
    })
    got = S.embedding_neardup(
        ray.data.from_arrow(tbl).repartition(4), cosine_threshold=thr,
    )["pairs"].to_pandas()
    got_pairs = _pair_set(got)

    assert got_pairs <= truth, "exact-cosine verify must kill false positives"
    recall = len(got_pairs & truth) / len(truth)
    assert recall >= 0.9, f"banded LSH recall {recall:.2f} below bound"
