"""Trained BPE (stages/tokenizer.py): merge-table parity with an independent
sequential implementation, encoder equivalence, partition invariance, and the
token_shards(counts=...) wiring."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from registry_address_matcher_ray.stages import tokenizer as T


def _mk_corpus(n=120, seed=9):
    rng = np.random.default_rng(seed)
    stems = ["low", "lower", "lowest", "new", "newer", "newest",
             "wide", "wider", "widest", "bright", "brighter"]
    rows = []
    for i in range(n):
        k = int(rng.integers(5, 30))
        words = [stems[int(rng.integers(0, len(stems)))] for _ in range(k)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    return pd.DataFrame(rows)


def _train_reference(texts, num_merges):
    """Independent sequential BPE: pair counts re-derived from the EXPANDED
    corpus each round (not the word-freq table), merges applied in training
    order (not the greedy-rank encoder) — different code path, same
    semantics."""
    corpus = [list(w) + ["</w>"] for t in texts for w in t.lower().split()]
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for sym in corpus:
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += 1
        if not pairs:
            break
        best, n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append(best)
        a, b = best
        for sym in corpus:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [a + b]
                else:
                    i += 1
    return merges


def _encode_reference(text, merges):
    """Sequential encoding: apply merges in training order over each word."""
    total = 0
    for w in (text or "").lower().split():
        sym = list(w) + ["</w>"]
        for a, b in merges:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [a + b]
                else:
                    i += 1
        total += len(sym)
    return total


def test_bpe_train_matches_independent_implementation(ray_session):
    df = _mk_corpus()
    fit = T.bpe_train(rd.from_pandas(df).repartition(4), "text",
                      num_merges=40)
    exp = _train_reference(df["text"], 40)
    assert fit["merges"] == exp
    assert not fit["truncated"]


def test_bpe_train_partition_invariant(ray_session):
    df = _mk_corpus(seed=11)
    fits = [T.bpe_train(rd.from_pandas(df).repartition(p), "text",
                        num_merges=25)["merges"]
            for p in (1, 8)]
    assert fits[0] == fits[1]


def test_bpe_counts_match_sequential_encoder(ray_session):
    df = _mk_corpus(seed=13)
    fit = T.bpe_train(rd.from_pandas(df), "text", num_merges=30)
    got = (T.bpe_token_counts(rd.from_pandas(df).repartition(3), "text",
                              "doc_id", fit["merges"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = [_encode_reference(t, fit["merges"]) for t in df["text"]]
    assert list(got["n_bpe_tokens"]) == exp
    # merges genuinely compress: fewer pieces than characters
    chars = df["text"].str.replace(" ", "").str.len().sum()
    assert got["n_bpe_tokens"].sum() < chars


def test_bpe_vocab_truncation_logged_and_bounded(ray_session):
    df = _mk_corpus(seed=17)
    fit = T.bpe_train(rd.from_pandas(df), "text", num_merges=10, max_words=4)
    assert fit["truncated"] and fit["n_words"] > 4
    assert len(fit["merges"]) <= 10


def test_token_shards_with_bpe_counts(ray_session):
    from registry_address_matcher_ray.stages import sampling as S

    df = _mk_corpus(seed=19)
    ds = rd.from_pandas(df)
    fit = T.bpe_train(ds, "text", num_merges=30)
    counts = T.bpe_token_counts(ds, "text", "doc_id", fit["merges"]) \
        .map_batches(lambda b: b.rename_columns(["doc_id", "n_tokens"]),
                     batch_format="pyarrow")
    shards = (S.token_shards(ds, "text", "doc_id", budget=500, counts=counts)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # shard = floor(exclusive running BPE-token sum / budget) under id order
    run = 0
    for _, r in shards.iterrows():
        assert r["shard"] == run // 500
        run += r["n_tokens"]
    exp = [_encode_reference(t, fit["merges"]) for t in df["text"]]
    assert list(shards["n_tokens"]) == exp
