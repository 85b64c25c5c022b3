"""Unigram-LM document scoring: both physical plans agree with each other and
with a pandas transcription of the DuckDB oracle semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from registry_address_matcher_ray.stages import analytics as A


def _docs():
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(1, 30)))
             for _ in range(400)]
    texts[5] = ""            # zero-token doc: dropped, like the SQL inner join
    texts[6] = "   "
    return pd.DataFrame({"doc_id": np.arange(400, dtype="int64"),
                         "text": texts})


def _expected(df: pd.DataFrame) -> pd.DataFrame:
    s = df["text"].str.lower().str.split(" ").explode()
    s = s[s != ""].dropna()
    tok = pd.DataFrame({"doc_id": df.loc[s.index, "doc_id"], "token": s})
    cnt = tok["token"].value_counts()
    n = float(len(tok))
    tok["lp"] = np.log(tok["token"].map(cnt).astype(float) / n)
    g = tok.groupby("doc_id")["lp"]
    return pd.DataFrame({
        "doc_id": g.mean().index.to_numpy(),
        "n_tokens": g.size().to_numpy(dtype="int64"),
        "avg_logprob": g.mean().round(6).to_numpy(),
    })


def test_both_plans_match_oracle_semantics(ray_session):
    df = _docs()
    want = _expected(df).sort_values("doc_id").reset_index(drop=True)
    ds = ray.data.from_pandas(df).repartition(5)
    for lim in (None, 0):  # broadcast plan, then forced join plan
        got = (A.unigram_logprob(ds, "doc_id", "text", vocab_broadcast_limit=lim)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert len(got) == len(want), lim
        assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
        assert (got["n_tokens"].to_numpy() == want["n_tokens"].to_numpy()).all()
        assert np.allclose(got["avg_logprob"], want["avg_logprob"], atol=1e-6), lim


def test_zero_token_docs_dropped(ray_session):
    df = _docs()
    ds = ray.data.from_pandas(df)
    got = A.unigram_logprob(ds, "doc_id", "text").to_pandas()
    assert 5 not in set(got["doc_id"]) and 6 not in set(got["doc_id"])
    assert len(got) == 398


def test_bigram_plans_agree_and_short_docs_dropped(ray_session):
    df = _docs()
    df.loc[7, "text"] = "solo"  # one token -> no bigrams -> dropped
    ds = ray.data.from_pandas(df).repartition(4)
    outs = []
    for lim in (None, 0):
        got = (A.bigram_logprob(ds, "doc_id", "text", vocab_broadcast_limit=lim)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(got)
    a, b = outs
    n_multi = int((df["text"].str.split().str.len() >= 2).sum())
    assert len(a) == len(b) == n_multi  # docs with <2 tokens are dropped
    assert not {5, 6, 7} & set(a["doc_id"])
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    assert (a["n_bigrams"].to_numpy() == b["n_bigrams"].to_numpy()).all()
    assert np.allclose(a["avg_logprob"], b["avg_logprob"], atol=1e-6)
    # pandas transcription of the MLE bigram model on a tiny case
    tiny = pd.DataFrame({"doc_id": [0, 1], "text": ["a b a b", "a b"]})
    got = (A.bigram_logprob(ray.data.from_pandas(tiny), "doc_id", "text")
           .to_pandas().sort_values("doc_id"))
    # corpus bigrams: doc0 -> (a b),(b a),(a b); doc1 -> (a b)
    # c(a b)=3, c(b a)=1; head counts over bigrams: c_head(a)=3, c_head(b)=1
    import math
    p_ab = 3 / 3   # c(a b)/c_head(a)
    p_ba = 1 / 1
    want0 = round((math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3, 6)
    want1 = round(math.log(p_ab), 6)
    assert got["avg_logprob"].tolist() == [want0, want1]


def test_perplexity_buckets_rejects_wrong_cut_count(ray_session):
    import pytest

    ds = ray.data.from_pandas(_docs())
    with pytest.raises(ValueError, match="exactly 2"):
        A.perplexity_buckets(ds, "doc_id", "text", cuts=(0.5,))
