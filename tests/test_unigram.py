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
