"""Deterministic split / sample / per-key cap operators (stages/sampling.py)."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from registry_address_matcher_ray.stages import sampling


@pytest.fixture(scope="module")
def docs_df():
    rng = np.random.default_rng(3)
    return pd.DataFrame({
        "doc_id": np.arange(2000),
        "lang": rng.choice(["en", "de", "zh"], size=2000, p=[0.6, 0.3, 0.1]),
    })


def test_hash_split_fractions_and_determinism(docs_df):
    out = sampling.hash_split(rd.from_pandas(docs_df), "doc_id").to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.04
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03
    # matches the reference md5 formula row-for-row
    def exp_one(i):
        h = hashlib.md5(str(i).encode()).hexdigest()[:4]
        return "train" if h < "cccc" else ("val" if h < "e666" else "test")
    exp = docs_df["doc_id"].map(exp_one)
    got = out.set_index("doc_id").loc[docs_df["doc_id"], "split"].values
    assert (got == exp.values).all()


def test_stratified_sample_rate_holds_per_stratum(docs_df):
    ds = rd.from_pandas(docs_df).repartition(8)
    out = sampling.stratified_hash_sample(ds, "doc_id").to_pandas()
    # ~10% overall and within each stratum (binomial tolerance)
    assert abs(len(out) / len(docs_df) - 0.1) < 0.03
    for lang, g in docs_df.groupby("lang"):
        rate = (out["lang"] == lang).sum() / len(g)
        assert abs(rate - 0.1) < 0.06, (lang, rate)
    # identical at different parallelism
    out2 = sampling.stratified_hash_sample(
        rd.from_pandas(docs_df).repartition(2), "doc_id").to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_per_key_topn_matches_pandas():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.integers(0, 40, size=1500),
        "v": rng.normal(size=1500).round(6),
        "id": np.arange(1500),
    })
    got = (
        sampling.per_key_topn(
            rd.from_pandas(df).repartition(7), "k",
            order_by=[("v", True), ("id", False)], n=3)
        .to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
    )
    exp = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
        .groupby("k", sort=False).head(3)
        .sort_values(["k", "id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "v", "id"]], exp[["k", "v", "id"]])


def test_chunk_documents_covers_and_overlaps(ray_session):
    import pyarrow as pa
    import ray.data
    from registry_address_matcher_ray.stages import sampling

    words = " ".join(f"w{i}" for i in range(100))
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": [words, "short doc"]})
    out = (sampling.chunk_documents(ray.data.from_arrow(t), "text", "doc_id",
                                    chunk_tokens=40, overlap=8)
           .to_pandas().sort_values(["doc_id", "chunk_id"]))
    d1 = out[out.doc_id == 1]
    # starts step by 32; 100 tokens -> m = 1 + ceil(60/32) = 3 chunks
    assert list(d1.chunk_id) == [0, 1, 2]
    assert list(d1.n_tokens) == [40, 40, 36]
    toks = words.split(" ")
    assert d1.iloc[0].text == " ".join(toks[0:40])
    assert d1.iloc[1].text == " ".join(toks[32:72])
    assert d1.iloc[2].text == " ".join(toks[64:100])
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0].text == "short doc"


def test_source_mix_rates_and_determinism(ray_session):
    import hashlib
    import pandas as pd
    import ray.data
    from registry_address_matcher_ray.stages import sampling

    df = pd.DataFrame({
        "doc_id": range(2000),
        "source": ["a" if i % 2 == 0 else "b" for i in range(2000)],
    })
    ds = ray.data.from_pandas(df).repartition(5)
    kept = sampling.source_mix(ds, "source", "doc_id",
                               weights={"a": 0.25}).to_pandas()
    # b untouched, a ~25% (exact: per-row md5 predicate)
    assert (kept[kept.source == "b"].shape[0]) == 1000
    expect_a = sum(1 for i in range(0, 2000, 2)
                   if hashlib.md5(str(i).encode()).hexdigest()[:4] < "4000")
    assert kept[kept.source == "a"].shape[0] == expect_a
    assert 0.15 < expect_a / 1000 < 0.35


def test_token_shards_budget_and_order(ray_session):
    import pandas as pd
    import ray.data
    from registry_address_matcher_ray.stages import sampling

    df = pd.DataFrame({
        "doc_id": range(100),
        "text": [" ".join(["t"] * (7 + i % 13)) for i in range(100)],
    })
    out = (sampling.token_shards(ray.data.from_pandas(df).repartition(7),
                                 "text", "doc_id", budget=50)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # shards non-decreasing in doc order, start at 0
    assert out.shard.iloc[0] == 0
    assert (out.shard.diff().fillna(0) >= 0).all()
    # exclusive-prefix rule: doc assigned to the shard its first token is in
    run = 0
    for r in out.itertuples():
        assert r.shard == run // 50, r
        run += r.n_tokens


def test_weighted_sample_deterministic_and_biased(ray_session):
    import numpy as np

    import ray.data

    from registry_address_matcher_ray.stages import sampling as S2

    # heavy items dominate: 20 items with weight 1000 vs 500 with weight 1
    df = pd.DataFrame({
        "id": range(520),
        "w": [1000.0] * 20 + [1.0] * 500,
    })
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = (S2.weighted_sample(ds, "id", "w", k=25)
               .to_pandas().sort_values("id").reset_index(drop=True))
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # partition-invariant
    # all 20 heavy items must be drawn into a k=25 sample (p_miss ~ (1/1000))
    assert set(range(20)) <= set(outs[0]["id"])
    # pandas transcription of the key rule agrees exactly
    import hashlib

    u = np.array([int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:],
                                 "little") for v in df["id"]],
                 dtype=np.float64) / float(1 << 64)
    key = np.power(u, 1.0 / df["w"].to_numpy())
    exp = set(df["id"].iloc[np.argsort(-key)[:25]])
    assert set(outs[0]["id"]) == exp
    # zero/negative/null weights never sampled
    df2 = pd.DataFrame({"id": [1, 2, 3], "w": [0.0, -5.0, None]})
    got2 = S2.weighted_sample(ray.data.from_pandas(df2), "id", "w", k=3).to_pandas()
    assert len(got2) == 0


def test_global_shuffle_matches_sequential_and_partition_invariant(ray_session):
    """global_shuffle = rank under ORDER BY md5(seed||id), id — identical to
    a sequential transcription, and invariant to input partitioning."""
    import hashlib

    from registry_address_matcher_ray.stages import sampling as S2

    df = pd.DataFrame({"id": list(range(300)), "payload": list(range(300))})
    exp_order = sorted(
        df["id"], key=lambda v: (hashlib.md5(("s7" + str(v)).encode())
                                 .hexdigest(), v))
    exp_pos = {v: i for i, v in enumerate(exp_order)}
    outs = []
    for parts in (1, 8):
        ds = rd.from_pandas(df).repartition(parts)
        got = (S2.global_shuffle(ds, "id", seed="s7")
               .to_pandas().sort_values("id").reset_index(drop=True))
        outs.append(got)
        assert list(got["shuffle_pos"]) == [exp_pos[v] for v in got["id"]]
        assert "payload" in got.columns  # payload rides the shuffle
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # a different seed produces a different permutation
    other = (S2.global_shuffle(rd.from_pandas(df), "id", seed="s8")
             .to_pandas().sort_values("id").reset_index(drop=True))
    assert list(other["shuffle_pos"]) != list(outs[0]["shuffle_pos"])


def test_shuffled_shards_interleave(ray_session):
    """shard = pos % n (round-robin interleave), pos_in_shard = pos // n;
    shard sizes differ by at most one doc."""
    from registry_address_matcher_ray.stages import sampling as S2

    df = pd.DataFrame({"id": list(range(101))})
    got = (S2.shuffled_shards(rd.from_pandas(df), "id", seed="x",
                              num_shards=4)
           .to_pandas().sort_values("shuffle_pos").reset_index(drop=True))
    assert list(got["shard"]) == [p % 4 for p in got["shuffle_pos"]]
    assert list(got["pos_in_shard"]) == [p // 4 for p in got["shuffle_pos"]]
    sizes = got.groupby("shard").size()
    assert sizes.max() - sizes.min() <= 1


def test_write_sharded_resumable_roundtrip_and_resume(ray_session, tmp_path):
    """The interleaved shard writer commits per shard atomically; a re-run
    skips committed shards; the read-back corpus is complete and within-shard
    order is restored by pos_in_shard."""
    import os

    from registry_address_matcher_ray.sources.io import write_sharded_resumable
    from registry_address_matcher_ray.stages import sampling as S2

    df = pd.DataFrame({"id": list(range(60)),
                       "text": [f"doc {i}" for i in range(60)]})
    out = str(tmp_path / "shards")
    sharded = S2.shuffled_shards(rd.from_pandas(df), "id", seed="w",
                                 num_shards=3)
    r1 = write_sharded_resumable(sharded, out, "shard")
    assert sorted(r1["written"]) == ["shard=0", "shard=1", "shard=2"]
    for d in r1["written"]:
        assert os.path.exists(os.path.join(out, d, "_SUCCESS"))
    # simulate a crashed run missing one shard: drop its marker + dir
    import shutil
    shutil.rmtree(os.path.join(out, "shard=2"))
    r2 = write_sharded_resumable(
        S2.shuffled_shards(rd.from_pandas(df), "id", seed="w",
                           num_shards=3), out, "shard")
    assert r2["written"] == ["shard=2"]
    assert sorted(r2["skipped"]) == ["shard=0", "shard=1"]
    back = rd.read_parquet(out).to_pandas()
    assert sorted(back["id"]) == list(range(60))
    # within-shard training order: pos_in_shard sorts each shard into the
    # global shuffled order restricted to that shard
    full = sharded.to_pandas()
    for s, g in back.groupby(back["shuffle_pos"] % 3):
        exp = (full[full["shard"] == s].sort_values("pos_in_shard")["id"]
               .tolist())
        got = g.sort_values("pos_in_shard")["id"].tolist()
        assert got == exp


def test_pack_sequences_matches_sequential_next_fit(ray_session):
    """Within-shard packing equals a sequential next-fit transcription;
    partition-invariant; oversize docs get their own sequence."""
    from registry_address_matcher_ray.stages import sampling as S2

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "id": list(range(150)),
        "text": [" ".join(["w"] * int(rng.integers(1, 40))) for _ in range(150)],
    })
    df.loc[17, "text"] = " ".join(["w"] * 100)  # oversize doc (> seq_len)
    outs = []
    for parts in (1, 8):
        got = (S2.pack_sequences(rd.from_pandas(df).repartition(parts),
                                 "text", "id", seq_len=64,
                                 shard_budget=500)
               .to_pandas().sort_values("id").reset_index(drop=True))
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]

    # sequential reference: shard by exclusive running sum, then next-fit
    ntok = df["text"].str.split(" ").str.len().to_numpy()
    run = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    shard = run // 500
    exp_seq, exp_pos = [], []
    cur_shard, local, fill, pos = -1, 0, 0, 0
    for i in range(len(df)):
        if shard[i] != cur_shard:
            cur_shard, local, fill, pos = shard[i], 0, 0, 0
        if fill > 0 and fill + ntok[i] > 64:
            local += 1
            fill, pos = 0, 0
        exp_seq.append((int(shard[i]) << 32) + local)
        exp_pos.append(pos)
        fill += int(ntok[i])
        pos += 1
    assert list(got["seq_id"]) == exp_seq
    assert list(got["seq_pos"]) == exp_pos
    # every sequence respects seq_len unless it is a single oversize doc
    agg = got.groupby("seq_id")["n_tokens"].agg(["sum", "count"])
    bad = agg[(agg["sum"] > 64) & (agg["count"] > 1)]
    assert len(bad) == 0
    assert got.loc[got["id"] == 17, "n_tokens"].iloc[0] == 100


def test_md5_kernel_bit_parity_with_hashlib():
    """The DuckDB vectorized md5 kernel must be bit-identical to the
    pure-python hashlib fallback on every expression the engine uses
    (prefix4, hex key, md5_number_lower uniform) across value types."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from registry_address_matcher_ray.stages import sampling as S

    vals = ["doc-1", "", "o'neil; --", "απλό", None, "None"]
    ints = pa.array([0, 1, -7, 2**40, None])

    # prefix4 / full hex
    assert S._md5_prefix4(vals) == [
        hashlib.md5(str(v).encode()).hexdigest()[:4] for v in vals]
    assert S._md5_prefix4(ints) == [
        hashlib.md5(str(v).encode()).hexdigest()[:4] for v in ints.to_pylist()]
    got_hex = S._md5_expr(pa.array(vals, pa.string()), "md5(s)").to_pylist()
    assert got_hex == [hashlib.md5(str(v).encode()).hexdigest() for v in vals]

    # uniform: last 8 digest bytes little-endian / 2^64
    exp = np.array(
        [int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "little")
         for v in vals], dtype=np.float64) / float(1 << 64)
    assert np.array_equal(S._md5_uniform(vals), exp)
    assert np.array_equal(S._md5_uniform(pa.array(vals, pa.string())), exp)

    # seeded shuffle key expression, including a quote-bearing seed
    seed = "se'ed"
    seed_sql = "'" + seed.replace("'", "''") + "'"
    got = S._md5_expr(pa.array(vals, pa.string()),
                      f"md5({seed_sql} || s)").to_pylist()
    assert got == [hashlib.md5((seed + str(v)).encode()).hexdigest()
                   for v in vals]


def test_md5_kernel_nonstring_column_parity():
    """Float/bool/timestamp id columns must hash identically to str(v)
    (Arrow/DuckDB casts render them differently — '2' vs '2.0', 'true' vs
    'True' — so those types must take the Python-formatter path)."""
    import datetime
    import hashlib

    import numpy as np
    import pyarrow as pa

    from registry_address_matcher_ray.stages import sampling as S

    cols = [
        pa.array([2.0, 0.5, -1.25, None], pa.float64()),
        pa.array([True, False, None], pa.bool_()),
        pa.array([datetime.datetime(2024, 1, 2, 3, 4, 5)],
                 pa.timestamp("us")),
    ]
    for col in cols:
        exp = np.array(
            [int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:],
                            "little")
             for v in col.to_pylist()], dtype=np.float64) / float(1 << 64)
        assert np.array_equal(S._md5_uniform(col), exp), col.type
        assert S._md5_prefix4(col) == [
            hashlib.md5(str(v).encode()).hexdigest()[:4]
            for v in col.to_pylist()]
