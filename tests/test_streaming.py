"""Streaming first-arrival dedup (the shared-mutable-index escape hatch)."""

import numpy as np
import pandas as pd
import ray
import ray.data

from registry_address_matcher_ray.stages import streaming as ST


def _fixture(n=5000, n_keys=1200, seed=11):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "row_id": np.arange(n, dtype="int64"),
        "key": [f"k{int(v):05d}" for v in rng.randint(0, n_keys, size=n)],
        "payload": rng.randint(0, 1 << 30, size=n).astype("int64"),
    })


def test_streaming_dedup_invariants(ray_session):
    df = _fixture()
    ds = ray.data.from_pandas(df).repartition(7)
    out = ST.streaming_dedup(ds, "key", num_shards=4,
                             batch_size=512).to_pandas()
    # exactly one survivor per distinct key, every key present
    assert out["key"].nunique() == len(out) == df["key"].nunique()
    # every survivor is a real input row (key, row_id, payload all intact)
    merged = out.merge(df, on=["row_id", "key", "payload"], how="left",
                       indicator=True)
    assert (merged["_merge"] == "both").all()


def test_streaming_dedup_in_batch_duplicates_first_wins(ray_session):
    df = pd.DataFrame({"row_id": [0, 1, 2, 3],
                       "key": ["a", "a", "b", "a"],
                       "payload": [10, 11, 12, 13]})
    # single block, single batch -> arrival order IS row order
    ds = ray.data.from_pandas(df)
    out = ST.streaming_dedup(ds, "key", num_shards=2,
                             batch_size=1024).to_pandas()
    assert sorted(out["key"]) == ["a", "b"]
    assert out.loc[out["key"] == "a", "row_id"].iloc[0] == 0


def test_streaming_dedup_index_persists_across_datasets(ray_session):
    # the index is the SHARED state: a second dataset streamed through the
    # same shards sees the first dataset's keys as duplicates
    shards = ST.start_index(num_shards=2)
    a = ray.data.from_pandas(pd.DataFrame({"key": ["x", "y"]}))
    b = ray.data.from_pandas(pd.DataFrame({"key": ["y", "z"]}))
    dedup_a = a.map_batches(ST.StreamingDeduper(shards, "key"),
                            batch_format="pyarrow").to_pandas()
    dedup_b = b.map_batches(ST.StreamingDeduper(shards, "key"),
                            batch_format="pyarrow").to_pandas()
    assert sorted(dedup_a["key"]) == ["x", "y"]
    assert sorted(dedup_b["key"]) == ["z"]
    assert sum(ray.get([s.size.remote() for s in shards])) == 3
