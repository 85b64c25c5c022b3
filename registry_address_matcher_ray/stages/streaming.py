"""Streaming first-arrival dedup: the shared-mutable-index case.

Everything else in this engine is a pure ``Dataset`` transform; this stage is
the one semantics the Dataset API genuinely cannot express — a GLOBAL
"have I seen this key before?" membership test that mutates as blocks stream
(ingestion-time dedup against an ever-growing index, e.g. a crawl frontier or
a rolling training-data intake). Per the escape-hatch rule, it drops to raw
``@ray.remote`` actors — but sharded, never a single bottleneck:

- ``DedupIndexShard``: one actor holding a plain ``set`` of key hashes.
- ``StreamingDeduper``: a ``map_batches`` callable; for each batch it hashes
  keys (md5 64-bit), routes them to ``num_shards`` actors by hash modulo
  (each shard sees a disjoint key space, so no coordination), and keeps only
  rows whose key is newly registered. In-batch duplicates resolve locally
  (first row wins) before any actor round-trip; each batch costs one
  ``ray.get`` over at most ``num_shards`` futures.

Semantics: exactly one surviving row per distinct key — the FIRST to reach
the index. Arrival order under parallel execution is nondeterministic, so
which duplicate survives is too (unlike :func:`dedup.exact_dedup`'s min-id
winner); the invariants that ARE deterministic — one row per key, every key
present, every survivor an input row — are pinned in ``tests/test_streaming.py``.
Use this for ingestion-time filtering; use ``exact_dedup`` when reproducible
winners matter.

Scale: a shard's set holds 8-byte hashes; 1e9 distinct keys across 64 shards
is ~2 GiB per shard actor. Shard count is fixed at construction — size it to
the expected key cardinality, or swap the set for a disk-backed store inside
the shard without touching the streaming side.
"""

from __future__ import annotations

import hashlib
from typing import List, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


@ray.remote(num_cpus=0)
class DedupIndexShard:
    """One shard of the global seen-key index (disjoint key space)."""

    def __init__(self):
        self._seen: set = set()

    def register(self, hashes: List[int]) -> List[bool]:
        """Mark each hash seen; True where THIS call was the first sighting.
        Duplicate hashes within one call: only the first position is True."""
        out = []
        seen = self._seen
        for h in hashes:
            if h in seen:
                out.append(False)
            else:
                seen.add(h)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self._seen)


def start_index(num_shards: int = 8) -> List["ray.actor.ActorHandle"]:
    """Spawn the shard actors (zero CPU reservation — they only mutate sets)."""
    return [DedupIndexShard.remote() for _ in range(num_shards)]


def _key_hashes(keys: pd.Series) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(k).encode()).digest()[:8], "big")
         for k in keys),
        dtype=np.uint64, count=len(keys))


class StreamingDeduper:
    """``map_batches`` callable filtering each batch against the shared index."""

    def __init__(self, shards: List["ray.actor.ActorHandle"], key_col: str):
        self._shards = shards
        self._key = key_col

    def __call__(self, batch: Union[pa.Table, pd.DataFrame]) -> pa.Table:
        tbl = batch if isinstance(batch, pa.Table) else pa.Table.from_pandas(
            batch, preserve_index=False)
        if tbl.num_rows == 0:
            return tbl
        keys = tbl.column(self._key).to_pandas()
        hashes = _key_hashes(keys)
        # in-batch duplicates resolve locally: first occurrence represents
        first_pos = pd.Series(np.arange(len(hashes))).groupby(
            hashes, sort=False).transform("min").to_numpy()
        is_rep = first_pos == np.arange(len(hashes))
        rep_hashes = hashes[is_rep]
        shard_of = (rep_hashes % np.uint64(len(self._shards))).astype(np.int64)
        futs, spans = [], []
        for s in range(len(self._shards)):
            m = shard_of == s
            if m.any():
                futs.append(self._shards[s].register.remote(
                    [int(h) for h in rep_hashes[m]]))
                spans.append(m)
        fresh_rep = np.zeros(len(rep_hashes), dtype=bool)
        for m, res in zip(spans, ray.get(futs)):
            fresh_rep[m] = res
        # a non-representative row is a duplicate of an earlier in-batch row
        fresh = np.zeros(len(hashes), dtype=bool)
        fresh[is_rep] = fresh_rep
        return tbl.filter(pa.array(fresh))


def streaming_dedup(
    ds: "ray.data.Dataset", key_col: str, num_shards: int = 8,
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """First-arrival streaming dedup of ``ds`` on ``key_col`` (see module doc)."""
    shards = start_index(num_shards)
    return ds.map_batches(
        StreamingDeduper(shards, key_col),
        batch_format="pyarrow", batch_size=batch_size)
