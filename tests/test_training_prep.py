"""End-to-end training-prep pipeline (pipelines/training_prep.py): dedup ->
decontaminate -> quality filter -> seeded shuffle -> resumable shard write."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from registry_address_matcher_ray.pipelines.training_prep import (
    run_training_prep,
)


def _mk_corpus():
    rng = np.random.default_rng(41)
    stop = ["the", "and", "of", "to", "in", "is"]
    rows = []
    for i in range(120):
        words = [stop[int(rng.integers(0, len(stop)))]
                 if rng.random() < 0.3 else
                 "".join(rng.choice(list("abcdefgh"), size=6))
                 for _ in range(30)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    # planted exact duplicates: 5 docs copy doc 0..4 (higher ids lose)
    for j in range(5):
        rows.append({"doc_id": 200 + j, "text": rows[j]["text"]})
    # garbage docs the quality filter should drop (distinct texts so the
    # exact-dedup stage keeps them all)
    for j in range(6):
        rows.append({"doc_id": 300 + j, "text": f"x#!{j}"})
    return pd.DataFrame(rows)


def test_training_prep_end_to_end(ray_session, tmp_path):
    df = _mk_corpus()
    bench = pd.DataFrame({
        "doc_id": [900],
        # contaminate doc 10: share its first 8 tokens
        "text": [" ".join(df.loc[10, "text"].split()[:8])],
    })
    out = str(tmp_path / "prep")
    res = run_training_prep(
        rd.from_pandas(df), out,
        benchmark=rd.from_pandas(bench),
        quality_weights=(-3.8, 0.4, 0.1, 2.0, 2.0),
        seed="t", num_shards=4, counts=True)
    assert sorted(res["written"]) == [f"shard={i}" for i in range(4)]
    back = rd.read_parquet(out).to_pandas()

    # expected survivors: exact-dedup winners (min id), minus the
    # contaminated doc, minus quality-dropped garbage
    surv = df.sort_values("doc_id").drop_duplicates("text", keep="first")
    surv = surv[surv.doc_id != 10]
    surv = surv[~surv.doc_id.isin(range(300, 306))]
    assert sorted(back["doc_id"]) == sorted(surv["doc_id"])
    # shuffle order is the seeded md5 permutation over the survivors
    exp_order = sorted(
        surv["doc_id"],
        key=lambda v: (hashlib.md5(("t" + str(v)).encode()).hexdigest(), v))
    got = back.sort_values("shuffle_pos")
    assert list(got["doc_id"]) == exp_order
    # hive partition values may read back as strings
    assert (got["shard"].astype("int64").to_numpy() ==
            got["shuffle_pos"].to_numpy() % 4).all()
    # stage counts recorded
    c = res["counts"]
    assert c["after_exact_dedup"] == 120 + 6
    assert c["after_decontaminate"] == 120 + 6 - 1
    assert c["after_quality_filter"] == len(surv)

    # resume: drop one shard, re-run -> only that shard rewritten
    import shutil, os
    shutil.rmtree(os.path.join(out, "shard=1"))
    res2 = run_training_prep(
        rd.from_pandas(df), out,
        benchmark=rd.from_pandas(bench),
        quality_weights=(-3.8, 0.4, 0.1, 2.0, 2.0),
        seed="t", num_shards=4)
    assert res2["written"] == ["shard=1"]
    back2 = rd.read_parquet(out).to_pandas()
    assert sorted(back2["doc_id"]) == sorted(back["doc_id"])


def test_training_prep_trained_quality(ray_session, tmp_path):
    """train_quality_on wires the distributed fit into the filter stage."""
    df = _mk_corpus()
    df["label"] = (df["doc_id"] < 300).astype("int64")  # garbage = 0
    out = str(tmp_path / "prep2")
    res = run_training_prep(
        rd.from_pandas(df), out, train_quality_on="label",
        seed="t2", num_shards=2, counts=True)
    assert len(res["counts"]["trained_quality_weights"]) == 5
    back = rd.read_parquet(out).to_pandas()
    # the learned filter separates the planted classes: garbage gone,
    # real docs (dedup winners) kept
    assert not set(range(300, 306)) & set(back["doc_id"])
    assert res["counts"]["after_quality_filter"] >= 115


def _seq_pack_expected(ordered_counts, shard, seq_len):
    """Sequential transcription of the next-fit rule over one shard's
    shuffle order — the parity oracle for pack_shuffled."""
    seq_ids, seq_pos = [], []
    local, fill, pos = 0, 0, 0
    for n in ordered_counts:
        if fill > 0 and fill + n > seq_len:
            local += 1
            fill, pos = 0, 0
        seq_ids.append((shard << 32) + local)
        seq_pos.append(pos)
        fill += int(n)
        pos += 1
    return seq_ids, seq_pos


@pytest.mark.parametrize("tok", ["whitespace", "bpe"])
def test_training_prep_packed(ray_session, tmp_path, tok):
    """pack_len wires tokenize -> next-fit packing into the flagship:
    written rows carry n_tokens/seq_id/seq_pos matching a sequential
    transcription over the same shuffle order, and the _manifest/ parquet
    aggregates per-sequence token totals."""
    import os

    df = _mk_corpus()
    out = str(tmp_path / f"packed-{tok}")
    res = run_training_prep(
        rd.from_pandas(df), out, seed="pk", num_shards=3,
        pack_len=64, tokenizer=tok, bpe_num_merges=40)
    assert sorted(res["written"]) == [f"shard={i}" for i in range(3)]
    back = rd.read_parquet(out).to_pandas()
    back["shard"] = back["shard"].astype("int64")
    for c in ("n_tokens", "seq_id", "seq_pos"):
        assert c in back.columns
        back[c] = back[c].astype("int64")

    if tok == "whitespace":
        exp_n = {r.doc_id: len(r.text.split())
                 for r in df.itertuples()}
        got_n = dict(zip(back["doc_id"], back["n_tokens"]))
        for d, n in got_n.items():
            assert n == exp_n[d]

    # parity: per shard, next-fit over pos_in_shard order
    for shard, g in back.groupby("shard"):
        g = g.sort_values("pos_in_shard")
        exp_ids, exp_pos = _seq_pack_expected(
            g["n_tokens"].tolist(), int(shard), 64)
        assert g["seq_id"].tolist() == exp_ids
        assert g["seq_pos"].tolist() == exp_pos
        # no sequence exceeds pack_len unless it is a single over-long doc
        tot = g.groupby("seq_id")["n_tokens"].agg(["sum", "count"])
        over = tot[tot["sum"] > 64]
        assert (over["count"] == 1).all()

    # manifest: one row per sequence, totals match the data
    man = rd.read_parquet(res["manifest_dir"]).to_pandas()
    exp_man = (back.groupby(["shard", "seq_id"])["n_tokens"]
               .agg(["sum", "count"]).reset_index())
    man = man.sort_values(["shard", "seq_id"]).reset_index(drop=True)
    exp_man = exp_man.sort_values(["shard", "seq_id"]).reset_index(drop=True)
    assert man["seq_id"].tolist() == exp_man["seq_id"].tolist()
    assert man["seq_tokens"].astype("int64").tolist() == \
        exp_man["sum"].tolist()
    assert man["n_docs"].astype("int64").tolist() == exp_man["count"].tolist()
    # the _manifest dir is invisible to data read-backs (underscore prefix)
    assert "_manifest" not in " ".join(
        rd.read_parquet(out).input_files())

    # crash-resume THROUGH the packed write: drop one shard, re-run ->
    # only that shard rewritten, bytes equivalent, manifest regenerated
    import shutil
    shutil.rmtree(os.path.join(out, "shard=1"))
    res2 = run_training_prep(
        rd.from_pandas(df), out, seed="pk", num_shards=3,
        pack_len=64, tokenizer=tok, bpe_num_merges=40)
    assert res2["written"] == ["shard=1"]
    back2 = rd.read_parquet(out).to_pandas()
    for c in ("shard", "n_tokens", "seq_id", "seq_pos"):
        back2[c] = back2[c].astype("int64")
    key = ["doc_id", "shard", "pos_in_shard", "n_tokens", "seq_id",
           "seq_pos"]
    a = back[key].sort_values("doc_id").reset_index(drop=True)
    b = back2[key].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    man2 = rd.read_parquet(res2["manifest_dir"]).to_pandas()
    assert len(man2) == len(man)


def test_prep_job_cli(tmp_path):
    """The ray-job-submit entrypoint runs end-to-end in a fresh process
    (parquet in -> shard dirs out -> one JSON summary line)."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    df = _mk_corpus()
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src)
    out = str(tmp_path / "shards")
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, "-m", "registry_address_matcher_ray.prep_job",
         "--docs", src, "--out", out, "--num-shards", "2", "--seed", "cli",
         "--quality-weights", "-3.8", "0.4", "0.1", "2.0", "2.0"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert sorted(summary["written"]) == ["shard=0", "shard=1"]
    assert os.path.exists(os.path.join(out, "shard=0", "_SUCCESS"))
