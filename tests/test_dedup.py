"""Dedup operators: exact, MinHash-LSH, SimHash — planted-duplicate recovery,
pandas-oracle equality for exact dedup, and partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from registry_address_matcher_ray.stages import dedup as D

_LETTERS = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def _mk_docs(n=200, dup_groups=12, seed=5):
    """n base docs + planted near/exact duplicates with known group labels.

    Tokens are random 8-letter words, so unrelated docs share almost no shingles
    and only the planted duplicates exceed the jaccard threshold.
    """
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        words = ["".join(rng.choice(_LETTERS, size=8)) for _ in range(60)]
        rows.append({"doc_id": i, "text": " ".join(words), "dup_group": -1})
    next_id = n
    planted = []
    for g in range(dup_groups):
        base = rows[int(rng.integers(0, n))]
        base["dup_group"] = g
        # exact copy
        rows.append({"doc_id": next_id, "text": base["text"], "dup_group": g})
        next_id += 1
        # near copy: swap one word
        toks = base["text"].split()
        toks[int(rng.integers(0, len(toks)))] = "zulu"
        rows.append({"doc_id": next_id, "text": " ".join(toks), "dup_group": g})
        next_id += 1
        planted.append(g)
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def docs():
    return _mk_docs()


def test_exact_dedup_oracle(docs, ray_session):
    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    got = D.exact_dedup(ds, "text", "doc_id").to_pandas().sort_values("doc_id")
    exp = (docs.sort_values("doc_id").drop_duplicates(subset=["text"], keep="first")
           [["doc_id", "text"]].reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["doc_id", "text"]].reset_index(drop=True), exp)


def test_exact_dedup_partition_invariance(docs, ray_session):
    ds1 = ray.data.from_pandas(docs[["doc_id", "text"]])
    ds8 = ds1.repartition(8)
    a = sorted(D.exact_dedup(ds1, "text", "doc_id").to_pandas()["doc_id"])
    b = sorted(D.exact_dedup(ds8, "text", "doc_id").to_pandas()["doc_id"])
    assert a == b


def test_minhash_finds_planted_dups(docs, ray_session):
    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    res = D.minhash_lsh_dedup(ds, "text", "doc_id", jaccard_threshold=0.5)
    pairs = res["pairs"].to_pandas()
    clusters = res["clusters"].to_pandas()
    id2group = dict(zip(docs.doc_id, docs.dup_group))
    # every planted group (base + exact copy + near copy) must cluster together
    by_group = docs[docs.dup_group >= 0].groupby("dup_group")["doc_id"].apply(list)
    # cluster node ids are canonicalized to strings (stages/cluster.py)
    node2cl = dict(zip(clusters["node"].astype(str), clusters["cluster_id"]))
    for g, ids in by_group.items():
        labels = {node2cl.get(str(i)) for i in ids}
        assert None not in labels, f"group {g}: member missing from clusters"
        assert len(labels) == 1, f"group {g} split across clusters"
    # no pairs between two different planted groups, and none between a planted
    # doc and an unrelated base doc
    for _, r in pairs.iterrows():
        ga, gb = id2group[int(r.id_a)], id2group[int(r.id_b)]
        assert ga == gb and ga >= 0


def test_minhash_partition_invariance(docs, ray_session):
    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    p1 = D.minhash_lsh_dedup(ds, "text", "doc_id")["pairs"].to_pandas()
    p8 = D.minhash_lsh_dedup(ds.repartition(8), "text", "doc_id")["pairs"].to_pandas()
    k1 = sorted(map(tuple, p1[["id_a", "id_b"]].values.tolist()))
    k8 = sorted(map(tuple, p8[["id_a", "id_b"]].values.tolist()))
    assert k1 == k8


def test_simhash_finds_exact_copies(docs, ray_session):
    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    res = D.simhash_dedup(ds, "text", "doc_id")
    pairs = res["pairs"].to_pandas()
    # every exact-copy pair (identical text) must be found (hamming 0)
    texts = docs.groupby("text")["doc_id"].apply(list)
    expected = set()
    for ids in texts:
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                expected.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    got = set(map(tuple, pairs[["id_a", "id_b"]].values.tolist()))
    assert expected <= got


def test_ngram_jaccard_pairs_threshold(docs, ray_session):
    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    pairs = D.ngram_jaccard_pairs(ds, "text", "doc_id", threshold=0.9).to_pandas()
    assert (pairs["jaccard"] >= 0.9).all()


def _mk_len_docs():
    """Fingerprint-dup groups whose raw texts differ only in case/whitespace,
    so canonical keys collide but raw lengths differ."""
    rows = [
        # group A: id 3 is longest (extra spaces), tie broken below
        {"doc_id": 0, "text": "hello world"},           # len 11
        {"doc_id": 3, "text": "Hello   world"},         # len 13  <- winner
        {"doc_id": 7, "text": "HELLO  WORLD"},          # len 12
        # group B: lengths tie (12 vs 12) -> min id 1 wins
        {"doc_id": 1, "text": "foo  bar baz"},          # len 12
        {"doc_id": 9, "text": "foo bar  baz"},          # len 12
        # singleton
        {"doc_id": 5, "text": "unique document"},
        # group C: identical raw text -> min id 2 wins
        {"doc_id": 2, "text": "same same"},
        {"doc_id": 8, "text": "same same"},
    ]
    return pd.DataFrame(rows)


def test_keep_longest_semantics(ray_session):
    df = _mk_len_docs()
    ds = ray.data.from_pandas(df)
    got = sorted(
        D.fingerprint_dedup_keep_longest(ds, "text", "doc_id")
        .to_pandas()["doc_id"].tolist())
    assert got == [1, 2, 3, 5]


def test_keep_longest_partition_invariance(ray_session):
    df = _mk_len_docs()
    ds = ray.data.from_pandas(df)
    a = sorted(D.fingerprint_dedup_keep_longest(ds, "text", "doc_id")
               .to_pandas()["doc_id"].tolist())
    b = sorted(D.fingerprint_dedup_keep_longest(ds.repartition(6), "text", "doc_id")
               .to_pandas()["doc_id"].tolist())
    assert a == b


def test_keep_longest_matches_pandas_oracle(docs, ray_session):
    from registry_address_matcher_ray.functions import textfns

    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    got = sorted(D.fingerprint_dedup_keep_longest(ds, "text", "doc_id")
                 .to_pandas()["doc_id"].tolist())
    o = docs.assign(_fp=docs["text"].map(textfns.fingerprint),
                    _len=docs["text"].str.len())
    o = o.sort_values(["_fp", "_len", "doc_id"], ascending=[True, False, True])
    exp = sorted(o.drop_duplicates(subset=["_fp"], keep="first")["doc_id"].tolist())
    assert got == exp


def test_line_dedup_semantics(ray_session):
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "intro\nboilerplate\nbody A",
            "boilerplate\nbody B",
            "body C\n\nboilerplate",
            "boilerplate",
        ],
    })
    out = (D.line_dedup(ray.data.from_pandas(df), "text", "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # first occurrence of 'boilerplate' is (doc 0, line 1); blanks survive;
    # doc 3 loses its only line and drops out entirely
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["text"].tolist() == ["intro\nboilerplate\nbody A", "body B", "body C\n"]


def test_line_dedup_partition_invariance(ray_session):
    rng = np.random.default_rng(7)
    lines_pool = ["".join(rng.choice(_LETTERS, size=10)) for _ in range(40)]
    texts = ["\n".join(rng.choice(lines_pool, size=rng.integers(1, 8)))
             for _ in range(120)]
    df = pd.DataFrame({"doc_id": range(120), "text": texts})
    a = (D.line_dedup(ray.data.from_pandas(df), "text", "doc_id")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (D.line_dedup(ray.data.from_pandas(df).repartition(9), "text", "doc_id")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # pandas oracle: keep first occurrence of each non-blank line
    seen = set()
    exp = {}
    for did, text in zip(df["doc_id"], df["text"]):
        kept = []
        for line in text.split("\n"):
            if line == "" or line not in seen:
                kept.append(line)
                if line != "":
                    seen.add(line)
        if kept:
            exp[did] = "\n".join(kept)
    assert dict(zip(a["doc_id"], a["text"])) == exp


def test_exact_dedup_join_fallback(docs, ray_session):
    """winner_broadcast_limit=0 forces the distributed equi-join winner
    resolution; survivors must be identical to the broadcast path."""
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(8)
    bc = sorted(D.exact_dedup(ds, "text", "doc_id").to_pandas()["doc_id"])
    jn = D.exact_dedup(
        ds, "text", "doc_id", winner_broadcast_limit=0).to_pandas()
    assert sorted(jn["doc_id"]) == bc
    assert list(jn.columns) == ["doc_id", "text"]


def test_keep_longest_join_fallback(docs, ray_session):
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(8)
    bc = sorted(
        D.fingerprint_dedup_keep_longest(ds, "text", "doc_id")
        .to_pandas()["doc_id"])
    jn = D.fingerprint_dedup_keep_longest(
        ds, "text", "doc_id", winner_broadcast_limit=0).to_pandas()
    assert sorted(jn["doc_id"]) == bc
    assert sorted(jn.columns) == ["doc_id", "text"]


# ---------------------------------------------------------------------------
# exact-substring duplication stats (Lee et al. ExactSubstr)
# ---------------------------------------------------------------------------

def _brute_substring_stats(texts: dict, k: int) -> dict:
    import collections

    counts = collections.Counter()
    toks = {d: (t or "").lower().split(" ") for d, t in texts.items()}
    for ts in toks.values():
        for i in range(len(ts) - k + 1):
            counts[" ".join(ts[i:i + k])] += 1
    out = {}
    for d, ts in toks.items():
        starts = [i for i in range(len(ts) - k + 1)
                  if counts[" ".join(ts[i:i + k])] >= 2]
        cov = set()
        for i in starts:
            cov.update(range(i, i + k))
        out[d] = (len(ts), len(starts), len(cov))
    return out


def test_substring_dup_stats_brute_parity(docs, ray_session):
    k = 5
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(6)
    got = D.substring_dup_stats(ds, "text", "doc_id", k=k).to_pandas()
    want = _brute_substring_stats(
        dict(zip(docs.doc_id, docs.text)), k)
    assert len(got) == len(want)
    for row in got.itertuples():
        n, nds, cov = want[row.doc_id]
        assert (row.n_tokens, row.n_dup_shingles, row.dup_tokens) == (n, nds, cov), row
        assert row.dup_token_fraction == round(cov / max(1, n), 6)
    # the planted dup groups must actually produce duplicated spans
    assert got.n_dup_shingles.sum() > 0


def test_substring_dup_stats_all_unique(ray_session):
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["alpha beta gamma delta epsilon zeta",
                 "one two three four five six seven"],
    })
    got = D.substring_dup_stats(
        ray.data.from_arrow(t), "text", "doc_id", k=3).to_pandas()
    assert (got.n_dup_shingles == 0).all() and (got.dup_tokens == 0).all()
    assert (got.dup_token_fraction == 0.0).all()


def test_substring_dup_stats_partition_invariance(docs, ray_session):
    outs = []
    for nb in (2, 9):
        ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(nb)
        outs.append(
            D.substring_dup_stats(ds, "text", "doc_id", k=5)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def _brute_substring_rewrite(texts: dict, k: int) -> dict:
    import collections

    cnt = collections.Counter()
    occs = []
    toks = {d: (t or "").split(" ") for d, t in texts.items()}
    for d in sorted(toks):
        ts = toks[d]
        for i in range(len(ts) - k + 1):
            s = " ".join(ts[i:i + k])
            cnt[s] += 1
            occs.append((d, i, s))
    winner = {}
    for d, i, s in occs:
        if cnt[s] >= 2 and s not in winner:
            winner[s] = (d, i)
    out = {}
    for d in sorted(toks):
        ts = toks[d]
        drop = [False] * len(ts)
        for dd, i, s in occs:
            if dd == d and cnt[s] >= 2 and winner[s] != (dd, i):
                for j in range(i, min(len(ts), i + k)):
                    drop[j] = True
        out[d] = " ".join(t for t, x in zip(ts, drop) if not x)
    return out


def test_substring_rewrite_brute_parity(docs, ray_session):
    k = 5
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(6)
    got = (D.substring_dedup_rewrite(ds, "text", "doc_id", k=k)
           .to_pandas().set_index("doc_id")["text"].to_dict())
    want = _brute_substring_rewrite(dict(zip(docs.doc_id, docs.text)), k)
    assert got == want
    # the planted exact copies must have lost their duplicated spans while
    # their originals (lower doc_id -> winners) kept the text
    originals = docs[docs.dup_group >= 0].groupby("dup_group").doc_id.min()
    copies = docs[docs.dup_group >= 0].groupby("dup_group").doc_id.max()
    assert all(got[o] == docs.set_index("doc_id").text[o] for o in originals)
    assert all(len(got[c]) < len(docs.set_index("doc_id").text[c]) for c in copies)


def test_substring_rewrite_all_unique_is_identity(ray_session):
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["alpha beta gamma delta epsilon zeta",
                 "one two three four five six seven"],
    })
    got = (D.substring_dedup_rewrite(ray.data.from_arrow(t), "text",
                                     "doc_id", k=3)
           .to_pandas().set_index("doc_id")["text"].to_dict())
    assert got == {1: "alpha beta gamma delta epsilon zeta",
                   2: "one two three four five six seven"}


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def _brute_contamination(corpus: dict, bench_texts: list, k: int) -> dict:
    """Per-doc hit counts by literal shingle-text comparison."""
    bset = set()
    for t in bench_texts:
        ts = (t or "").lower().split(" ")
        for i in range(len(ts) - k + 1):
            bset.add(" ".join(ts[i:i + k]))
    out = {}
    for rid, t in corpus.items():
        ts = (t or "").lower().split(" ")
        out[rid] = sum(1 for i in range(len(ts) - k + 1)
                       if " ".join(ts[i:i + k]) in bset)
    return out


def test_contamination_stats_brute_parity(docs, ray_session):
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(6)
    bench_ids = set(docs["doc_id"][docs["doc_id"] % 7 == 0])
    bench_df = docs[docs["doc_id"].isin(bench_ids)][["doc_id", "text"]]
    bench = ray.data.from_pandas(bench_df).repartition(3)
    got = (D.contamination_stats(ds, bench, "text", "doc_id", k=8,
                                 plan="broadcast")
           .to_pandas().set_index("doc_id").sort_index())
    want = _brute_contamination(
        dict(zip(docs["doc_id"], docs["text"])), list(bench_df["text"]), 8)
    assert {int(i): int(v) for i, v in got["n_hit_shingles"].items()} == want
    assert (got["contaminated"] == (got["n_hit_shingles"] > 0)).all()
    # every benchmark member with >= k tokens flags itself
    assert got.loc[sorted(bench_ids), "contaminated"].all()


def test_contamination_plans_identical(docs, ray_session):
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(5)
    bench = ray.data.from_pandas(
        docs[docs["doc_id"] % 11 == 0][["doc_id", "text"]])
    a = (D.contamination_stats(ds, bench, "text", "doc_id", k=8,
                               plan="broadcast")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (D.contamination_stats(ds, bench, "text", "doc_id", k=8, plan="join")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # auto resolves to one of the two and agrees
    c = (D.contamination_stats(ds, bench, "text", "doc_id", k=8, plan="auto")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, c)


def test_decontaminate_drops_exactly_flagged(docs, ray_session):
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(4)
    bench = ray.data.from_pandas(
        docs[docs["doc_id"] % 13 == 0][["doc_id", "text"]])
    stats = D.contamination_stats(ds, bench, "text", "doc_id", k=8).to_pandas()
    clean = set(stats["doc_id"][~stats["contaminated"]])
    kept = D.decontaminate(ds, bench, "text", "doc_id", k=8).to_pandas()
    assert set(kept["doc_id"]) == clean
    assert set(kept.columns) == {"doc_id", "text"}


def test_contamination_short_and_empty_edge_cases(ray_session):
    corpus = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["one two", "a b c d e f g h i", None],
    })
    bench = pd.DataFrame({"doc_id": [9], "text": ["a b c d e f g h extra"]})
    got = (D.contamination_stats(
        ray.data.from_pandas(corpus), ray.data.from_pandas(bench),
        "text", "doc_id", k=8)
        .to_pandas().set_index("doc_id").sort_index())
    # doc 1 is shorter than k, doc 3 is NULL -> never contaminated
    assert not got.loc[1, "contaminated"] and not got.loc[3, "contaminated"]
    # doc 2 shares exactly one 8-gram window: "a b c d e f g h"
    assert got.loc[2, "contaminated"] and got.loc[2, "n_hit_shingles"] == 1
    # empty benchmark -> nothing contaminated, both plans
    empty = ray.data.from_pandas(pd.DataFrame({"doc_id": [], "text": []}))
    for plan in ("broadcast", "join"):
        g2 = (D.contamination_stats(
            ray.data.from_pandas(corpus), empty, "text", "doc_id",
            k=8, plan=plan).to_pandas())
        assert not g2["contaminated"].any()


def test_lsh_params_tuner():
    from registry_address_matcher_ray.stages.blocking import lsh_params

    prev_rows = 0
    for t in (0.3, 0.5, 0.7, 0.9):
        b, r = lsh_params(t, num_perm=64)
        assert b * r <= 64 and b >= 1 and r >= 1
        # higher thresholds want longer bands (more rows)
        assert r >= prev_rows
        prev_rows = r
        # the S-curve's 50% crossover lands near the target threshold
        crossover = (1.0 - 0.5 ** (1.0 / b)) ** (1.0 / r)
        assert abs(crossover - t) < 0.15, (t, b, r, crossover)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        lsh_params(1.5)


# ---------------------------------------------------------------------------
# exact prefix-filter jaccard join
# ---------------------------------------------------------------------------


def _brute_jaccard_pairs(texts: dict, thr: float):
    import itertools

    sets = {i: {t for t in (x or "").lower().split(" ") if t}
            for i, x in texts.items()}
    out = []
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        u = len(sa | sb)
        j = len(sa & sb) / u if u else 0.0
        if round(j, 6) >= thr:
            out.append((a, b, round(j, 6)))
    return sorted(out)


def test_jaccard_join_exact_completeness(docs, ray_session):
    texts = dict(zip(docs["doc_id"], docs["text"]))
    for thr in (0.5, 0.9):
        want = _brute_jaccard_pairs(texts, thr)
        got = (D.jaccard_join_exact(
            ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(6),
            "text", "doc_id", threshold=thr).to_pandas())
        got_t = sorted(map(tuple, got[["id_a", "id_b", "jaccard"]]
                           .values.tolist()))
        assert got_t == want, thr  # COMPLETE and exact, incl. boundary ties


def test_jaccard_join_exact_partition_invariance(docs, ray_session):
    outs = []
    for parts in (1, 9):
        got = (D.jaccard_join_exact(
            ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(parts),
            "text", "doc_id", threshold=0.6).to_pandas()
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_minhash_truncation_counter(ray_session):
    """Hot-bucket truncation is counted on ONE metrics actor (no per-bucket
    log line); dropped-pair arithmetic matches C(n,2)-C(cap,2)."""
    import time

    from registry_address_matcher_ray.state import metrics as M

    M.truncation_actor()
    M.reset_truncation("minhash_lsh")
    base = " ".join("tok%03d" % i for i in range(40))
    df = pd.DataFrame({"doc_id": list(range(30)), "text": [base] * 30})
    D.minhash_lsh_dedup(ray.data.from_pandas(df), "text", "doc_id",
                        max_group=5)
    snap = {}
    for _ in range(50):  # adds are fire-and-forget: poll the actor mailbox
        snap = M.truncation_snapshot().get("minhash_lsh", {})
        if snap.get("buckets_truncated"):
            break
        time.sleep(0.2)
    assert snap.get("buckets_truncated", 0) > 0
    assert snap.get("rows_dropped", 0) > 0
    # every truncated bucket holds all 30 ids capped to 5:
    # drops C(30,2) - C(5,2) = 435 - 10 = 425 candidate pairs
    assert snap["pairs_dropped"] == snap["buckets_truncated"] * 425
    assert snap["rows_dropped"] == snap["buckets_truncated"] * 25


def test_minhash_dedup_against_cross_corpus(ray_session):
    """Cross-corpus near-dup filter: new docs that copy (or nearly copy)
    reference docs are dropped; unrelated docs survive; no within-corpus
    pairs are emitted."""
    base = _mk_docs(n=60, dup_groups=0, seed=101)
    ref = base.iloc[:40][["doc_id", "text"]].reset_index(drop=True)
    rng = np.random.default_rng(7)
    new_rows = []
    # 5 exact copies of ref docs, 5 near copies (one word swapped), 10 fresh
    for j in range(5):
        new_rows.append({"doc_id": 1000 + j, "text": ref.loc[j, "text"]})
    for j in range(5):
        toks = ref.loc[10 + j, "text"].split()
        toks[int(rng.integers(0, len(toks)))] = "zulu"
        new_rows.append({"doc_id": 1100 + j, "text": " ".join(toks)})
    fresh = base.iloc[40:50][["doc_id", "text"]]
    for _, r in fresh.iterrows():
        new_rows.append({"doc_id": int(r.doc_id) + 2000, "text": r.text})
    new = pd.DataFrame(new_rows)

    res = D.minhash_dedup_against(
        ray.data.from_pandas(new).repartition(3),
        ray.data.from_pandas(ref).repartition(2),
        "text", "doc_id", jaccard_threshold=0.5)
    pairs = res["pairs"].to_pandas()
    filtered = res["filtered"].to_pandas()
    # every copy/near-copy is caught and dropped; the 10 fresh docs survive
    dropped = set(new["doc_id"]) - set(filtered["doc_id"])
    assert dropped == set(range(1000, 1005)) | set(range(1100, 1105))
    # pairs are strictly cross-corpus (id_a in ref, id_b in new)
    assert set(pairs["id_a"]) <= set(ref["doc_id"])
    assert set(pairs["id_b"]) <= set(new["doc_id"])
    assert (pairs["jaccard"] >= 0.5).all()


def test_minhash_dedup_against_no_matches(ray_session):
    """Disjoint corpora: nothing dropped, empty pair set."""
    a = _mk_docs(n=20, dup_groups=0, seed=5)[["doc_id", "text"]]
    b = _mk_docs(n=20, dup_groups=0, seed=99)[["doc_id", "text"]]
    res = D.minhash_dedup_against(
        ray.data.from_pandas(a), ray.data.from_pandas(b),
        "text", "doc_id")
    assert res["pairs"].count() == 0
    assert sorted(res["filtered"].to_pandas()["doc_id"]) == sorted(a["doc_id"])


# ---------------------------------------------------------------------------
# span-level decontamination (Llama-2-style)
# ---------------------------------------------------------------------------


def _brute_span_removal(text, bench_texts, k, buffer):
    bset = set()
    for t in bench_texts:
        bt = (t or "").lower().split(" ")
        for i in range(len(bt) - k + 1):
            bset.add(" ".join(bt[i:i + k]))
    ts = (text or "").split(" ")
    low = (text or "").lower().split(" ")
    drop = [False] * len(ts)
    for i in range(len(low) - k + 1):
        if " ".join(low[i:i + k]) in bset:
            for j in range(max(i - buffer, 0), min(i + k + buffer, len(ts))):
                drop[j] = True
    return " ".join(t for t, d in zip(ts, drop) if not d), sum(drop)


def test_span_decontaminate_partial_removal(ray_session):
    snippet = "q1 q2 q3 q4"  # 4-token benchmark quote, k=3 windows inside
    doc = f"Intro words stay here {snippet} and the tail also stays intact"
    t = pa.table({"doc_id": [1, 2], "text": [doc, "totally clean text here"]})
    bench = ray.data.from_arrow(pa.table({"doc_id": [9], "text": [snippet]}))
    got = (D.decontaminate_spans(ray.data.from_arrow(t), bench, "text",
                                 "doc_id", k=3, buffer=0)
           .to_pandas().set_index("doc_id"))
    want_text, want_n = _brute_span_removal(doc, [snippet], 3, 0)
    assert got.loc[1, "text"] == want_text
    assert int(got.loc[1, "n_removed"]) == want_n == 4
    # flanks survived, quote is gone
    assert "Intro words stay here" in got.loc[1, "text"]
    assert "tail also stays intact" in got.loc[1, "text"]
    assert "q2" not in got.loc[1, "text"]
    assert got.loc[2, "text"] == "totally clean text here"
    assert int(got.loc[2, "n_removed"]) == 0


def test_span_decontaminate_buffer_and_edges(ray_session):
    snippet = "b1 b2 b3"
    # hit at position 0: buffer clamps at the left edge; second hit near the
    # right edge clamps at the end
    doc = f"{snippet} mid1 mid2 mid3 mid4 {snippet}"
    t = pa.table({"doc_id": [1], "text": [doc]})
    bench = ray.data.from_arrow(pa.table({"doc_id": [9], "text": [snippet]}))
    got = (D.decontaminate_spans(ray.data.from_arrow(t), bench, "text",
                                 "doc_id", k=3, buffer=1)
           .to_pandas().iloc[0])
    want_text, want_n = _brute_span_removal(doc, [snippet], 3, 1)
    assert got["text"] == want_text == "mid2 mid3"
    assert int(got["n_removed"]) == want_n == 8
    with pytest.raises(ValueError):
        D.decontaminate_spans(ray.data.from_arrow(t), bench, "text",
                              "doc_id", k=3, buffer=-1)


def test_span_decontaminate_case_and_short_docs(ray_session):
    # matching is lowercased, removal preserves ORIGINAL case; docs shorter
    # than k never change
    bench = ray.data.from_arrow(pa.table({"doc_id": [9],
                                          "text": ["x1 x2 x3"]}))
    t = pa.table({"doc_id": [1, 2],
                  "text": ["KEEP X1 X2 X3 Keep", "x1 x2"]})
    got = (D.decontaminate_spans(ray.data.from_arrow(t), bench, "text",
                                 "doc_id", k=3)
           .to_pandas().set_index("doc_id"))
    assert got.loc[1, "text"] == "KEEP Keep"
    assert got.loc[2, "text"] == "x1 x2"
    assert int(got.loc[2, "n_tokens"]) == 2


def test_span_decontaminate_plans_identical(docs, ray_session):
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(5)
    bench = ray.data.from_pandas(
        docs[docs["doc_id"] % 7 == 0][["doc_id", "text"]])
    a = (D.decontaminate_spans(ds, bench, "text", "doc_id", k=8, buffer=2,
                               plan="broadcast")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (D.decontaminate_spans(ds, bench, "text", "doc_id", k=8, buffer=2,
                               plan="join")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # brute parity on every doc
    bench_texts = list(docs[docs["doc_id"] % 7 == 0]["text"])
    texts = dict(zip(docs["doc_id"], docs["text"]))
    for rid, row in a.set_index("doc_id").iterrows():
        want_text, want_n = _brute_span_removal(texts[rid], bench_texts, 8, 2)
        assert row["text"] == want_text and int(row["n_removed"]) == want_n


def test_span_decontaminate_empty_benchmark(docs, ray_session):
    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    bench = ray.data.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                          "text": pa.array([], pa.string())}))
    got = (D.decontaminate_spans(ds, bench, "text", "doc_id", k=8)
           .to_pandas())
    assert (got["n_removed"] == 0).all()
    assert got["text"].tolist() == [
        ("" if t is None else t) for t in
        got.merge(docs, on="doc_id", suffixes=("", "_orig"))["text_orig"]]
