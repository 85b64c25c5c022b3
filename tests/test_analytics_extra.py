"""Unit tests for exact_quantiles / token_doc_frequency / crosstab_counts
(round-2 additions; each also has a DuckDB oracle in __ray_entry__)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from registry_address_matcher_ray.stages import analytics as A


@pytest.mark.parametrize("n", [1, 2, 7, 100, 1001])
def test_exact_quantiles_nearest_rank(n):
    rng = np.random.default_rng(n)
    vals = rng.integers(0, 1_000_000, size=n).astype("float64")
    ds = ray.data.from_arrow(pa.table({"x": vals})).repartition(4)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = A.exact_quantiles(ds, "x", qs)
    srt = np.sort(vals)
    for q in qs:
        assert got[q] == srt[max(0, math.ceil(q * n) - 1)], (n, q)


def test_exact_quantiles_empty():
    ds = ray.data.from_arrow(pa.table({"x": pa.array([], type=pa.float64())}))
    assert A.exact_quantiles(ds, "x", [0.5]) == {0.5: None}


def test_token_doc_frequency_vs_pandas():
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": [
            "the cat sat", "the the the dog", "a cat", "", "dog dog cat",
            "The CAT",  # case-folded
        ],
    })
    ds = ray.data.from_pandas(docs).repartition(3)
    got = A.token_doc_frequency(ds, "doc_id", "text", 10).to_pandas()
    # pandas oracle: distinct (doc, token) pairs
    s = docs.set_index("doc_id")["text"].str.lower().str.split(" ").explode()
    s = s[s != ""].dropna()
    want = (
        s.reset_index().drop_duplicates()["text"].value_counts()
        .rename_axis("token").reset_index(name="doc_freq")
        .sort_values(["doc_freq", "token"], ascending=[False, True])
        .head(10).reset_index(drop=True)
    )
    got = got.sort_values(["doc_freq", "token"], ascending=[False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["token", "doc_freq"]], want[["token", "doc_freq"]], check_dtype=False)
    assert int(got.set_index("token").loc["cat", "doc_freq"]) == 4
    assert int(got.set_index("token").loc["the", "doc_freq"]) == 3


def test_crosstab_counts_vs_pandas():
    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame({
        "g": rng.integers(0, 4, size=n),
        "cat": rng.choice(["a", "b", "c"], size=n),
    })
    ds = ray.data.from_pandas(df).repartition(5)
    got = (
        A.crosstab_counts(ds, "g", "cat", categories=["a", "b", "c"])
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    want = pd.crosstab(df["g"], df["cat"]).reset_index()
    for c in ["a", "b", "c"]:
        assert (got[f"n_{c}"].values == want[c].values).all()


def test_crosstab_discovers_categories():
    df = pd.DataFrame({"g": [1, 1, 2], "cat": ["x", "y", "x"]})
    got = A.crosstab_counts(ray.data.from_pandas(df), "g", "cat").to_pandas()
    assert set(got.columns) == {"g", "n_x", "n_y"}
    assert int(got.set_index("g").loc[1, "n_x"]) == 1
    assert int(got.set_index("g").loc[2, "n_x"]) == 1


def test_crosstab_row_fn_derived_key():
    ts = pa.array(
        pd.to_datetime(["2024-01-01 03:15", "2024-01-01 03:45", "2024-01-01 17:00"]))
    t = pa.table({"ts": ts, "cat": ["a", "a", "b"]})
    got = (
        A.crosstab_counts(
            ray.data.from_arrow(t), "hour", "cat", categories=["a", "b"],
            row_fn=lambda b: pc.cast(pc.hour(b.column("ts")), pa.int64()))
        .to_pandas().set_index("hour")
    )
    assert int(got.loc[3, "n_a"]) == 2 and int(got.loc[17, "n_b"]) == 1


def test_grouped_quantiles_vs_numpy():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=300),
        "x": rng.normal(size=300),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    got = (
        A.grouped_quantiles(ds, "g", "x", [0.25, 0.5, 0.9])
        .to_pandas().set_index("g").sort_index()
    )
    for g, sub in df.groupby("g"):
        v = np.sort(sub["x"].to_numpy())
        n = len(v)
        for q, col in [(0.25, "p25"), (0.5, "p50"), (0.9, "p90")]:
            assert got.loc[g, col] == v[max(0, math.ceil(q * n) - 1)], (g, q)


def test_weighted_mean_vs_pandas():
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], size=400),
        "v": rng.uniform(0, 1, size=400),
        "w": rng.uniform(1, 10, size=400),
    })
    ds = ray.data.from_pandas(df).repartition(5)
    got = A.weighted_mean(ds, "g", "v", "w", alias="wm").to_pandas().set_index("g")
    for g, sub in df.groupby("g"):
        want = round((sub.v * sub.w).sum() / sub.w.sum(), 6)
        assert abs(got.loc[g, "wm"] - want) < 1e-9, g


def test_rollup_agg_all_levels():
    df = pd.DataFrame({
        "a": ["x", "x", "x", "y", "y"],
        "b": ["1", "1", "2", "1", "2"],
        "v": [10.0, 20.0, 5.0, 1.0, 2.0],
    })
    ds = ray.data.from_pandas(df).repartition(3)
    got = A.rollup_agg(ds, ["a", "b"], "v", sum_alias="s").to_pandas()
    assert len(got) == 4 + 2 + 1  # finest combos + per-a + grand total

    def row(a, b):
        m = got[(got["a"].fillna("~") == (a or "~")) & (got["b"].fillna("~") == (b or "~"))]
        assert len(m) == 1, (a, b, got)
        return m.iloc[0]

    assert row("x", "1")["cnt"] == 2 and row("x", "1")["s"] == 30.0
    assert row("y", "2")["cnt"] == 1 and row("y", "2")["s"] == 2.0
    assert row("x", None)["cnt"] == 3 and row("x", None)["s"] == 35.0
    assert row("y", None)["cnt"] == 2 and row("y", None)["s"] == 3.0
    assert row(None, None)["cnt"] == 5 and row(None, None)["s"] == 38.0


def test_gopher_quality_rules(ray_session):
    import pandas as pd
    import ray.data

    from registry_address_matcher_ray.stages import analytics as A

    good = "the quick brown fox jumps over lazy dogs and then sits down to rest " \
           "while other animals watch from afar with great interest today"
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            good,                                   # passes every rule
            "",                                     # empty -> fails word count
            "the cat sat",                          # too few words
            good + " " + "#### " * 30,              # symbol ratio too high
            " ".join(["12345"] * 30) + " the end",  # alpha-word ratio too low
        ],
    })
    out = (A.gopher_quality(ray.data.from_pandas(df), "text", "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["passes"].tolist() == [True, False, False, False, False]
    assert out.loc[0, "stop_hits"] >= 1
    assert out.loc[1, "n_words"] == 0 and out.loc[1, "mean_word_len"] == 0.0


_PII_DOCS = [
    "contact me at john.doe+spam@example.co.uk or call +374 (10) 123-456 now",
    "server at 192.168.0.1 and 10.0.0.255, backup 999.999.999.999 too",
    "no pii here, just words and the number 42",
    "a@b.io b@c.org twice, then 12345678 and (044) 555 6677",
    "",
]


def test_pii_redact_python_vs_duckdb_parity(ray_session):
    """Planted-PII corpus: the Ray stage and the oracle SQL (same RE2 patterns)
    must agree byte-for-byte — guards regex-dialect drift."""
    import duckdb
    import importlib.util
    import pandas as pd
    import ray.data

    from registry_address_matcher_ray.stages import analytics as A

    df = pd.DataFrame({"doc_id": range(len(_PII_DOCS)), "text": _PII_DOCS})
    got = (A.pii_redact(ray.data.from_pandas(df), "text", "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    spec = importlib.util.spec_from_file_location("entry_mod", "__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    con = duckdb.connect()
    con.register("documents", df)
    exp = (con.execute(m.oracle_sql()["docs_pii_redact"]).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False)
    assert got.loc[0, "n_emails"] == 1 and got.loc[0, "n_phones"] >= 1
    assert got.loc[1, "n_ips"] >= 2
    assert "<EMAIL>" in got.loc[0, "text"] and "john.doe" not in got.loc[0, "text"]
    assert got.loc[2, "text"] == _PII_DOCS[2]


def test_repetition_stats_python_vs_duckdb_parity(ray_session):
    import duckdb
    import importlib.util
    import pandas as pd
    import ray.data

    from registry_address_matcher_ray.stages import analytics as A

    docs = [
        "a b a b a b",                      # top bigram 'a b' x3 of 5
        "x\ny\nx\ny\nz",                    # dup lines 2/5... (5-3)/5
        "one two",                          # single bigram
        "solo",                             # no bigram
        "",
    ]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    got = (A.repetition_stats(ray.data.from_pandas(df), "text", "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    spec = importlib.util.spec_from_file_location("entry_mod2", "__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    con = duckdb.connect()
    con.register("documents", df)
    exp = (con.execute(m.oracle_sql()["docs_repetition_stats"]).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False)
    assert got.loc[0, "top_bigram"] == "a b"
    assert got.loc[0, "top_bigram_fraction"] == 3 / 5
    assert got.loc[1, "dup_line_fraction"] == 2 / 5
    assert got.loc[3, "top_bigram"] == "" and got.loc[3, "top_bigram_fraction"] == 0.0


def test_group_zscore_vs_pandas():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "id": range(300),
        "g": rng.choice(["a", "b", "c"], size=300),
        "v": rng.normal(10, 4, size=300),
    })
    # a zero-variance group -> null z
    df.loc[df["g"] == "c", "v"] = 5.0
    ds = ray.data.from_pandas(df).repartition(4)
    got = (A.group_zscore(ds, "g", "v", "id").to_pandas()
           .sort_values("id").reset_index(drop=True))
    mean = df.groupby("g")["v"].transform("mean")
    std = df.groupby("g")["v"].transform(lambda s: np.sqrt(np.mean((s - s.mean()) ** 2)))
    want = ((df["v"] - mean) / std.replace(0.0, np.nan)).round(3)
    assert np.allclose(got["z"].values, want.values, equal_nan=True)
    assert got.loc[got["g"] == "c", "z"].isna().all()


def test_iqr_outliers_vs_numpy():
    vals = np.concatenate([np.arange(100, dtype=float), [1e6, -1e6]])
    rng = np.random.default_rng(3)
    rng.shuffle(vals)
    df = pd.DataFrame({"event_id": range(len(vals)), "value": vals})
    ds = ray.data.from_pandas(df).repartition(3)
    got = (A.iqr_outliers(ds, "value", ["event_id"]).to_pandas()
           .sort_values("value").reset_index(drop=True))
    srt = np.sort(vals)
    n = len(vals)
    q1 = srt[max(0, math.ceil(0.25 * n) - 1)]
    q3 = srt[max(0, math.ceil(0.75 * n) - 1)]
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    want = np.sort(vals[(vals < lo) | (vals > hi)])
    assert np.array_equal(got["value"].values, want)
    assert set(got["value"]) >= {1e6, -1e6}


def test_hourly_moving_avg_small():
    ts = pd.to_datetime([
        "2024-01-01 00:10", "2024-01-01 00:50",  # hour 0: avg 2.0
        "2024-01-01 01:00",                        # hour 1: 10
        "2024-01-02 03:30", "2024-01-05 03:00",   # hour 3: avg 5.0
    ])
    df = pd.DataFrame({"ts": ts, "value": [1.0, 3.0, 10.0, 4.0, 6.0]})
    got = A.hourly_moving_avg(ray.data.from_pandas(df).repartition(2), "ts", "value")
    assert list(got["hour"]) == [0, 1, 3]
    assert list(got["avg_value"]) == [2.0, 10.0, 5.0]
    # trailing 3-bucket moving mean over bucket averages
    assert list(got["moving_avg"]) == [2.0, 6.0, round((2 + 10 + 5) / 3, 3)]


def test_bloom_semi_join_exact():
    rng = np.random.default_rng(5)
    probe = pd.DataFrame({"k": np.arange(2000), "payload": rng.integers(0, 9, 2000)})
    build = pd.DataFrame({"fk": np.concatenate([
        rng.choice(np.arange(0, 2000, 3), size=500),  # multiples of 3 only
    ])})
    got = (A.bloom_semi_join(
        ray.data.from_pandas(probe).repartition(4), "k",
        ray.data.from_pandas(build).repartition(3), "fk",
        m_bits=1 << 12)  # small bitmap -> force false positives into verify
        .to_pandas().sort_values("k").reset_index(drop=True))
    want = np.sort(probe[probe["k"].isin(build["fk"])]["k"].values)
    assert np.array_equal(got["k"].values, want)


def test_tfidf_top_terms_small():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["apple banana apple", "banana cherry", "apple DATE date"],
    })
    got = (A.tfidf_top_terms(ray.data.from_pandas(df).repartition(2),
                             "doc_id", "text", k=2)
           .to_pandas().sort_values(["doc_id", "score", "token"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))
    # doc 1: apple tf=2 df=2 -> 2*ln(3/2); banana tf=1 df=2
    top1 = got[got["doc_id"] == 1].iloc[0]
    assert top1["token"] == "apple" and top1["tf"] == 2 and top1["df"] == 2
    assert top1["score"] == round(2 * math.log(3 / 2), 6)
    # doc 3: 'date' (lowercased, tf=2, df=1) outranks apple
    top3 = got[got["doc_id"] == 3].iloc[0]
    assert top3["token"] == "date" and top3["tf"] == 2 and top3["df"] == 1
    assert (got.groupby("doc_id").size() <= 2).all()


def test_tumbling_window_agg_small():
    ts = pd.to_datetime([
        "2024-01-01 00:00:01", "2024-01-01 00:14:59",  # window 0
        "2024-01-01 00:15:00",                          # window 900
        "2024-01-01 01:00:00",                          # window 3600
    ])
    df = pd.DataFrame({"ts": ts, "event_type": ["a", "a", "a", "b"],
                       "value": [1.0, 2.0, 4.0, 8.0]})
    got = (A.tumbling_window_agg(ray.data.from_pandas(df).repartition(2),
                                 "ts", "event_type", "value", width_s=900)
           .to_pandas().sort_values(["event_type", "win_start"])
           .reset_index(drop=True))
    base = int(ts[0].floor("15min").timestamp())
    assert got.loc[0].tolist() == ["a", base, 2, 3.0]
    assert got.loc[1].tolist() == ["a", base + 900, 1, 4.0]
    assert got.loc[2].tolist() == ["b", base + 3600, 1, 8.0]


def test_regex_field_agg_small():
    df = pd.DataFrame({
        "props": ['{"k": 10}', '{"k": 20}', "no match", None, '{"k": 5}'],
        "event_type": ["x", "x", "x", "y", "y"],
    })
    got = (A.regex_field_agg(ray.data.from_pandas(df).repartition(2),
                             "props", "event_type", r'"k": (?P<v>\d+)')
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    assert got.loc[0].tolist() == ["x", 2, 30, 15.0]
    assert got.loc[1].tolist() == ["y", 1, 5, 5.0]


def test_global_rank_and_ntile_vs_pandas():
    rng = np.random.default_rng(17)
    n = 5000
    df = pd.DataFrame({
        "v": rng.integers(0, 500, size=n),    # heavy ties on v
        "id": rng.permutation(n),             # unique tiebreak
    })
    ds = ray.data.from_pandas(df).repartition(13)
    got = (A.ntile(ds, ["v", "id"], 7).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    want = df.sort_values(["v", "id"], kind="mergesort").reset_index(drop=True)
    assert (got["v"].values == want["v"].values).all()
    assert (got["id"].values == want["id"].values).all()
    assert (got["rank"].values == np.arange(n)).all()
    # NTILE semantics: first n%7 buckets get the extra row
    base, rem = divmod(n, 7)
    sizes = got.groupby("tile").size()
    assert sizes.iloc[:rem].eq(base + 1).all() and sizes.iloc[rem:].eq(base).all()
    assert got["tile"].is_monotonic_increasing


def test_global_rank_string_keys():
    df = pd.DataFrame({"s": ["b", "a", "c", "aa", "B"], "x": range(5)})
    got = (A.global_rank(ray.data.from_pandas(df).repartition(3), ["s"])
           .to_pandas().sort_values("rank").reset_index(drop=True))
    assert got["s"].tolist() == sorted(df["s"])


def test_sliding_window_agg_small():
    ts = pd.to_datetime(["2024-01-01 00:50:00", "2024-01-01 01:10:00"])
    df = pd.DataFrame({"ts": ts, "event_type": ["a", "a"], "value": [1.0, 2.0]})
    got = (A.sliding_window_agg(ray.data.from_pandas(df).repartition(2),
                                "ts", "event_type", "value",
                                width_s=3600, slide_s=900)
           .to_pandas().sort_values("win_start").reset_index(drop=True))
    t0 = int(ts[0].timestamp())   # 00:50 -> bucket 00:45
    t1 = int(ts[1].timestamp())   # 01:10 -> bucket 01:00
    b0, b1 = t0 - t0 % 900, t1 - t1 % 900
    # event 0 feeds windows starting b0-2700..b0; event 1 feeds b1-2700..b1
    exp = {}
    for b, v in ((b0, 1.0), (b1, 2.0)):
        for i in range(4):
            w = b - 900 * i
            n, s = exp.get(w, (0, 0.0))
            exp[w] = (n + 1, s + v)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n, s = exp[int(r["win_start"])]
        assert (r["n"], r["sum_value"]) == (n, s)
    # the overlapping middle windows contain both events
    assert exp[b1 - 2700] == (2, 3.0)


def test_distinct_count_agg_vs_pandas():
    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], size=2000),
        "u": rng.integers(0, 50, size=2000),
    })
    got = (A.distinct_count_agg(ray.data.from_pandas(df).repartition(7),
                                ["g"], "u")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = df.groupby("g")["u"].nunique().reset_index()
    assert got["n_distinct"].tolist() == want["u"].tolist()


def test_group_stats_vs_pandas():
    rng = np.random.default_rng(29)
    df = pd.DataFrame({"k": rng.choice(["a", "b"], size=500),
                       "v": rng.integers(0, 1000, size=500)})
    got = (A.group_stats(ray.data.from_pandas(df).repartition(4), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = df.groupby("k")["v"].agg(["count", "sum", "mean", "min", "max"])
    for i, k in enumerate(["a", "b"]):
        assert got.loc[i, "n"] == want.loc[k, "count"]
        assert got.loc[i, "sum_v"] == want.loc[k, "sum"]
        assert got.loc[i, "avg_v"] == round(want.loc[k, "mean"], 6)
        assert got.loc[i, "min_v"] == want.loc[k, "min"]
        assert got.loc[i, "max_v"] == want.loc[k, "max"]


def test_star_revenue_by_nation_vs_pandas():
    rng = np.random.default_rng(31)
    n_li, n_o, n_c = 400, 120, 30
    li = pd.DataFrame({
        "l_orderkey": rng.integers(0, n_o, size=n_li),
        "l_extendedprice": np.round(rng.uniform(10, 1000, size=n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, size=n_li), 2),
    })
    orders = pd.DataFrame({"o_orderkey": np.arange(n_o),
                           "o_custkey": rng.integers(0, n_c, size=n_o)})
    cust = pd.DataFrame({"c_custkey": np.arange(n_c),
                         "c_nationkey": rng.integers(0, 5, size=n_c)})
    nation = pd.DataFrame({"n_nationkey": np.arange(5),
                           "n_name": [f"N{i}" for i in range(5)]})
    got = (A.star_revenue_by_nation(
        ray.data.from_pandas(li).repartition(4),
        ray.data.from_pandas(orders).repartition(2),
        ray.data.from_pandas(cust), ray.data.from_pandas(nation),
        num_partitions=4)
        .to_pandas().sort_values("n_name").reset_index(drop=True))
    j = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cust, left_on="o_custkey", right_on="c_custkey")
         .merge(nation, left_on="c_nationkey", right_on="n_nationkey"))
    units = (np.round(j["l_extendedprice"] * 100).astype("int64")
             * (100 - np.round(j["l_discount"] * 100).astype("int64")))
    want = (units.groupby(j["n_name"]).sum() / 10000.0).round(4)
    assert got["n_name"].tolist() == list(want.index)
    assert got["revenue"].tolist() == want.tolist()


def test_grouped_concat_deterministic():
    df = pd.DataFrame({"k": ["a", "b", "a", "a", "b"],
                       "v": ["z", "m", "x", "y", "n"]})
    for parts in (1, 3):
        got = (A.grouped_concat(ray.data.from_pandas(df).repartition(parts),
                                "k", "v")
               .to_pandas().sort_values("k").reset_index(drop=True))
        assert got["vals"].tolist() == ["x,y,z", "m,n"]


@pytest.mark.parametrize("n_true", [50, 2000, 40000])
def test_approx_distinct_error_bound(n_true):
    rng = np.random.default_rng(n_true)
    vals = rng.choice(n_true, size=n_true * 3, replace=True)  # dups galore
    exact = len(np.unique(vals))
    ds = ray.data.from_pandas(pd.DataFrame({"u": vals})).repartition(5)
    est = A.approx_distinct(ds, "u")
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_approx_distinct_partition_invariant():
    vals = np.arange(10000)
    df = pd.DataFrame({"u": vals})
    ests = {
        A.approx_distinct(ray.data.from_pandas(df).repartition(p), "u")
        for p in (1, 4, 16)
    }
    assert len(ests) == 1  # mergeable sketch: partitioning cannot change it


def test_global_running_sum_vs_pandas():
    rng = np.random.default_rng(37)
    n = 3000
    df = pd.DataFrame({
        "k": rng.permutation(n),
        "v": np.round(rng.uniform(1, 500, size=n), 2),
    })
    got = (A.global_running_sum(ray.data.from_pandas(df).repartition(9),
                                ["k"], "v")
           .to_pandas().reset_index(drop=True))
    want = df.sort_values("k", kind="mergesort").reset_index(drop=True)
    cents = np.round(want["v"] * 100).astype("int64")
    exp = np.round(np.cumsum(cents) / 100.0, 2)
    assert got["k"].tolist() == want["k"].tolist()
    assert got["running"].tolist() == exp.tolist()


def test_rolling_window_per_key_vs_pandas():
    rng = np.random.default_rng(41)
    df = pd.DataFrame({
        "u": rng.integers(0, 20, size=800),
        "t": rng.permutation(800),
        "id": np.arange(800),
        "v": rng.uniform(0, 100, size=800),
    })
    got = (A.rolling_window_per_key(ray.data.from_pandas(df).repartition(5),
                                    "u", ["t", "id"], "v", 3, ["id"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    want = df.sort_values(["u", "t", "id"], kind="mergesort")
    want["trailing_avg"] = (want.groupby("u")["v"]
                            .transform(lambda s: s.rolling(3, min_periods=1)
                                       .mean()).round(4))
    want = want.sort_values("id").reset_index(drop=True)
    assert np.allclose(got["trailing_avg"].values, want["trailing_avg"].values)


def test_global_rank_and_scan_empty_input():
    empty = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                          "v": pa.array([], pa.float64())}))
    assert A.global_rank(empty, ["k"]).count() == 0
    assert A.global_running_sum(empty, ["k"], "v").count() == 0


def test_late_event_flags_small():
    ts = pd.to_datetime([
        "2024-01-01 10:00", "2024-01-01 09:00",  # u1: second arrival is late
        "2024-01-01 11:00",                       # u1: ahead of watermark
        "2024-01-01 08:00",                       # u2: first arrival never late
    ])
    df = pd.DataFrame({"u": [1, 1, 1, 2], "arr": [0, 1, 2, 3],
                       "ts": ts, "id": [10, 11, 12, 13]})
    got = (A.late_event_flags(ray.data.from_pandas(df).repartition(2),
                              "u", "arr", "ts", ["id"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert got["is_late"].tolist() == [False, True, False, False]


def test_bottomk_quantile_sketch_error_and_partition_invariance(ray_session):
    import numpy as np
    import pandas as pd
    import ray
    import ray.data

    from registry_address_matcher_ray.stages import analytics as A

    rng = np.random.RandomState(3)
    n = 20_000
    df = pd.DataFrame({"event_id": np.arange(n, dtype="int64"),
                       "value": rng.lognormal(0.0, 1.0, size=n)})
    exact = {q: float(np.quantile(np.sort(df["value"].to_numpy()), q,
                                  method="lower"))
             for q in (0.25, 0.5, 0.75)}
    outs = []
    for parts in (3, 17):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = A.approx_quantiles_bottomk(
            ds, "value", "event_id", k=2048).to_pandas()
        outs.append(out)
        assert out["sample_n"].iloc[0] == 2048
        # rank error bound: estimated quantile must sit within +-3% of the
        # population rank (k=2048 -> sigma ~ 1.1%)
        vals = np.sort(df["value"].to_numpy())
        for q in (0.25, 0.5, 0.75):
            est = out[f"q{int(q*100):02d}"].iloc[0]
            rank = np.searchsorted(vals, est) / n
            assert abs(rank - q) < 0.03, (q, est, rank)
    # deterministic merge: identical output regardless of partitioning
    assert outs[0].equals(outs[1])


def test_ensure_arrow_schema_normalizes_aggregate_blocks(ray_session):
    import pyarrow as pa
    import ray
    import ray.data
    from ray.data.aggregate import Count

    from registry_address_matcher_ray.stages import analytics as A

    # 3 groups, many partitions -> the hash aggregate emits column-less
    # empty pandas blocks that break a downstream join's key resolution
    ds = ray.data.range(300).map_batches(
        lambda b: pa.table({"k": pa.array(
            [f"g{int(i) % 3}" for i in b.column("id").to_pylist()])}),
        batch_format="pyarrow").repartition(16)
    agg = ds.groupby("k").aggregate(Count(alias_name="n"))
    fixed = A.ensure_arrow_schema(
        agg, pa.schema([("k", pa.string()), ("n", pa.int64())]))
    other = ray.data.from_items([{"k": f"g{i}"} for i in range(3)])
    joined = other.join(fixed, join_type="inner", num_partitions=2, on=("k",))
    out = joined.to_pandas().sort_values("k").reset_index(drop=True)
    assert out["n"].tolist() == [100, 100, 100]


def test_quality_classifier_matches_rowwise(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from registry_address_matcher_ray.functions import textfns
    from registry_address_matcher_ray.stages import analytics as A

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["the quick brown fox and the lazy dog on a log in the fog "
                 "with a cat as it sat by that mat for fun " * 4,
                 "x", "", "aaaa bbbb cccc dddd 1234 !!!"],
    })
    out = (A.quality_classifier(ray.data.from_arrow(t), "text", "doc_id")
           .to_pandas().set_index("doc_id"))
    w = (-3.8, 0.4, 0.1, 2.0, 2.0)
    for row in t.to_pylist():
        q = textfns.quality_features(row["text"])
        z = (w[0] + w[1] * np.log1p(q["n_tokens"]) + w[2] * q["avg_token_len"]
             + w[3] * q["stopword_ratio"] + w[4] * q["alpha_ratio"])
        got = out.loc[row["doc_id"]]
        assert got["quality_score"] == round(1 / (1 + np.exp(-z)), 6)
        assert got["quality_label"] == ("keep" if z >= 0 else "drop")
    # stopword-rich long doc keeps, empty/garbage drops
    assert out.loc[1, "quality_label"] == "keep"
    assert out.loc[3, "quality_label"] == "drop"


# ---------------------------------------------------------------------------
# exact heavy hitters (Misra-Gries candidates + verified recount)
# ---------------------------------------------------------------------------


def _hh_oracle(values, k):
    import collections
    c = collections.Counter(v for v in values if v is not None)
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_heavy_hitters_skewed_certified(ray_session):
    # zipf-ish skew: value i appears ~1000/i times -> certificate holds
    vals = [f"v{i:03d}" for i in range(1, 60) for _ in range(1000 // i)]
    rng = np.random.default_rng(3)
    rng.shuffle(vals)
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(7)
    got = [tuple(r.values()) for r in
           A.heavy_hitters(ds, "x", k=5).take_all()]
    assert got == _hh_oracle(vals, 5)


def test_heavy_hitters_flat_fallback_exact(ray_session):
    # near-flat distribution: MG certificate fails, fallback stays exact
    vals = [i % 97 for i in range(2000)]
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(9)
    got = [tuple(r.values()) for r in
           A.heavy_hitters(ds, "x", k=10, capacity_mult=2).take_all()]
    assert got == _hh_oracle(vals, 10)


def test_heavy_hitters_nulls_and_partition_invariance(ray_session):
    vals = (["a"] * 50 + ["b"] * 30 + [None] * 100 + ["c"] * 10 +
            [f"u{i}" for i in range(40)])
    df = pd.DataFrame({"x": vals})
    expect = _hh_oracle(vals, 3)
    for parts in (1, 4, 13):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = [tuple(r.values()) for r in
               A.heavy_hitters(ds, "x", k=3).take_all()]
        assert got == expect, parts


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def _mk_domain_docs():
    # two vocabularies: "science" target domain vs "spam" background
    sci = "quantum electron proton neutron orbit spin field wave".split()
    spam = "buy cheap now click offer free deal win".split()
    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        words = list(rng.choice(sci, size=30))
        rows.append({"doc_id": i, "text": " ".join(words), "domain": "sci"})
    for i in range(60, 120):
        words = list(rng.choice(spam, size=30))
        rows.append({"doc_id": i, "text": " ".join(words), "domain": "spam"})
    return pd.DataFrame(rows)


def test_dsir_separates_domains(ray_session):
    df = _mk_domain_docs()
    ds = ray.data.from_pandas(df[["doc_id", "text"]]).repartition(5)
    # target = first half of the science docs only
    tgt = ray.data.from_pandas(
        df[(df["domain"] == "sci") & (df["doc_id"] < 30)][["doc_id", "text"]])
    got = A.dsir_weights(ds, tgt, "text", "doc_id").to_pandas()
    m = got.merge(df[["doc_id", "domain"]], on="doc_id")
    sci_mean = m.loc[m["domain"] == "sci", "logratio_mean"].mean()
    spam_mean = m.loc[m["domain"] == "spam", "logratio_mean"].mean()
    # science docs must score strictly above background docs
    assert sci_mean > spam_mean + 0.5
    assert (m.loc[m["domain"] == "sci", "logratio_mean"]
            > m.loc[m["domain"] == "spam", "logratio_mean"].max()).all()


def test_dsir_partition_invariance_and_drops_empty(ray_session):
    df = _mk_domain_docs()
    df.loc[len(df)] = {"doc_id": 999, "text": "", "domain": "x"}
    df.loc[len(df)] = {"doc_id": 998, "text": None, "domain": "x"}
    tgt = ray.data.from_pandas(df[df["doc_id"] < 20][["doc_id", "text"]])
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_pandas(df[["doc_id", "text"]]).repartition(parts)
        outs.append(A.dsir_weights(ds, tgt, "text", "doc_id")
                    .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert 999 not in set(outs[0]["doc_id"])
    assert 998 not in set(outs[0]["doc_id"])
    # single-token doc has one feature (no bigram)
    assert (outs[0]["n_feats"] >= 1).all()


def test_approx_distinct_by_key_error_and_invariance(ray_session):
    rng = np.random.default_rng(21)
    n = 30_000
    df = pd.DataFrame({
        "host": rng.choice([f"h{i}" for i in range(12)], size=n),
        "user": rng.integers(0, 5000, size=n),
    })
    df.loc[:50, "user"] = None  # nulls ignored
    exact = df.dropna(subset=["user"]).groupby("host")["user"].nunique()
    outs = []
    for parts in (3, 11):
        ds = ray.data.from_pandas(df).repartition(parts)
        g = (A.approx_distinct_by_key(ds, "host", "user")
             .to_pandas().set_index("host")["approx_distinct"].sort_index())
        outs.append(g)
    # deterministic hashing -> bit-identical estimates across partitionings
    pd.testing.assert_series_equal(outs[0], outs[1])
    rel = ((outs[0] - exact).abs() / exact).max()
    assert rel < 0.12, rel  # ~3.2% expected at p=10; 12% is a safe ceiling
    # all-null key disappears
    df2 = pd.DataFrame({"host": ["only_null"] * 5, "user": [None] * 5})
    g2 = A.approx_distinct_by_key(
        ray.data.from_pandas(pd.concat([df, df2])), "host", "user").to_pandas()
    assert "only_null" not in set(g2["host"])


def test_count_min_sketch_bounds_and_invariance(ray_session):
    """CMS: est >= true always; bounded overshoot; partition-invariant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from registry_address_matcher_ray.stages.analytics import (
        count_min_estimate, count_min_sketch)

    rng = np.random.default_rng(11)
    # zipf-ish categorical: few heavy keys + long tail
    keys = [f"k{i}" for i in range(300)]
    weights = 1.0 / np.arange(1, 301) ** 1.3
    vals = rng.choice(keys, size=20_000, p=weights / weights.sum())
    true = pd.Series(vals).value_counts()
    tbl = pa.table({"v": pa.array(vals.tolist(), pa.string())})

    sks = [count_min_sketch(rd.from_arrow(tbl).repartition(n), "v",
                            width=1024, depth=4) for n in (1, 7)]
    # partition-invariant: identical sketch from any blocking
    np.testing.assert_array_equal(sks[0], sks[1])
    est = count_min_estimate(sks[0], list(true.index))
    t = true.to_numpy()
    assert (est >= t).all()                      # CMS never undercounts
    assert (est - t).max() <= 2 * 20_000 / 1024  # eps*N overshoot bound
    # heavy keys are essentially exact at this width
    assert (est[:10] == t[:10]).all()
    # total mass per row is preserved exactly
    assert sks[0].sum(axis=1).tolist() == [20_000] * 4


def _mk_quality_docs(n=240, seed=5):
    """Docs whose keep/drop label correlates with real text quality."""
    rng = np.random.default_rng(seed)
    stop = ["the", "and", "of", "to", "in", "is", "it", "that"]
    rows = []
    for i in range(n):
        good = i % 2 == 0
        if good:
            words = [stop[int(rng.integers(0, len(stop)))]
                     if rng.random() < 0.3 else
                     "".join(rng.choice(list("abcdefg"), size=5))
                     for _ in range(40)]
        else:
            words = ["x0#!" + str(int(rng.integers(0, 9)))
                     for _ in range(int(rng.integers(2, 8)))]
        rows.append({"doc_id": i, "text": " ".join(words),
                     "label": 1 if good else 0})
    return pd.DataFrame(rows)


def _train_reference(df, iters=60, lr=0.5, l2=1e-6):
    """Independent sequential implementation of the same fit (numpy only)."""
    from registry_address_matcher_ray.functions import textfns

    X = np.ones((len(df), 5))
    for i, t in enumerate(df["text"]):
        q = textfns.quality_features(t)
        X[i, 1:] = (np.log1p(q["n_tokens"]), q["avg_token_len"],
                    q["stopword_ratio"], q["alpha_ratio"])
    y = df["label"].to_numpy(dtype=np.float64)
    mean = X.mean(axis=0)
    std = X.std(axis=0)
    mean[0], std[0] = 0.0, 1.0
    std[std <= 1e-12] = 1.0
    Xs = (X - mean) / std
    w = np.zeros(5)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w)))
        g = Xs.T @ (p - y) / len(df) + l2 * w
        w = w - lr * g
    raw = np.zeros(5)
    raw[1:] = w[1:] / std[1:]
    raw[0] = w[0] - float((w[1:] * mean[1:] / std[1:]).sum())
    return raw


def test_quality_classifier_train_matches_independent_fit(ray_session):
    df = _mk_quality_docs()
    ds = ray.data.from_pandas(df).repartition(5)
    fit = A.quality_classifier_train(ds, "text", "label")
    exp = _train_reference(df)
    np.testing.assert_allclose(fit["weights"], exp, rtol=1e-9, atol=1e-12)
    # loss decreases over the fit
    assert fit["loss"][-1] < fit["loss"][0]
    assert fit["n"] == len(df)


def test_quality_classifier_train_partition_invariant_and_wires_inference(
        ray_session):
    df = _mk_quality_docs()
    fits = [A.quality_classifier_train(
                ray.data.from_pandas(df).repartition(p), "text", "label")
            for p in (1, 8)]
    np.testing.assert_allclose(fits[0]["weights"], fits[1]["weights"],
                               rtol=1e-9, atol=1e-12)
    # train -> infer: the learned filter separates the planted classes
    scored = A.quality_classifier(
        ray.data.from_pandas(df), "text", "doc_id",
        weights=fits[0]["weights"]).to_pandas()
    merged = scored.merge(df[["doc_id", "label"]], on="doc_id")
    acc = ((merged["quality_label"] == "keep") == (merged["label"] == 1)).mean()
    assert acc >= 0.95


def test_pmi_collocations_matches_pandas(ray_session):
    """PMI top-k equals a pandas transcription (counts, formula, ties)."""
    rng = np.random.default_rng(31)
    vocab = ["new", "york", "san", "francisco", "the", "bay", "area", "data"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(3, 12))))
             for _ in range(80)]
    df = pd.DataFrame({"doc_id": range(80), "text": texts})
    got = (A.pmi_collocations(ray.data.from_pandas(df).repartition(4),
                              "text", top_k=10, min_count=2)
           .to_pandas().reset_index(drop=True))

    from collections import Counter
    uni, bi = Counter(), Counter()
    for t in texts:
        ws = t.lower().split(" ")
        uni.update(ws)
        bi.update(a + " " + b for a, b in zip(ws, ws[1:]))
    nu, nb = float(sum(uni.values())), float(sum(bi.values()))
    rows = []
    for bg, cb in bi.items():
        if cb < 2:
            continue
        w1, w2 = bg.split(" ")
        pmi = np.round(np.log2((cb / nb) / ((uni[w1] / nu) * (uni[w2] / nu))), 6)
        rows.append((w1, w2, cb, pmi))
    exp = (pd.DataFrame(rows, columns=["w1", "w2", "n", "pmi"])
           .sort_values(["pmi", "w1", "w2"], ascending=[False, True, True],
                        kind="mergesort").head(10).reset_index(drop=True))
    exp["n"] = exp["n"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)
