"""Round-4 corpus ops: boilerplate removal (both plans), CCNet perplexity
buckets, temperature mixing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from registry_address_matcher_ray.stages import analytics as A
from registry_address_matcher_ray.stages import dedup as D


@pytest.fixture(scope="module")
def lined_docs():
    rows = [
        (1, "keep one\nCOOKIE BANNER\nunique a"),
        (2, "COOKIE BANNER\nunique b\n\nNAV BAR"),
        (3, "NAV BAR\nunique c\nCOOKIE BANNER"),
        (4, "only unique here"),
        (5, "COOKIE BANNER"),  # every line removed -> doc drops out
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _expected_boiler(df, max_df):
    lines = df.assign(line=df["text"].str.split("\n")).explode("line")
    dfreq = (lines[lines["line"] != ""].drop_duplicates(["doc_id", "line"])
             .groupby("line").size())
    boiler = set(dfreq[dfreq >= max_df].index)
    out = {}
    for doc, g in lines.groupby("doc_id"):
        kept = [l for l in g["line"] if l == "" or l not in boiler]
        if kept:
            out[doc] = "\n".join(kept)
    return out


@pytest.mark.parametrize("fold_limit,broadcast_limit", [
    (1 << 30, 2_000_000),   # driver-fold fast path
    (0, 2_000_000),         # distributed aggregate + broadcast strip
    (0, 0),                 # distributed aggregate + equi-join strip
])
def test_boilerplate_removed_all_plans(lined_docs, fold_limit,
                                       broadcast_limit):
    ds = ray.data.from_pandas(lined_docs)
    got = D.boilerplate_removed(
        ds, "text", "doc_id", max_df=2,
        broadcast_limit=broadcast_limit,
        fold_input_limit=fold_limit).to_pandas()
    want = _expected_boiler(lined_docs, 2)
    assert dict(zip(got["doc_id"], got["text"])) == want
    assert 5 not in set(got["doc_id"])  # all-boilerplate doc dropped
    assert "COOKIE BANNER" not in "\n".join(got["text"])


def test_boilerplate_empty_set_is_identity(lined_docs):
    ds = ray.data.from_pandas(lined_docs)
    got = D.boilerplate_removed(ds, "text", "doc_id", max_df=99).to_pandas()
    want = lined_docs.sort_values("doc_id").reset_index(drop=True)
    got = got.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "text"]], want)


def test_perplexity_buckets_match_numpy():
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(3, 12)))
             for _ in range(90)]
    df = pd.DataFrame({"doc_id": np.arange(90), "text": texts})
    got = A.perplexity_buckets(
        ray.data.from_pandas(df), "doc_id", "text").to_pandas()

    # independent reference
    toks = df.assign(t=df["text"].str.lower().str.split(" ")).explode("t")
    toks = toks[toks["t"] != ""]
    cnt = toks["t"].value_counts()
    total = float(len(toks))
    lp = toks.assign(lp=np.log(toks["t"].map(cnt).astype(float) / total))
    agg = lp.groupby("doc_id")["lp"].mean().round(6)
    n = len(agg)
    import math
    s = np.sort(agg.to_numpy())
    t_lo = s[max(0, math.ceil(n / 3.0) - 1)]
    t_hi = s[max(0, math.ceil(2 * n / 3.0) - 1)]

    m = got.set_index("doc_id")
    assert np.allclose(m["avg_logprob"].sort_index(), agg.sort_index())
    for doc, row in m.iterrows():
        v = row["avg_logprob"]
        want = "tail" if v <= t_lo else ("middle" if v <= t_hi else "head")
        assert row["bucket"] == want
    # all three buckets populated and ordered by construction
    assert set(m["bucket"]) == {"head", "middle", "tail"}


def test_perplexity_buckets_partition_invariant():
    df = pd.DataFrame({
        "doc_id": np.arange(40),
        "text": [f"a b c w{i % 7}" for i in range(40)],
    })
    a = A.perplexity_buckets(
        ray.data.from_pandas(df), "doc_id", "text").to_pandas()
    b = A.perplexity_buckets(
        ray.data.from_pandas(df).repartition(13), "doc_id", "text").to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_temperature_mix():
    df = pd.DataFrame({"source": ["big"] * 80 + ["mid"] * 16 + ["small"] * 4})
    got = A.temperature_mix(
        ray.data.from_pandas(df), "source", alpha=0.5).to_pandas()
    got = got.set_index("source")
    assert got["n_docs"].to_dict() == {"big": 80, "mid": 16, "small": 4}
    pw = np.sqrt(np.array([80.0, 16.0, 4.0]))
    w = pw / pw.sum()
    assert np.allclose(got.loc[["big", "mid", "small"], "weight"], np.round(w, 6))
    # alpha < 1 upweights the small source vs its natural share
    assert (got.loc["small", "weight"] > got.loc["small", "natural_share"])
    assert abs(got["weight"].sum() - 1.0) < 1e-5


def test_overlap_contamination_palm_rule():
    # benchmark contains doc 0's exact text; doc 1 shares half its windows;
    # doc 2 shares nothing; doc 3 is shorter than k (never dropped)
    base = " ".join(f"w{i}" for i in range(20))          # 20 tokens, 13 windows
    half = " ".join(f"w{i}" for i in range(10)) + " " + \
           " ".join(f"x{i}" for i in range(10))          # windows 1-3 hit
    corpus = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [base, half, "totally different text here", "tiny doc"],
    })
    bench = pd.DataFrame({"doc_id": [100], "text": [base]})
    got = D.overlap_contamination(
        ray.data.from_pandas(corpus), ray.data.from_pandas(bench),
        "text", "doc_id", k=8, frac=0.7,
    ).to_pandas().set_index("doc_id").sort_index()

    assert got.loc[0, "n_windows"] == 13 and got.loc[0, "n_hit_shingles"] == 13
    assert bool(got.loc[0, "dropped"])                  # 100% >= 70%
    assert got.loc[1, "n_hit_shingles"] == 3            # windows at pos 0..2
    assert not bool(got.loc[1, "dropped"])              # 3/13 < 70%
    assert got.loc[2, "n_hit_shingles"] == 0 and not bool(got.loc[2, "dropped"])
    assert got.loc[3, "n_windows"] == 0 and not bool(got.loc[3, "dropped"])


def test_overlap_contamination_integer_threshold_exact():
    # exactly at the boundary: 7 hits / 10 windows at frac=0.7 -> dropped;
    # 6 hits at frac=0.7 -> kept (no float round-off at the boundary)
    toks = [f"t{i}" for i in range(17)]                  # 17 tokens, 10 windows
    doc = " ".join(toks)
    # benchmark covering windows 0..6 = tokens 0..13
    bench_text = " ".join(toks[:14])
    got = D.overlap_contamination(
        ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": [doc]})),
        ray.data.from_pandas(pd.DataFrame({"doc_id": [9], "text": [bench_text]})),
        "text", "doc_id", k=8, frac=0.7,
    ).to_pandas()
    assert got.loc[0, "n_hit_shingles"] == 7
    assert bool(got.loc[0, "dropped"])


def test_temperature_sample_properties():
    from registry_address_matcher_ray.stages import sampling

    df = pd.DataFrame({
        "doc_id": np.arange(1200),
        "source": ["big"] * 1000 + ["small"] * 200,
    })
    ds = ray.data.from_pandas(df)
    got = sampling.temperature_sample(ds, "source", "doc_id",
                                      alpha=0.5, frac=0.5).to_pandas()
    # deterministic: same call twice -> identical rows
    again = sampling.temperature_sample(ds, "source", "doc_id",
                                        alpha=0.5, frac=0.5).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))
    # expected retention: p_s = min(1, 0.5 * N * w_s / c_s)
    pw = np.sqrt(np.array([1000.0, 200.0]))
    w = pw / pw.sum()
    p = np.minimum(1.0, 0.5 * 1200 * w / np.array([1000.0, 200.0]))
    counts = got["source"].value_counts()
    for s, cs, ps in (("big", 1000, p[0]), ("small", 200, p[1])):
        assert abs(counts.get(s, 0) - cs * ps) < 4 * np.sqrt(cs * ps + 1)
    # alpha < 1 keeps a larger FRACTION of the small source
    assert counts["small"] / 200 > counts["big"] / 1000


def test_temperature_sample_saturation_keeps_all():
    from registry_address_matcher_ray.stages import sampling

    # tiny source saturates at p=1: every row survives
    df = pd.DataFrame({
        "doc_id": np.arange(1010),
        "source": ["big"] * 1000 + ["tiny"] * 10,
    })
    got = sampling.temperature_sample(
        ray.data.from_pandas(df), "source", "doc_id",
        alpha=0.1, frac=0.9).to_pandas()
    assert (got["source"] == "tiny").sum() == 10


def test_temperature_sample_nonstring_source_column():
    """Regression: int-typed source columns must look up the same retention
    probability they were counted under (probs keyed by str on both sides)."""
    from registry_address_matcher_ray.stages import sampling

    df = pd.DataFrame({"doc_id": np.arange(100),
                       "source": [1] * 50 + [2] * 50})
    got = sampling.temperature_sample(
        ray.data.from_pandas(df), "source", "doc_id",
        alpha=0.7, frac=0.9).to_pandas()
    assert len(got) > 0
    assert set(got["source"]) == {1, 2}


def test_simhash64_matches_per_bit_reference():
    """The vectorized simhash64 must stay bit-identical to the original
    per-bit tally loop (the SimHash contract all near-dup ops depend on)."""
    import hashlib

    import numpy as np

    from registry_address_matcher_ray.functions import textfns

    def ref(text):
        acc = np.zeros(64, dtype=np.int64)
        for tok in textfns._TOKEN_RE.findall((text or "").lower()):
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
            for b in range(64):
                acc[b] += 1 if (h >> b) & 1 else -1
        out = 0
        for b in range(64):
            if acc[b] > 0:
                out |= 1 << b
        return out

    rng = np.random.default_rng(17)
    vocab = [f"tok{i}" for i in range(300)] + ["բառ", "şehir", "mot-clé"]
    docs = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 80))))
            for _ in range(100)] + ["", "   ", "one", "ONE one oNe"]
    for d in docs:
        assert textfns.simhash64(d) == ref(d)


def test_fix_mojibake_repairs_and_fixpoint():
    """ftfy-style repair: planted single- and double-encoded mojibake is
    repaired byte-exact; clean multilingual text is a fixpoint; the batch
    kernel reports `changed` correctly."""
    import pyarrow as pa

    from registry_address_matcher_ray.functions import textfns as T

    clean = [
        "plain ascii text",
        b"caf\xc3\xa9 na\xc3\xafve".decode("utf-8"),          # café naïve
        b"\xd5\xb0\xd5\xa1\xd5\xb5\xd5\xa5\xd6\x80\xd5\xa5\xd5\xb6".decode("utf-8"),
        b"\xe6\x97\xa5\xe6\x9c\xac\xe8\xaa\x9e".decode("utf-8"),
        "", "   ",
    ]
    for s in clean:
        assert T.fix_mojibake(s) == s

    originals = [b"caf\xc3\xa9".decode("utf-8"),
                 b"\xe2\x80\x9cquote\xe2\x80\x9d".decode("utf-8"),
                 b"\xd5\xb0\xd5\xa1\xd5\xb5".decode("utf-8")]
    for orig in originals:
        once = orig.encode("utf-8").decode("latin-1")
        twice = once.encode("utf-8").decode("latin-1")
        assert T.fix_mojibake(once) == orig, repr(once)
        assert T.fix_mojibake(twice) == orig, repr(twice)

    # batch kernel: mixed batch, changed flags, clean fast path
    batch = pa.table({"text": pa.array(
        [clean[1], originals[0].encode("utf-8").decode("latin-1"), None])})
    out = T.fix_mojibake_column(batch, "text")
    assert out.column("text_fixed").to_pylist() == [clean[1], originals[0], ""]
    # null -> "" is normalization, not a repair: changed stays False
    assert out.column("changed").to_pylist() == [False, True, False]
    allclean = T.fix_mojibake_column(pa.table({"text": clean[:4]}), "text")
    assert allclean.column("changed").to_pylist() == [False] * 4


def test_within_doc_line_dedup_matches_sql_window():
    """Planted duplicate lines: the Python kernel and the DuckDB per-doc
    min-line_no window (the production oracle) agree on cleaned text and
    removal counts; blank lines survive; cross-doc duplicates untouched."""
    import duckdb
    import pandas as pd

    from registry_address_matcher_ray.functions import textfns as T

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a\nb\na\n\nb\nc",          # dups of a and b
            "a\nb\nc",                   # cross-doc dup only: untouched
            "\n\nx\n\nx\n\n",            # blanks always kept
            "",                          # empty doc
        ],
    })
    got = []
    for t in docs["text"]:
        cleaned, removed = T.dedup_lines_within(t)
        got.append((cleaned, removed))
    assert got[0] == ("a\nb\n\nc", 2)
    assert got[1] == ("a\nb\nc", 0)
    assert got[2] == ("\n\nx\n\n\n", 1)
    assert got[3] == ("", 0)

    sql = """
        WITH lines AS (
            SELECT doc_id,
                   unnest(string_split(text, chr(10))) AS line,
                   generate_subscripts(string_split(text, chr(10)), 1)
                       AS line_no
            FROM docs
        ), keep AS (
            SELECT doc_id, line, line_no,
                   CASE WHEN line = '' THEN NULL
                        ELSE min(line_no) OVER (PARTITION BY doc_id, line)
                   END AS first_no
            FROM lines
        )
        SELECT doc_id,
               string_agg(line, chr(10) ORDER BY line_no)
                   FILTER (WHERE line = '' OR line_no = first_no) AS text,
               CAST(sum(CASE WHEN line <> '' AND line_no <> first_no
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
        FROM keep GROUP BY doc_id ORDER BY doc_id
    """
    oracle = duckdb.sql(sql).df()
    for i, (cleaned, removed) in enumerate(got):
        # string_agg of an all-filtered-out-to-empty doc yields '' via the
        # single empty line; NULL only when the doc has zero lines (never)
        assert (oracle["text"][i] or "") == cleaned, i
        assert int(oracle["n_removed"][i]) == removed, i


def test_compression_ratio_signal():
    from registry_address_matcher_ray.functions import textfns as T

    import numpy as np

    rng = np.random.default_rng(9)
    repetitive = "spam ham " * 500
    natural = " ".join(
        "".join(rng.choice(list("abcdefghijklmnop"), size=rng.integers(2, 9)))
        for _ in range(1000))
    r_rep = T.compression_ratio(repetitive)
    r_nat = T.compression_ratio(natural)
    assert 0 < r_rep < r_nat < 1.0
    assert T.compression_ratio("") == 0.0
    # deterministic across calls
    assert T.compression_ratio(natural) == r_nat


# ------------------------------------------------------------------ C4 §2.2


def test_c4_clean_doc_line_rules():
    from registry_address_matcher_ray.functions import textfns as T

    text = "\n".join([
        "This line has enough words to stay.",      # kept
        "Short line.",                               # < 5 words -> dropped
        "This line has no terminal punctuation",     # no terminal -> dropped
        "Please enable JavaScript to view comments.",  # javascript -> dropped
        'He said "five words are here."',            # ends in quote? ends '."' -> kept (last char ")
        "Trailing spaces keep the terminal mark.   ",  # rtrim -> kept
        "",                                          # blank -> dropped
    ])
    kept, n_kept, n_drop, sents, passes = T.c4_clean_doc(text)
    lines = kept.split("\n")
    assert lines == [
        "This line has enough words to stay.",
        'He said "five words are here."',
        "Trailing spaces keep the terminal mark.   ",
    ]
    assert (n_kept, n_drop) == (3, 4)
    assert sents == 3  # two periods inside quotes line? count [.!?] chars
    assert passes  # 3 sentences >= default min_sentences=3


def test_c4_clean_doc_page_rules():
    from registry_address_matcher_ray.functions import textfns as T

    good = "One good sentence right here.\nAnother proper sentence is here.\nA third full sentence sits here."
    assert T.c4_clean_doc(good)[4] is True
    # < min_sentences
    assert T.c4_clean_doc("Only one full sentence is here.")[4] is False
    assert T.c4_clean_doc("Only one full sentence is here.",
                          min_sentences=1)[4] is True
    # page kills on ORIGINAL text even when the offending line is dropped
    assert T.c4_clean_doc(good + "\nLorem Ipsum dolor")[4] is False
    assert T.c4_clean_doc(good + "\nvar x = {1};")[4] is False
    assert T.c4_clean_doc(good, badwords=("sentence",))[4] is False
    assert T.c4_clean_doc(good, badwords=("absent",))[4] is True
    # empty / None-ish text
    assert T.c4_clean_doc("") == ("", 0, 1, 0, False)


def test_c4_clean_stage_matches_per_doc_kernel():
    from registry_address_matcher_ray.functions import textfns as T

    docs = [
        (1, "A first proper sentence is here.\nshort.\nSecond proper sentence is also here.\nThird full sentence rounds it out."),
        (2, "No terminal punctuation at all here"),
        (3, "Lorem ipsum makes this page fail.\nEven with a full sentence here.\nAnd a third one for the floor."),
        (4, None),
        (5, "Enable javascript for this one.\nBut keep this full proper sentence.\nAnd this second proper sentence too.\nAnd a third proper sentence as well."),
    ]
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    got = (A.c4_clean(ray.data.from_pandas(df).repartition(3), "text", "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, (_, raw) in enumerate(docs):
        k, nk, nd, s, p = T.c4_clean_doc(raw or "")
        assert got["text"][i] == k
        assert int(got["lines_kept"][i]) == nk
        assert int(got["lines_dropped"][i]) == nd
        assert int(got["sentences"][i]) == s
        assert bool(got["passes"][i]) == p
    # doc 3: lorem kills the page even though its lines are kept
    assert not got["passes"][2] and got["lines_kept"][2] == 3
    # doc 5: javascript line dropped, remaining 3 sentences pass
    assert got["passes"][4] and got["lines_kept"][4] == 3


# ---------------------------------------------------- near-dup keep-best


def _neardup_corpus():
    base_a = ("alpha bravo charlie delta echo foxtrot golf hotel india "
              "juliet kilo lima mike november oscar papa quebec romeo")
    base_b = ("zebra yankee xray whiskey victor uniform tango sierra "
              "quebec papa oscar november mango lima kilo julia indigo")
    rows = [
        # group A: 3 near-dups, id 11 longest -> survives
        (10, base_a + " extra"),
        (11, base_a + " extra extra padding words"),
        (12, base_a),
        # group B: 2 near-dups with EQUAL length -> min id 20 survives
        (20, base_b + " night watch"),
        (21, base_b + " night watcX"),
        # unclustered docs pass through
        (30, "completely different text about nothing shared at all"),
        (31, "another unrelated document with its own words entirely"),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.mark.parametrize("force_join", [False, True])
def test_neardup_keep_best_retention(force_join):
    df = _neardup_corpus()
    res = D.neardup_keep_best(
        ray.data.from_pandas(df).repartition(3), "text", "doc_id",
        jaccard_threshold=0.6, shingle_k=3,
        winner_broadcast_limit=0 if force_join else None,
    )
    kept = sorted(res["kept"].to_pandas()["doc_id"].tolist())
    assert kept == [11, 20, 30, 31]
    dropped = sorted(int(v) for v in res["dropped"].to_pandas()["node"])
    assert dropped == [10, 12, 21]


def test_neardup_keep_best_no_dups_is_identity():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["totally unique first document text",
                 "second document with different content entirely",
                 "third one sharing nothing with the others"],
    })
    res = D.neardup_keep_best(
        ray.data.from_pandas(df).repartition(2), "text", "doc_id",
        jaccard_threshold=0.8)
    assert sorted(res["kept"].to_pandas()["doc_id"].tolist()) == [1, 2, 3]
    assert res["dropped"].count() == 0


# ---------------------------------------------------- Gopher top-n-grams


def test_top_ngram_fractions_rules():
    from registry_address_matcher_ray.functions import textfns as T

    # "spam ham" dominates: 3 occurrences of the bigram
    s = T.top_ngram_fractions("spam ham spam ham spam ham eggs")
    # bigrams: spam-ham x3, ham-spam x2, ham-eggs x1
    assert s["top2gram"] == "spam ham"
    joined = "spam ham spam ham spam ham eggs"
    assert s["top2frac"] == round(3 * len("spam ham") / len(joined), 6)

    # tie-break: both bigrams occur once -> lexicographically smallest wins
    t = T.top_ngram_fractions("bb aa cc")
    assert t["top2gram"] == "aa cc"

    # newlines are token separators; multiple spaces collapse via the
    # non-empty filter
    u = T.top_ngram_fractions("a b\na b\na  b")
    assert u["top2gram"] == "a b"

    # fewer than n tokens -> empty gram, 0.0
    v = T.top_ngram_fractions("lonely")
    assert v["top2gram"] == "" and v["top2frac"] == 0.0
    assert v["top4gram"] == "" and v["top4frac"] == 0.0
    w = T.top_ngram_fractions("")
    assert all(w[f"top{n}gram"] == "" and w[f"top{n}frac"] == 0.0
               for n in (2, 3, 4))


def test_top_ngram_stage_matches_kernel_and_sql():
    import duckdb

    from registry_address_matcher_ray.functions import textfns as T

    docs = [
        (1, "the cat sat on the mat the cat sat again"),
        (2, "x y x y x y x y"),
        (3, "one two three four five six seven"),
        (4, None),
        (5, "solo"),
        (6, "line one\nline one\nline two"),
    ]
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    got = (A.top_ngram_stats(
        ray.data.from_pandas(df).repartition(3), "text", "doc_id")
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # stage == per-doc kernel
    for i, (_, raw) in enumerate(docs):
        s = T.top_ngram_fractions(raw or "")
        for n in (2, 3, 4):
            assert got[f"top{n}gram"][i] == s[f"top{n}gram"], (i, n)
            assert abs(got[f"top{n}frac"][i] - s[f"top{n}frac"]) < 1e-12

    # kernel == the oracle SQL's QUALIFY pick on the same frame
    con = duckdb.connect()
    con.register("documents", df)
    import __ray_entry__ as E

    sql = E.oracle_sql()["docs_top_ngrams"]
    oracle = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
    for n in (2, 3, 4):
        assert oracle[f"top{n}gram"].tolist() == got[f"top{n}gram"].tolist()
        assert np.allclose(oracle[f"top{n}frac"], got[f"top{n}frac"])


def test_neardup_keep_best_precomputed_clusters():
    # SimHash-style labels supplied directly: winner by length, tie -> min id
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["short", "much longer text here", "unrelated", "also free"],
    })
    labels = pd.DataFrame({"node": ["1", "2"], "cluster_id": ["1", "1"]})
    res = D.neardup_keep_best(
        ray.data.from_pandas(df).repartition(2), "text", "doc_id",
        clusters=ray.data.from_pandas(labels))
    assert sorted(res["kept"].to_pandas()["doc_id"].tolist()) == [2, 3, 4]
    assert res["dropped"].to_pandas()["node"].tolist() == ["1"]
