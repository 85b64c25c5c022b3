"""Soundex parity: scalar vs vectorized series vs generated DuckDB SQL."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from registry_address_matcher_ray.functions.phonetic import (
    soundex,
    soundex_series,
    sql_soundex,
)
from registry_address_matcher_ray.stages.blocking import (
    soundex_block_sizes,
    soundex_keys,
)

WORDS = [
    "Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister", "Honeyman",
    "smith", "SMYTH", "schmidt", "", "123", "a", "O'Brien", "McDonald",
    "Washington", "Lee", "Gutierrez", "Jackson", "aaaaaa", "bcdbcd",
    "wwhh", "Euler", "Gauss", "Hilbert", "Knuth", "Lloyd", "Lukasiewicz",
    "héllo", "x1y2z3", "PPPFFF",
]


def test_known_vectors():
    assert soundex("Robert") == "R163"
    assert soundex("smith") == soundex("SMYTH") == "S530"
    assert soundex("") == ""
    assert soundex("42") == ""


def test_series_matches_scalar():
    got = soundex_series(pd.Series(WORDS + [None]))
    want = [soundex(w) for w in WORDS] + [""]
    assert list(got) == want


def test_sql_matches_scalar():
    con = duckdb.connect()
    con.register("w", pd.DataFrame({"token": WORDS}))
    got = con.execute(
        f"SELECT {sql_soundex('token')} AS code FROM w"
    ).fetchdf()["code"]
    assert list(got) == [soundex(w) for w in WORDS]


def test_soundex_keys_stage():
    t = pa.table({"id": [1, 2, 3],
                  "name": ["smith smyth", "robert rupert robert", ""]})
    for parallelism in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parallelism)
        keys = soundex_keys(ds, "id", "name").to_pandas()
        keys = keys.sort_values(["id", "token"]).reset_index(drop=True)
        assert list(keys.itertuples(index=False, name=None)) == [
            (1, "smith", "S530"), (1, "smyth", "S530"),
            (2, "robert", "R163"), (2, "rupert", "R163"),
        ]
        sizes = soundex_block_sizes(ds, "id", "name").to_pandas()
        sizes = dict(zip(sizes["code"], sizes["n"]))
        assert sizes == {"S530": 1, "R163": 1}


# -- property parity on random strings (scalar is the spec; the vectorized
#    pandas kernel and the generated DuckDB SQL must agree byte-for-byte)

from hypothesis import given, settings, strategies as st

_rand_words = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            max_size=24),
    min_size=1, max_size=30)


@settings(max_examples=60, deadline=None)
@given(_rand_words)
def test_series_parity_property(words):
    got = soundex_series(pd.Series(words, dtype=object))
    assert list(got) == [soundex(w) for w in words]


@settings(max_examples=25, deadline=None)
@given(_rand_words)
def test_sql_parity_property(words):
    con = duckdb.connect()
    con.register("w", pd.DataFrame({"token": pd.Series(words, dtype=object)}))
    got = con.execute(
        f"SELECT {sql_soundex('token')} AS code FROM w").fetchdf()["code"]
    assert list(got) == [soundex(w) for w in words]
