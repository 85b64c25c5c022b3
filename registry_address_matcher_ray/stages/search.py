"""Ranked keyword retrieval over a document corpus.

BM25 (Okapi, Lucene ``ln(1 + (n - df + .5)/(df + .5))`` idf variant) top-k
search as two streaming passes — the retrieval primitive a training-data
pipeline uses to pull topical slices out of a crawl (the query side of the
reference's search-key lookup, `/root/reference/address.py:305-330`,
generalised from exact-key equality to ranked relevance).

Scale shape:
- pass A reduces per-batch partials (per-query-term document frequency, the
  corpus token count) driver-side — O(|query terms| + 1) rows per batch, never
  corpus-sized; ``n`` comes from Dataset metadata.
- pass B scores each batch against the broadcast (idf, avgdl) constants with
  vectorized pandas groupbys, keeps a local top-k per batch, and the global
  top-k is a sort+limit over ≤ k·#batches rows.
Tokenization matches the corpus token ops (lowercase, split on single spaces,
drop empties).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

__all__ = ["bm25_topk"]


def _tokens(query: str) -> list[str]:
    seen: dict[str, None] = {}
    for t in query.lower().split(" "):
        if t:
            seen.setdefault(t, None)
    return list(seen)


def bm25_topk(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    ndigits: int = 6,
) -> ray.data.Dataset:
    """Top-``k`` documents for ``query`` by BM25, ties broken by id asc.

    Output columns: ``(id_col, score)`` with ``score`` rounded to ``ndigits``
    AFTER the top-k cut (selection runs on the unrounded double, same as the
    SQL oracle's ``row_number() OVER (ORDER BY score DESC, id)``).
    """
    terms = _tokens(query)
    if not terms:
        raise ValueError("query has no tokens")
    n_docs = ds.count()
    term_set = set(terms)
    if n_docs == 0:
        # empty corpus: no hits, same shape as the no-match path (avoids a
        # ZeroDivisionError computing avgdl)
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], ds.schema().base_schema.field(id_col).type),
            "score": pa.array([], pa.float64()),
        }))

    def _stats_partial(df: "pd.DataFrame") -> "pd.DataFrame":
        s = df[text_col].fillna("").str.lower().str.split(" ").explode()
        s = s[s != ""].dropna()
        total_len = int(len(s))
        hit = s[s.isin(term_set)]
        pairs = pd.DataFrame({"_id": df.loc[hit.index, id_col], "token": hit})
        d = (pairs.drop_duplicates().groupby("token", observed=True)
             .size().astype("int64"))
        return pd.DataFrame({
            "token": [""] + list(d.index),
            "d": [0] + list(d.to_numpy()),
            "len": [total_len] + [0] * len(d),
        })

    df_map: dict[str, int] = {t: 0 for t in terms}
    total_len = 0
    for part in (ds.select_columns([id_col, text_col])
                 .map_batches(_stats_partial, batch_format="pandas")
                 .iter_batches(batch_format="pandas")):
        for token, d, ln in zip(part["token"], part["d"], part["len"]):
            if token:
                df_map[token] += int(d)
            else:
                total_len += int(ln)
    avgdl = total_len / float(n_docs)
    idf = {t: float(np.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)))
           for t, d in df_map.items()}
    consts_ref = ray.put((idf, avgdl, sorted(term_set)))

    def _score(df: "pd.DataFrame") -> "pd.DataFrame":
        idf_m, adl, term_list = ray.get(consts_ref)
        s = df[text_col].fillna("").str.lower().str.split(" ").explode()
        s = s[s != ""].dropna()
        if not len(s):
            return pd.DataFrame({id_col: pd.Series([], dtype=df[id_col].dtype),
                                 "score": pd.Series([], dtype="float64")})
        ids = df.loc[s.index, id_col]
        dl = ids.groupby(ids, observed=True).size().rename("dl")
        hit = s.isin(set(term_list))
        tf = (pd.DataFrame({id_col: ids[hit], "token": s[hit]})
              .groupby([id_col, "token"], observed=True)
              .size().rename("tf").reset_index())
        if not len(tf):
            return pd.DataFrame({id_col: pd.Series([], dtype=df[id_col].dtype),
                                 "score": pd.Series([], dtype="float64")})
        tf["dl"] = tf[id_col].map(dl).astype(float)
        tfv = tf["tf"].to_numpy(dtype=float)
        idfv = tf["token"].map(idf_m).to_numpy(dtype=float)
        # operand order mirrors the SQL oracle expression exactly
        w = idfv * (tfv * (k1 + 1.0)) / (
            tfv + k1 * (1.0 - b + b * tf["dl"].to_numpy() / adl))
        out = (pd.DataFrame({id_col: tf[id_col], "score": w})
               .groupby(id_col, observed=True)["score"].sum().reset_index())
        out = out.sort_values(["score", id_col], ascending=[False, True],
                              kind="mergesort").head(k)
        return out.reset_index(drop=True)

    scored = ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pandas")
    top = scored.sort(["score", id_col], descending=[True, False]).limit(k)

    def _round(batch: pa.Table) -> pa.Table:
        sc = np.round(batch.column("score").to_numpy(zero_copy_only=False),
                      ndigits)
        return batch.set_column(batch.schema.get_field_index("score"),
                                "score", pa.array(sc, pa.float64()))

    return top.map_batches(_round, batch_format="pyarrow")
