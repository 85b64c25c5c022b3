"""Flagship training-data preparation pipeline: raw document corpus ->
deduped, decontaminated, quality-filtered, globally shuffled, packed,
shard-written training set.

The linkage pipelines (``pipelines/linkage.py``) are the reference's product;
this is the north-star companion for the 100-TB web-text half of the engine —
one composition a training-data user runs end-to-end, each stage an operator
that is individually oracle- or pytest-gated:

1. exact dedup          ``stages.dedup.exact_dedup``            (min-id winner)
2. decontamination      ``stages.dedup.decontaminate``          (optional, GPT-3 App. C)
3. quality filter       ``stages.analytics.quality_classifier`` (supplied or
                        TRAINED weights via ``quality_classifier_train``)
4. global shuffle       ``stages.sampling.shuffled_shards``     (seeded md5 order)
5. tokenize + pack      ``stages.tokenizer.bpe_token_counts`` +
   (optional)           ``stages.sampling.pack_shuffled``       (next-fit per shard)
6. resumable shard sink ``sources.io.write_sharded_resumable``  (per-shard commit)
   + per-shard sequence manifests under ``out_dir/_manifest/``

Scale notes: stages 1-3 are streaming filters / vocab-bounded aggregates; the
one unavoidable all-to-all is stage 4's order-randomizing sort; the sink
commits per shard so a crashed run resumes. Stage outputs stay lazy between
steps — only the final write executes the plan. ``report`` collects row
counts per stage (each ``count()`` is an extra pass over a lazy plan, so it
is opt-in).
"""

from __future__ import annotations

from typing import Optional, Sequence

import ray.data

from ..sources import io as rio
from ..stages import analytics, dedup, sampling


def _attach_token_counts(
    sharded: ray.data.Dataset,
    text_col: str,
    id_col: str,
    tokenizer: str,
    report: dict,
    bpe_num_merges: int,
    bpe_max_words: int,
    train_corpus: ray.data.Dataset,
) -> ray.data.Dataset:
    """Append an ``n_tokens`` column to the shuffled stream. Whitespace is a
    stateless per-batch count; ``"bpe"`` first TRAINS a merge table on the
    filtered corpus (one distributed word-frequency aggregate,
    ``stages.tokenizer.bpe_train``) then counts with the broadcast-ranks
    actor pool — the tokens the model will actually see."""
    import pyarrow as pa

    if tokenizer == "bpe":
        from ..stages import tokenizer as tok

        fit = tok.bpe_train(train_corpus, text_col,
                            num_merges=bpe_num_merges,
                            max_words=bpe_max_words)
        report["bpe_merges"] = len(fit["merges"])
        report["bpe_truncated"] = fit["truncated"]
        return tok.bpe_token_counts(sharded, text_col, id_col,
                                    fit["merges"], out_col="n_tokens",
                                    append=True)
    if tokenizer != "whitespace":
        raise ValueError(f"unknown tokenizer {tokenizer!r} "
                         "(expected 'whitespace' or 'bpe')")

    def _ws(batch: pa.Table) -> pa.Table:
        n = [len([w for w in ("" if t is None else t).split(" ") if w])
             for t in batch.column(text_col).to_pylist()]
        return batch.append_column("n_tokens", pa.array(n, pa.int64()))

    return sharded.map_batches(_ws, batch_format="pyarrow")


def _write_manifest(out_dir: str) -> str:
    """Aggregate per-sequence manifests ``(shard, seq_id, seq_tokens,
    n_docs)`` from the COMMITTED shard directories (disk is the source of
    truth, so a resumed run regenerates a complete manifest) and write them
    under ``out_dir/_manifest/``. Small by construction: one row per packed
    sequence."""
    import os
    import shutil

    from ray.data.aggregate import Count, Sum

    man_dir = os.path.join(out_dir, "_manifest")
    if os.path.exists(man_dir):
        shutil.rmtree(man_dir)
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(out_dir, columns=["shard", "seq_id",
                                                 "n_tokens"])

    def _cast(b: pa.Table) -> pa.Table:
        # hive partition values read back as strings
        return pa.table({"shard": pc.cast(b.column("shard"), pa.int64()),
                         "seq_id": pc.cast(b.column("seq_id"), pa.int64()),
                         "n_tokens": pc.cast(b.column("n_tokens"),
                                             pa.int64())})

    man = ds.map_batches(_cast, batch_format="pyarrow").groupby(
        ["shard", "seq_id"]).aggregate(
        Sum("n_tokens", alias_name="seq_tokens"),
        Count(alias_name="n_docs"))
    man.write_parquet(man_dir)
    return man_dir


def run_training_prep(
    docs: ray.data.Dataset,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark: Optional[ray.data.Dataset] = None,
    quality_weights: Optional[Sequence[float]] = None,
    train_quality_on: Optional[str] = None,
    seed: str = "prep",
    num_shards: int = 64,
    decontaminate_k: int = 8,
    counts: bool = False,
    pack_len: Optional[int] = None,
    tokenizer: str = "whitespace",
    bpe_num_merges: int = 200,
    bpe_max_words: int = 100_000,
) -> dict:
    """Run the full prep chain and write ``out_dir/shard=N/``.

    ``benchmark``: eval set to decontaminate against (skipped when None).
    ``quality_weights``: linear-filter weights; when None and
    ``train_quality_on`` names a 0/1 label column on ``docs``, the filter is
    TRAINED first (distributed logistic GD); when both are None the quality
    stage is skipped.
    ``pack_len``: when set, the shuffled corpus is tokenized (``tokenizer``
    = ``"whitespace"`` or ``"bpe"`` — the latter TRAINS a merge table on the
    filtered corpus first) and next-fit packed into fixed-``pack_len``
    training sequences in shuffle order (:func:`..stages.sampling.
    pack_shuffled`); written rows then carry ``n_tokens``/``seq_id``/
    ``seq_pos`` and a ``(shard, seq_id, seq_tokens, n_docs)`` manifest is
    written under ``out_dir/_manifest/`` (leading underscore — parquet
    read-backs of ``out_dir`` ignore it).
    Returns ``{"written", "skipped", "out_dir", "counts"?}``.
    """
    report: dict = {}
    cur = dedup.exact_dedup(docs, text_col, id_col)
    if counts:
        report["after_exact_dedup"] = cur.count()

    if benchmark is not None:
        cur = dedup.decontaminate(cur, benchmark, text_col, id_col,
                                  k=decontaminate_k)
        if counts:
            report["after_decontaminate"] = cur.count()

    if quality_weights is None and train_quality_on:
        fit = analytics.quality_classifier_train(
            docs, text_col, train_quality_on)
        quality_weights = fit["weights"]
        report["trained_quality_weights"] = list(quality_weights)
    if quality_weights is not None:
        # in-place streaming filter — the SAME z >= 0 decision rule as
        # analytics.quality_classifier, applied row-wise so the full-column
        # corpus never round-trips through an id join (a kept-id gather
        # would be O(corpus) at 100 TB)
        import numpy as np
        import pyarrow as pa
        import ray

        w_ref = ray.put(np.asarray(quality_weights, dtype=np.float64))

        def _quality_keep(batch: pa.Table) -> pa.Table:
            w = ray.get(w_ref)
            X = analytics._quality_feature_matrix(batch, text_col)
            z = (w[0] + w[1] * X[:, 1] + w[2] * X[:, 2]
                 + w[3] * X[:, 3] + w[4] * X[:, 4])
            return batch.filter(pa.array(z >= 0.0))

        cur = cur.map_batches(_quality_keep, batch_format="pyarrow")
        if counts:
            report["after_quality_filter"] = cur.count()

    if pack_len is not None and tokenizer == "bpe":
        # BPE training consumes `cur` once (word-frequency aggregate) and
        # shuffled_shards consumes it again; without this checkpoint the
        # lazy dedup/decontaminate/quality chain — the expensive stages —
        # would EXECUTE TWICE. One materialize, both readers share blocks.
        cur = cur.materialize()
    sharded = sampling.shuffled_shards(cur, id_col, seed=seed,
                                       num_shards=num_shards)
    if pack_len is not None:
        sharded = _attach_token_counts(
            sharded, text_col, id_col, tokenizer, report,
            bpe_num_merges=bpe_num_merges, bpe_max_words=bpe_max_words,
            train_corpus=cur)
        sharded = sampling.pack_shuffled(sharded, seq_len=pack_len)
    result = rio.write_sharded_resumable(sharded, out_dir, "shard")
    if pack_len is not None:
        result["manifest_dir"] = _write_manifest(out_dir)
    if counts:
        result["counts"] = report
    elif report:
        result["counts"] = report
    return result
