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
5. resumable shard sink ``sources.io.write_sharded_resumable``  (per-shard commit)

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
) -> dict:
    """Run the full prep chain and write ``out_dir/shard=N/``.

    ``benchmark``: eval set to decontaminate against (skipped when None).
    ``quality_weights``: linear-filter weights; when None and
    ``train_quality_on`` names a 0/1 label column on ``docs``, the filter is
    TRAINED first (distributed logistic GD); when both are None the quality
    stage is skipped.
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

    sharded = sampling.shuffled_shards(cur, id_col, seed=seed,
                                       num_shards=num_shards)
    result = rio.write_sharded_resumable(sharded, out_dir, "shard")
    if counts:
        result["counts"] = report
    elif report:
        result["counts"] = report
    return result
