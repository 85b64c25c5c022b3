"""``ray job submit`` entrypoint for the training-data prep pipeline.

Usage on a cluster (same launch surface as ``job.py`` for the linkage half):

    ray job submit --working-dir . -- \
        python -m registry_address_matcher_ray.prep_job \
        --docs s3://bucket/corpus/ --out /mnt/shards \
        --benchmark s3://bucket/eval/ --num-shards 512 --seed run7

Runs ``pipelines.training_prep.run_training_prep``: exact dedup ->
optional decontamination -> optional quality filter (supplied weights or a
distributed trained fit over ``--train-quality-on``) -> seeded global
shuffle -> resumable interleaved shard write. Re-submitting with the same
arguments after a crash skips committed shards (the ``_SUCCESS`` protocol).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Ray Data training-prep job")
    p.add_argument("--docs", required=True, help="corpus parquet path/dir")
    p.add_argument("--out", required=True, help="shard output directory")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--benchmark", help="eval-set parquet to decontaminate "
                                       "against (optional)")
    p.add_argument("--quality-weights", type=float, nargs=5,
                   metavar=("W0", "W1", "W2", "W3", "W4"),
                   help="linear quality-filter weights (optional)")
    p.add_argument("--train-quality-on",
                   help="0/1 label column on --docs: train the quality "
                        "filter first (distributed logistic GD)")
    p.add_argument("--seed", default="prep")
    p.add_argument("--num-shards", type=int, default=64)
    p.add_argument("--decontaminate-k", type=int, default=8)
    p.add_argument("--counts", action="store_true",
                   help="report per-stage row counts (extra passes)")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init()  # inside `ray job submit` this attaches to the cluster

    from .pipelines.training_prep import run_training_prep
    from .sources import io as rio

    docs = rio.read_parquet_clean(args.docs)
    bench = (rio.read_parquet_clean(args.benchmark)
             if args.benchmark else None)
    res = run_training_prep(
        docs, args.out,
        id_col=args.id_col, text_col=args.text_col,
        benchmark=bench,
        quality_weights=args.quality_weights,
        train_quality_on=args.train_quality_on,
        seed=args.seed, num_shards=args.num_shards,
        decontaminate_k=args.decontaminate_k, counts=args.counts)
    print(json.dumps({
        "written": res["written"], "skipped": res["skipped"],
        "out_dir": res["out_dir"], "counts": res.get("counts", {}),
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
