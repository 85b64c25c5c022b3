"""``ray job submit`` entrypoint for the linkage pipeline.

Usage on a cluster (the BASELINE.json launch surface):

    ray job submit --working-dir . -- \
        python -m registry_address_matcher_ray.job \
        --spr s3://bucket/spr/ --cad s3://bucket/cad/ \
        --out /mnt/out --ckpt /mnt/ckpt --threshold 85

or with a pages table as the probe side (the flagship):

    ray job submit --working-dir . -- \
        python -m registry_address_matcher_ray.job \
        --pages s3://bucket/pages/ --cad s3://bucket/cad/ --out /mnt/out

In the sandbox this runs single-node (``RAY_ADDRESS=local``); on a real cluster the
same script connects to the running cluster via the job supervisor. Actor-pool
concurrency defaults scale from ``ray.cluster_resources()`` so the identical
entrypoint drives N-node and 4N-node clusters.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_config(args, num_cpus: int):
    from .pipelines.config import PipelineConfig

    return PipelineConfig(
        threshold=args.threshold,
        method=args.method,
        fuzzy_strategy=args.fuzzy_strategy,
        max_records=args.max_records,
        num_partitions=args.num_partitions or max(8, num_cpus),
        fuzzy_concurrency=max(2, num_cpus - 2),
        progress=getattr(args, "progress", False),
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Ray Data record-linkage job")
    p.add_argument("--spr", help="SPR registry parquet path/dir")
    p.add_argument("--pages", help="Common-Crawl-style pages parquet path/dir "
                                   "(alternative probe side to --spr)")
    p.add_argument("--warc", help="crawl-native probe side: .warc/.warc.gz "
                                  "path or dir (sources/warc.read_warc, one "
                                  "read task per archive)")
    p.add_argument("--cad", required=True, help="Cadastre registry parquet path/dir")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--ckpt", help="checkpoint directory (enables resume)")
    p.add_argument("--threshold", type=float, default=85.0)
    p.add_argument("--method", default="Comprehensive",
                   choices=["Comprehensive", "Exact Only", "Fuzzy Only",
                            "Hybrid (Exact + Fuzzy)"])
    p.add_argument("--fuzzy-strategy", default="auto",
                   choices=["auto", "broadcast_dedup", "broadcast", "shuffle"])
    p.add_argument("--max-records", type=int)
    p.add_argument("--num-partitions", type=int)
    p.add_argument("--progress", action="store_true",
                   help="spawn the live ProgressActor (state/progress.py); "
                        "poll linkage.LAST_PROGRESS.snapshot.remote() mid-run")
    args = p.parse_args(argv)
    if sum(map(bool, (args.spr, args.pages, args.warc))) != 1:
        p.error("exactly one of --spr / --pages / --warc is required")

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init()  # inside `ray job submit` this attaches to the cluster
    num_cpus = int(ray.cluster_resources().get("CPU", 8))
    cfg = build_config(args, num_cpus)

    from .pipelines import linkage
    from .sources import io as rio

    if cfg.progress:
        # live per-stage counters to stderr while the pipeline streams (the
        # engine's form of the reference's per-chunk UI counters)
        import threading
        import time as _time

        def _poll():
            while True:
                _time.sleep(5.0)
                actor = linkage.LAST_PROGRESS
                if actor is None:
                    continue
                try:
                    snap = ray.get(actor.snapshot.remote(), timeout=4)
                except Exception:
                    return
                print("[progress] " + json.dumps(snap), file=sys.stderr,
                      flush=True)

        threading.Thread(target=_poll, daemon=True).start()

    if args.warc:
        from .sources import warc as rwarc

        out = linkage.pages_to_match_clusters(
            rwarc.read_warc(args.warc),
            rio.read_registry(args.cad, "Cadastre"),
            cfg,
        )
        matches, clusters = out["matches"], out["clusters"]
    elif args.pages and args.ckpt:
        out = linkage.run_pages_checkpointed(args.pages, args.cad, args.ckpt, cfg)
        matches, clusters = out["matches"], out["clusters"]
    elif args.pages:
        out = linkage.pages_to_match_clusters(
            rio.read_pages(args.pages),
            rio.read_registry(args.cad, "Cadastre"),
            cfg,
        )
        matches, clusters = out["matches"], out["clusters"]
    elif args.ckpt:
        out = linkage.run_linkage_checkpointed(args.spr, args.cad, args.ckpt, cfg)
        matches, clusters = out["matches"], out["clusters"]
    else:
        out = linkage.run_linkage(args.spr, args.cad, config=cfg)
        matches, clusters = out["matches"], out["clusters"]

    rio.write_dataset(matches, f"{args.out}/matches")
    rio.write_dataset(clusters, f"{args.out}/clusters")
    summary = {
        "matches": matches.count(),
        "cluster_rows": clusters.count(),
        "num_cpus": num_cpus,
        "config": {"threshold": cfg.threshold, "method": cfg.method,
                   "fuzzy_strategy": cfg.fuzzy_strategy},
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
