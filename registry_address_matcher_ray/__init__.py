"""registry_address_matcher_ray — a Ray-Data-native record-linkage engine.

A from-scratch reimplementation of the query/data-processing capabilities of
``fr44lancer/registry_address_matcher`` (reference at /root/reference, read-only)
re-expressed Ray-Data-first: every stage is a transform over ``ray.data.Dataset``
(Arrow batches, actor pools for stateful stages, groupby/join shuffles for the
wide steps), designed for a fixed-size multi-node cluster streaming ~100 TB.

Layout
------
functions/   pure, Ray-free kernels: normalization, string scorers, text
             extraction, text statistics, minhash/simhash hashing
sources/     parquet ingest + schema validation, sinks, deterministic
             synthetic fixtures (registries, labeled pairs, web pages)
stages/      Dataset -> Dataset operators: blocking, exact/fuzzy matching,
             transitive clustering, dedup, similarity search, analytics
pipelines/   end-to-end composition (flagship linkage pipeline) + config
state/       checkpoint manifests + per-stage metrics

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are owned
by the caller (driver, bench.py, test fixture).
"""

__version__ = "0.1.0"
