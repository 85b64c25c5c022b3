"""Benchmark harness: headline linkage pipeline + operator suite.

Plain run (driver contract): one JSON line
    {"metric": "linkage_pages_sec", "value": <sec>, "unit": "sec",
     "queries": {...per-pipeline seconds...}, "sf": <sf>, "num_cpus": N,
     "extras": {...pairs-scored throughput...}}

Inputs: $GRAFT_SF_DIR (default /root/testdata/sf0.1) for the document/embedding
operator benches, plus deterministic synthetic registries/pages scaled to the same
sf (cached under /tmp, identical bytes across runs/parallelism levels).

``--scaling``: runs this same script in two fresh processes at N and 4N CPUs
(default RAY_SCALING_LO=2 / RAY_SCALING_HI=8; override via env) on the same
pre-warmed input, headline pipeline only, ``broadcast_dedup`` plan, and reports
throughput at both plus efficiency = (t_lo/t_hi)/(hi/lo) — the sandbox evidence
for the N->4N cluster-scaling criterion. Endpoint choice: this single VM's own
multi-process pure-CPU ceiling (measured, see BASELINE.md) is ~1.0 up to 8
concurrent processes but 0.90 for 4->16 and 0.74 for 8->32 — beyond ~8 workers
the host (steal/contention), not the engine, caps scaling, so 2->8 is the
largest 4x step at which ENGINE scaling is observable. 4->16 numbers are also
recorded in BASELINE.md for transparency.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _fixture_paths(sf: float) -> dict:
    """Bench-scale synthetic registries/pages (larger than the driver-check ones)."""
    import pyarrow.parquet as pq

    from registry_address_matcher_ray.sources import synth

    n = int(os.environ.get("RAY_GRAFT_BENCH_N", 0)) or max(2000, int(sf * 600_000))
    cache = f"/tmp/ram_ray_bench/n{n}_seed42_rg"
    names = ("registry_spr", "registry_cad", "pages")
    paths = {k: f"{cache}/{k}.parquet" for k in names}
    if not all(os.path.exists(p) for p in paths.values()):
        os.makedirs(cache, exist_ok=True)
        t = synth.synth_registries(n, seed=42)
        # small row groups: parquet row groups are Ray's read-split unit, and the
        # real workload is many files/row-groups — one giant row group would cap
        # read parallelism at 1 block
        for k in ("registry_spr", "registry_cad"):
            pq.write_table(t[k], paths[k] + ".tmp", row_group_size=2048)
            os.replace(paths[k] + ".tmp", paths[k])
        pages = synth.synth_pages(t["registry_spr"], seed=42)
        pq.write_table(pages, paths["pages"] + ".tmp", row_group_size=2048)
        os.replace(paths["pages"] + ".tmp", paths["pages"])
    return paths


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray
    import ray.data

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import numpy as np

    from registry_address_matcher_ray.pipelines import linkage
    from registry_address_matcher_ray.pipelines.config import PipelineConfig
    from registry_address_matcher_ray.sources import io as rio
    from registry_address_matcher_ray.stages import analytics as A
    from registry_address_matcher_ray.stages import dedup as D
    from registry_address_matcher_ray.stages import similarity as S

    sf = _sf_of(sf_dir)
    paths = _fixture_paths(sf)
    # broadcast_dedup (the scale default: distinct probes scored once job-wide,
    # stateless-task stages) for both the plain and the scaling runs
    cfg = PipelineConfig(
        fuzzy_strategy=os.environ.get("RAY_GRAFT_STRATEGY", "broadcast_dedup"),
        fuzzy_concurrency=max(2, num_cpus - 2),
        num_partitions=max(8, num_cpus),
    )
    queries: dict = {}
    extras: dict = {}

    # warm the OS page cache (untimed)
    for p in paths.values():
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass

    # warm the worker pool (untimed): spawn + import-load every worker before
    # the timed run, the way a long-lived cluster's workers are already warm.
    # Session startup cost is a per-cluster constant, not pipeline throughput.
    def _warm(batch):
        import time as _t

        import registry_address_matcher_ray.stages.matching  # noqa: F401
        _t.sleep(0.3)  # hold the worker so the whole pool spawns
        return batch

    ray.data.range(num_cpus * 2, override_num_blocks=num_cpus * 2).map_batches(
        _warm, batch_size=None).materialize()

    # ---- headline: pages -> extract -> records -> match -> cluster -> write
    nblocks = num_cpus * 3
    t0 = time.time()
    _dbg = os.environ.get("RAY_GRAFT_TIMING")

    def _mark(label):
        if _dbg:
            print(f"[bench] {label}: {time.time() - t0:.2f}s",
                  file=sys.stderr, flush=True)

    pages = rio.read_parquet_clean(paths["pages"], override_num_blocks=nblocks)
    cad = rio.read_parquet_clean(paths["registry_cad"])
    out = linkage.pages_to_match_clusters(pages, cad, cfg)
    _mark("matches materialized")
    rio.write_dataset(out["matches"], "/tmp/ram_ray_bench/out_matches")
    _mark("matches written")
    n_clusters = out["clusters"].count()
    _mark("clusters counted")
    headline = time.time() - t0
    queries["linkage_pages"] = round(headline, 3)
    n_matches = out["matches"].count()
    extras["n_matches"] = n_matches
    extras["n_cluster_rows"] = n_clusters

    # candidate-pairs-scored throughput (the BASELINE.md reported metric):
    # pairs = sum over fuzzy-probed SPR rows of their (house,building) block size
    import pyarrow.parquet as pq
    import pandas as pd

    from registry_address_matcher_ray.functions.normalize import normalize

    spr_df = pq.read_table(paths["registry_spr"]).to_pandas()
    cad_df = pq.read_table(paths["registry_cad"]).to_pandas()
    for df in (spr_df, cad_df):
        for c in ("STREET_NAME", "HOUSE", "BUILDING"):
            df[c] = df[c].fillna("")
        df["HN"] = df["HOUSE"].map(normalize)
        df["BN"] = df["BUILDING"].map(normalize)
        df["SN"] = df["STREET_NAME"].map(normalize)
    matched = pq.read_table("/tmp/ram_ray_bench/out_matches").to_pandas()
    exact_ids = set(matched.loc[matched.MATCH_TYPE.str.startswith("EXACT"), "ADDRESS_ID_SPR"])
    # only rows with a non-empty normalized street are ever scored (ADVICE r1)
    residue = spr_df[~spr_df.ADDRESS_ID.isin(exact_ids) & (spr_df.SN != "")]
    blk = cad_df[(cad_df.HN != "") & (cad_df.SN != "")].groupby(["HN", "BN"]).size()
    keys = pd.MultiIndex.from_frame(residue[["HN", "BN"]])
    pairs_scored = int(blk.reindex(keys).fillna(0).sum())
    extras["candidate_pairs_scored"] = pairs_scored
    extras["pairs_scored_per_sec"] = round(pairs_scored / headline, 1)
    # scoring-phase wall time (the compute core of the job) from the plan marks
    from registry_address_matcher_ray.stages import matching as _m

    ph = _m.LAST_PHASE_TIMES
    if "fuzzy scored" in ph and "residue partitioned" in ph:
        score_sec = ph["fuzzy scored"] - ph["residue partitioned"]
        extras["score_phase_sec"] = round(score_sec, 3)
        extras["score_pairs_per_sec"] = round(pairs_scored / max(score_sec, 1e-9), 1)

    # ---- registry-direct linkage (no pages layer)
    if os.environ.get("RAY_GRAFT_HEADLINE_ONLY"):
        result = {
            "metric": "linkage_pages_sec", "value": queries["linkage_pages"],
            "unit": "sec", "queries": queries, "sf": sf, "num_cpus": num_cpus,
            "extras": extras,
        }
        ray.shutdown()
        return result
    t0 = time.time()
    m = linkage.match_registries(
        rio.read_parquet_clean(paths["registry_spr"]),
        rio.read_parquet_clean(paths["registry_cad"]),
        cfg,
    )
    m_count = m.count()
    queries["match_registries"] = round(time.time() - t0, 3)
    extras["match_registries_rows"] = m_count

    # ---- document/embedding operator suite over the driver tables
    docs_path = f"{sf_dir}/documents.parquet"
    emb_path = f"{sf_dir}/embeddings.parquet"
    if os.path.exists(docs_path):
        t0 = time.time()
        ds = rio.read_parquet_clean(docs_path)
        A.text_stats(ds, "text").count()
        queries["text_stats"] = round(time.time() - t0, 3)

        t0 = time.time()
        D.exact_dedup_by_fingerprint(
            rio.read_parquet_clean(docs_path, columns=["doc_id", "text"]), "text", "doc_id"
        ).count()
        queries["exact_dedup"] = round(time.time() - t0, 3)

        t0 = time.time()
        D.minhash_lsh_dedup(
            rio.read_parquet_clean(docs_path), "text", "doc_id", jaccard_threshold=0.7
        )["clusters"].count()
        queries["minhash_dedup"] = round(time.time() - t0, 3)

        # round-3: ExactSubstr volume stage (one shingle row per token)
        t0 = time.time()
        D.substring_dup_stats(
            rio.read_parquet_clean(docs_path, columns=["doc_id", "text"]),
            "text", "doc_id", k=8).count()
        queries["substring_dedup"] = round(time.time() - t0, 3)

    if os.path.exists(emb_path):
        t0 = time.time()
        ds = rio.read_parquet_clean(emb_path)
        row = ds.take(1)[0]
        q = np.asarray(row["embedding"], dtype=np.float64)[None, :]
        S.knn_brute(ds, q, k=10)
        queries["knn_brute"] = round(time.time() - t0, 3)

    # ---- round-2 graft operator additions (representative one per family)
    if os.path.exists(docs_path):
        t0 = time.time()
        A.tfidf_top_terms(
            rio.read_parquet_clean(docs_path, columns=["doc_id", "text"]),
            "doc_id", "text", 3).count()
        queries["tfidf_top3"] = round(time.time() - t0, 3)

        from registry_address_matcher_ray.stages.search import bm25_topk
        t0 = time.time()
        bm25_topk(
            rio.read_parquet_clean(docs_path, columns=["doc_id", "text"]),
            "doc_id", "text", "spark hash sort window", k=10).count()
        queries["bm25_top10"] = round(time.time() - t0, 3)

    ev_path = f"{sf_dir}/events.parquet"
    if os.path.exists(ev_path):
        t0 = time.time()
        A.tumbling_window_agg(
            rio.read_parquet_clean(ev_path, columns=["ts", "event_type", "value"]),
            "ts", "event_type", "value", width_s=900).count()
        queries["tumbling_15m"] = round(time.time() - t0, 3)

    li_path = f"{sf_dir}/lineitem.parquet"
    if os.path.exists(li_path):
        t0 = time.time()
        A.ntile(
            rio.read_parquet_clean(
                li_path,
                columns=["l_extendedprice", "l_orderkey", "l_linenumber"]),
            ["l_extendedprice", "l_orderkey", "l_linenumber"], 4).count()
        queries["ntile4"] = round(time.time() - t0, 3)

        t0 = time.time()
        A.star_revenue_by_nation(
            rio.read_parquet_clean(li_path),
            rio.read_parquet_clean(f"{sf_dir}/orders.parquet"),
            rio.read_parquet_clean(f"{sf_dir}/customer.parquet"),
            rio.read_parquet_clean(f"{sf_dir}/nation.parquet")).count()
        queries["star_revenue"] = round(time.time() - t0, 3)

    # ---- round-3 graft operator additions
    if os.path.exists(docs_path):
        t0 = time.time()
        A.unigram_logprob(
            rio.read_parquet_clean(docs_path, columns=["doc_id", "text"]),
            "doc_id", "text").count()
        queries["unigram_logprob"] = round(time.time() - t0, 3)

    t0 = time.time()
    from registry_address_matcher_ray.functions import urls as U
    from registry_address_matcher_ray.sources import synth as _synth

    crawl_n = max(20_000, int(sf * 2_000_000))
    crawl_path = f"/tmp/ram_ray_bench/crawl_n{crawl_n}_seed42.parquet"
    if not os.path.exists(crawl_path):
        os.makedirs(os.path.dirname(crawl_path), exist_ok=True)
        pq.write_table(_synth.synth_crawl_urls(crawl_n, seed=42),
                       crawl_path + ".tmp")
        os.replace(crawl_path + ".tmp", crawl_path)
    gen_s = time.time() - t0
    t0 = time.time()
    crawl = rio.read_parquet_clean(crawl_path).map_batches(
        lambda b: U.canonical_column(b, "url", "canonical_url"),
        batch_format="pyarrow")
    D.keep_latest_dedup(crawl, "canonical_url", "warc_ts", "page_id").count()
    queries["url_latest_dedup"] = round(time.time() - t0, 3)
    extras["crawl_fixture_gen_sec"] = round(gen_s, 3)

    if os.path.exists(docs_path):
        import hashlib as _hl

        t0 = time.time()
        corpus = rio.read_parquet_clean(docs_path, columns=["doc_id", "text"])

        def _bench_slice(b):
            import pyarrow as _pa
            keep = [_hl.md5(str(v).encode()).hexdigest()[:4] >= "e666"
                    for v in b.column("doc_id").to_pylist()]
            return b.filter(_pa.array(keep))

        D.decontaminate(
            corpus, corpus.map_batches(_bench_slice, batch_format="pyarrow"),
            "text", "doc_id", k=8).count()
        queries["decontaminate"] = round(time.time() - t0, 3)

    t0 = time.time()
    ev = rio.read_parquet_clean(f"{sf_dir}/events.parquet",
                                columns=["user_id"])
    A.heavy_hitters(ev, "user_id", k=20).count()
    queries["heavy_hitters"] = round(time.time() - t0, 3)

    # ---- Fellegi-Sunter probabilistic linkage: pattern histogram -> EM ->
    # per-pair weights over the house-blocked candidates
    from registry_address_matcher_ray.stages import blocking as B
    from registry_address_matcher_ray.stages import probabilistic as P

    t0 = time.time()
    spr_pre = B.preprocess_registry(
        rio.read_parquet_clean(paths["registry_spr"]))
    cad_pre = B.preprocess_registry(
        rio.read_parquet_clean(paths["registry_cad"]))
    vecs = P.comparison_vectors(spr_pre, cad_pre).materialize()
    counts = P.fs_pattern_counts(spr_pre, cad_pre, vecs=vecs).to_pandas()
    fit = P.fs_em(counts, k=4)
    n_fs = P.fs_match_weights(
        spr_pre, cad_pre, fit["m"], fit["u"], vecs=vecs).count()
    queries["fs_linkage"] = round(time.time() - t0, 3)
    extras["fs_pairs_weighted"] = n_fs

    # ---- round-4 graft operator additions
    if os.path.exists(docs_path):
        import shutil as _sh

        from registry_address_matcher_ray.stages import sampling as SA
        from registry_address_matcher_ray.stages import tokenizer as TK

        # training-prep finale: seeded global shuffle -> interleaved shards
        # -> resumable partitioned parquet
        t0 = time.time()
        out_dir = "/tmp/ram_ray_bench/shuffled_shards"
        _sh.rmtree(out_dir, ignore_errors=True)
        rio.write_sharded_resumable(
            SA.shuffled_shards(rio.read_parquet_clean(docs_path),
                               "doc_id", seed="bench", num_shards=16),
            out_dir)
        queries["global_shuffle_write"] = round(time.time() - t0, 3)

        # trained-BPE tokenizer: merge-table fit + corpus token count
        from ray.data.aggregate import Sum as _Sum

        t0 = time.time()
        fit_bpe = TK.bpe_train(
            rio.read_parquet_clean(docs_path, columns=["text"]),
            "text", num_merges=200)
        total_tok = TK.bpe_token_counts(
            rio.read_parquet_clean(docs_path, columns=["doc_id", "text"]),
            "text", "doc_id", fit_bpe["merges"]) \
            .aggregate(_Sum("n_bpe_tokens", alias_name="s"))["s"]
        queries["bpe_train_count"] = round(time.time() - t0, 3)
        extras["bpe_corpus_tokens"] = int(total_tok)

        # CCNet perplexity bucketing (unigram LM -> exact terciles -> label)
        t0 = time.time()
        A.perplexity_buckets(
            rio.read_parquet_clean(docs_path, columns=["doc_id", "text"]),
            "doc_id", "text").count()
        queries["perplexity_buckets"] = round(time.time() - t0, 3)

        # PaLM overlap-fraction decontamination vs the md5-test slice
        import hashlib as _hl2

        import pyarrow as _pa2

        def _bench_f(b):
            keep = [_hl2.md5(str(v).encode()).hexdigest()[:4] >= "e666"
                    for v in b.column("doc_id").to_pylist()]
            return b.filter(_pa2.array(keep))

        t0 = time.time()
        _docs = rio.read_parquet_clean(docs_path, columns=["doc_id", "text"])
        D.overlap_contamination(
            _docs, _docs.map_batches(_bench_f, batch_format="pyarrow"),
            "text", "doc_id", k=8, frac=0.7).count()
        queries["overlap_contamination"] = round(time.time() - t0, 3)

    # ---- round-5 session additions: C4 cleaning, Gopher top-n-grams,
    # quality-aware near-dup retention (the SlimPajama-style composition)
    if os.path.exists(docs_path):
        t0 = time.time()
        A.c4_clean(
            rio.read_parquet_clean(docs_path, columns=["doc_id", "text"]),
            "text", "doc_id").count()
        queries["c4_clean"] = round(time.time() - t0, 3)

        t0 = time.time()
        A.top_ngram_stats(
            rio.read_parquet_clean(docs_path, columns=["doc_id", "text"]),
            "text", "doc_id").count()
        queries["top_ngrams"] = round(time.time() - t0, 3)

        t0 = time.time()
        n_kept = D.neardup_keep_best(
            rio.read_parquet_clean(docs_path, columns=["doc_id", "text"]),
            "text", "doc_id", jaccard_threshold=0.7)["kept"].count()
        queries["neardup_keep_best"] = round(time.time() - t0, 3)
        extras["neardup_kept_rows"] = n_kept

    # real media decode throughput: PPM+PNG+JPEG images through the
    # library-free codecs on the actor pool (fixture gen excluded)
    import ray.data as _rd

    from registry_address_matcher_ray.stages import multimodal as MM

    t0 = time.time()
    media = (_rd.from_arrow(MM.synth_decodable_media(200, "ppm", seed=3))
             .union(_rd.from_arrow(MM.synth_decodable_media(100, "png", seed=4)))
             .union(_rd.from_arrow(MM.synth_decodable_media(100, "jpeg", seed=5)))
             .materialize())
    gen_s = time.time() - t0
    t0 = time.time()
    n_imgs = MM.decode_images(media, codec="real", dim=64).count()
    queries["media_decode_real"] = round(time.time() - t0, 3)
    extras["media_decode_images_per_sec"] = round(
        n_imgs / max(queries["media_decode_real"], 1e-9), 1)
    extras["media_fixture_gen_sec"] = round(gen_s, 3)

    # DRI-bearing fixture (large baseline JPEGs with restart intervals):
    # serial entropy decode vs segment-parallel (dri_workers=4) on the same
    # 12 images — the per-image latency knob for big-image corpora
    # ONE actor both times: across-image parallelism is already covered by
    # the pool; dri_workers buys PER-IMAGE latency, so that is what we time
    dri = _rd.from_arrow(
        MM.synth_decodable_media(12, "jpeg_dri", seed=6)).materialize()
    t0 = time.time()
    MM.decode_images(dri, codec="real", dim=64, batch_size=12,
                     concurrency=(1, 1)).count()
    queries["media_decode_dri_serial"] = round(time.time() - t0, 3)
    t0 = time.time()
    MM.decode_images(dri, codec="real", dim=64, batch_size=12,
                     concurrency=(1, 1), dri_workers=4).count()
    queries["media_decode_dri_parallel"] = round(time.time() - t0, 3)
    extras["media_dri_speedup"] = round(
        queries["media_decode_dri_serial"]
        / max(queries["media_decode_dri_parallel"], 1e-9), 2)

    # WARC crawl-transport ingest: the pages fixture as 16 .warc.gz chunks
    # (member-per-record gzip, HTTP-wrapped — one read task per archive),
    # full streaming parse back to (url, warc_ts, html). Encode is cached.
    import glob as _glob

    from registry_address_matcher_ray.sources import warc as _warc

    warc_dir = paths["pages"].replace("pages.parquet", "pages_warc")
    if not _glob.glob(os.path.join(warc_dir, "*.warc.gz")):
        os.makedirs(warc_dir + ".tmp", exist_ok=True)
        rows = pq.read_table(
            paths["pages"], columns=["url", "warc_ts", "html"]).to_pylist()
        per = -(-len(rows) // 16)
        for c in range(16):
            chunk = rows[c * per:(c + 1) * per]
            if chunk:
                with open(f"{warc_dir}.tmp/chunk-{c:02d}.warc.gz", "wb") as f:
                    f.write(_warc.encode_warc(chunk, gzip_mode="record"))
        os.replace(warc_dir + ".tmp", warc_dir)
    t0 = time.time()
    n_warc = _warc.read_warc(
        sorted(_glob.glob(os.path.join(warc_dir, "*.warc.gz")))).count()
    queries["warc_read"] = round(time.time() - t0, 3)
    extras["warc_pages_per_sec"] = round(
        n_warc / max(queries["warc_read"], 1e-9), 1)

    # ---- final-session additions: crawl link graph, crawl pagerank,
    # triangles, span-level decontamination
    from registry_address_matcher_ray.sources import synth as _synth
    from registry_address_matcher_ray.stages import cluster as CL
    from registry_address_matcher_ray.stages import webgraph as WG

    lp_path = "/tmp/ram_ray_fixtures/bench_linked_pages_v4_n20000_seed42.parquet"
    if not os.path.exists(lp_path):
        os.makedirs(os.path.dirname(lp_path), exist_ok=True)
        pq.write_table(_synth.synth_linked_pages(20_000, seed=42),
                       lp_path + ".tmp")
        os.replace(lp_path + ".tmp", lp_path)
    t0 = time.time()
    n_links = WG.link_graph(_rd.read_parquet(lp_path)).count()
    queries["link_graph"] = round(time.time() - t0, 3)
    extras["link_graph_edges"] = n_links

    # crawl-corpus flagship: politeness -> extract -> boilerplate -> C4 ->
    # exact dedup over the same 20k-page fixture
    from registry_address_matcher_ray.pipelines.web_corpus import \
        pages_to_corpus

    t0 = time.time()
    n_corpus = pages_to_corpus(
        _rd.read_parquet(lp_path),
        blocked=frozenset({"w3.example.org"})).count()
    queries["corpus_prep"] = round(time.time() - t0, 3)
    extras["corpus_prep_docs"] = n_corpus
    extras["corpus_prep_pages_per_sec"] = round(
        20_000 / max(queries["corpus_prep"], 1e-9), 1)
    t0 = time.time()
    WG.crawl_pagerank(_rd.read_parquet(lp_path)).count()
    queries["crawl_pagerank"] = round(time.time() - t0, 3)

    t0 = time.time()
    tri = CL.triangle_stats(
        _rd.from_arrow(_synth.synth_web_graph(100_000, seed=42))
    ).take_all()[0]
    queries["triangles_100k"] = round(time.time() - t0, 3)
    extras["triangles_found"] = int(tri["n_triangles"])

    if os.path.exists(docs_path):
        t0 = time.time()
        docs_sd = rio.read_parquet_clean(docs_path,
                                         columns=["doc_id", "text"])

        def _bench_sd(b):
            import hashlib as _hl

            import pyarrow as _pa
            keep = [_hl.md5(str(v).encode()).hexdigest()[:4] >= "e666"
                    for v in b.column("doc_id").to_pylist()]
            return b.filter(_pa.array(keep))

        D.decontaminate_spans(
            docs_sd, docs_sd.map_batches(_bench_sd, batch_format="pyarrow"),
            "text", "doc_id", k=8, buffer=2).count()
        queries["span_decontaminate"] = round(time.time() - t0, 3)

    # ---- media near-dup triad (image dHash / audio SimHash / video
    # majority-dHash): planted-dup corpora generated once, cached
    import numpy as _np
    import pyarrow as _pa3

    from registry_address_matcher_ray.functions import codecs as _codecs
    from registry_address_matcher_ray.functions.avi import encode_mjpeg_avi
    from registry_address_matcher_ray.stages import multimodal as MM

    med_dir = "/tmp/ram_ray_fixtures/bench_media_neardup"
    if not os.path.exists(med_dir):
        os.makedirs(med_dir + ".tmp", exist_ok=True)
        rng = _np.random.default_rng(29)
        ids, pays = [], []
        for i in range(300):
            img = rng.integers(0, 256, size=(48, 64, 3)).astype(_np.uint8)
            ids.append(f"img-{i:05d}")
            pays.append(_codecs.encode_ppm(img))
            if i % 3 == 0:
                jit = _np.clip(img.astype(_np.int16)
                               + rng.integers(-2, 3, img.shape),
                               0, 255).astype(_np.uint8)
                ids.append(f"img-{i:05d}-dup")
                pays.append(_codecs.encode_bmp(jit))
        pq.write_table(_pa3.table({
            "media_id": ids, "payload": _pa3.array(pays, _pa3.binary())}),
            med_dir + ".tmp/images.parquet")
        ids, pays = [], []
        for i in range(120):
            low = rng.integers(30, 226, size=(6, 8, 3)).astype(_np.float32)
            base = _np.kron(low, _np.ones((8, 8, 1))).astype(_np.int16)
            frames = [
                _np.clip(base + rng.integers(-4, 5, base.shape), 0, 255
                         ).astype(_np.uint8) for _ in range(10)]
            ids.append(f"vid-{i:05d}")
            pays.append(encode_mjpeg_avi(frames, fps=10, quality=85))
            if i % 3 == 0:
                fr2 = [_np.clip(f.astype(_np.int16)
                                + rng.integers(-2, 3, f.shape), 0, 255
                                ).astype(_np.uint8) for f in frames]
                ids.append(f"vid-{i:05d}-dup")
                pays.append(encode_mjpeg_avi(fr2, fps=10, quality=70))
        pq.write_table(_pa3.table({
            "media_id": ids, "payload": _pa3.array(pays, _pa3.binary())}),
            med_dir + ".tmp/videos.parquet")
        os.replace(med_dir + ".tmp", med_dir)

    t0 = time.time()
    img_pairs = MM.image_neardup(
        _rd.read_parquet(med_dir + "/images.parquet"),
        codec="real")["pairs"].count()
    queries["image_neardup"] = round(time.time() - t0, 3)
    extras["image_neardup_pairs"] = img_pairs
    t0 = time.time()
    vid_pairs = MM.video_neardup(
        _rd.read_parquet(med_dir + "/videos.parquet"),
        codec="real")["pairs"].count()
    queries["video_neardup"] = round(time.time() - t0, 3)
    extras["video_neardup_pairs"] = vid_pairs

    result = {
        "metric": "linkage_pages_sec",
        "value": queries["linkage_pages"],
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "extras": extras,
    }
    ray.shutdown()
    return result


def run_scaling(sf_dir: str) -> dict:
    """Fresh-process N vs 4N CPU runs on identical input (cache pre-warmed).

    Uses a 4x-larger fixture (240k rows; RAY_GRAFT_BENCH_N overrides — 480k
    doubles the compute-bound fraction but exceeds a 10-min budget) than the
    plain per-sf bench so the run
    is compute-bound — the scaling criterion measures throughput scaling of the
    pipeline's work, not of fixed session/driver overheads that a 100 TB run
    amortizes away (measured: ~10 s of serial extract/exact/emit/cluster cost
    per run regardless of fixture size; at 240k rows that serial floor alone
    caps the 2->8 end-to-end ratio near 0.8 even with perfect scoring
    scaling). Both CPU levels read the identical input.
    """
    env_base = dict(os.environ)
    env_base.setdefault("RAY_GRAFT_BENCH_N", "240000")
    env_base["RAY_GRAFT_HEADLINE_ONLY"] = "1"
    env_base.setdefault("RAY_GRAFT_STRATEGY", "broadcast_dedup")

    def once(ncpu: int) -> dict:
        env = dict(env_base, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # Default N=2 vs 4N=8 (see module docstring for the host-ceiling rationale).
    # One warm-up run precedes the timed runs; host steal noise on this box is
    # +/-30% run to run, so treat single-run numbers accordingly.
    lo_n = int(os.environ.get("RAY_SCALING_LO", "2"))
    hi_n = int(os.environ.get("RAY_SCALING_HI", "8"))
    once(hi_n)  # warm caches / fixture generation, untimed
    r_lo = once(lo_n)
    r_hi = once(hi_n)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi_n / lo_n)
    out = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_low": lo_n,
        "cpus_high": hi_n,
        "sec_low": t_lo,
        "sec_high": t_hi,
        "pairs_per_sec_low": r_lo["extras"]["pairs_scored_per_sec"],
        "pairs_per_sec_high": r_hi["extras"]["pairs_scored_per_sec"],
        "sf": _sf_of(sf_dir),
        "queries": {f"headline_{lo_n}cpu": t_lo, f"headline_{hi_n}cpu": t_hi},
    }
    # scoring-phase (compute-core) efficiency, reported alongside end-to-end
    s_lo = r_lo["extras"].get("score_phase_sec")
    s_hi = r_hi["extras"].get("score_phase_sec")
    if s_lo and s_hi:
        out["score_sec_low"] = s_lo
        out["score_sec_high"] = s_hi
        out["score_pairs_per_sec_low"] = r_lo["extras"]["score_pairs_per_sec"]
        out["score_pairs_per_sec_high"] = r_hi["extras"]["score_pairs_per_sec"]
        out["score_scaling_efficiency"] = round((s_lo / s_hi) / (hi_n / lo_n), 3)
    return out


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, ncpu)))
