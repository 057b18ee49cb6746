"""Benchmark harness.

Plain run: executes the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "triples": n, "triples_per_sec": r}

--scaling: runs the headline KG pipeline twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same (pre-warmed) input and reports both
wall times + scaling efficiency — the in-sandbox stand-in for the N vs 4N
cluster-size criterion (results recorded in BASELINE.md).
"""

from __future__ import annotations

from text_to_graph_ray.util import read_parquet_clean

import json
import os
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _bench_queries(sf_dir: str) -> tuple[float, dict, dict]:
    """Returns (headline_sec, per_query_sec, extras)."""
    import ray.data as rd

    from text_to_graph_ray.pipelines import kg
    from text_to_graph_ray.synth import ensure_synth

    kg_input = os.environ.get("GRAFT_KG_INPUT") or f"{ensure_synth(sf_dir)}/repo_files.parquet"
    times: dict[str, float] = {}
    extras: dict = {}

    # warm-up (untimed): page-cache the input and spin up ray workers /
    # imports / compiled regexes with a tiny end-to-end pass, so the timed
    # number measures steady-state throughput rather than cold start
    read_parquet_clean(kg_input, columns=["repo"]).count()
    wd = ensure_synth("/root/testdata/sf0.001")
    wn, we = kg.graph_tables(f"{wd}/repo_files.parquet")
    we.count()
    wn.count()

    # headline: full KG construction (extract -> link -> canonicalize -> materialize)
    t0 = time.monotonic()
    nodes, edges = kg.graph_tables(kg_input)
    n_nodes = nodes.count()
    n_edges = edges.count()
    times["kg_pipeline"] = round(time.monotonic() - t0, 3)
    extras["nodes"] = n_nodes
    extras["triples"] = n_edges
    extras["triples_per_sec"] = round(n_edges / times["kg_pipeline"], 1)

    if os.environ.get("GRAFT_HEADLINE_ONLY"):
        return times["kg_pipeline"], times, extras

    # secondary pipelines
    read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()
    read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id"]).count()
    from text_to_graph_ray.functions.ann import brute_force_topk, queries_from_dataset
    from text_to_graph_ray.functions.dedup import minhash_near_dup_pairs
    from text_to_graph_ray.functions.text import text_stats
    from text_to_graph_ray.pipelines.analytics import events_tumbling_window, pricing_summary

    t0 = time.monotonic()
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    minhash_near_dup_pairs(docs, threshold=0.5).count()
    times["dedup_minhash"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs.map_batches(text_stats, batch_format="pyarrow").count()
    times["text_stats"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q_ids, q_vecs = queries_from_dataset(emb, n_queries=8)
    brute_force_topk(emb, q_ids, q_vecs, k=10).count()
    times["ann_topk"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    events_tumbling_window(sf_dir).count()
    times["events_window"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    pricing_summary(sf_dir).count()
    times["rel_pricing"] = round(time.monotonic() - t0, 3)

    from text_to_graph_ray.functions.dedup import near_dup_survivors
    from text_to_graph_ray.pipelines.analytics import order_revenue_topk

    t0 = time.monotonic()
    order_revenue_topk(sf_dir).count()
    times["rel_order_revenue"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    near_dup_survivors(docs, threshold=0.5).count()
    times["dedup_survivors"] = round(time.monotonic() - t0, 3)

    from text_to_graph_ray.functions.pack import packed_sequences
    from text_to_graph_ray.pipelines.analytics import purchase_click_asof

    t0 = time.monotonic()
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    packed_sequences(docs).count()
    times["text_packed_seqs"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    purchase_click_asof(sf_dir).count()
    times["events_asof"] = round(time.monotonic() - t0, 3)

    from text_to_graph_ray.functions.text import tfidf_topk

    t0 = time.monotonic()
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tfidf_topk(docs, k=3).count()
    times["text_tfidf"] = round(time.monotonic() - t0, 3)

    from text_to_graph_ray.functions.decontam import ngram_contamination

    t0 = time.monotonic()
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    ngram_contamination(docs, eval_sources=("src0", "src1"), n=8).count()
    times["dedup_decontaminate"] = round(time.monotonic() - t0, 3)

    import __ray_entry__ as _e

    t0 = time.monotonic()
    _e._q_graph_pagerank(sf_dir).count()
    times["graph_pagerank"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_pipeline_pretraining(sf_dir).count()  # same entry the gate checks
    times["pipeline_pretraining"] = round(time.monotonic() - t0, 3)

    # round-4 families: bloom semijoin (fixed-size broadcast filter) and the
    # sketch trio (KMV + HLL + heavy hitters — three streamed driver folds)
    from text_to_graph_ray.pipelines.analytics import customers_with_orders_bloom, event_heavy_hitters, events_distinct_sketch

    t0 = time.monotonic()
    customers_with_orders_bloom(sf_dir).count()
    times["rel_bloom_semijoin"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    events_distinct_sketch(sf_dir, kind="kmv")
    events_distinct_sketch(sf_dir, kind="hll")
    event_heavy_hitters(sf_dir)
    times["stats_sketches"] = round(time.monotonic() - t0, 3)

    # ED<=1 fuzzy self-join: deletion-neighborhood exchange + exact verify
    from text_to_graph_ray.pipelines.analytics import customer_fuzzy_pairs

    t0 = time.monotonic()
    customer_fuzzy_pairs(sf_dir).count()
    times["rel_fuzzy_names"] = round(time.monotonic() - t0, 3)

    # round-4 part-4 families: pair-explosion projection, bounded BFS, and
    # the time-RANGE window frame
    t0 = time.monotonic()
    _e._q_rel_copart_pairs(sf_dir).count()
    times["rel_copart_pairs"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_graph_bfs(sf_dir).count()
    times["graph_bfs"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_events_range_sum(sf_dir).count()
    times["events_range_sum"] = round(time.monotonic() - t0, 3)

    # round-4 part-5 families: corpus-level segment dedup, bounded k-core
    # peeling, CDC merge-upsert, and the bucketed storage join (the timed
    # span includes BOTH bucketed writes — the once-per-layout exchange)
    t0 = time.monotonic()
    _e._q_text_segment_dedup(sf_dir).count()
    times["text_segment_dedup"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_graph_kcore(sf_dir).count()
    times["graph_kcore"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_events_cdc_merge(sf_dir).count()
    times["events_cdc_merge"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_rel_bucketed_join(sf_dir).count()
    times["rel_bucketed_join"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_pipeline_curation_full(sf_dir).count()
    times["pipeline_curation_full"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_text_lexical(sf_dir).count()
    times["text_lexical"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_rel_part_lookup(sf_dir).count()
    times["rel_part_lookup"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_events_anomaly_mad(sf_dir).count()
    times["events_anomaly_mad"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_graph_triangles(sf_dir).count()
    times["graph_triangles"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_events_markov(sf_dir).count()
    times["events_markov"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_docs_length_band(sf_dir).count()
    times["docs_length_band"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_text_lm_score(sf_dir).count()
    times["text_lm_score"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_events_drift_chi2(sf_dir).count()
    times["events_drift_chi2"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_emb_knn_classify(sf_dir).count()
    times["emb_knn_classify"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_dedup_cross_corpus(sf_dir).count()
    times["dedup_cross_corpus"] = round(time.monotonic() - t0, 3)

    # round-5 part-6 families: BPE tokenizer training, SemDeDup, the
    # temperature mixture plan, and window throttling
    t0 = time.monotonic()
    _e._q_text_bpe_merges(sf_dir).count()
    times["text_bpe_merges"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_dedup_semdedup(sf_dir).count()
    times["dedup_semdedup"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_events_throttle(sf_dir).count()
    times["events_throttle"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_docs_mixture_temperature(sf_dir).count()
    times["docs_mixture_temperature"] = round(time.monotonic() - t0, 3)

    # round-5 part-8 families: BPE apply, the Gopher rule gate, BM25
    # retrieval, and the exact PCA projection
    t0 = time.monotonic()
    _e._q_text_bpe_encode(sf_dir).count()
    times["text_bpe_encode"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_text_gopher_rules(sf_dir).count()
    times["text_gopher_rules"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_text_bm25_topk(sf_dir).count()
    times["text_bm25_topk"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_emb_pca_project(sf_dir).count()
    times["emb_pca_project"] = round(time.monotonic() - t0, 3)

    # round-5 part-10 families: bounded k-truss peeling, NB classifier
    # train/classify, k-means clustering profile, the integer-exact EMA /
    # CUSUM per-key stream kernels, and the Q10-style returned-revenue join
    t0 = time.monotonic()
    _e._q_graph_ktruss(sf_dir).count()
    times["graph_ktruss"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_docs_naive_bayes(sf_dir).count()
    times["docs_naive_bayes"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_emb_kmeans(sf_dir).count()
    times["emb_kmeans"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_events_user_ema(sf_dir).count()
    _e._q_events_cusum(sf_dir).count()
    times["events_ema_cusum"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _e._q_rel_returned_revenue(sf_dir).count()
    times["rel_returned_revenue"] = round(time.monotonic() - t0, 3)

    return times["kg_pipeline"], times, extras


def run_once() -> dict:
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    headline, times, extras = _bench_queries(SF_DIR)
    out = {
        "metric": "kg_pipeline_wall",
        "value": headline,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        **extras,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same job, same input, fresh ray.init processes at 8 vs 32 CPUs — the
    in-sandbox stand-in for the N vs 4N cluster-size criterion. Uses a larger
    content-only corpus (~150k rich files) so compute dominates fixed
    per-job overhead the way it would on a real multi-node run."""
    import subprocess

    from text_to_graph_ray.synth import ensure_scaling_corpus

    # GRAFT_SCALING_FILES shrinks the corpus for a quick smoke of the
    # machinery; the recorded BASELINE.md numbers use the 200k default
    # (~2 GB logical / ~7 GB content). Bigger corpus = more parallel work
    # per unit of fixed per-job overhead (driver barriers, actor spin-up,
    # sort sampling) — the regime that predicts multi-node behavior; at 100k
    # files the round-3 pipeline finishes the 32-cpu leg in <60 s and fixed
    # overhead distorts the ratio.
    corpus = ensure_scaling_corpus(n_files=int(os.environ.get("GRAFT_SCALING_FILES", "200000")))

    def child(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=SF_DIR,
            GRAFT_KG_INPUT=corpus,
            GRAFT_HEADLINE_ONLY="1",
        )
        p = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env, capture_output=True, text=True, check=True)
        return json.loads(p.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "1"))
    # shared-host noise corrupts individual samples: BOTH legs get the same
    # repeats+1 sample count (asymmetric counts would bias min-of-more-draws
    # downward on one side), and the min per level estimates uncontended
    # capability. All observations are reported for honesty.
    runs_lo = [child(lo) for _ in range(repeats + 1)]
    runs_hi = [child(hi) for _ in range(repeats + 1)]
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "kg_pipeline_scaling",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "sec_8_all": [r["value"] for r in runs_lo],
        "sec_32_all": [r["value"] for r in runs_hi],
        "speedup": round(t_lo / t_hi, 3),
        "scaling_efficiency": round(eff, 3),
        "triples_8": r_lo.get("triples"),
        "triples_per_sec_8": r_lo.get("triples_per_sec"),
        "triples_per_sec_32": r_hi.get("triples_per_sec"),
        "corpus": corpus,
        "num_cpus": [lo, hi],
    }


def run_once_dedup() -> dict:
    """Timed minhash near-dup pass over the doc scaling corpus (child of
    run_scaling_dedup; GRAFT_DEDUP_INPUT points at the corpus dir)."""
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    from text_to_graph_ray.functions.dedup import minhash_near_dup_pairs

    corpus = os.environ["GRAFT_DEDUP_INPUT"]
    # warm-up: page-cache one column + spin workers with a tiny pass
    read_parquet_clean(corpus, columns=["doc_id"]).count()
    small = read_parquet_clean(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    minhash_near_dup_pairs(small, threshold=0.5).count()

    t0 = time.monotonic()
    docs = read_parquet_clean(corpus, columns=["doc_id", "text"])
    n_pairs = minhash_near_dup_pairs(docs, threshold=0.5, signature_join="auto").count()
    wall = round(time.monotonic() - t0, 3)
    n_docs = docs.count()
    out = {
        "metric": "dedup_minhash_wall",
        "value": wall,
        "unit": "sec",
        "num_cpus": NUM_CPUS,
        "docs": n_docs,
        "pairs": n_pairs,
        "docs_per_sec": round(n_docs / wall, 1),
    }
    ray.shutdown()
    return out


def run_scaling_dedup() -> dict:
    """Second scaling pair, different workload: MinHash+LSH near-dup over a
    400k-doc corpus at 8 vs 32 CPUs in fresh processes — evidence that the
    LLM-data-ops side of the engine scales like the KG side does."""
    import subprocess

    from text_to_graph_ray.synth import ensure_doc_scaling_corpus

    corpus = ensure_doc_scaling_corpus(n_docs=int(os.environ.get("GRAFT_DEDUP_DOCS", "400000")))

    def child(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR, GRAFT_DEDUP_INPUT=corpus)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--dedup-child"],
            env=env, capture_output=True, text=True, check=True,
        )
        return json.loads(p.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "1"))
    runs_lo = [child(lo) for _ in range(repeats + 1)]
    runs_hi = [child(hi) for _ in range(repeats + 1)]
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "dedup_minhash_scaling",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "sec_8_all": [r["value"] for r in runs_lo],
        "sec_32_all": [r["value"] for r in runs_hi],
        "speedup": round(t_lo / t_hi, 3),
        "scaling_efficiency": round(eff, 3),
        "docs": r_lo.get("docs"),
        "pairs": r_lo.get("pairs"),
        "docs_per_sec_8": r_lo.get("docs_per_sec"),
        "docs_per_sec_32": r_hi.get("docs_per_sec"),
        "corpus": corpus,
        "num_cpus": [lo, hi],
    }


def run_once_segdedup() -> dict:
    """Timed corpus-level exact segment dedup over the doc scaling corpus
    (child of run_scaling_segdedup). Unlike the KG/minhash pairs this
    workload is EXCHANGE-bound: a digest-keyed global-first exchange plus a
    doc-keyed reassembly exchange, with the full segment text crossing the
    wire — the shuffle-heavy regime the third scaling criterion pair is
    meant to evidence."""
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    from text_to_graph_ray.functions.text import segment_dedup

    corpus = os.environ["GRAFT_SEGDEDUP_INPUT"]
    # warm-up: page-cache one column + spin workers with a tiny pass
    read_parquet_clean(corpus, columns=["doc_id"]).count()
    small = read_parquet_clean(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    segment_dedup(small).count()

    t0 = time.monotonic()
    docs = read_parquet_clean(corpus, columns=["doc_id", "text"])
    # the removed set for this corpus is ~32k rows (2% near-dup docs), far
    # under the 25M default — the broadcast is O(duplicates), not O(corpus)
    n_out = segment_dedup(docs).count()
    wall = round(time.monotonic() - t0, 3)
    n_docs = docs.count()
    out = {
        "metric": "segment_dedup_wall",
        "value": wall,
        "unit": "sec",
        "num_cpus": NUM_CPUS,
        "docs": n_docs,
        "docs_out": n_out,
        "docs_per_sec": round(n_docs / wall, 1),
    }
    ray.shutdown()
    return out


def run_scaling_segdedup() -> dict:
    """Third scaling pair (VERDICT r4 #7), shuffle/exchange-bound workload:
    exact segment dedup over a 1.6M-doc corpus (~4.4 GB text, 40M segments)
    at 8 vs 32 CPUs in fresh processes — the KG and minhash pairs are
    extraction/scan-dominant; this one is dominated by a 40M-row digest
    exchange, a 640 MB survivor-index broadcast, and a 4.4 GB text sort.
    Legs INTERLEAVE (lo, hi, lo, hi, ...) so shared-host noise windows hit
    both widths; min-of-N per leg."""
    import subprocess

    from text_to_graph_ray.synth import ensure_doc_scaling_corpus

    corpus = ensure_doc_scaling_corpus(n_docs=int(os.environ.get("GRAFT_SEGDEDUP_DOCS", "1600000")))

    def child(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR, GRAFT_SEGDEDUP_INPUT=corpus)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--segdedup-child"],
            env=env, capture_output=True, text=True, check=True,
        )
        return json.loads(p.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "1"))
    runs_lo, runs_hi = [], []
    for _ in range(repeats + 1):
        runs_lo.append(child(lo))
        runs_hi.append(child(hi))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "segment_dedup_scaling",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "sec_8_all": [r["value"] for r in runs_lo],
        "sec_32_all": [r["value"] for r in runs_hi],
        "speedup": round(t_lo / t_hi, 3),
        "scaling_efficiency": round(eff, 3),
        "docs": r_lo.get("docs"),
        "docs_out": r_lo.get("docs_out"),
        "docs_per_sec_8": r_lo.get("docs_per_sec"),
        "docs_per_sec_32": r_hi.get("docs_per_sec"),
        "corpus": corpus,
        "num_cpus": [lo, hi],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--scaling-dedup" in sys.argv:
        print(json.dumps(run_scaling_dedup()))
    elif "--dedup-child" in sys.argv:
        print(json.dumps(run_once_dedup()))
    elif "--scaling-segdedup" in sys.argv:
        print(json.dumps(run_scaling_segdedup()))
    elif "--segdedup-child" in sys.argv:
        print(json.dumps(run_once_segdedup()))
    else:
        print(json.dumps(run_once()))
