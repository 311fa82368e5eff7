"""Headline benchmark: run the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line with per-query wall-clock seconds.

Each query is forced through a full materialization (count of the
result) — no collect of wide payloads, so the measured time is plan
execution, not driver transfer.

MEASUREMENT PROTOCOL (fixed in round 5 — round 4's committed artifact
was contended and misled by up to 40% per query): the bench MUST run
in a fresh, otherwise-idle session (no CHECKALL/pytest in the same
JVM or on the same cores). Per query: 2 warm-up executions
(discarded — they absorb Janino codegen compile, Python-worker
spin-up, and shuffle-file warming) then best-of-3 timed executions
with the Spark cache cleared before every run (operators may cache
internally; the clear keeps each run a full recompute). Best-of is
the right statistic for a dedicated-cluster posture: it estimates the
code's cost, not co-tenant noise. The one-line JSON records the
protocol so cross-round deltas are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — scan+agg, multi-join, window,
# keyed merge, checksum dispatch, dedup hashing, near-dup join, ANN,
# plus the scale-path variants (two-phase assignment, LSH dedup/ANN,
# temporal as-of) and the training-corpus curation stages (repetition
# quality, decontamination, sequence packing, incremental dedup),
# and the corpus-hygiene/layout stages (span dedup, quality gate,
# Z-order skipping stats).
# The first 16 are the round-1 set, unchanged for cross-round
# comparability; the curation stages were added in round 2.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q5_regional_revenue",
    "q7_volume_shipping",
    "window_bucket_assign",
    "assign_scalable",
    "topk_per_group",
    "merge_last_writer_wins",
    "checksum_dispatch",
    "sessionize",
    "asof_attribution",
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_neardup",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "ann_sign_lsh",
    "repetition_quality",
    "benchmark_contamination",
    "sequence_pack",
    "incremental_dedup",
    # round-2 additions: corpus hygiene + layout
    "span_dedup_docs",
    "quality_rules_filter",
    "zorder_data_skipping",
    # round-3 additions: SemDeDup-style embedding dedup, DSIR data
    # selection, blocked-GEMM exact all-pairs cosine, bigram-LM
    # perplexity scoring
    "semantic_dedup",
    "dsir_importance_weights",
    "embedding_cosine_neardup_gemm",
    "bigram_lm_nll",
    # round-4 additions: real BPE (12 learned merges + encode),
    # Lee-et-al-style duplicated-substring runs, count-min sketch,
    # integer PageRank, scalable ntile twin, int8-quantized ANN
    "bpe_learn_encode",
    "duplicated_substring_runs",
    "countmin_heavy_hitters",
    "pagerank_supplier_customer",
    "ntile_rank_scalable",
    "ann_int8_quantized",
    # round-4 continuation: triangle counting over the co-purchase
    # graph, per-user time-series gap fill + forward fill, batch
    # sliding event-time windows
    "triangle_copurchase",
    "gapfill_forward_fill",
    "sliding_window_counts",
    # round-5 addition: IVF+PQ re-ranking ANN (rewritten this round —
    # recall@3 0.33 -> 0.81 at sf0.1 at sign-LSH cost)
    "ann_pq",
    # round-6 addition: asymmetric shingle-containment join (quote /
    # subset detection — probe-side prefix filter, full index side)
    "shingle_containment_pairs",
    # round-8 additions (VERDICT r7 #5): the two retuned IVF rungs —
    # their probe counts now differ materially from the other ANN
    # entries (ann_ivf nprobe=5 scans half the label lists;
    # ann_ivf_kmeans runs two Lloyd passes + nprobe 3), so the next
    # retune's cost must be a tracked number, not a claim
    "ann_ivf",
    "ann_ivf_kmeans",
    # round-12 addition (VERDICT r11 task 5): the multimodal near-dup
    # path (real netpbm decode -> blockhash -> shared banded hamming
    # join) gets a driver-visible number — r11's signature-pin and
    # verify-before-dedup wins on this family had no bench entry.
    # Additions keep cross-round comparability (names never removed).
    "image_phash_neardup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Protocol evidence (VERDICT r6 #6): capture machine state BEFORE the
    # run so cross-round deltas are explainable without prose caveats.
    # load1 > ~1 means the session was not idle and the numbers are
    # contended; the committed runs are made cold (load1 < 0.2).
    try:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
    except OSError:  # non-Linux fallback
        load1 = -1.0
    from adsmasterpipeline_spark.queries import REGISTRY, _load
    from adsmasterpipeline_spark.session import get_spark

    _load()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure
    # execution, not session startup
    REGISTRY["q1_pricing_summary"].spark_fn(spark, sf_dir).count()
    for t in ("documents", "embeddings", "events"):
        from adsmasterpipeline_spark.sources import load_table
        load_table(spark, sf_dir, t).count()

    times: dict[str, float] = {}
    warm_times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        qd = REGISTRY[name]
        runs: list[float] = []
        for i in range(5):  # 2 warm-up + best-of-3 (see module doc)
            spark.catalog.clearCache()  # operators may cache internally
            t0 = time.time()
            qd.spark_fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
        warm_times[name] = round(min(runs[:2]), 3)
        times[name] = round(min(runs[2:]), 3)

    total = round(sum(times.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # The stdout line carries EXACTLY the driver-spec keys — the r05
    # driver artifact recorded "parsed": null with a mid-JSON
    # truncated tail, i.e. the extra verbosity (protocol string,
    # warm-up map) pushed the line past the driver's capture buffer.
    # Full detail goes to --detail PATH (the committed
    # BENCH_r{N}_local.json protocol evidence).
    slim = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # compact on purpose — the slim line must stay under the
        # driver's capture buffer (the r05 lesson)
        "protocol": {"stat": "best3_after_2warm", "load1": load1},
    }
    # cross-round comparability note: the first 16 BENCH_QUERIES are
    # the round-1 set (r1: 27.1s, r2: 16.0s, r3: 10.7s). The names are
    # fixed but implementations evolve — r3 retuned minhash bands, r4
    # made ann_sign_lsh multiprobe, r6 gave it Hadamard planes — so
    # deltas mix engine and parameter changes.
    detail = dict(slim)
    detail["r1_subset_total"] = round(
        sum(times[n] for n in BENCH_QUERIES[:16]), 3)
    detail["protocol"] = ("fresh idle session; per query 2 warm-up "
                          "then best-of-3, cache cleared each run")
    detail["warmup_best"] = warm_times
    if len(sys.argv) > 2 and sys.argv[1] == "--detail":
        with open(sys.argv[2], "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    print(json.dumps(slim))


if __name__ == "__main__":
    main()
