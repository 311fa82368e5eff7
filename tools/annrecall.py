"""ANN quality artifact: recall@k of the approximate neighbor queries
vs the exact brute-force ground truth, per scale factor.

CHECKALL tracks value correctness; approximate operators additionally
need their APPROXIMATION QUALITY tracked as a committed number, so a
bucketing-parameter regression shows up as a recall drop in the
per-round artifact rather than only as a pytest failure.

Usage: python tools/annrecall.py [--json OUT.json] [sf_dir ...]

For each ANN query the ground truth is the exact cosine top-k over the
SAME query set and k (ann_brute_force covers vec_id < 32, k = 3;
queries with a narrower query set are compared on their subset).
recall@k = |ANN pairs ∩ exact pairs| / |exact pairs restricted to the
ANN query set|.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

#: each ANN query's DEFINED query set (vec_id < bound) — the recall
#: denominator must come from the definition, not from which queries
#: happened to return pairs (a query with zero ANN results must count
#: its missed truth pairs against recall, not drop out)
ANN_QUERIES = {"ann_sign_lsh": 32, "ann_ivf": 32, "ann_ivf_kmeans": 16,
               "ann_int8_quantized": 8, "ann_pq": 32}


def pairs(df) -> set[tuple[int, int]]:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def main() -> int:
    from adsmasterpipeline_spark.queries import REGISTRY, _load
    from adsmasterpipeline_spark.session import get_spark

    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dirs = argv or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    _load()
    spark = get_spark("annrecall", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        sf_key = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        t0 = time.time()
        exact = pairs(REGISTRY["ann_brute_force"].spark_fn(spark, sf_dir))
        # truth-building is timed SEPARATELY from each ANN query (the
        # per-query secs below are the ANN query harness alone), so
        # retune cost claims can cite an unambiguous number
        row: dict[str, dict] = {
            "_truth_brute_force": {"secs": round(time.time() - t0, 2),
                                   "pairs": len(exact)}}
        for name, qbound in ANN_QUERIES.items():
            t0 = time.time()
            approx = pairs(REGISTRY[name].spark_fn(spark, sf_dir))
            truth = {p for p in exact if p[0] < qbound}
            hit = len(approx & truth)
            recall = round(hit / len(truth), 4) if truth else None
            row[name] = {
                "recall_at_3": recall,
                "n_queries": qbound,
                "truth_pairs": len(truth),
                "hit_pairs": hit,
                "secs": round(time.time() - t0, 2),
            }
            print(f"{sf_key:8s} {name:18s} recall@3="
                  f"{recall if recall is not None else 'n/a'} "
                  f"({hit}/{len(truth)})")
        out[sf_key] = row

    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=2, sort_keys=True)
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
