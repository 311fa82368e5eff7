"""Full-registry physical-plan audit: for EVERY registered query,
walk the physical plan and classify each construct that could be a
100x scale-killer — SinglePartition shuffles, nested-loop/cartesian
joins — with a structural boundedness verdict (grouping-free
aggregate partials-merge and limit/TopK inputs are bounded by
construction; see plans/explain.plan_scale_issues). The committed
artifact (PLANAUDIT_r{N}.json) makes "no hidden global funnel, no
accidental cartesian" auditable across the whole registry, not a
test-by-test claim.

Usage: python tools/plan_audit.py [--json OUT.json] [sf_dir]

Queries in KNOWN_UNBOUNDED may carry the named construct; each entry
states the reason (key-cardinality bounds and total-order semantics
are invisible to the structural walk). Anything else with an
unbounded issue fails the audit, so a regression that introduces a
new funnel or cartesian turns the artifact red.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# query -> (max unbounded issues allowed, reason)
KNOWN_UNBOUNDED: dict[str, tuple[int, str]] = {
    # declarative twins whose SEMANTICS are a total order; each has a
    # separately-audited scalable twin or documented caveat
    "window_ntile_rank": (1, "global ntile/percent_rank oracle twin; "
                             "scalable twin = ntile_rank_scalable"),
    "window_bucket_assign": (1, "global row_number oracle twin; "
                                "scalable twin = assign_scalable"),
    "window_running_total": (1, "global running-total twin (RANGE "
                                "frame over one ordering)"),
    "window_lag_lead": (1, "global-order lag/lead oracle twin"),
    "window_range_frame": (1, "global RANGE frame oracle twin"),
    "window_flag_first": (1, "global first-flag twin; tiny flag "
                             "cardinality"),
    "first_last_value": (1, "global first/last_value twin"),
    "string_agg_ordered": (1, "deterministic global string_agg"),
    "explode_tokens_top": (1, "global-order output twin"),
    # single-partition exchanges whose input is bounded by KEY
    # CARDINALITY (invisible structurally): segment/filename tables
    "ntile_rank_scalable": (1, "segment aggregate: <= |c_mktsegment| "
                               "rows (plan-asserted <= 2 exchanges in "
                               "test_plans)"),
}

# A broadcast build side caps one input of a nested-loop join, but the
# PROBE side is unbounded — output is probe x build rows. That is the
# intentional pattern behind ANN scoring / centroid assignment (every
# probe row scores against a small broadcast set), but an ACCIDENTAL
# non-equi join whose small side slips under autoBroadcastJoinThreshold
# has the same plan shape. So broadcast-build nested loops are NOT
# auto-certified: each query carrying one must be allowlisted here with
# the reason its build side is structurally small; anything else FLAGs.
# query -> (max broadcast-build nested loops allowed, reason)
KNOWN_BROADCAST_NESTED: dict[str, tuple[int, str]] = {
    "ann_brute_force": (1, "query set (vec_id<32) broadcast; exact "
                           "baseline by design"),
    "ann_int8_quantized": (1, "int8 query set broadcast"),
    "ann_ivf": (2, "tiny centroid table broadcast (assign + probe)"),
    "ann_ivf_kmeans": (6, "k-means centroid table broadcast per "
                          "Lloyd step (k=8 rows; round-8 retune runs "
                          "TWO Lloyd updates + the final assignment "
                          "= 3 crossJoins, and the shared ranked2 "
                          "subtree appears under both cassign and "
                          "qprobe, so the plan carries each twice)"),
    # ann_pq needs no entry since the round-5 IVFADC+R rewrite: the
    # whole search is one Arrow pass + a per-query TopK window — no
    # joins at all
    "cosine_topk": (1, "query set broadcast"),
    "dsir_importance_weights": (1, "hashed feature-weight table "
                                   "broadcast (2^12 buckets fixed)"),
    "embedding_cosine_neardup": (1, "LSH-bucketed small side"),
    "embedding_cosine_neardup_gemm": (1, "tile-aggregated side "
                                         "broadcast (exact kernel)"),
    "semantic_dedup": (3, "k-means centroids broadcast (k rows)"),
}


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from adsmasterpipeline_spark.plans.explain import (
        join_strategies, plan_scale_issues, scan_count,
        takeordered_count,
    )
    from adsmasterpipeline_spark.queries import REGISTRY, _load
    from adsmasterpipeline_spark.session import get_spark

    _load()
    spark = get_spark()
    results: dict[str, dict] = {}
    bad: list[str] = []
    for name, qd in sorted(REGISTRY.items()):
        t0 = time.time()
        try:
            df = qd.spark_fn(spark, sf_dir)
            issues = plan_scale_issues(df)
            unbounded = [i for i in issues if not i["bounded"]]
            bnl = [i for i in issues
                   if i.get("via") == "broadcast-build"]
            allowed, reason = KNOWN_UNBOUNDED.get(name, (0, ""))
            bnl_allowed, bnl_reason = KNOWN_BROADCAST_NESTED.get(
                name, (0, ""))
            row = {
                "issues": issues,
                "unbounded": len(unbounded),
                "broadcast_nested": len(bnl),
                "joins": sorted(set(join_strategies(df))),
                "takeordered": takeordered_count(df),
                "parquet_scans": scan_count(df),
                "secs": round(time.time() - t0, 2),
            }
            if len(unbounded) > allowed:
                row["status"] = "FLAG"
                bad.append(name)
            elif len(bnl) > bnl_allowed:
                # plan-shape of an accidental non-equi join — a small
                # build side must not auto-certify a probe x build
                # fan-out; allowlist it with a reason or fix the join
                row["status"] = "FLAG"
                row["detail"] = ("broadcast-build nested loop not "
                                 "allowlisted (probe side unbounded)")
                bad.append(name)
            else:
                row["status"] = "OK"
                if unbounded:
                    row["allowed_reason"] = reason
                if bnl:
                    row["broadcast_nested_reason"] = bnl_reason
        except Exception:
            row = {"status": "ERROR",
                   "detail": traceback.format_exc(limit=2),
                   "secs": round(time.time() - t0, 2)}
            bad.append(name)
        results[name] = row
        print(f"{row['status']:5s} {name} "
              f"unbounded={row.get('unbounded', '?')} "
              f"issues={len(row.get('issues', []))}")

    summary = {
        "sf_dir": sf_dir,
        "total": len(results),
        "ok": sum(1 for r in results.values() if r["status"] == "OK"),
        "flagged": bad,
    }
    print(f"\n{summary['ok']}/{summary['total']} OK; flagged: {bad}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"summary": summary, "queries": results}, f,
                      indent=1, sort_keys=True)
        print(f"wrote {out_json}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
